"""3D Gaussian parameter pack (Particle-GS scene representation).

TPU-native redesign of the reference's ``GaussianModel``
(``modules/d3gs/scene/gaussian_model.py`` in the reference repo): the
mutable torch module becomes an immutable pytree of raw (pre-activation)
parameters plus pure activation helpers. PLY layout and activations match
3DGS exactly so reference-trained kernels load 1:1:

* ``scaling``   stored as log, activated with exp
* ``rotation``  stored as unnormalized wxyz quaternion, normalized on use
* ``opacity``   stored as logit, activated with sigmoid
* ``features``  (N, (deg+1)^2, 3) SH coefficients, DC first
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import _pytree_dataclass, static_field
from ..ops.rotation import quat_to_rotmat


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) upper-triangular packing
    [xx, xy, xz, yy, yz, zz] (reference general_utils.py:93-105)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = [packed[..., i] for i in range(6)]
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def build_covariance(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Sigma = (R S)(R S)^T packed to 6 entries (reference
    gaussian_model.py:26-31 + general_utils.py:130-139). ``scaling`` is the
    activated (exp'd) scale."""
    R = quat_to_rotmat(rotation)
    L = R * (scaling_modifier * scaling)[..., None, :]
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


@_pytree_dataclass
class GaussianPack:
    """Raw Gaussian parameters (pre-activation)."""

    xyz: jnp.ndarray  # (K, 3)
    features_dc: jnp.ndarray  # (K, 1, 3)
    features_rest: jnp.ndarray  # (K, (deg+1)^2 - 1, 3)
    scaling: jnp.ndarray  # (K, 3) log-scale
    rotation: jnp.ndarray  # (K, 4) wxyz
    opacity: jnp.ndarray  # (K, 1) logit
    sh_degree: int = static_field(default=3)

    @property
    def num_gaussians(self) -> int:
        return self.xyz.shape[0]

    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(
            self.rotation, axis=-1, keepdims=True
        )

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.features_dc, self.features_rest], axis=1
        )

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return build_covariance(
            self.get_scaling, self.rotation, scaling_modifier
        )

    # --- I/O (PLY layout identical to 3DGS / the reference) --------------

    @classmethod
    def from_ply(cls, path, sh_degree: int = 3) -> "GaussianPack":
        """Reference ``GaussianModel.load_ply`` (gaussian_model.py:227-270)."""
        from ..data.ply import load_ply

        d = load_ply(path)
        n = d["x"].shape[0]
        xyz = np.stack([d["x"], d["y"], d["z"]], axis=1)
        opacity = d["opacity"][:, None]
        f_dc = np.stack(
            [d["f_dc_0"], d["f_dc_1"], d["f_dc_2"]], axis=1
        )[:, None, :].transpose(0, 1, 2)
        n_rest = 3 * ((sh_degree + 1) ** 2 - 1)
        rest_names = sorted(
            (k for k in d if k.startswith("f_rest_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        assert len(rest_names) == n_rest, (
            f"expected {n_rest} f_rest_* fields, found {len(rest_names)}"
        )
        # PLY stores (C, coeff) flattened; model uses (coeff, C)
        # (reference load_ply reshape + transpose, gaussian_model.py:243-263).
        # sh_degree 0 (the whole realworld family) has no f_rest fields.
        if n_rest == 0:
            rest = np.zeros((n, 0, 3), np.float32)
        else:
            rest = np.stack([d[k] for k in rest_names], axis=1).reshape(
                n, 3, (sh_degree + 1) ** 2 - 1
            ).transpose(0, 2, 1)
        scale_names = sorted(
            (k for k in d if k.startswith("scale_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        scaling = np.stack([d[k] for k in scale_names], axis=1)
        rot_names = sorted(
            (k for k in d if k.startswith("rot_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        rotation = np.stack([d[k] for k in rot_names], axis=1)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return cls(
            xyz=f32(xyz),
            features_dc=f32(f_dc.reshape(n, 1, 3)),
            features_rest=f32(rest),
            scaling=f32(scaling),
            rotation=f32(rotation),
            opacity=f32(opacity),
            sh_degree=sh_degree,
        )

    def to_ply(self, path) -> None:
        """Reference ``GaussianModel.save_ply`` (gaussian_model.py:203-220)."""
        from ..data.ply import save_ply

        n = self.num_gaussians
        props: Dict[str, np.ndarray] = {}
        xyz = np.asarray(self.xyz)
        props["x"], props["y"], props["z"] = xyz.T
        props["nx"] = props["ny"] = props["nz"] = np.zeros(n, np.float32)
        f_dc = np.asarray(self.features_dc).transpose(0, 2, 1).reshape(n, -1)
        for i in range(f_dc.shape[1]):
            props[f"f_dc_{i}"] = f_dc[:, i]
        rest = np.asarray(self.features_rest).transpose(0, 2, 1).reshape(n, -1)
        for i in range(rest.shape[1]):
            props[f"f_rest_{i}"] = rest[:, i]
        props["opacity"] = np.asarray(self.opacity)[:, 0]
        scaling = np.asarray(self.scaling)
        for i in range(scaling.shape[1]):
            props[f"scale_{i}"] = scaling[:, i]
        rotation = np.asarray(self.rotation)
        for i in range(rotation.shape[1]):
            props[f"rot_{i}"] = rotation[:, i]
        save_ply(path, props)

    def masked(self, mask: np.ndarray) -> "GaussianPack":
        """Subset selection (reference ``load_ply_with_mask``,
        gaussian_model.py:272-324, used for opacity pruning)."""
        mask = np.asarray(mask)
        return dataclasses.replace(
            self,
            xyz=self.xyz[mask],
            features_dc=self.features_dc[mask],
            features_rest=self.features_rest[mask],
            scaling=self.scaling[mask],
            rotation=self.rotation[mask],
            opacity=self.opacity[mask],
        )

    @classmethod
    def concatenate(cls, packs) -> "GaussianPack":
        """Multi-object concatenation (reference
        ``preprocess_for_rasterization``, tune/utils.py:475-523)."""
        return cls(
            xyz=jnp.concatenate([p.xyz for p in packs]),
            features_dc=jnp.concatenate([p.features_dc for p in packs]),
            features_rest=jnp.concatenate([p.features_rest for p in packs]),
            scaling=jnp.concatenate([p.scaling for p in packs]),
            rotation=jnp.concatenate([p.rotation for p in packs]),
            opacity=jnp.concatenate([p.opacity for p in packs]),
            sh_degree=packs[0].sh_degree,
        )


def create_from_points(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    sh_degree: int = 3,
) -> GaussianPack:
    """Initialize Gaussians from a point cloud: isotropic scales from
    mean 3-NN distance, identity rotations, opacity 0.1 (reference
    ``create_from_pcd``, gaussian_model.py:136-159; the CUDA ``distCUDA2``
    kNN is replaced by a vectorized brute-force / chunked jnp kNN —
    component N3 in SURVEY.md)."""
    from ..ops.sh import rgb_to_sh

    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if colors is None:
        colors = np.full((n, 3), 0.5, np.float32)

    # mean squared distance to the 3 nearest neighbors, chunked
    pts = jnp.asarray(points)

    k_nn = min(4, n)

    def mean_d2(chunk):
        d2 = jnp.sum((chunk[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        knn = -jax.lax.top_k(-d2, k_nn)[0][:, 1:]  # drop self
        if knn.shape[1] == 0:
            return jnp.full((chunk.shape[0],), 1e-4, chunk.dtype)
        return jnp.mean(knn, axis=-1)

    chunks = [
        mean_d2(pts[i : i + 4096]) for i in range(0, n, 4096)
    ]
    dist2 = jnp.maximum(jnp.concatenate(chunks), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacity = np.full((n, 1), np.log(0.1 / 0.9), np.float32)  # logit(0.1)

    n_rest = (sh_degree + 1) ** 2 - 1
    return GaussianPack(
        xyz=jnp.asarray(points),
        features_dc=jnp.asarray(rgb_to_sh(colors))[:, None, :],
        features_rest=jnp.zeros((n, n_rest, 3), jnp.float32),
        scaling=scales,
        rotation=jnp.asarray(rots),
        opacity=jnp.asarray(opacity),
        sh_degree=sh_degree,
    )
