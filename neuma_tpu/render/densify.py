"""3DGS densification machinery as pure functions over GaussianPack.

The reference retains the full adaptive-density-control surface from
3DGS (``gaussian_model.py:359-475``: densify_and_clone / densify_and_split
/ prune / reset_opacity / densification stats) even though NeuMA training
itself never densifies; this module provides the same capability in
functional form (host-side numpy shape changes, since densification
changes array sizes between optimization rounds).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.rotation import quat_to_rotmat
from .gaussians import GaussianPack


@dataclasses.dataclass
class DensifyState:
    """Screen-space gradient accumulation (gaussian_model.py:471-475)."""

    xyz_gradient_accum: np.ndarray  # (K, 1)
    denom: np.ndarray  # (K, 1)
    max_radii2d: np.ndarray  # (K,)

    @classmethod
    def zeros(cls, k: int) -> "DensifyState":
        return cls(
            xyz_gradient_accum=np.zeros((k, 1), np.float32),
            denom=np.zeros((k, 1), np.float32),
            max_radii2d=np.zeros((k,), np.float32),
        )

    def add_stats(self, viewspace_grad: np.ndarray, update_filter,
                  radii: Optional[np.ndarray] = None) -> None:
        g = np.linalg.norm(
            np.asarray(viewspace_grad)[update_filter, :2], axis=-1,
            keepdims=True,
        )
        self.xyz_gradient_accum[update_filter] += g
        self.denom[update_filter] += 1
        if radii is not None:
            self.max_radii2d[update_filter] = np.maximum(
                self.max_radii2d[update_filter],
                np.asarray(radii)[update_filter],
            )


def prune(pack: GaussianPack, mask: np.ndarray) -> GaussianPack:
    """Remove gaussians where mask is True (gaussian_model.py:359-373)."""
    return pack.masked(~np.asarray(mask))


def reset_opacity(pack: GaussianPack, ceiling: float = 0.01) -> GaussianPack:
    """Clamp activated opacity to <= ceiling (gaussian_model.py:222-225)."""
    new_op = jnp.minimum(pack.get_opacity, ceiling)
    logit = jnp.log(new_op / (1.0 - new_op))
    return dataclasses.replace(pack, opacity=logit)


def densify_and_clone(
    pack: GaussianPack,
    grads: np.ndarray,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float = 0.01,
) -> GaussianPack:
    """Clone small high-gradient gaussians (gaussian_model.py:482-499)."""
    grads = np.asarray(grads).reshape(-1)
    scaling_max = np.asarray(pack.get_scaling).max(axis=1)
    selected = (grads >= grad_threshold) & (
        scaling_max <= percent_dense * scene_extent
    )
    if not selected.any():
        return pack
    clone = pack.masked(selected)
    return GaussianPack.concatenate([pack, clone])


def densify_and_split(
    pack: GaussianPack,
    grads: np.ndarray,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float = 0.01,
    n_split: int = 2,
    rng: Optional[np.random.Generator] = None,
) -> GaussianPack:
    """Split big high-gradient gaussians into N samples with scales
    shrunk by 0.8*N, removing the originals (gaussian_model.py:441-466)."""
    rng = rng or np.random.default_rng(0)
    grads = np.asarray(grads).reshape(-1)
    scaling = np.asarray(pack.get_scaling)
    selected = (grads >= grad_threshold) & (
        scaling.max(axis=1) > percent_dense * scene_extent
    )
    if not selected.any():
        return pack
    sel = pack.masked(selected)
    stds = np.tile(np.asarray(sel.get_scaling), (n_split, 1))
    samples = rng.normal(0.0, stds).astype(np.float32)
    rots = np.tile(
        np.asarray(quat_to_rotmat(sel.rotation)), (n_split, 1, 1)
    )
    new_xyz = (
        np.einsum("kij,kj->ki", rots, samples)
        + np.tile(np.asarray(sel.xyz), (n_split, 1))
    )
    new_scaling = np.log(
        np.tile(np.asarray(sel.get_scaling), (n_split, 1))
        / (0.8 * n_split)
    )
    children = GaussianPack(
        xyz=jnp.asarray(new_xyz, jnp.float32),
        features_dc=jnp.tile(sel.features_dc, (n_split, 1, 1)),
        features_rest=jnp.tile(sel.features_rest, (n_split, 1, 1)),
        scaling=jnp.asarray(new_scaling, jnp.float32),
        rotation=jnp.tile(sel.rotation, (n_split, 1)),
        opacity=jnp.tile(sel.opacity, (n_split, 1)),
        sh_degree=pack.sh_degree,
    )
    survivors = pack.masked(~selected)
    return GaussianPack.concatenate([survivors, children])


def densify_and_prune(
    pack: GaussianPack,
    state: DensifyState,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: Optional[float] = None,
    percent_dense: float = 0.01,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[GaussianPack, DensifyState]:
    """Full adaptive density control round (gaussian_model.py:452-468)."""
    grads = state.xyz_gradient_accum / np.maximum(state.denom, 1e-12)
    grads = np.nan_to_num(grads, nan=0.0).reshape(-1)

    n_before = pack.num_gaussians
    pack = densify_and_clone(pack, grads, max_grad, extent, percent_dense)
    # Pad grads for the clones (they start with zero accumulated grad,
    # matching the reference's padded_grad in densify_and_split).
    grads = np.concatenate(
        [grads, np.zeros(pack.num_gaussians - n_before, np.float32)]
    )
    pack = densify_and_split(
        pack, grads, max_grad, extent, percent_dense, rng=rng
    )

    prune_mask = (
        np.asarray(pack.get_opacity).reshape(-1) < min_opacity
    )
    if max_screen_size:
        big_ws = np.asarray(pack.get_scaling).max(axis=1) > 0.1 * extent
        prune_mask = prune_mask | big_ws
    pack = prune(pack, prune_mask)
    return pack, DensifyState.zeros(pack.num_gaussians)
