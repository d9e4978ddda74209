"""Particle <-> Gaussian kernel binding.

TPU-native redesign of the reference's binding pipeline
(``modules/d3gs/utils/binding_utils.py`` + ``modules/tune/utils.py:424-472``):

* Precompute: instead of a host loop launching one Mahalanobis kernel per
  Gaussian (reference binding_utils.py:157-232 — a known slow spot), a
  single vectorized pass computes the (K, P) Mahalanobis field in chunks,
  selects the <= max_particles nearest by test statistic, and emits a
  DENSE (K, max_particles) index/weight table. On TPU a small dense
  gather table beats a sparse COO matmul (SURVEY.md N6).
* Runtime: gathers + einsum replace ``torch.sparse.mm``; the incremental
  kernel advection's stop-gradients match the reference exactly
  (``compute_bindings_xyz``: gradient only reaches the *current*
  particle positions, tune/utils.py:441-446).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import _pytree_dataclass, static_field
from .gaussians import GaussianPack, unstrip_symmetric

# chi2.ppf(0.95, 3) — the reference computes this via scipy at runtime
# (binding_utils.py:131); it is a constant.
CHI2_95_3 = 7.814727903251179


def _chi2_ppf_3(confidence: float) -> float:
    if abs(confidence - 0.95) < 1e-9:
        return CHI2_95_3
    from scipy.stats import chi2  # optional path for non-default confidence

    return float(chi2.ppf(confidence, 3))


@_pytree_dataclass
class BindingTable:
    """Dense binding: for each Gaussian kernel k, up to M particle indices
    with normalized weights (zero weight = unused slot)."""

    indices: jnp.ndarray  # (K, M) int32
    weights: jnp.ndarray  # (K, M) float32, rows sum to 1 (or 0 if unbound)

    @property
    def num_kernels(self) -> int:
        return self.indices.shape[0]

    def counts(self) -> jnp.ndarray:
        return jnp.sum(self.weights > 0, axis=1)

    def save(self, path) -> None:
        np.savez(
            path,
            indices=np.asarray(self.indices),
            weights=np.asarray(self.weights),
        )

    @classmethod
    def load(cls, path) -> "BindingTable":
        d = np.load(path)
        return cls(
            indices=jnp.asarray(d["indices"], jnp.int32),
            weights=jnp.asarray(d["weights"], jnp.float32),
        )


def mahalanobis_field(
    means: jnp.ndarray,  # (K, 3)
    inv_covs: jnp.ndarray,  # (K, 3, 3)
    particles: jnp.ndarray,  # (P, 3)
) -> jnp.ndarray:
    """d^T Sigma^-1 d for every (kernel, particle) pair; (K, P).
    Vectorizes reference ``test_point_in_gaussians_with_inv_cov_warp``
    (binding_utils.py:87-121)."""
    d = particles[None, :, :] - means[:, None, :]  # (K, P, 3)
    return jnp.einsum("kpi,kij,kpj->kp", d, inv_covs, d)


def compute_binding_table(
    gaussians: GaussianPack,
    particles: jnp.ndarray,
    confidence: float = 0.95,
    max_particles: int = 10,
    chunk: int = 1024,
) -> BindingTable:
    """Two criteria matching ``gaussian_binding_with_clip_v1``
    (binding_utils.py:199-285): keep particles with Mahalanobis stat <=
    chi2.ppf(confidence, 3); if more than ``max_particles`` qualify keep
    the nearest; weights are uniform softmax over the kept set (the
    reference overwrites the stats with ones before the softmax)."""
    threshold = _chi2_ppf_3(confidence)
    covs = unstrip_symmetric(gaussians.get_covariance())  # (K, 3, 3)
    inv_covs = jnp.linalg.inv(covs)
    means = gaussians.xyz
    K = means.shape[0]

    top_k = min(max_particles, particles.shape[0])

    @jax.jit
    def chunk_fn(m, ic):
        p = mahalanobis_field(m, ic, particles)  # (k, P)
        stat = jnp.where(p <= threshold, p, jnp.inf)
        # nearest max_particles by stat
        neg_top, idx = jax.lax.top_k(-stat, top_k)
        inside = jnp.isfinite(-neg_top)  # (k, top_k)
        count = jnp.maximum(jnp.sum(inside, axis=1, keepdims=True), 1)
        w = jnp.where(inside, 1.0 / count, 0.0)  # uniform softmax
        pad = max_particles - top_k
        if pad:
            idx = jnp.pad(idx, ((0, 0), (0, pad)))
            w = jnp.pad(w, ((0, 0), (0, pad)))
        return idx.astype(jnp.int32), w.astype(jnp.float32)

    indices = []
    weights = []
    for start in range(0, K, chunk):
        idx, w = chunk_fn(
            means[start : start + chunk], inv_covs[start : start + chunk]
        )
        indices.append(idx)
        weights.append(w)
    return BindingTable(
        indices=jnp.concatenate(indices, axis=0),
        weights=jnp.concatenate(weights, axis=0),
    )


def binding_flags(
    gaussians: GaussianPack,
    particles: jnp.ndarray,
    confidence: float = 0.95,
    max_particles: int = 10,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Boolean 'has any bound particle' per kernel — the first-pass use
    (reference ``gaussian_binding`` + prepare_simulation_data's injection
    of unbound kernel centers, tune/utils.py:276-287)."""
    table = compute_binding_table(
        gaussians, particles, confidence, max_particles, chunk
    )
    return table.counts() > 0


def apply_binding_xyz(
    table: BindingTable,
    p_curr: jnp.ndarray,
    p_prev: jnp.ndarray,
    k_prev: jnp.ndarray,
) -> jnp.ndarray:
    """Incremental kernel advection (reference ``compute_bindings_xyz``,
    tune/utils.py:424-448):
        k_curr = stop_grad(k_prev) + B @ (p_curr - stop_grad(p_prev))
    Gradient reaches the sim only through p_curr."""
    delta = p_curr - jax.lax.stop_gradient(p_prev)  # (P, 3)
    gathered = delta[table.indices]  # (K, M, 3)
    delta_k = jnp.einsum("km,kmc->kc", table.weights, gathered)
    return jax.lax.stop_gradient(k_prev) + delta_k


def apply_binding_F(
    table: BindingTable, deform_grad: jnp.ndarray
) -> jnp.ndarray:
    """Kernel deformation gradient = weighted particle F (reference
    ``compute_bindings_F``, tune/utils.py:451-472)."""
    flatF = deform_grad.reshape(-1, 9)
    gathered = flatF[table.indices]  # (K, M, 9)
    F_k = jnp.einsum("km,kmc->kc", table.weights, gathered)
    return F_k.reshape(-1, 3, 3)


def deform_cov_by_F(
    cov3d: jnp.ndarray, F: jnp.ndarray, stop_gradient: bool = True
) -> jnp.ndarray:
    """Sigma' = F Sigma F^T, packed 6 (reference ``deform_cov_by_F`` Warp
    kernel, d3gs/utils/simulation_utils.py:25-48). The reference launches
    it OUTSIDE any tape, so no gradient flows through the covariance path —
    replicated via stop_gradient (default on; flag off to enable the
    extra gradient path as a framework improvement)."""
    from .gaussians import strip_symmetric

    if stop_gradient:
        F = jax.lax.stop_gradient(F)
        cov3d = jax.lax.stop_gradient(cov3d)
    sig = unstrip_symmetric(cov3d)
    out = F @ sig @ jnp.swapaxes(F, -1, -2)
    # Symmetrize against accumulation error before packing.
    out = 0.5 * (out + jnp.swapaxes(out, -1, -2))
    return strip_symmetric(out)
