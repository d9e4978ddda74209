"""Binding table: Mahalanobis selection, weights, runtime application."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.render.binding import (
    CHI2_95_3,
    BindingTable,
    apply_binding_F,
    apply_binding_xyz,
    compute_binding_table,
    deform_cov_by_F,
)
from neuma_tpu.render.gaussians import (
    GaussianPack,
    build_covariance,
    unstrip_symmetric,
    create_from_points,
)


def make_gaussians(rng, k=16):
    pts = rng.random((k, 3)).astype(np.float32)
    return create_from_points(pts, sh_degree=3)


def test_binding_selects_nearby_particles(rng):
    g = make_gaussians(rng, k=8)
    # Particles exactly at kernel centers must always bind.
    particles = g.xyz
    table = compute_binding_table(g, particles, max_particles=4)
    counts = np.asarray(table.counts())
    assert np.all(counts >= 1)
    # Weight rows sum to 1 for bound kernels.
    wsum = np.asarray(jnp.sum(table.weights, axis=1))
    np.testing.assert_allclose(wsum[counts > 0], 1.0, atol=1e-6)


def test_binding_respects_max_particles(rng):
    g = make_gaussians(rng, k=4)
    # Blob of many particles at each kernel center.
    centers = np.asarray(g.xyz)
    particles = np.concatenate(
        [c + 0.001 * rng.standard_normal((50, 3)) for c in centers]
    ).astype(np.float32)
    table = compute_binding_table(
        g, jnp.asarray(particles), max_particles=10
    )
    assert np.all(np.asarray(table.counts()) <= 10)


def test_binding_mahalanobis_threshold(rng):
    g = make_gaussians(rng, k=2)
    covs = unstrip_symmetric(g.get_covariance())
    # Particle far outside the 95% ellipsoid of every kernel: no binding.
    far = jnp.asarray([[50.0, 50.0, 50.0]], jnp.float32)
    table = compute_binding_table(g, far, max_particles=4)
    assert np.all(np.asarray(table.counts()) == 0)


def test_apply_binding_xyz_gradient_only_through_curr(rng):
    k, p, m = 5, 20, 4
    table = BindingTable(
        indices=jnp.asarray(rng.integers(0, p, (k, m)), jnp.int32),
        weights=jnp.full((k, m), 1.0 / m, jnp.float32),
    )
    p_prev = jnp.asarray(rng.random((p, 3)), jnp.float32)
    p_curr = p_prev + 0.1
    k_prev = jnp.asarray(rng.random((k, 3)), jnp.float32)

    k_curr = apply_binding_xyz(table, p_curr, p_prev, k_prev)
    # Uniform +0.1 shift of all particles must shift every kernel by +0.1.
    np.testing.assert_allclose(
        np.asarray(k_curr - k_prev), 0.1, atol=1e-6
    )

    # Gradient w.r.t. p_curr flows; w.r.t. p_prev and k_prev it is zero
    # (reference detach semantics, tune/utils.py:441-446).
    def loss(pc, pp, kp):
        return jnp.sum(apply_binding_xyz(table, pc, pp, kp) ** 2)

    g_pc, g_pp, g_kp = jax.grad(loss, argnums=(0, 1, 2))(
        p_curr, p_prev, k_prev
    )
    assert float(jnp.max(jnp.abs(g_pc))) > 0
    np.testing.assert_allclose(np.asarray(g_pp), 0.0)
    np.testing.assert_allclose(np.asarray(g_kp), 0.0)


def test_apply_binding_F_matches_dense(rng):
    k, p, m = 6, 15, 3
    idx = rng.integers(0, p, (k, m))
    w = rng.random((k, m)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    table = BindingTable(
        indices=jnp.asarray(idx, jnp.int32), weights=jnp.asarray(w)
    )
    F = jnp.asarray(rng.standard_normal((p, 3, 3)), jnp.float32)
    out = apply_binding_F(table, F)
    # dense check
    B = np.zeros((k, p), np.float32)
    for i in range(k):
        for j in range(m):
            B[i, idx[i, j]] += w[i, j]
    expected = (B @ np.asarray(F).reshape(p, 9)).reshape(k, 3, 3)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_deform_cov_stop_gradient(rng):
    cov = jnp.asarray(rng.random((4, 6)), jnp.float32)
    F = jnp.asarray(
        np.eye(3)[None] + 0.1 * rng.standard_normal((4, 3, 3)), jnp.float32
    )
    out = deform_cov_by_F(cov, F)
    # Sigma' = F Sigma F^T
    sig = np.asarray(unstrip_symmetric(cov))
    F_np = np.asarray(F)
    expected = F_np @ sig @ np.swapaxes(F_np, -1, -2)
    got = np.asarray(unstrip_symmetric(out))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # No gradient flows (reference launches the kernel untaped,
    # tune/utils.py:355-373).
    g = jax.grad(lambda f: jnp.sum(deform_cov_by_F(cov, f)))(F)
    np.testing.assert_allclose(np.asarray(g), 0.0)
    # Flag off => gradient flows.
    g2 = jax.grad(
        lambda f: jnp.sum(deform_cov_by_F(cov, f, stop_gradient=False))
    )(F)
    assert float(jnp.max(jnp.abs(g2))) > 0
