"""svd3: reconstruction, orthogonality, sign convention, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.ops.svd3 import svd3


def random_batch(rng, n=64, scale=1.0, near_identity=False):
    if near_identity:
        A = np.eye(3)[None] + 0.2 * rng.standard_normal((n, 3, 3))
    else:
        A = scale * rng.standard_normal((n, 3, 3))
    return jnp.asarray(A, jnp.float32)


def test_reconstruction(rng):
    A = random_batch(rng, 128)
    U, s, Vh = svd3(A)
    recon = (U * s[:, None, :]) @ Vh
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=2e-5)


def test_orthogonality_and_det_sign(rng):
    A = random_batch(rng, 128)
    U, s, Vh = svd3(A)
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(U @ jnp.swapaxes(U, -1, -2)),
        np.broadcast_to(eye, U.shape),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(Vh @ jnp.swapaxes(Vh, -1, -2)),
        np.broadcast_to(eye, Vh.shape),
        atol=1e-5,
    )
    # Reference sign convention: det(U) > 0 and det(V) > 0 with the
    # reflection folded into sigma[2] (reference warp/svd.py:76-92).
    assert np.all(np.asarray(jnp.linalg.det(U)) > 0.99)
    assert np.all(np.asarray(jnp.linalg.det(jnp.swapaxes(Vh, -1, -2))) > 0.99)
    # Sorted by magnitude descending; first two non-negative.
    s_np = np.asarray(s)
    assert np.all(s_np[:, 0] >= s_np[:, 1] - 1e-6)
    assert np.all(np.abs(s_np[:, 1]) >= np.abs(s_np[:, 2]) - 1e-6)
    assert np.all(s_np[:, :2] >= -1e-6)


def test_sigma_matches_lapack(rng):
    A = random_batch(rng, 64)
    _, s, _ = svd3(A)
    s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
    np.testing.assert_allclose(np.abs(np.asarray(s)), s_ref, atol=2e-5)


def test_reflection_sign(rng):
    # A pure reflection must produce sigma[2] < 0.
    A = jnp.asarray(np.diag([1.0, 1.0, -1.0])[None], jnp.float32)
    U, s, Vh = svd3(A)
    assert float(s[0, 2]) < 0
    recon = (U * s[:, None, :]) @ Vh
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=1e-5)


def test_gradient_vs_finite_difference(rng):
    A = random_batch(rng, 8, near_identity=True)

    def loss(A):
        U, s, Vh = svd3(A)
        R = U @ Vh
        return jnp.sum(jnp.sin(s)) + jnp.sum(R * jnp.cos(A)) + jnp.sum(
            s ** 2
        )

    g = jax.grad(loss)(A)
    # central finite differences
    eps = 1e-3
    A_np = np.asarray(A, np.float64)
    g_fd = np.zeros_like(A_np)
    for idx in np.ndindex(A_np.shape):
        Ap = A_np.copy()
        Ap[idx] += eps
        Am = A_np.copy()
        Am[idx] -= eps
        g_fd[idx] = (
            float(loss(jnp.asarray(Ap, jnp.float32)))
            - float(loss(jnp.asarray(Am, jnp.float32)))
        ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, atol=5e-2, rtol=5e-2)


def test_degenerate_inputs_finite(rng):
    # Repeated and zero singular values should not produce NaN in forward.
    A = jnp.asarray(
        np.stack([np.eye(3), np.zeros((3, 3)), np.diag([1.0, 1.0, 0.0])]),
        jnp.float32,
    )
    U, s, Vh = svd3(A)
    assert np.all(np.isfinite(np.asarray(U)))
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.all(np.isfinite(np.asarray(Vh)))
    recon = (U * s[:, None, :]) @ Vh
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=1e-5)
