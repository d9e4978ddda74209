"""SH rotation correctness: rotating coefficients must equal rotating the
evaluation direction — eval(rot_sh, d) == eval(sh, R^T d) for all bands."""
import numpy as np
import jax.numpy as jnp
import pytest

from neuma_tpu.ops.sh import eval_sh
from neuma_tpu.ops.rotation import axis_angle_to_rotmat
from neuma_tpu.ops.wigner import rotate_sh, sh_rotation_matrices


def random_rotation(rng):
    aa = rng.standard_normal(3)
    return np.asarray(
        axis_angle_to_rotmat(jnp.asarray(aa, jnp.float32))
    )


@pytest.mark.parametrize("deg", [1, 2, 3])
def test_sh_rotation_render_consistency(rng, deg):
    n = 16
    n_coeff = (deg + 1) ** 2
    sh = jnp.asarray(
        rng.standard_normal((n, n_coeff, 3)), jnp.float32
    )
    R = random_rotation(rng)
    Rj = jnp.asarray(R, jnp.float32)

    f_rest_rot = rotate_sh(sh[:, 1:, :], Rj)
    sh_rot = jnp.concatenate([sh[:, :1, :], f_rest_rot], axis=1)

    dirs = rng.standard_normal((50, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs, jnp.float32)

    for i in range(4):
        d = dirs[i * 10 : i * 10 + 10]
        # function value of the ROTATED field at direction d must equal
        # the original field at R^T d
        lhs = eval_sh(deg, sh_rot[:, None, :, :], d[None, :, :])
        rhs = eval_sh(
            deg, sh[:, None, :, :], (d @ Rj)[None, :, :]
        )
        np.testing.assert_allclose(
            np.asarray(lhs), np.asarray(rhs), atol=2e-4,
            err_msg=f"deg={deg}",
        )


def test_band_matrices_orthogonal(rng):
    R = random_rotation(rng)
    mats = sh_rotation_matrices(jnp.asarray(R, jnp.float32), 3)
    for l, D in enumerate(mats, start=1):
        eye = np.eye(2 * l + 1)
        np.testing.assert_allclose(
            np.asarray(D @ D.T), eye, atol=1e-4,
            err_msg=f"band {l} not orthogonal",
        )


def test_identity_rotation_is_noop(rng):
    sh = jnp.asarray(rng.standard_normal((4, 15, 3)), jnp.float32)
    out = rotate_sh(sh, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(sh), atol=1e-6)
