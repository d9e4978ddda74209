"""Rotation-representation conversions in pure jnp.

TPU-native replacement for the reference's pytorch3d-backed helpers
(``modules/d3gs/utils/se3_utils.py`` in the reference repo) and the 3DGS
quaternion utilities (``modules/d3gs/utils/general_utils.py:107-139``).

Quaternions use the (w, x, y, z) convention, matching 3DGS.
All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.
    Normalizes the quaternion first (reference ``build_rotation``,
    general_utils.py:107-128)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz quaternion (branch-free Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Four candidate constructions; pick the numerically largest pivot.
    qw0 = 0.5 * safe_sqrt(1.0 + tr)
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
         (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
         (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
         (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), -2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q


def rot6d_to_rotmat(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6D rotation (Zhou et al. 2019) -> (..., 3, 3).
    Used by the real-world registration stage (reference Register params,
    ``modules/tune/regist/register.py:27-33``)."""
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2, axis=-1)
    return jnp.stack([b1, b2, b3], axis=-2)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two rows, flattened."""
    return R[..., :2, :].reshape(R.shape[:-2] + (6,))


def axis_angle_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle (Rodrigues) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    k = aa / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    t = theta[..., None]
    eye = jnp.eye(3, dtype=aa.dtype)
    return eye + jnp.sin(t) * K + (1 - jnp.cos(t)) * (K @ K)


def euler_to_rotmat(angles: jnp.ndarray, order: str = "XYZ") -> jnp.ndarray:
    """(..., 3) euler angles (radians) -> (..., 3, 3), intrinsic rotations
    applied in ``order``."""

    def axis_rot(axis, a):
        c, s = jnp.cos(a), jnp.sin(a)
        one, zero = jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            elems = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            elems = [c, zero, s, zero, one, zero, -s, zero, c]
        else:
            elems = [c, -s, zero, s, c, zero, zero, zero, one]
        return jnp.stack(elems, axis=-1).reshape(a.shape + (3, 3))

    R = axis_rot(order[0], angles[..., 0])
    for i, ax in enumerate(order[1:], start=1):
        R = R @ axis_rot(ax, angles[..., i])
    return R
