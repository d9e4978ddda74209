"""Real spherical harmonics evaluation (degrees 0-4) in jnp.

Matches the reference's PlenOctree-derived coefficients and layout
(``modules/d3gs/utils/sh_utils.py`` in the reference repo): SH coeffs are
stored as (..., (deg+1)^2, C) with the DC term first — note the reference
stores (..., C, coeffs) inside ``eval_sh`` after a transpose; here we take
the Gaussian-model layout (..., n_coeffs, 3) directly and contract on the
coefficient axis.
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    Args:
        deg: max degree (0..3 supported, matching the rasterizer).
        dirs: (..., 3) unit directions.
    Returns:
        (..., (deg+1)^2) basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, C0)]
    if deg > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors.

    Args:
        deg: active degree (0..3).
        sh: (..., n_coeffs, C) coefficients, n_coeffs >= (deg+1)^2.
        dirs: (..., 3) unit view directions.
    Returns:
        (..., C) colors (pre-offset; the rasterizer adds 0.5 and clamps).
    """
    basis = sh_basis(deg, dirs)  # (..., k)
    k = (deg + 1) ** 2
    return jnp.einsum("...kc,...k->...c", sh[..., :k, :], basis)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
