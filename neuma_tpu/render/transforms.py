"""Rigid/similarity transforms of Gaussian packs.

Functional equivalents of the reference's in-place transform utilities
(``modules/d3gs/utils/transform_utils.py``): translation, origin-centered
scaling (log-scale offset), rotation (xyz, quaternion composition, SH
rotation via Wigner-D).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.rotation import rotmat_to_quat
from ..ops.wigner import rotate_sh
from .gaussians import GaussianPack


def quaternion_multiply(q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """Reference transform_utils.py:14-22 (note the argument order)."""
    w0, x0, y0, z0 = jnp.moveaxis(q0, -1, 0)
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    return jnp.stack(
        [
            -x1 * x0 - y1 * y0 - z1 * z0 + w1 * w0,
            x1 * w0 + y1 * z0 - z1 * y0 + w1 * x0,
            -x1 * z0 + y1 * w0 + z1 * x0 + w1 * y0,
            x1 * y0 - y1 * x0 + z1 * w0 + w1 * z0,
        ],
        axis=-1,
    )


def translate_points(points: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return points + t[None, :]


def scale_points(
    points: jnp.ndarray,
    log_scales: jnp.ndarray,
    scale: jnp.ndarray,
    origin: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Origin-centered scaling; Gaussian extents scale too (reference
    ``scale_transform``, transform_utils.py:174-198)."""
    if origin is None:
        origin = jnp.mean(points, axis=0, keepdims=True)
    points = scale * (points - origin)
    log_scales = log_scales + jnp.log(scale)
    return points, log_scales


def rotate_points(
    points: jnp.ndarray, rotations: jnp.ndarray, R: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate positions and compose quaternions (reference
    ``rotate_transform``, transform_utils.py:201-221; SH handled
    separately)."""
    points = points @ R.T
    quat = rotmat_to_quat(R)[None, :]
    rotations = quaternion_multiply(
        rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True),
        quat,
    )
    rotations = rotations / jnp.linalg.norm(
        rotations, axis=-1, keepdims=True
    )
    return points, rotations


def transform_gaussians(
    pack: GaussianPack,
    R: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    origin: Optional[jnp.ndarray] = None,
) -> GaussianPack:
    """Apply scale -> rotate -> translate (the Register composition order,
    reference register.py:75-82) returning a new pack."""
    xyz = pack.xyz
    scaling = pack.scaling
    rotation = pack.rotation
    f_rest = pack.features_rest

    if scale is not None:
        xyz, scaling = scale_points(xyz, scaling, scale, origin)
    if R is not None:
        xyz, rotation = rotate_points(xyz, rotation, R)
        if f_rest.shape[1] > 0:
            f_rest = rotate_sh(f_rest, R)
    if t is not None:
        xyz = translate_points(xyz, t)
    return dataclasses.replace(
        pack,
        xyz=xyz,
        scaling=scaling,
        rotation=rotation,
        features_rest=f_rest,
    )
