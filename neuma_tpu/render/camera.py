"""Camera model with 3DGS conventions.

Mirrors the reference's ``Camera`` / ``PhysCamera`` / ``MiniCam``
(``modules/d3gs/scene/cameras.py``) and ``graphics_utils.py``: matrices
are stored TRANSPOSED (row-vector convention, ``p_cam = [p, 1] @ world_view``)
so numerics line up with diff-gaussian-rasterization's expectations.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

from ..core.types import _pytree_dataclass, static_field

import jax.numpy as jnp


def get_world2view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
) -> np.ndarray:
    """Reference ``getWorld2View2`` (graphics_utils.py:38-49): R is the
    COLMAP-convention cam-to-world rotation (stored transposed), t the
    world-to-cam translation."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def get_projection_matrix(
    znear: float, zfar: float, fov_x: float, fov_y: float
) -> np.ndarray:
    """Reference ``getProjectionMatrix`` (graphics_utils.py:51-71)."""
    tan_y = math.tan(fov_y / 2)
    tan_x = math.tan(fov_x / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


@_pytree_dataclass
class Camera:
    """Immutable camera pytree. ``world_view`` / ``full_proj`` are the
    TRANSPOSED 4x4 matrices (reference cameras.py:54-57)."""

    world_view: jnp.ndarray  # (4, 4) transposed W2V
    full_proj: jnp.ndarray  # (4, 4) transposed W2V @ proj
    camera_center: jnp.ndarray  # (3,)
    width: int = static_field(default=800)
    height: int = static_field(default=800)
    fov_x: float = static_field(default=0.7)
    fov_y: float = static_field(default=0.7)
    znear: float = static_field(default=0.01)
    zfar: float = static_field(default=100.0)

    @property
    def tan_fov_x(self) -> float:
        return math.tan(self.fov_x * 0.5)

    @property
    def tan_fov_y(self) -> float:
        return math.tan(self.fov_y * 0.5)

    @property
    def focal_x(self) -> float:
        return fov2focal(self.fov_x, self.width)

    @property
    def focal_y(self) -> float:
        return fov2focal(self.fov_y, self.height)

    @classmethod
    def from_Rt(
        cls,
        R: np.ndarray,
        t: np.ndarray,
        fov_x: float,
        fov_y: float,
        width: int,
        height: int,
        znear: float = 0.01,
        zfar: float = 100.0,
        trans: np.ndarray = np.zeros(3),
        scale: float = 1.0,
    ) -> "Camera":
        w2v = get_world2view(R, t, trans, scale).T  # transposed storage
        proj = get_projection_matrix(znear, zfar, fov_x, fov_y).T
        full = w2v @ proj
        cam_center = np.linalg.inv(w2v)[3, :3]
        return cls(
            world_view=jnp.asarray(w2v, jnp.float32),
            full_proj=jnp.asarray(full, jnp.float32),
            camera_center=jnp.asarray(cam_center, jnp.float32),
            width=int(width),
            height=int(height),
            fov_x=float(fov_x),
            fov_y=float(fov_y),
            znear=float(znear),
            zfar=float(zfar),
        )

    @classmethod
    def interpolate(
        cls, cam1: "Camera", cam2: "Camera", steps: int
    ) -> list:
        """Slerp a camera path between two cameras (reference
        ``interpolate_cameras``, camera_utils.py:261-290)."""
        from ..ops.rotation import rotmat_to_quat, quat_to_rotmat

        import jax.numpy as jnp

        # Recover COLMAP R (stored transposed) and T from the matrices.
        def decompose(cam):
            w2v = np.asarray(cam.world_view).T  # column-vector W2V
            return w2v[:3, :3].T, w2v[:3, 3]

        R1, T1 = decompose(cam1)
        R2, T2 = decompose(cam2)
        q1 = np.asarray(rotmat_to_quat(jnp.asarray(R1.T)))
        q2 = np.asarray(rotmat_to_quat(jnp.asarray(R2.T)))
        if np.dot(q1, q2) < 0:
            q2 = -q2
        cams = []
        for t in np.linspace(0.0, 1.0, steps):
            dot = np.clip(np.dot(q1, q2), -1.0, 1.0)
            angle = math.acos(dot)
            if abs(angle) < 1e-6:
                q = q1
            else:
                isin = 1.0 / math.sin(angle)
                q = (
                    math.sin((1 - t) * angle) * isin * q1
                    + math.sin(t * angle) * isin * q2
                )
            R = np.asarray(quat_to_rotmat(jnp.asarray(q))).T
            T = (1 - t) * T1 + t * T2
            cams.append(
                cls.from_Rt(
                    R.T, T, cam1.fov_x, cam1.fov_y, cam1.width,
                    cam1.height, cam1.znear, cam1.zfar,
                )
            )
        return cams

    @classmethod
    def look_at(
        cls,
        eye: np.ndarray,
        target: np.ndarray,
        up: np.ndarray = np.array([0.0, 1.0, 0.0]),
        fov: float = 0.8,
        width: int = 256,
        height: int = 256,
    ) -> "Camera":
        """Convenience constructor for tests/demos."""
        eye = np.asarray(eye, np.float64)
        forward = np.asarray(target, np.float64) - eye
        forward /= np.linalg.norm(forward)
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(forward, right)
        # COLMAP convention: rows of R_w2c are (right, down-ish up, forward);
        # reference stores R = R_w2c^T and t = -R_w2c @ eye.
        R_w2c = np.stack([right, true_up, forward], axis=0)
        t = -R_w2c @ eye
        return cls.from_Rt(
            R_w2c.T, t, fov, fov, width, height
        )
