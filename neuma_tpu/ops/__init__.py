from .svd3 import svd3
from .rotation import (
    quat_to_rotmat,
    rotmat_to_quat,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    axis_angle_to_rotmat,
    euler_to_rotmat,
)
from .sh import eval_sh, rgb_to_sh, sh_to_rgb

__all__ = [
    "svd3",
    "quat_to_rotmat",
    "rotmat_to_quat",
    "rot6d_to_rotmat",
    "rotmat_to_rot6d",
    "axis_angle_to_rotmat",
    "euler_to_rotmat",
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
]
