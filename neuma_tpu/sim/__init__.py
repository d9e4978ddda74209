from .mpm import (
    p2g,
    grid_op,
    g2p,
    mpm_step,
    mpm_step_diff,
    advect_extra,
)
from .initializers import MPMInitData, build_initial_state, build_statics

__all__ = [
    "p2g",
    "grid_op",
    "g2p",
    "mpm_step",
    "mpm_step_diff",
    "advect_extra",
    "MPMInitData",
    "build_initial_state",
    "build_statics",
]
