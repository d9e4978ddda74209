from .ply import (
    load_ply,
    save_ply,
    load_ply_points,
    save_ply_points,
)

__all__ = [
    "load_ply",
    "save_ply",
    "load_ply_points",
    "save_ply_points",
]
