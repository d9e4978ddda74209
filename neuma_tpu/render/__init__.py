from .gaussians import GaussianPack, build_covariance, strip_symmetric, unstrip_symmetric
from .camera import Camera
from .rasterize import rasterize, RasterConfig
from .binding import (
    BindingTable,
    compute_binding_table,
    apply_binding_xyz,
    apply_binding_F,
    deform_cov_by_F,
)

__all__ = [
    "GaussianPack",
    "build_covariance",
    "strip_symmetric",
    "unstrip_symmetric",
    "Camera",
    "rasterize",
    "RasterConfig",
    "BindingTable",
    "compute_binding_table",
    "apply_binding_xyz",
    "apply_binding_F",
    "deform_cov_by_F",
]
