from .losses import l1_loss, l2_loss, smooth_l1_loss, ssim, psnr, mse
from .schedulers import cosine_decay_schedule, exponential_decay_schedule, fetch_schedule
from .optim import radam, clip_by_global_norm_strict, masked_radam

__all__ = [
    "l1_loss",
    "l2_loss",
    "smooth_l1_loss",
    "ssim",
    "psnr",
    "mse",
    "cosine_decay_schedule",
    "exponential_decay_schedule",
    "fetch_schedule",
    "radam",
    "clip_by_global_norm_strict",
    "masked_radam",
]
