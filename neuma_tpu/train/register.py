"""Stage-1 registration for real captures: fit a global Sim(3) aligning
the static 3DGS reconstruction to the first video frame across views.

TPU-native version of the reference's ``Register`` module +
``experiments/regist.py``: parameters are a continuous 6D rotation,
translation and scale (register.py:27-33), optimized with RAdam + cosine
schedule against L1 (+ optional D-SSIM) photometric loss on the first
frame of every view (regist.py:138-194).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.rotation import euler_to_rotmat, rot6d_to_rotmat, rotmat_to_rot6d
from ..render.camera import Camera
from ..render.gaussians import GaussianPack
from ..render.rasterize import RasterConfig, rasterize_with_aux
from ..render.transforms import transform_gaussians
from .losses import l1_loss, ssim
from .optim import radam
from .schedulers import cosine_decay_schedule


@dataclasses.dataclass
class RegisterConfig:
    """Mirrors the reference register cfg (INIT_R degrees, INIT_T,
    INIT_S, per-param lrs, scheduler, lambda_dssim, iterations)."""

    init_r_deg: Sequence[float] = (0.0, 0.0, 0.0)
    init_t: Sequence[float] = (0.0, 0.0, 0.0)
    init_s: float = 1.0
    lr_r: float = 1e-3
    lr_t: float = 1e-3
    lr_s: float = 1e-3
    iterations: int = 20000
    lambda_dssim: float = 0.0
    learning_rate_alpha: float = 0.05


def init_sim3_params(cfg: RegisterConfig):
    euler = jnp.asarray(cfg.init_r_deg, jnp.float32) * (math.pi / 180.0)
    R0 = euler_to_rotmat(euler)
    return {
        "r": rotmat_to_rot6d(R0),
        "t": jnp.asarray(cfg.init_t, jnp.float32),
        "s": jnp.asarray([cfg.init_s], jnp.float32),
    }


def apply_sim3(params, pack: GaussianPack) -> GaussianPack:
    """scale -> rotate -> translate + SH rotation (register.py:68-91)."""
    R = rot6d_to_rotmat(params["r"])
    return transform_gaussians(
        pack, R=R, t=params["t"], scale=params["s"][0]
    )


def apply_sim3_points(params, points: jnp.ndarray,
                      origin: jnp.ndarray) -> jnp.ndarray:
    """Apply the fitted Sim(3) to bare particles (regist.py:208-247;
    origin is the kernel centroid used during fitting)."""
    R = rot6d_to_rotmat(params["r"])
    p = params["s"][0] * (points - origin)
    p = p @ R.T
    return p + params["t"][None, :]


@dataclasses.dataclass
class RegistrationResult:
    params: dict
    losses: List[float]
    origin: np.ndarray


def register_gaussians(
    pack: GaussianPack,
    cameras: Sequence[Camera],
    gt_images: jnp.ndarray,  # (n_views, 3, H, W) first-frame GT
    cfg: RegisterConfig,
    background: jnp.ndarray,
    raster_cfg: RasterConfig = RasterConfig(),
    log_fn: Optional[Callable] = None,
    log_every: int = 500,
) -> RegistrationResult:
    params = init_sim3_params(cfg)
    origin = jnp.mean(pack.xyz, axis=0, keepdims=True)

    sched_r = cosine_decay_schedule(
        cfg.lr_r, cfg.iterations, cfg.learning_rate_alpha
    )
    sched_t = cosine_decay_schedule(
        cfg.lr_t, cfg.iterations, cfg.learning_rate_alpha
    )
    sched_s = cosine_decay_schedule(
        cfg.lr_s, cfg.iterations, cfg.learning_rate_alpha
    )
    opt = optax.multi_transform(
        {
            "r": radam(sched_r),
            "t": radam(sched_t),
            "s": radam(sched_s),
        },
        {"r": "r", "t": "t", "s": "s"},
    )
    opt_state = opt.init(params)

    opacity = pack.get_opacity
    sh_degree = pack.sh_degree

    def loss_fn(params):
        moved = apply_sim3(params, pack)
        cov = moved.get_covariance()
        loss = 0.0
        overflow = jnp.bool_(False)
        for cam, gt in zip(cameras, gt_images):
            img, aux = rasterize_with_aux(
                moved.xyz,
                cov,
                opacity,
                cam,
                background,
                shs=moved.get_features,
                sh_degree=sh_degree,
                cfg=raster_cfg,
            )
            overflow = overflow | aux["overflow"]
            loss = loss + l1_loss(img, gt)
            if cfg.lambda_dssim > 0:
                loss = loss + cfg.lambda_dssim * (1.0 - ssim(img, gt))
        return loss, overflow

    @jax.jit
    def step(params, opt_state, ever_ovf):
        (loss, overflow), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Accumulate device-side so a transient overflow between log
        # points is never missed (checked every log_every iterations).
        return params, opt_state, loss, ever_ovf | overflow

    losses = []
    ever_ovf = jnp.bool_(False)
    for it in range(1, cfg.iterations + 1):
        params, opt_state, loss, ever_ovf = step(
            params, opt_state, ever_ovf
        )
        if (
            it == 1 or it % log_every == 0 or it == cfg.iterations
        ) and bool(ever_ovf):
            from .grounding import PairBudgetOverflowError

            raise PairBudgetOverflowError(
                f"raster pair budget exceeded by registration iter {it}:"
                " raise raster.max_pairs/max_per_tile"
            )
        if it % log_every == 0 or it == cfg.iterations:
            losses.append(float(loss))
            if log_fn:
                log_fn(it, float(loss), params)
    return RegistrationResult(
        params=jax.tree_util.tree_map(np.asarray, params),
        losses=losses,
        origin=np.asarray(origin),
    )
