"""Two-stage dynamics grounding: init-velocity optimization + LoRA
constitutive finetuning.

TPU-native redesign of the reference's ``experiments/finetune.py``:
instead of a Python-level 400-iteration loop over per-step autograd
functions and per-view CUDA rasterizer calls, one jitted loss function
runs the full [elasticity -> MPM -> plasticity -> bind -> rasterize]
rollout under ``lax.scan`` with per-frame rematerialization, and the two
stages share it:

* Stage 1 (``optimize_init_velocity``, finetune.py:63-231): RAdam on the
  global initial velocity with the x/z (or full) sparsity regularizer and
  its 10%-of-epochs warmup gate.
* Stage 2 (``finetune_constitutive``, finetune.py:234-488): masked RAdam
  on LoRA leaves of both adaptors with rollout-decay-weighted loss,
  per-net cosine schedules, strict grad clipping, non-finite trap.
"""
from __future__ import annotations

import dataclasses
import os
import sys
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.types import MPMConstants, ParticleState, Statics
from ..render.binding import (
    BindingTable,
    apply_binding_F,
    apply_binding_xyz,
    deform_cov_by_F,
)
from ..render.camera import Camera
from ..render.gaussians import GaussianPack
from ..render.rasterize import RasterConfig, rasterize_with_aux
from ..sim.mpm import make_packed_substep
from ..sim.rollout import denormalize_points
from .losses import l1_loss, l2_loss
from .optim import clip_by_global_norm_strict, masked_radam, radam

PIXEL_LOSSES = {"l1": l1_loss, "l2": l2_loss}


@dataclasses.dataclass
class GroundingScene:
    """Everything static for the rollout loss (device arrays + configs)."""

    constants: MPMConstants
    statics: Statics
    elasticity: object  # material module (apply/init/init_lora)
    plasticity: object
    elasticity_params: object  # pretrained base params (stage 1 uses as-is)
    plasticity_params: object
    gaussians: GaussianPack
    binding: BindingTable
    cameras: Sequence[Camera]  # one per used view
    gt_images: jnp.ndarray  # (n_frames, n_views, 3, H, W)
    init_x: jnp.ndarray  # (N, 3) sim-box positions
    size: np.ndarray  # denormalization scale (sim <- world)
    center: np.ndarray
    background: jnp.ndarray  # (3,)
    substeps: int = 1
    pixel_loss: str = "l2"
    force_mask_data: bool = False
    scaling_modifier: float = 1.0
    raster_cfg: RasterConfig = dataclasses.field(default_factory=RasterConfig)
    exclude_frames: Sequence[int] = ()
    # Optional SPMD annotations: when ``mesh`` is set, particle arrays
    # are constrained to ``particle_axis`` and the vmapped view axis of
    # the rasterizer to ``view_axis`` (2-axis mesh: dp x vp).
    mesh: Optional[object] = None
    particle_axis: Optional[str] = None
    view_axis: Optional[str] = None
    # Grid distribution strategy for the sharded sim step:
    # * 'replicated' — the grid is replicated; GSPMD all-reduces the
    #   per-shard partial grids every step (fine for small grids).
    # * 'halo' — slab-decomposed grid with ppermute halo exchange
    #   (parallel/halo.py): O(G^2) traffic instead of O(G^3), the
    #   blocked production kernels run per shard. Requires ``mesh``.
    grid_mode: str = "replicated"
    # Static per-shard particle-bin capacity for halo mode (None = N,
    # always safe; lower it when the scene provably spreads over slabs).
    halo_capacity: Optional[int] = None
    # Rollout rematerialization policy (SURVEY 5.7):
    # * 'frame' — per-frame jax.checkpoint, saving only the named
    #   integer raster layout: residual memory stays at the carry size,
    #   but the backward replays each frame's forward (the sim forward
    #   is ~20% of the realworld step).
    # * 'none'  — store every substep's custom-VJP residuals at forward
    #   time; no replay. Residuals are ~(4 grid channels + particle
    #   state + layouts) per substep, alive for the WHOLE rollout.
    # * 'auto'  — 'none' when the estimated residual footprint fits a
    #   conservative HBM budget (see _remat_policy), else 'frame'.
    remat: str = "auto"

    @property
    def num_frames(self) -> int:
        return self.gt_images.shape[0]

    @property
    def num_views(self) -> int:
        return self.gt_images.shape[1]


def _remat_policy(scene: "GroundingScene") -> str:
    """Resolve scene.remat ('auto' picks 'none' when the whole rollout's
    substep residuals fit a conservative HBM budget). Residual estimate
    per substep: 4 f32 grid channels + ~22 f32 per particle (state +
    g2p outputs + stress) + the block-sort/chunk layouts (~3x particle
    ints); per frame additionally the saved raster pair layout."""
    if scene.remat in ("frame", "none"):
        return scene.remat
    if scene.remat != "auto":
        raise ValueError(
            f"unknown remat policy: {scene.remat!r} "
            "(expected 'frame', 'none', or 'auto')"
        )
    if scene.grid_mode != "replicated":
        return "frame"  # halo bins change the residual shape; keep remat
    g3 = int(scene.constants.num_grids) ** 3
    n = int(scene.init_x.shape[0])
    # The packed substep (sim/mpm.py::make_packed_substep) stores every
    # f32 residual FLAT, so stacking over (frames, substeps) pads only
    # the negligible lane remainder of each 1-D leaf. (Unpacked
    # residuals padded a stacked (N, 3) to N*128 f32 and a (N, 3, 3)
    # to N*8*128 under TPU tile layouts — a 'none'-mode realworld
    # rollout then OOMed at 20.9 GB where unpadded math said 0.9 GB.)
    # Per substep: state x/v/C/F (24n) + stress (9n) + new_v/new_C
    # (12n) + pre-plasticity F (9n) = 54n f32, 4 flat grid channels,
    # and the int sort/chunk layouts (~30n — counted twice since the
    # scan may stack them both as carry and as residual).
    per_substep = 4 * (4 * g3 + 54 * n + 60 * n)
    # Render residuals per frame (composite custom-VJP saves the pair
    # features + per-tile T/last; the pair builder's integer layout is
    # comparable): ~10 f32 per pair slot + 5x256 f32 per tile, per view.
    from ..render.pallas_raster import CHUNK as _RC

    cam = scene.cameras[0]
    tiles = ((cam.width + 15) // 16) * ((cam.height + 15) // 16)
    pair_slots = scene.raster_cfg.max_pairs + _RC * tiles
    per_frame_render = scene.num_views * 4 * (
        10 * pair_slots + 5 * 256 * tiles
    )
    total = scene.num_frames * (
        scene.substeps * per_substep + per_frame_render
    )
    budget = int(float(os.environ.get("NEUMA_REMAT_BUDGET_GB", "4")) * 2**30)
    return "none" if total <= budget else "frame"


def make_rollout_loss(scene: GroundingScene) -> Callable:
    """Builds loss(params_e, params_p, init_v, frame_weights) -> scalar.

    ``init_v`` may be (3,) (global, the reference default —
    neuma_dataset.py:103-138) or (N, 3) per-particle. ``frame_weights``
    is the per-frame loss weight vector (rollout decay x exclusion)."""
    constants = scene.constants
    statics = scene.statics
    table = scene.binding
    pixel_loss = PIXEL_LOSSES[scene.pixel_loss]
    cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)
    opacity = scene.gaussians.get_opacity
    shs = scene.gaussians.get_features
    sh_degree = scene.gaussians.sh_degree
    k_xyz0 = scene.gaussians.xyz
    n_particles = scene.init_x.shape[0]

    excluded = np.zeros(scene.num_frames, np.float32)
    for f in scene.exclude_frames:
        if 0 <= f < scene.num_frames:
            excluded[f] = 1.0
    excluded = jnp.asarray(excluded)

    def render_one(cam, means3d, cov_def):
        if scene.force_mask_data:
            img, aux = rasterize_with_aux(
                means3d,
                cov_def,
                opacity,
                cam,
                scene.background,
                colors_precomp=jnp.ones(
                    (means3d.shape[0], 3), means3d.dtype
                ),
                cfg=scene.raster_cfg,
            )
        else:
            img, aux = rasterize_with_aux(
                means3d,
                cov_def,
                opacity,
                cam,
                scene.background,
                shs=shs,
                sh_degree=sh_degree,
                cfg=scene.raster_cfg,
            )
        return img, aux["overflow"]

    # SPMD constraint helpers (no-ops without a mesh).
    def constrain(x, *axes):
        if scene.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec(*axes)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(scene.mesh, spec)
        )

    def constrain_particles(tree):
        if scene.mesh is None or scene.particle_axis is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: constrain(x, scene.particle_axis), tree
        )

    cams = list(scene.cameras)
    homogeneous_views = len(cams) > 1 and all(
        (c.width, c.height, c.fov_x, c.fov_y)
        == (cams[0].width, cams[0].height, cams[0].fov_x, cams[0].fov_y)
        for c in cams
    )
    # vmap over views only when the view axis is actually sharded (or
    # the view count is large enough that graph size matters): batching
    # the pair-build's sorts/scatters costs ~1.6x the unrolled loop on
    # v5e (187 vs 141 ms at 3x1080p fwd+bwd, probe_residual.py).
    vmap_views = homogeneous_views and (
        (scene.mesh is not None and scene.view_axis is not None)
        or len(cams) > 8
    )
    if vmap_views:
        # One render instance vmapped over the view axis (smaller graph
        # than an unrolled per-view loop; view axis shardable).
        cam_wv = jnp.stack([c.world_view for c in cams])
        cam_fp = jnp.stack([c.full_proj for c in cams])
        cam_cc = jnp.stack([c.camera_center for c in cams])

        def render_views(means3d, cov_def):
            def one(wv, fp, cc):
                cam = dataclasses.replace(
                    cams[0],
                    world_view=wv,
                    full_proj=fp,
                    camera_center=cc,
                )
                return render_one(cam, means3d, cov_def)

            imgs, ovf = jax.vmap(one)(cam_wv, cam_fp, cam_cc)
            if scene.view_axis is not None:
                imgs = constrain(imgs, scene.view_axis)
            return imgs, jnp.any(ovf)

    else:

        def render_views(means3d, cov_def):
            pairs = [render_one(cam, means3d, cov_def) for cam in cams]
            return (
                jnp.stack([p[0] for p in pairs]),
                jnp.any(jnp.stack([p[1] for p in pairs])),
            )

    if scene.grid_mode == "halo":
        if scene.mesh is None:
            raise ValueError("grid_mode='halo' requires scene.mesh")
        from ..parallel.halo import (
            make_halo_bins_step,
            partition_particles,
            unpartition,
        )

        halo_axis = scene.particle_axis or "dp"
        n_halo_shards = scene.mesh.shape[halo_axis]
        # Drift tolerance 2 cells: CFL keeps per-substep motion well
        # under one cell, so one repartition per FRAME suffices (the
        # margin flag in the loss aux guards the assumption) — the
        # global argsort + bin gather/scatter leaves the substep loop.
        halo_step = make_halo_bins_step(
            constants, scene.mesh, halo_axis, tol=2
        )
    elif scene.grid_mode != "replicated":
        raise ValueError(f"unknown grid_mode: {scene.grid_mode!r}")

    # Blocked path: ONE block sort for the whole rollout, refreshed
    # (and conditionally rebuilt only when a particle crossed a block
    # boundary) each substep — the argsort was the dominant fixed cost
    # at small/medium N (BENCHMARKS.md scaling table).
    amortize_sort = (
        scene.grid_mode == "replicated" and constants.num_grids > 24
    )
    if amortize_sort:
        from ..sim.p2g_kernel import (
            build_step_layouts,
            refresh_step_layouts,
        )
    # The substep (elasticity -> mpm_step_diff -> plasticity) runs as
    # ONE custom_vjp with flat (1-D) residuals so the replay-free remat
    # policy ('none') stores them unpadded — see make_packed_substep.
    packed_substep = make_packed_substep(
        constants,
        statics,
        lambda pe, F: scene.elasticity.apply(pe, F),
        lambda pp, F: scene.plasticity.apply(pp, F),
    )

    def loss_fn(params_e, params_p, init_v, frame_weights,
                gt_images=None):
        # GT frames default to the scene closure for convenience, but
        # trainers pass them explicitly: a closure-captured frame stack
        # becomes an HLO *constant* (e.g. ~768 MB at 100x800^2x3), which
        # bloats every compile and overflows the remote-compile tunnel's
        # request limit at realistic scales.
        if gt_images is None:
            gt_images = scene.gt_images
        v0 = jnp.broadcast_to(
            jnp.reshape(init_v, (-1, 3)), (n_particles, 3)
        )
        state = ParticleState.initial(scene.init_x, v0)
        de_x0 = denormalize_points(scene.init_x, scene.size, scene.center)
        layouts0 = (
            build_step_layouts(constants, scene.init_x)
            if amortize_sort
            else None
        )
        carry = (state, layouts0, de_x0, k_xyz0)

        def frame_body(carry, inputs):
            gt_frame, weight, is_excluded = inputs
            state, layouts, de_x_prev, g_prev = carry

            if scene.grid_mode == "halo":
                # Partition ONCE per frame; the substep scan stays in
                # (n_shards, cap, ...) bins space (drift covered by the
                # widened halo; margin flag guards the tolerance).
                part = partition_particles(
                    constants, state, statics, n_halo_shards,
                    scene.halo_capacity or n_particles,
                )
                valid_m = part.valid[..., None, None]

                def sub_h(bins, _):
                    flat_f = bins.F.reshape((-1, 3, 3))
                    stress = scene.elasticity.apply(
                        params_e, flat_f
                    ).reshape(bins.F.shape)
                    stress = jnp.where(valid_m, stress, 0.0)
                    new_bins, margin = halo_step(
                        part.statics, bins, stress
                    )
                    f_p = scene.plasticity.apply(
                        params_p, new_bins.F.reshape((-1, 3, 3))
                    ).reshape(bins.F.shape)
                    new_bins = dataclasses.replace(new_bins, F=f_p)
                    return new_bins, jnp.any(margin)

                bins, margins = jax.lax.scan(
                    sub_h, part.state, None, length=scene.substeps
                )
                halo_overflow = part.overflow | jnp.any(margins)
                state = unpartition(
                    dataclasses.replace(part, state=bins),
                    n_particles,
                    state,
                )
            else:

                def sub(c, _):
                    s, layouts = c
                    if layouts is not None:
                        layouts, _ = refresh_step_layouts(
                            constants, s.x, layouts
                        )
                    s = packed_substep(params_e, params_p, s, layouts)
                    return (s, layouts), None

                (state, layouts), _ = jax.lax.scan(
                    sub, (state, layouts), None, length=scene.substeps
                )
                halo_overflow = jnp.bool_(False)
            state = constrain_particles(state)

            de_x = denormalize_points(state.x, scene.size, scene.center)
            means3d = apply_binding_xyz(table, de_x, de_x_prev, g_prev)
            F_k = apply_binding_F(table, state.F)
            cov_def = deform_cov_by_F(cov0, F_k)  # stop-grad (reference)

            imgs, overflow = render_views(means3d, cov_def)
            frame_loss = pixel_loss(imgs, gt_frame) * gt_frame.shape[0]

            # Excluded frames contribute no loss and keep prev refs
            # (reference finetune.py:370-372 `continue`).
            keep = 1.0 - is_excluded
            new_prev_x = jax.lax.stop_gradient(
                keep * de_x + is_excluded * de_x_prev
            )
            new_prev_g = jax.lax.stop_gradient(
                keep * means3d + is_excluded * g_prev
            )
            return (
                (state, layouts, new_prev_x, new_prev_g),
                (weight * keep * frame_loss, overflow, halo_overflow),
            )

        # Per-frame remat, but SAVE the rasterizer's integer pair layout
        # (~1MB/frame) so the sorts/binning don't run again in backward.
        # Short rollouts skip the remat entirely (scene.remat / 'auto' —
        # all substep residuals fit HBM, so the backward replays
        # nothing; see _remat_policy).
        if _remat_policy(scene) == "frame":
            policy = jax.checkpoint_policies.save_only_these_names(
                "raster_pairs"
            )
            body = jax.checkpoint(frame_body, policy=policy)
        else:
            body = frame_body
        (state, _, _, _), (frame_losses, overflows, halo_ovfs) = (
            jax.lax.scan(
                body,
                carry,
                (gt_images, frame_weights, excluded),
            )
        )
        return jnp.sum(frame_losses), {
            "overflow": jnp.any(overflows),
            "halo_overflow": jnp.any(halo_ovfs),
        }

    return loss_fn


def _raise_on_overflow(aux: dict, where: str) -> None:
    """Fail-loudly contract for the rollout loss aux: any fired budget
    flag means the just-taken gradient step was wrong (pairs or particle
    mass were dropped device-side)."""
    if bool(aux["overflow"]):
        raise PairBudgetOverflowError(
            f"raster pair budget exceeded at {where}: raise "
            f"raster.max_pairs/max_per_tile (pairs were dropped — the "
            f"rendered image and its gradients are wrong)"
        )
    if bool(aux["halo_overflow"]):
        raise HaloOverflowError(
            f"halo shard budget exceeded at {where}: a shard bin "
            f"overflowed or a particle's stencil escaped its slab view "
            f"(raise halo_capacity or shard count — particle mass was "
            f"dropped, so the state and its gradients are wrong)"
        )


def rollout_decay_weights(
    num_frames: int,
    decay_rate,
    decay_steps: int,
) -> jnp.ndarray:
    """weight[f] = decay_rate ** (f // decay_steps) for frame f (0-based;
    reference finetune.py:388: decay ** ((cur_step - 1) // decay_steps))."""
    exponents = jnp.asarray(
        np.arange(num_frames) // max(decay_steps, 1), jnp.float32
    )
    return jnp.power(decay_rate, exponents)


def decay_rate_for_epoch(cfg, epoch: int, num_epochs: int) -> float:
    """Reference finetune.py:353-358."""
    lam = float(cfg.get("lambda_max_decay", 0.0))
    if lam > 0:
        ratio = min((1.0 / lam) * epoch / num_epochs, 1.0)
    else:
        ratio = 1.0
    d0 = float(cfg["decay_init"])
    d1 = float(cfg["decay_final"])
    return d0 + (d1 - d0) * ratio


# --- Stage 1: initial velocity ---------------------------------------------

@dataclasses.dataclass
class VelocityStageResult:
    init_v: np.ndarray
    losses: List[float]


def optimize_init_velocity(
    scene: GroundingScene,
    num_epochs: int,
    lr: float,
    schedule: Callable,
    lambda_reg: Optional[float] = 0.005,
    reg_all: bool = False,
    init_v0: Optional[np.ndarray] = None,
    log_fn: Optional[Callable] = None,
) -> VelocityStageResult:
    """Stage 1 (reference finetune.py:63-231): optimize the global initial
    velocity by rendering the short rollout against ground truth."""
    loss_fn = make_rollout_loss(scene)
    weights = jnp.ones(scene.num_frames, jnp.float32)

    params_e = scene.elasticity_params
    params_p = scene.plasticity_params

    init_v = jnp.asarray(
        init_v0 if init_v0 is not None else np.zeros(3), jnp.float32
    )
    opt = radam(schedule)
    opt_state = opt.init(init_v)

    gt_images = jnp.asarray(scene.gt_images)

    @jax.jit
    def epoch_step(init_v, opt_state, reg_weight, gt):
        def total_loss(iv):
            loss_rgb, aux = loss_fn(
                params_e, params_p, iv, weights, gt_images=gt
            )
            if reg_all:
                reg = jnp.mean(jnp.abs(iv))
            else:
                ivr = jnp.reshape(iv, (-1, 3))
                reg = (
                    jnp.mean(jnp.abs(ivr[:, 0]))
                    + jnp.mean(jnp.abs(ivr[:, 2]))
                ) / 2.0
            return loss_rgb + reg_weight * reg, (loss_rgb, aux)

        (loss, (loss_rgb, aux)), g = jax.value_and_grad(
            total_loss, has_aux=True
        )(init_v)
        updates, opt_state = opt.update(g, opt_state, init_v)
        init_v = optax.apply_updates(init_v, updates)
        return init_v, opt_state, loss, loss_rgb, aux

    losses = []
    warmup_gate = int(0.1 * num_epochs)
    for epoch in range(1, num_epochs + 1):
        reg_w = (
            float(lambda_reg)
            if (lambda_reg is not None and epoch > warmup_gate)
            else 0.0
        )
        init_v, opt_state, loss, loss_rgb, aux = epoch_step(
            init_v, opt_state, jnp.float32(reg_w), gt_images
        )
        _raise_on_overflow(aux, f"velocity epoch {epoch}")
        losses.append(float(loss))
        if log_fn:
            log_fn(epoch, float(loss), float(loss_rgb), np.asarray(init_v))
    return VelocityStageResult(
        init_v=np.asarray(init_v), losses=losses
    )


# --- Stage 2: LoRA constitutive finetune ------------------------------------

@dataclasses.dataclass
class ConstitutiveStageResult:
    params_e: object
    params_p: object
    losses: List[float]
    grad_norms_e: List[float]
    grad_norms_p: List[float]


class NonFiniteGradientError(RuntimeError):
    """Raised when clip_grad_norm detects a non-finite gradient (the
    reference prints per-param norms and exits, finetune.py:429-444)."""


class PairBudgetOverflowError(RuntimeError):
    """Raised when a rendered frame exceeded the static raster pair
    budget (``RasterConfig.max_pairs`` / ``max_per_tile``): pairs were
    dropped, so the image — and every gradient flowing through it — is
    wrong. The fix is a larger budget, not a smaller loss."""


class HaloOverflowError(RuntimeError):
    """Raised when the halo-sharded sim step dropped particles: a
    per-shard bin overflowed its static capacity, or an enabled
    particle's stencil escaped its shard's slab view. Mass was lost, so
    the state and all gradients are wrong; raise ``halo_capacity`` (or
    repartition more often in lazy schedules)."""


def finetune_constitutive(
    scene: GroundingScene,
    init_v: np.ndarray,
    cfg: dict,
    params_e,
    params_p,
    checkpoint_fn: Optional[Callable] = None,
    log_fn: Optional[Callable] = None,
    start_epoch: int = 1,
    train_state_path=None,
    resume_state: bool = False,
    write_state: bool = True,
) -> ConstitutiveStageResult:
    """Stage 2 (reference finetune.py:234-488). ``cfg`` mirrors the
    reference's ``constitution`` config section. ``params_e/p`` must
    already carry LoRA leaves (``init_lora``).

    ``log_fn`` receives ``(epoch, loss, e_norm, p_norm, decay, lr_e,
    lr_p)``. ``train_state_path`` enables FULL training-state
    checkpointing (params + optimizer moments + schedule step — beyond
    the reference, which only persists LoRA weights and restarts the
    optimizer cold on resume, finetune.py:299-309): the state is saved
    at every checkpoint interval when ``write_state`` (primary host
    only on pods), and restored — overriding ``start_epoch`` and the
    passed params — when ``resume_state`` and the file exists."""
    from pathlib import Path

    from .checkpoint import load_train_state, save_train_state
    from .schedulers import fetch_schedule

    num_epochs = int(cfg["num_epochs"])
    warmup = int(cfg.get("warmup_step", 0))
    decay_steps = int(cfg.get("decay_steps", 80))
    e_lr = float(cfg["elasticity_lr"])
    p_lr = float(cfg["plasticity_lr"])

    loss_fn = make_rollout_loss(scene)
    init_v = jnp.asarray(init_v, jnp.float32)

    e_sched_base = fetch_schedule(cfg["elasticity_scheduler"], e_lr)
    p_sched_base = fetch_schedule(cfg["plasticity_scheduler"], p_lr)

    def with_warmup(base, lr0):
        """Reference warmup semantics (finetune.py:345-351, 482-484):
        linear lr ramp for the first ``warmup_step`` epochs; the decay
        schedule only starts stepping afterwards."""
        if warmup == 0:
            return base

        def sched(count):
            c = jnp.asarray(count, jnp.float32)
            ramp = lr0 * (c + 1.0) / warmup
            return jnp.where(
                c < warmup, ramp, base(jnp.maximum(c - warmup, 0))
            )

        return sched

    e_sched = with_warmup(e_sched_base, e_lr)
    p_sched = with_warmup(p_sched_base, p_lr)

    e_mask = scene.elasticity.lora_mask(params_e)
    p_mask = scene.plasticity.lora_mask(params_p)
    e_opt = masked_radam(
        e_sched, e_mask, float(cfg.get("elasticity_wd", 0.0))
    )
    p_opt = masked_radam(
        p_sched, p_mask, float(cfg.get("plasticity_wd", 0.0))
    )
    e_state = e_opt.init(params_e)
    p_state = p_opt.init(params_p)

    ts_path = Path(train_state_path) if train_state_path else None
    if ts_path is not None and resume_state and ts_path.is_file():
        template = {
            "step": 0,
            "params": {"e": params_e, "p": params_p},
            "opt_state": (e_state, p_state),
        }
        restored = load_train_state(ts_path, template)
        params_e = restored["params"]["e"]
        params_p = restored["params"]["p"]
        e_state, p_state = restored["opt_state"]
        start_epoch = int(restored["step"]) + 1

    e_max_norm = float(cfg.get("elasticity_grad_max_norm", 1.0))
    p_max_norm = float(cfg.get("plasticity_grad_max_norm", 1.0))
    # Non-finite-gradient policy (SURVEY 5.3). 'raise' (default) treats
    # a non-finite TOTAL gradient as a hard failure. 'skip' reproduces
    # the reference's degrade-and-continue semantics for full-horizon
    # runs: its per-step nan_to_num scrub (sim/interface.py:65-74) maps
    # inf cotangents to finite-max and clip_grad_norm_ (finetune.py:
    # 417-423, error_if_nonfinite unset) turns an inf total norm into a
    # clip_coef of ~0 — i.e. the epoch's update is effectively zeroed
    # and training continues. Here 'skip' zeroes BOTH nets' clipped
    # gradients on the bad epoch (optimizer state still advances, as in
    # torch) and raises only after ``max_nonfinite_skips`` consecutive
    # bad epochs.
    on_nonfinite = str(cfg.get("on_nonfinite", "raise"))
    if on_nonfinite not in ("raise", "skip"):
        raise ValueError(
            f"unknown on_nonfinite policy: {on_nonfinite!r} "
            "(expected 'raise' or 'skip')"
        )
    max_skips = int(cfg.get("max_nonfinite_skips", 30))

    gt_images = jnp.asarray(scene.gt_images)

    @jax.jit
    def epoch_step(params_e, params_p, e_state, p_state, decay_rate, gt):
        weights = rollout_decay_weights(
            scene.num_frames, decay_rate, decay_steps
        )

        def total(pe, pp):
            return loss_fn(pe, pp, init_v, weights, gt_images=gt)

        (loss, aux), (ge, gp) = jax.value_and_grad(
            total, argnums=(0, 1), has_aux=True
        )(params_e, params_p)
        ge, e_norm, e_bad = clip_by_global_norm_strict(ge, e_max_norm)
        gp, p_norm, p_bad = clip_by_global_norm_strict(gp, p_max_norm)
        if on_nonfinite == "skip":
            bad = e_bad | p_bad
            zero = lambda g: jnp.where(bad, jnp.zeros_like(g), g)
            ge = jax.tree_util.tree_map(zero, ge)
            gp = jax.tree_util.tree_map(zero, gp)
        e_updates, e_state = e_opt.update(ge, e_state, params_e)
        params_e = optax.apply_updates(params_e, e_updates)
        p_updates, p_state = p_opt.update(gp, p_state, params_p)
        params_p = optax.apply_updates(params_p, p_updates)
        return (
            params_e,
            params_p,
            e_state,
            p_state,
            loss,
            e_norm,
            p_norm,
            e_bad | p_bad,
            aux,
        )

    losses, e_norms, p_norms = [], [], []
    consecutive_bad = 0
    for epoch in range(start_epoch, num_epochs + 1):
        decay_rate = decay_rate_for_epoch(cfg, epoch, num_epochs)
        (
            params_e,
            params_p,
            e_state,
            p_state,
            loss,
            e_norm,
            p_norm,
            bad,
            aux,
        ) = epoch_step(
            params_e, params_p, e_state, p_state,
            jnp.float32(decay_rate), gt_images,
        )
        if bool(bad):
            consecutive_bad += 1
            if on_nonfinite == "raise" or consecutive_bad > max_skips:
                raise NonFiniteGradientError(
                    f"non-finite gradient at epoch {epoch}: "
                    f"loss={float(loss):.7f} e_norm={float(e_norm)} "
                    f"p_norm={float(p_norm)}"
                    + (
                        f" ({consecutive_bad} consecutive skipped "
                        f"epochs exceeded max_nonfinite_skips="
                        f"{max_skips})"
                        if on_nonfinite == "skip"
                        else ""
                    )
                )
            print(
                f"[grounding] non-finite gradient at epoch {epoch} "
                f"(e_norm={float(e_norm)}, p_norm={float(p_norm)}) — "
                f"update skipped ({consecutive_bad}/{max_skips})",
                file=sys.stderr,
            )
        else:
            consecutive_bad = 0
        _raise_on_overflow(aux, f"constitutive epoch {epoch}")
        losses.append(float(loss))
        e_norms.append(float(e_norm))
        p_norms.append(float(p_norm))
        if log_fn:
            log_fn(epoch, float(loss), float(e_norm), float(p_norm),
                   decay_rate, float(e_sched(epoch - 1)),
                   float(p_sched(epoch - 1)))
        at_ckpt = epoch == 1 or epoch % 10 == 0 or epoch == num_epochs
        if checkpoint_fn and at_ckpt:
            checkpoint_fn(epoch, params_e, params_p, float(loss))
        if ts_path is not None and write_state and at_ckpt:
            save_train_state(
                ts_path,
                epoch,
                {"e": params_e, "p": params_p},
                opt_state=(e_state, p_state),
            )
    return ConstitutiveStageResult(
        params_e=params_e,
        params_p=params_p,
        losses=losses,
        grad_norms_e=e_norms,
        grad_norms_p=p_norms,
    )
