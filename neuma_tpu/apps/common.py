"""Shared app glue: scene assembly from configs, checkpoint lifecycle,
experiment directories.

Mirrors the orchestration in the reference's ``experiments/*.py`` entry
points (config snapshot, idempotent stage skipping, init.pt / lora ring
checkpoints — SURVEY.md section 5.4) with npz-based artifacts.
"""
from __future__ import annotations

import dataclasses
import shutil
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import MPMConstants, ParticleState, Statics
from ..data.prepare import load_prepared, prepare_simulation_data
from ..data.readers import VideoDataset
from ..data.torch_ckpt import (
    load_base_model,
    load_params_npz,
    merge_lora_state_dict,
    save_params_npz,
)
from ..materials import (
    InvariantFullMetaElasticity,
    InvariantFullMetaPlasticity,
    MetaMaterialConfig,
)
from ..render.rasterize import RasterConfig
from ..sim.initializers import MPMInitData, build_statics
from ..train.grounding import GroundingScene
from ..utils.config import Config

# The reference hard-forces eps = 6e-7 in every training entry point
# (finetune.py:47,105,270).
TRAIN_EPS = 6e-7


def resolve_exp_dirs(cfg: Config, resume: bool, overwrite: bool):
    exp_root = Path(cfg.root) / cfg.name
    if exp_root.exists() and not resume:
        if overwrite:
            shutil.rmtree(exp_root)
        # else: keep and continue (non-interactive variant of the
        # reference's mkdir prompt, nclaw/utils.py:39-63)
    exp_root.mkdir(parents=True, exist_ok=True)
    tune_root = exp_root / "finetune"
    tune_root.mkdir(exist_ok=True)
    return exp_root, tune_root


def background_color(cfg: Config) -> Tuple[jnp.ndarray, bool]:
    """White/black background + force-mask handling (finetune.py:510-522)."""
    force_mask = bool(cfg.video_data.data.get("read_mask_only", False))
    white = bool(cfg.video_data.data.get("white_background", False))
    if force_mask:
        white = False
        cfg.video_data.data.white_background = False
    bg = jnp.ones(3) if white else jnp.zeros(3)
    return bg, force_mask


def run_data_preparation(cfg: Config, data_root: Path) -> None:
    """finetune.py:550-576."""
    pd = cfg.particle_data
    if pd.get("particles_path") is not None:
        prepare_simulation_data(
            save_dir=data_root,
            kernels_path=Path(cfg.gaussian.kernels_path),
            particles_path=Path(pd.particles_path),
            sh_degree=cfg.gaussian.sh_degree,
            opacity_thres=cfg.gaussian.opacity_thres,
            particles_downsample_factor=pd.get("downsample_factor", 3),
            confidence=cfg.gaussian.confidence,
            max_particles=cfg.gaussian.max_particles,
        )
    elif pd.get("mesh_path") is not None:
        prepare_simulation_data(
            save_dir=data_root,
            kernels_path=Path(cfg.gaussian.kernels_path),
            mesh_path=Path(pd.mesh_path),
            mesh_sample_mode=pd.mesh_sample_mode,
            mesh_sample_resolution=pd.mesh_sample_resolution,
            sh_degree=cfg.gaussian.sh_degree,
            opacity_thres=cfg.gaussian.opacity_thres,
            particles_downsample_factor=1,
            confidence=cfg.gaussian.confidence,
            max_particles=cfg.gaussian.max_particles,
        )
    else:
        # No particle source: the assets folder must already be prepared
        # (the reference's inference.py:165-190 demo path skips prep the
        # same way and loads kernels/particles/bindings from the assets
        # dir populated by a download or an earlier finetune run).
        missing = [
            f
            for f in ("kernels.ply", "particles.ply", "bindings.npz")
            if not (data_root / f).is_file()
        ]
        if missing:
            raise FileNotFoundError(
                f"No 'particles_path'/'mesh_path' in the config and the "
                f"assets dir {data_root} is missing {missing}; either "
                f"point the config at a particle source or pre-populate "
                f"the prepared assets."
            )


def build_materials(cfg: Config):
    e_cfg = MetaMaterialConfig.from_cfg(cfg.constitution.elasticity)
    p_cfg = MetaMaterialConfig.from_cfg(cfg.constitution.plasticity)
    elasticity = InvariantFullMetaElasticity(e_cfg)
    plasticity = InvariantFullMetaPlasticity(p_cfg)
    n_layers = len(e_cfg.layer_widths)
    ckpt = cfg.get("pretrained_ckpt")
    if ckpt and str(ckpt).endswith(".pt"):
        pe, pp = load_base_model(ckpt, num_layers=n_layers)
    elif ckpt and str(ckpt).endswith(".npz"):
        d = load_params_npz(ckpt)
        pe, pp = d["elasticity"], d["plasticity"]
    else:
        key = jax.random.PRNGKey(cfg.get("seed", 42))
        pe = elasticity.init(key)
        pp = plasticity.init(jax.random.fold_in(key, 1))
    return elasticity, plasticity, pe, pp


def init_data_from_cfg(
    cfg: Config, data_root: Path, nsteps: int
) -> MPMInitData:
    """finetune.py:109-111: span = [0, nsteps], particle source = the
    prepared particles.ply in data_root."""
    pd = cfg.particle_data.copy()
    pd.span = [0, nsteps]
    pd.shape.name = "particles"
    pd.shape.asset_root = str(data_root)
    return MPMInitData.from_cfg(pd.to_dict())


def assemble_scene(
    cfg: Config,
    data_root: Path,
    dataset: VideoDataset,
    elasticity,
    plasticity,
    pe,
    pp,
    num_frames: int,
    substeps: int,
    used_views: List[str],
    pixel_loss: str,
    background: jnp.ndarray,
    force_mask: bool,
    exclude_frames=(),
) -> Tuple[GroundingScene, MPMInitData]:
    nsteps = num_frames * substeps
    sim_cfg = cfg.sim.to_dict()
    sim_cfg["eps"] = TRAIN_EPS
    constants = MPMConstants.from_cfg(sim_cfg)

    init_data = init_data_from_cfg(cfg, data_root, nsteps)
    statics = build_statics([init_data])

    gaussians, particles, table = load_prepared(
        data_root, cfg.gaussian.sh_degree
    )
    assert init_data.pos.shape[0] == particles.shape[0], (
        f"Shape mismatch: init_data {init_data.pos.shape[0]} "
        f"prepared particles {particles.shape[0]}"
    )

    # GT frames: rollout frame f corresponds to dataset step
    # dataset.steps[f+1] (steps[0] is the initial frame;
    # finetune.py:154-156).
    frame_steps = [dataset.steps[f + 1] for f in range(num_frames)]
    gt = jnp.asarray(dataset.stacked_gt(used_views, frame_steps))
    cameras = dataset.cameras_for(used_views)

    rcfg_kw = cfg.get("raster", Config())
    raster_cfg = RasterConfig(
        max_pairs=int(rcfg_kw.get("max_pairs", 1 << 18)),
        max_per_tile=int(rcfg_kw.get("max_per_tile", 512)),
        segment=int(rcfg_kw.get("segment", 32)),
    )

    scene = GroundingScene(
        constants=constants,
        statics=statics,
        elasticity=elasticity,
        plasticity=plasticity,
        elasticity_params=pe,
        plasticity_params=pp,
        gaussians=gaussians,
        binding=table,
        cameras=cameras,
        gt_images=gt,
        init_x=jnp.asarray(init_data.pos),
        size=init_data.size,
        center=init_data.center,
        background=background,
        substeps=substeps,
        pixel_loss=pixel_loss,
        force_mask_data=force_mask,
        scaling_modifier=float(cfg.gaussian.get("scaling_modifier", 1.0)),
        raster_cfg=raster_cfg,
        exclude_frames=tuple(exclude_frames),
    )
    return scene, init_data


def save_lora_checkpoint(
    tune_root: Path,
    epoch: int,
    elasticity,
    plasticity,
    params_e,
    params_p,
    loss: float,
    keep: int = 3,
) -> None:
    """Ring-buffer LoRA checkpoints (finetune.py:470-480)."""
    save_params_npz(
        tune_root / f"{epoch:04d}_lora.npz",
        {
            "elasticity": elasticity.lora_params(params_e),
            "plasticity": plasticity.lora_params(params_p),
            "loss": np.float32(loss),
        },
    )
    ckpts = sorted(
        tune_root.glob("*_lora.npz"), key=lambda p: int(p.stem.split("_")[0])
    )
    while len(ckpts) > keep:
        ckpts.pop(0).unlink()


def load_latest_lora(tune_root: Path):
    """Resume support (finetune.py:299-309)."""
    ckpts = sorted(
        tune_root.glob("*_lora.npz"), key=lambda p: int(p.stem.split("_")[0])
    )
    if not ckpts:
        return None, 0
    data = load_params_npz(ckpts[-1])
    return data, int(ckpts[-1].stem.split("_")[0])


def overlay_lora(params, lora_tree):
    """Overlay saved LoRA leaves (lora_a/lora_b) onto LoRA-initialized
    params."""

    def overlay(p, l):
        if isinstance(p, dict):
            out = dict(p)
            for k, v in (l or {}).items():
                if k in ("lora_a", "lora_b"):
                    out[k] = jnp.asarray(v)
                elif k in out:
                    out[k] = overlay(out[k], v)
            return out
        if isinstance(p, list):
            return [
                overlay(x, (l or [None] * len(p))[i])
                for i, x in enumerate(p)
            ]
        return p

    return overlay(params, lora_tree)
