"""Multi-object generalization rollout CLI.

Mirrors ``experiments/inference.py`` in the reference repo: N objects,
each with its own prepared Gaussians/bindings/adaptor (+ optional LoRA),
concatenated into one particle system with per-object sections routed
through ``ComposeMaterial``; optional random initial velocities; kernels
transformed into the sim box when not denormalizing; per-step renders and
optional particle export.

    python -m neuma_tpu.apps.inference -c configs/demo/multiobj.yaml \
        -vn out [-s eval_steps] [-dv view ...]
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import MPMConstants, ParticleState
from ..data.prepare import load_prepared
from ..data.readers import VideoDataset
from ..data.torch_ckpt import (
    load_params_npz,
    load_torch_file,
    merge_lora_state_dict,
)
from ..data.ply import save_ply_points
from ..materials import (
    ComposeMaterial,
    InvariantFullMetaElasticity,
    InvariantFullMetaPlasticity,
    MetaMaterialConfig,
)
from ..render.binding import (
    BindingTable,
    apply_binding_F,
    apply_binding_xyz,
    deform_cov_by_F,
)
from ..render.gaussians import GaussianPack
from ..render.rasterize import RasterConfig, rasterize_with_aux
from ..render.transforms import transform_gaussians
from ..sim.initializers import MPMInitData, build_initial_state, build_statics
from ..sim.mpm import mpm_step
from ..utils.config import Config, load_config
from ..utils.video import save_video
from .common import TRAIN_EPS, background_color, run_data_preparation, overlay_lora


def sample_vel(cfg=None, seed=None):
    """Random initial velocities (reference nclaw/utils.py:14-30)."""
    rng = np.random.Generator(np.random.PCG64(seed if seed is not None else 42))
    lin_dir = rng.uniform(-1, 1, size=3)
    if lin_dir[1] > 0:
        lin_dir[1] = -lin_dir[1]
    lin_dir /= np.linalg.norm(lin_dir)
    lin_bound = (
        cfg["lin_vel_bound"] if cfg and "lin_vel_bound" in cfg else (0.5, 1.5)
    )
    ang_bound = (
        cfg["ang_vel_bound"] if cfg and "ang_vel_bound" in cfg else (-6.0, 6.0)
    )
    lin_vel = lin_dir * rng.uniform(*lin_bound)
    ang_vel = rng.uniform(*ang_bound, size=3)
    return lin_vel, ang_vel


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", "-c", type=str, required=True)
    p.add_argument("--eval_steps", "-s", type=int, default=600)
    p.add_argument("--skip_frames", "-f", type=int, default=1)
    p.add_argument("--video_name", "-vn", type=str, required=True)
    p.add_argument("--debug_views", "-dv", nargs="+", default=[])
    p.add_argument("--save_particles", "-sp", type=str, default=None)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--set", nargs="*", default=[])
    return p.parse_args(argv)


def _load_object(obj_cfg: Config, eval_steps: int, seed: int):
    """Per-object data prep + materials + init data (reference
    inference.py:158-259)."""
    data_root = Path(
        obj_cfg.get("data_root", f"assets/{obj_cfg.sim_data_name}")
    )
    data_root.mkdir(parents=True, exist_ok=True)
    run_data_preparation(obj_cfg, data_root)
    gaussians, particles, table = load_prepared(
        data_root, obj_cfg.gaussian.sh_degree
    )

    e_cfg = MetaMaterialConfig.from_cfg(obj_cfg.constitution.elasticity)
    p_cfg = MetaMaterialConfig.from_cfg(obj_cfg.constitution.plasticity)
    elasticity = InvariantFullMetaElasticity(e_cfg)
    plasticity = InvariantFullMetaPlasticity(p_cfg)
    n_layers = len(e_cfg.layer_widths)
    ckpt = load_torch_file(obj_cfg.pretrained_ckpt)
    from ..data.torch_ckpt import mlp_params_from_state_dict

    pe = mlp_params_from_state_dict(ckpt["elasticity"], n_layers)
    pp = mlp_params_from_state_dict(ckpt["plasticity"], n_layers)

    load_lora = obj_cfg.constitution.get("load_lora")
    if load_lora:
        r = int(obj_cfg.constitution.lora.r)
        alpha = float(obj_cfg.constitution.lora.alpha)
        key = jax.random.PRNGKey(seed)
        pe = elasticity.init_lora(pe, key, r=r, alpha=alpha)
        pp = plasticity.init_lora(
            pp, jax.random.fold_in(key, 7), r=r, alpha=alpha
        )
        if str(load_lora).endswith(".npz"):
            lora = load_params_npz(load_lora)
            pe = overlay_lora(pe, lora["elasticity"])
            pp = overlay_lora(pp, lora["plasticity"])
        else:
            lora = load_torch_file(load_lora)
            pe = merge_lora_state_dict(pe, lora["elasticity"], n_layers, r, alpha)
            pp = merge_lora_state_dict(pp, lora["plasticity"], n_layers, r, alpha)
        print(f"Loaded lora weights from {load_lora}")

    pd = obj_cfg.particle_data.copy()
    pd.span = [0, eval_steps]
    pd.shape.name = "particles"
    pd.shape.asset_root = str(data_root)
    init_data = MPMInitData.from_cfg(pd.to_dict())

    vel_cfg = obj_cfg.particle_data.get("vel")
    if vel_cfg is not None:
        init_data.set_lin_vel(np.array(vel_cfg.lin_vel))
        init_data.set_ang_vel(np.array(vel_cfg.ang_vel))
    else:
        lin, ang = sample_vel(seed=seed)
        init_data.set_lin_vel(lin)
        init_data.set_ang_vel(ang)

    return {
        "gaussians": gaussians,
        "binding": table,
        "elasticity": elasticity,
        "plasticity": plasticity,
        "pe": pe,
        "pp": pp,
        "init_data": init_data,
        "scaling": float(obj_cfg.gaussian.get("scaling_modifier", 1.0)),
    }


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, args.set)
    seed = int(cfg.get("seed", 42))

    out_root = Path(cfg.get("root", "results")) / args.video_name
    image_root = out_root / "images"
    image_root.mkdir(parents=True, exist_ok=True)

    background, force_mask = background_color(cfg)
    if args.debug_views:
        cfg.video_data.data.used_views = list(args.debug_views)
    dataset = VideoDataset(cfg.video_data.to_dict())
    first_step = dataset.steps[0]
    views = args.debug_views or cfg.get("debug_views", dataset.views)

    objs = [
        _load_object(Config(o.to_dict()), args.eval_steps, seed)
        for o in cfg.objects
    ]
    denormalize = bool(cfg.get("denormalize", False))

    # Build concatenated particle system + compose materials.
    groups = [o["init_data"] for o in objs]
    state0, sections = build_initial_state(groups)
    statics = build_statics(groups)
    sim_cfg = cfg.sim.to_dict()
    sim_cfg.setdefault("eps", TRAIN_EPS)
    constants = MPMConstants.from_cfg(sim_cfg)

    elasticity = ComposeMaterial([o["elasticity"] for o in objs], sections)
    plasticity = ComposeMaterial([o["plasticity"] for o in objs], sections)
    pes = [o["pe"] for o in objs]
    pps = [o["pp"] for o in objs]

    # When staying in the sim box, transform kernels into it (reference
    # inference.py:276-283).
    packs: List[GaussianPack] = []
    for o in objs:
        pack = o["gaussians"]
        if not denormalize:
            pack = transform_gaussians(
                pack,
                scale=jnp.float32(o["init_data"].size[0]),
                origin=jnp.zeros((1, 3)),
                t=jnp.asarray(o["init_data"].center, jnp.float32),
            )
        packs.append(pack)

    covs = [
        p.get_covariance(o["scaling"]) for p, o in zip(packs, objs)
    ]
    opac = jnp.concatenate([p.get_opacity for p in packs])
    shs = jnp.concatenate([p.get_features for p in packs])
    sh_degree = packs[0].sh_degree
    cov0 = jnp.concatenate(covs)

    rcfg = RasterConfig(
        max_pairs=int(cfg.get("raster", {}).get("max_pairs", 1 << 18)),
        max_per_tile=int(cfg.get("raster", {}).get("max_per_tile", 512)),
        segment=32,
    )
    cameras = {v: dataset.get(v, first_step).camera for v in views}

    def maybe_denorm(x):
        if not denormalize:
            return x
        outs = []
        off = 0
        for o in objs:
            n = o["init_data"].num_particles
            outs.append(
                (x[off : off + n] - o["init_data"].center)
                / o["init_data"].size
            )
            off += n
        return jnp.concatenate(outs)

    # Blocked path: one block sort carried across the rollout, refreshed
    # per step (rebuilt only on block crossings) — layouts depend only
    # on positions, so the per-step enabled-span statics updates below
    # don't invalidate them.
    if constants.num_grids > 24:
        from ..sim.p2g_kernel import (
            build_step_layouts,
            refresh_step_layouts,
        )
    else:
        build_step_layouts = refresh_step_layouts = None

    @jax.jit
    def sim_frame(state, statics, layouts):
        if layouts is not None:
            layouts, _ = refresh_step_layouts(constants, state.x, layouts)
        stress = elasticity.apply(pes, state.F)
        new = mpm_step(constants, statics, state, stress, layouts)
        F = plasticity.apply(pps, new.F)
        return dataclasses.replace(new, F=F), layouts

    render_jit = jax.jit(
        lambda m, c, cam: rasterize_with_aux(
            m, c, opac, cam, background, shs=shs, sh_degree=sh_degree,
            cfg=rcfg,
        )
    )
    warned_overflow = [False]

    def render_checked(m, c, cam, where):
        img, aux = render_jit(m, c, cam)
        if not warned_overflow[0] and bool(aux["overflow"]):
            warned_overflow[0] = True
            print(
                f"WARNING: raster pair budget exceeded at {where}; "
                "pairs were dropped and the image is wrong - raise "
                "raster.max_pairs/max_per_tile in the config."
            )
        return img

    from PIL import Image

    def save_img(img, path):
        arr = np.clip(
            np.asarray(img).transpose(1, 2, 0) * 255, 0, 255
        ).astype(np.uint8)
        Image.fromarray(arr).save(path)

    # Frame 0: undeformed kernels.
    first_means = jnp.concatenate([p.xyz for p in packs])
    for view in views:
        save_img(
            render_checked(first_means, cov0, cameras[view], "frame 0"),
            image_root / f"{view}_{0:03d}.png",
        )

    state = state0
    de_x_prev = maybe_denorm(state.x)
    k_prev = [p.xyz for p in packs]

    if args.save_particles:
        particles_root = out_root / args.save_particles
        particles_root.mkdir(exist_ok=True)

    sections = [o["init_data"].num_particles for o in objs]
    spans = [tuple(o["init_data"].span) for o in objs]
    dynamic_spans = any(
        s[0] > 0 or s[1] <= args.eval_steps for s in spans
    )

    layouts = (
        jax.jit(build_step_layouts)(constants, state.x)
        if build_step_layouts is not None
        else None
    )
    for step in range(1, args.eval_steps + 1):
        if dynamic_spans:
            # Per-step enabled spans (reference
            # statics_initializer.update, inference loop :310).
            statics = statics.with_enabled_at_step(
                sections, spans, step
            )
        state, layouts = sim_frame(state, statics, layouts)
        de_x = maybe_denorm(state.x)
        # per-object binding application, then concat (reference
        # preprocess_for_rasterization, tune/utils.py:475-523)
        means_list, cov_list = [], []
        off = 0
        for i, o in enumerate(objs):
            n = o["init_data"].num_particles
            m = apply_binding_xyz(
                o["binding"],
                de_x[off : off + n],
                de_x_prev[off : off + n],
                k_prev[i],
            )
            F_k = apply_binding_F(
                o["binding"], state.F[off : off + n]
            )
            cov_list.append(deform_cov_by_F(covs[i], F_k))
            means_list.append(m)
            off += n
        means3d = jnp.concatenate(means_list)
        cov_def = jnp.concatenate(cov_list)

        for view in views:
            save_img(
                render_checked(
                    means3d, cov_def, cameras[view], f"step {step}"
                ),
                image_root / f"{view}_{step:03d}.png",
            )
        if args.save_particles:
            save_ply_points(
                particles_root / f"{first_step + step:03d}.ply",
                np.asarray(state.x),
            )
        de_x_prev = de_x
        k_prev = means_list

    for view in views:
        save_video(
            image_root,
            f"{view}_*.png",
            out_root / f"{args.video_name}_{view}.mp4",
            skip_frame=args.skip_frames,
            fps=args.fps,
        )
    print(f"Inference finished -> {out_root}")


if __name__ == "__main__":
    main()
