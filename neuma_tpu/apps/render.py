"""Forward rollout + rendering CLI (no gradients).

Mirrors ``experiments/render.py`` in the reference repo: load prepared
data + learned init velocity + optional LoRA weights, run the MPM
rollout under jit, render chosen debug views each frame, export PNGs +
an mp4/gif.

    python -m neuma_tpu.apps.render -c config.yaml -vn out \
        [-s eval_steps] [-l lora.npz] [-dv view1 view2] [-sp particles_dir]
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import ParticleState
from ..data.readers import VideoDataset
from ..data.torch_ckpt import load_params_npz, load_torch_file, merge_lora_state_dict
from ..data.ply import save_ply_points
from ..render.binding import (
    apply_binding_F,
    apply_binding_xyz,
    deform_cov_by_F,
)
from ..render.rasterize import rasterize_with_aux
from ..sim.mpm import mpm_step
from ..sim.rollout import denormalize_points
from ..utils.config import load_config
from ..utils.video import save_video
from .common import (
    assemble_scene,
    background_color,
    build_materials,
    overlay_lora,
    run_data_preparation,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", "-c", type=str, required=True)
    p.add_argument("--eval_steps", "-s", type=int, default=600)
    p.add_argument("--skip_frames", "-f", type=int, default=1)
    p.add_argument("--init_frame", type=int, default=None)
    p.add_argument("--load_lora", "-l", type=str, default=None)
    p.add_argument("--video_name", "-vn", type=str, required=True)
    p.add_argument("--sim_dt", "-dt", type=float, default=None)
    p.add_argument("--debug_views", "-dv", nargs="+", default=[])
    p.add_argument("--save_particles", "-sp", type=str, default=None)
    p.add_argument(
        "--change_base_model", "-cbm", type=str, default=None,
        help="Replace the pretrained base model for rendering.",
    )
    p.add_argument(
        "--alpha", type=float, default=None,
        help="Rewrite the plasticity adaptor alpha.",
    )
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--set", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, args.set)

    # Multi-host entry (no-op single-process; SURVEY.md section 5.8).
    from ..parallel.distributed import initialize

    initialize()
    if args.sim_dt is not None:
        cfg.sim.dt = args.sim_dt
    if args.change_base_model is not None:
        cfg.pretrained_ckpt = args.change_base_model
    if args.alpha is not None:
        cfg.constitution.plasticity.alpha = args.alpha

    exp_root = Path(cfg.root) / cfg.name
    result_root = exp_root / "results"
    result_root.mkdir(parents=True, exist_ok=True)
    data_root = Path(cfg.get("data_root", exp_root / "sim_data"))
    data_root.mkdir(parents=True, exist_ok=True)

    background, force_mask = background_color(cfg)
    run_data_preparation(cfg, data_root)

    # Only the init frame's cameras are needed (reference --init_frame).
    vd_cfg = cfg.video_data.to_dict()
    if args.init_frame is not None:
        vd_cfg["data"]["init_frame"] = args.init_frame
    dataset = VideoDataset(vd_cfg)

    elasticity, plasticity, pe, pp = build_materials(cfg)
    views = args.debug_views or dataset.views

    scene, init_data = assemble_scene(
        cfg,
        data_root,
        dataset,
        elasticity,
        plasticity,
        pe,
        pp,
        num_frames=1,
        substeps=1,
        used_views=sorted(views)[:1],
        pixel_loss="l2",
        background=background,
        force_mask=force_mask,
    )
    cameras = {
        v: dataset.get(v, dataset.steps[0]).camera for v in views
    }

    # optional LoRA overlay
    if args.load_lora:
        r = int(cfg.constitution.lora.r)
        alpha = float(cfg.constitution.lora.alpha)
        key = jax.random.PRNGKey(cfg.get("seed", 42))
        pe = elasticity.init_lora(pe, key, r=r, alpha=alpha)
        pp = plasticity.init_lora(
            pp, jax.random.fold_in(key, 7), r=r, alpha=alpha
        )
        if args.load_lora.endswith(".npz"):
            lora = load_params_npz(args.load_lora)
            pe = overlay_lora(pe, lora["elasticity"])
            pp = overlay_lora(pp, lora["plasticity"])
        else:  # reference torch LoRA checkpoint
            ckpt = load_torch_file(args.load_lora)
            n_layers = len(cfg.constitution.elasticity.layer_widths)
            pe = merge_lora_state_dict(
                pe, ckpt["elasticity"], n_layers, r, alpha
            )
            pp = merge_lora_state_dict(
                pp, ckpt["plasticity"], n_layers, r, alpha
            )

    # init state: learned velocity if available
    init_path = exp_root / "finetune" / "init.npz"
    if init_path.is_file():
        d = np.load(init_path)
        init_x = jnp.asarray(d["init_x"], jnp.float32)
        init_v = jnp.asarray(d["init_v"], jnp.float32)
    else:
        init_x = scene.init_x
        init_v = jnp.zeros(3, jnp.float32)
    n = init_x.shape[0]
    v0 = jnp.broadcast_to(jnp.reshape(init_v, (-1, 3)), (n, 3))
    state = ParticleState.initial(init_x, v0)

    cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)
    opacity = scene.gaussians.get_opacity
    shs = scene.gaussians.get_features

    # Blocked path: one block sort carried across the whole rollout,
    # refreshed per step (rebuilt only when a particle crossed a block
    # boundary) — see sim/p2g_kernel.refresh_step_layouts.
    if scene.constants.num_grids > 24:
        from ..sim.p2g_kernel import (
            build_step_layouts,
            refresh_step_layouts,
        )

        layouts = jax.jit(build_step_layouts)(scene.constants, state.x)
    else:
        layouts = None

    @jax.jit
    def sim_frame(state, layouts):
        if layouts is not None:
            layouts, _ = refresh_step_layouts(
                scene.constants, state.x, layouts
            )
        stress = elasticity.apply(pe, state.F)
        new = mpm_step(scene.constants, scene.statics, state, stress,
                       layouts)
        F = plasticity.apply(pp, new.F)
        return dataclasses.replace(new, F=F), layouts

    def render_frame(means3d, cov_def, cam):
        if force_mask:
            return rasterize_with_aux(
                means3d, cov_def, opacity, cam, background,
                colors_precomp=jnp.ones((means3d.shape[0], 3)),
                cfg=scene.raster_cfg,
            )
        return rasterize_with_aux(
            means3d, cov_def, opacity, cam, background,
            shs=shs, sh_degree=scene.gaussians.sh_degree,
            cfg=scene.raster_cfg,
        )

    render_frame = jax.jit(render_frame)
    warned_overflow = [False]

    def check_overflow(aux, where):
        if not warned_overflow[0] and bool(aux["overflow"]):
            warned_overflow[0] = True
            print(
                f"WARNING: raster pair budget exceeded at {where}; "
                "pairs were dropped and the image is wrong — raise "
                "raster.max_pairs/max_per_tile in the config."
            )

    frames_dir = result_root / args.video_name
    frames_dir.mkdir(exist_ok=True)
    if args.save_particles:
        particles_dir = result_root / args.save_particles
        particles_dir.mkdir(exist_ok=True)

    from PIL import Image

    de_x_prev = denormalize_points(state.x, init_data.size, init_data.center)
    g_prev = scene.gaussians.xyz
    skip = int(cfg.sim.get("skip_frame", 1))
    for step in range(1, args.eval_steps + 1):
        state, layouts = sim_frame(state, layouts)
        if step % skip != 0:
            continue
        de_x = denormalize_points(
            state.x, init_data.size, init_data.center
        )
        means3d = apply_binding_xyz(scene.binding, de_x, de_x_prev, g_prev)
        cov_def = deform_cov_by_F(
            cov0, apply_binding_F(scene.binding, state.F)
        )
        for view in views:
            img, aux = render_frame(means3d, cov_def, cameras[view])
            check_overflow(aux, f"step {step} view {view}")
            arr = np.clip(
                np.asarray(img).transpose(1, 2, 0) * 255, 0, 255
            ).astype(np.uint8)
            Image.fromarray(arr).save(
                frames_dir / f"{view}_{step:04d}.png"
            )
        if args.save_particles:
            save_ply_points(
                particles_dir / f"particles_{step:04d}.ply",
                np.asarray(de_x),
            )
        de_x_prev = de_x
        g_prev = means3d

    for view in views:
        save_video(
            frames_dir,
            f"{view}_*.png",
            result_root / f"{args.video_name}_{view}.mp4",
            skip_frame=args.skip_frames,
            fps=args.fps,
        )
    print(f"Render finished -> {result_root}")


if __name__ == "__main__":
    main()
