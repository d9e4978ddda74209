"""Material-recovery self-consistency benchmark (the "does grounding
actually work" capstone).

Protocol (mirrors the intent of the reference's finetune pipeline,
``experiments/finetune.py:234-488`` + ``modules/tune/metrics.py:6-105``,
without needing its datasets):

1. simulate ground truth with material A — the base meta-material with
   perturbed elasticity weights (a stiffer constitutive law) — from a
   known initial velocity, and render its frames with this framework;
2. ground from pixels starting at material B (the unperturbed base +
   zero-initialized LoRA) through the stage-2 LoRA finetune;
3. roll out the RECOVERED material and quantify trajectory MSE and
   final-frame chamfer distance against the GT particle trajectory,
   vs the same metrics for the un-grounded material B.

Prints ONE JSON line with the pre/post metrics and improvement factors
(>1 means grounding moved the dynamics toward the truth).

Scale knobs default to the realistic benchmark (10k particles, 32^3,
100 frames at 800^2 — run on TPU); --quick shrinks everything for a
CPU smoke (also used by tests/test_material_recovery.py).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

# Runnable as `python benchmarks/material_recovery.py` from anywhere:
# the scene builder lives in the repo-root __graft_entry__.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def gt_rollout_and_frames(scene, params_e, params_p, init_v):
    """Simulate + render the full rollout; returns (frames
    (F, V, 3, H, W), traj (F, N, 3))."""
    import jax
    import jax.numpy as jnp

    from neuma_tpu.core.types import ParticleState
    from neuma_tpu.render.binding import (
        apply_binding_F,
        apply_binding_xyz,
        deform_cov_by_F,
    )
    from neuma_tpu.render.rasterize import rasterize
    from neuma_tpu.sim.mpm import mpm_step

    n = scene.init_x.shape[0]
    v0 = jnp.broadcast_to(jnp.reshape(init_v, (-1, 3)), (n, 3))
    cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)

    def frame(carry, _):
        state, de_x_prev, g_prev = carry

        def sub(s, _):
            stress = scene.elasticity.apply(params_e, s.F)
            s = mpm_step(scene.constants, scene.statics, s, stress)
            F = scene.plasticity.apply(params_p, s.F)
            return dataclasses.replace(s, F=F), None

        state, _ = jax.lax.scan(sub, state, None, length=scene.substeps)
        means3d = apply_binding_xyz(
            scene.binding, state.x, de_x_prev, g_prev
        )
        cov_def = deform_cov_by_F(
            cov0, apply_binding_F(scene.binding, state.F)
        )
        imgs = jnp.stack(
            [
                rasterize(
                    means3d,
                    cov_def,
                    scene.gaussians.get_opacity,
                    cam,
                    scene.background,
                    shs=scene.gaussians.get_features,
                    sh_degree=scene.gaussians.sh_degree,
                    cfg=scene.raster_cfg,
                )
                for cam in scene.cameras
            ]
        )
        return (state, state.x, means3d), (imgs, state.x)

    state0 = ParticleState.initial(scene.init_x, v0)
    carry = (state0, scene.init_x, scene.gaussians.xyz)
    _, (frames, traj) = jax.lax.scan(
        frame, carry, None, length=scene.num_frames
    )
    return frames, traj


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--particles", type=int, default=10000)
    p.add_argument("--grid", type=int, default=32)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--substeps", type=int, default=1)
    p.add_argument("--img", type=int, default=800)
    p.add_argument("--views", type=int, default=1)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--elasticity-lr", type=float, default=None)
    p.add_argument("--plasticity-lr", type=float, default=None)
    p.add_argument("--lora-r", type=int, default=16)
    p.add_argument("--max-pairs", type=int, default=None)
    p.add_argument("--max-per-tile", type=int, default=None)
    p.add_argument("--perturb", type=float, default=1.3,
                   help="GT elasticity weight scale (material A)")
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke (overrides scale knobs)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.quick:
        args.particles, args.grid = 384, 16
        args.frames, args.substeps = 20, 5
        args.img, args.lora_r = 48, 4
        if args.epochs is None:
            args.epochs = 30
        # The tiny budget needs a hotter schedule to show movement.
        if args.elasticity_lr is None:
            args.elasticity_lr = 0.05
        if args.plasticity_lr is None:
            args.plasticity_lr = 0.005
    if args.epochs is None:
        args.epochs = 150
    if args.elasticity_lr is None:
        # Measured on v5e at the realistic scale (10k/32^3/100f/800^2):
        # 0.02/150ep recovers traj-MSE x9.96 / chamfer x5.19 vs x1.06 at
        # 0.01/60ep and x1.32 at 0.005/150ep (loss rises until ~ep30
        # while the rollout-decay ramp raises late-frame weights, then
        # converges to ~7.5e-4 by ep120).
        args.elasticity_lr = 0.02
    if args.plasticity_lr is None:
        args.plasticity_lr = 0.001
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_tiny_scene
    from neuma_tpu.train.grounding import finetune_constitutive
    from neuma_tpu.train.metrics import chamfer_distance, trajectory_mse

    scene = _build_tiny_scene(
        n_particles=args.particles,
        grid=args.grid,
        frames=args.frames,
        substeps=args.substeps,
        img=args.img,
        n_views=args.views,
    )
    # The tiny scene's randomly-initialized base produces near-zero
    # stress (dynamics indistinguishable under perturbation); ground
    # the benchmark in the reference's pretrained jelly law when its
    # checkpoint is reachable (the VERDICT protocol: jelly base +
    # perturbation as material A).
    base_ckpt = Path(
        "/root/reference/experiments/base_models/jelly_0300.pt"
    )
    if base_ckpt.is_file():
        from neuma_tpu.data.torch_ckpt import load_base_model

        pe_b, pp_b = load_base_model(base_ckpt, num_layers=2)
        scene = dataclasses.replace(
            scene, elasticity_params=pe_b, plasticity_params=pp_b
        )
        print(f"[recovery] base law: {base_ckpt.name}", file=sys.stderr)
    else:
        print(
            "[recovery] WARNING: reference jelly base unavailable — "
            "random base produces near-zero stress and the benchmark "
            "is not meaningful",
            file=sys.stderr,
        )
    # Raster budget: realistic at bench scale, roomy in quick mode (the
    # perturbed-material rollouts spread splats wider than the default
    # tiny-scene budget).
    scene = dataclasses.replace(
        scene,
        raster_cfg=dataclasses.replace(
            scene.raster_cfg,
            max_pairs=args.max_pairs
            or ((1 << 15) if args.quick else (1 << 16)),
            # small images have few tiles: per-tile depth must cover
            # clustered frames or the depth overflow trips. Default to
            # "everything can land in one tile" below 1k particles.
            max_per_tile=args.max_per_tile
            or max(512, min(args.particles, 4096)),
            segment=16 if args.quick else 32,
        ),
    )

    # BouncyBall-style drop test (dt matches the synthetic configs'
    # 1e-3): shift the body just above the floor and launch it down so
    # it impacts, squashes, and rebounds within the rollout — without
    # deformation F stays ~I and EVERY constitutive law produces the
    # same ballistic trajectory (no signal to recover).
    shift = jnp.asarray([0.0, -0.2, 0.0], jnp.float32)
    # The grid BC wall must sit ABOVE the particle clip bound (0.1 of
    # the box) or bodies position-clamp without any grid collision —
    # no deformation, identical trajectories under every law (observed
    # at grid=32 where 2 cells = 0.0625 < 0.1).
    bound = max(2, int(round(0.12 * args.grid)))
    scene = dataclasses.replace(
        scene,
        constants=dataclasses.replace(
            scene.constants, dt=jnp.float32(1e-3), bound=bound
        ),
        init_x=scene.init_x + shift,
        gaussians=dataclasses.replace(
            scene.gaussians, xyz=scene.gaussians.xyz + shift
        ),
        # binding tables are built from relative geometry — a uniform
        # shift of both particles and kernels keeps them valid.
    )
    init_v = jnp.asarray([1.0, -2.0, 0.0], jnp.float32)

    # Material A (ground truth): stiffer elasticity law.
    pe_gt = jax.tree_util.tree_map(
        lambda x: x * args.perturb + 0.01, scene.elasticity_params
    )
    pp_gt = scene.plasticity_params

    t0 = time.perf_counter()
    frames_gt, traj_gt = jax.jit(
        lambda pe, pp: gt_rollout_and_frames(scene, pe, pp, init_v)
    )(pe_gt, pp_gt)
    traj_gt = np.asarray(traj_gt)
    print(
        f"[recovery] GT rollout+render: {time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )

    # Material B (start): unperturbed base + zero-delta LoRA.
    pe0 = scene.elasticity.init_lora(
        scene.elasticity_params, jax.random.PRNGKey(11),
        r=args.lora_r, alpha=float(args.lora_r),
    )
    pp0 = scene.plasticity.init_lora(
        scene.plasticity_params, jax.random.PRNGKey(12),
        r=args.lora_r, alpha=float(args.lora_r),
    )

    def rollout_metrics(pe, pp):
        _, traj = jax.jit(
            lambda a, b: gt_rollout_and_frames(scene, a, b, init_v)
        )(pe, pp)
        traj = np.asarray(traj)
        return {
            "traj_mse": trajectory_mse(traj, traj_gt, skip=1),
            "chamfer_final": chamfer_distance(traj[-1], traj_gt[-1]),
        }

    before = rollout_metrics(pe0, pp0)
    print(f"[recovery] before: {before}", file=sys.stderr)

    scene_t = dataclasses.replace(scene, gt_images=frames_gt)
    cfg = {
        "num_epochs": args.epochs,
        "elasticity_lr": args.elasticity_lr,
        "plasticity_lr": args.plasticity_lr,
        "elasticity_wd": 0.0,
        "plasticity_wd": 0.0,
        "elasticity_grad_max_norm": 1.0,
        "plasticity_grad_max_norm": 1.0,
        "elasticity_scheduler": {
            "type": "cos", "max_steps": args.epochs,
            "learning_rate_alpha": 0.025,
        },
        "plasticity_scheduler": {
            "type": "cos", "max_steps": args.epochs,
            "learning_rate_alpha": 0.025,
        },
        "decay_init": 0.5,
        "decay_final": 1.0,
        "decay_steps": 80,
        "lambda_max_decay": 0.33,
    }
    t1 = time.perf_counter()
    result = finetune_constitutive(
        scene_t,
        np.asarray(init_v),
        cfg,
        pe0,
        pp0,
        log_fn=lambda e, l, en, pn, d, *lrs: print(
            f"[recovery] epoch {e}/{args.epochs} loss {l:.5e}",
            file=sys.stderr,
        ) if (e == 1 or e % 10 == 0) else None,
    )
    train_s = time.perf_counter() - t1

    after = rollout_metrics(result.params_e, result.params_p)
    print(f"[recovery] after: {after}", file=sys.stderr)

    out = {
        "metric": "material_recovery",
        "particles": args.particles,
        "grid": args.grid,
        "frames": args.frames,
        "img": args.img,
        "epochs": args.epochs,
        "train_s": round(train_s, 1),
        "pixel_loss_first": result.losses[0],
        "pixel_loss_last": result.losses[-1],
        "traj_mse_before": before["traj_mse"],
        "traj_mse_after": after["traj_mse"],
        "traj_mse_improvement": before["traj_mse"]
        / max(after["traj_mse"], 1e-12),
        "chamfer_before": before["chamfer_final"],
        "chamfer_after": after["chamfer_final"],
        "chamfer_improvement": before["chamfer_final"]
        / max(after["chamfer_final"], 1e-12),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
