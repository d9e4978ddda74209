"""Dynamics grounding CLI: two-stage training (init velocity + LoRA).

Mirrors ``experiments/finetune.py`` in the reference repo. Usage:

    python -m neuma_tpu.apps.finetune -c configs/synthetic/finetune-bb.yaml \
        [--set key.path=value ...]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..data.readers import VideoDataset
from ..data.torch_ckpt import load_params_npz, save_params_npz
from ..train.checkpoint import MetricsLogger
from ..train.grounding import finetune_constitutive, optimize_init_velocity
from ..train.schedulers import fetch_schedule
from ..utils.config import load_config
from ..utils.logging import Logger, Timer
from .common import (
    assemble_scene,
    background_color,
    build_materials,
    load_latest_lora,
    overlay_lora,
    resolve_exp_dirs,
    run_data_preparation,
    save_lora_checkpoint,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", type=str, required=True)
    parser.add_argument(
        "--set", nargs="*", default=[], help="key.path=value overrides"
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, args.set)

    # Multi-host entry (no-op single-process; SURVEY.md section 5.8):
    # on a pod slice every host runs this same program and only the
    # primary writes checkpoints/logs.
    from ..parallel.distributed import initialize, is_primary

    initialize()
    primary = is_primary()

    np.random.seed(cfg.get("seed", 42))

    exp_root, tune_root = resolve_exp_dirs(
        cfg, cfg.get("resume", False), cfg.get("overwrite", False)
    )
    if primary:
        cfg.save(exp_root / "config.yaml")
        Logger.tee(exp_root / "log.txt")
    # Per-epoch scalar metrics (lr/grad-norm/loss/decay) — the
    # observability equivalent of the reference's tensorboardX writer
    # (finetune.py:463-468), as an appendable/tailable JSONL.
    metrics = MetricsLogger(exp_root / "metrics.jsonl") if primary else None
    timer = Timer()

    data_root = Path(cfg.get("data_root", exp_root / "sim_data"))
    data_root.mkdir(parents=True, exist_ok=True)

    background, force_mask = background_color(cfg)

    # data prep (idempotent)
    run_data_preparation(cfg, data_root)

    dataset = VideoDataset(cfg.video_data.to_dict())
    elasticity, plasticity, pe, pp = build_materials(cfg)

    # ---------------- stage 1: init velocity --------------------------
    vel_cfg = cfg.velocity
    v_views = (
        dataset.views
        if vel_cfg.get("views", "all") == "all"
        else list(vel_cfg.views)
    )
    scene_v, init_data = assemble_scene(
        cfg,
        data_root,
        dataset,
        elasticity,
        plasticity,
        pe,
        pp,
        num_frames=int(vel_cfg.num_frames),
        substeps=int(vel_cfg.get("substeps", 1)),
        used_views=sorted(v_views),
        pixel_loss=vel_cfg.get("pixel_loss", "l2"),
        background=background,
        force_mask=force_mask,
    )

    init_path = tune_root / "init.npz"
    if init_path.is_file():
        print("Loading initial velocity from checkpoint ...")
        data = np.load(init_path)
        init_v = data["init_v"]
    else:
        print("Optimizing initial velocity ...")
        schedule = fetch_schedule(
            vel_cfg.scheduler.to_dict(), float(vel_cfg.lr)
        )

        def vel_log(e, l, l_rgb, v):
            print(
                f"[velocity] epoch {e}/{vel_cfg.num_epochs} "
                f"loss {l:.4e} init_v {v}"
            )
            if metrics:
                metrics.log(
                    e, stage=1.0, loss=l, loss_rgb=l_rgb,
                    lr_velocity=schedule(e - 1),
                )

        result = optimize_init_velocity(
            scene_v,
            num_epochs=int(vel_cfg.num_epochs),
            lr=float(vel_cfg.lr),
            schedule=schedule,
            lambda_reg=vel_cfg.get("lambda_reg"),
            reg_all=bool(vel_cfg.get("reg_all", False)),
            log_fn=vel_log,
        )
        init_v = result.init_v
        if primary:
            np.savez(init_path, init_x=init_data.pos, init_v=init_v)
    print(f"Initial velocity obtained: {np.asarray(init_v).reshape(-1, 3).mean(0)}")

    # ---------------- stage 2: LoRA constitutive ----------------------
    con = cfg.constitution
    c_views = (
        dataset.views
        if con.get("views", "all") == "all"
        else list(con.views)
    )
    scene_c, _ = assemble_scene(
        cfg,
        data_root,
        dataset,
        elasticity,
        plasticity,
        pe,
        pp,
        num_frames=int(con.num_frames),
        substeps=int(con.substeps),
        used_views=sorted(c_views),
        pixel_loss=con.get("pixel_loss", "l2"),
        background=background,
        force_mask=force_mask,
        exclude_frames=con.get("exclude_steps", ()),
    )

    r = int(con.lora.r)
    alpha = float(con.lora.alpha)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params_e = elasticity.init_lora(pe, key, r=r, alpha=alpha)
    params_p = plasticity.init_lora(
        pp, jax.random.fold_in(key, 7), r=r, alpha=alpha
    )

    # Resume: prefer the FULL train-state checkpoint (params + optimizer
    # moments + schedule step; restored inside finetune_constitutive),
    # falling back to LoRA-weights-only overlay with a cold optimizer —
    # the reference's resume semantics (finetune.py:299-309).
    start_epoch = 1
    ts_path = tune_root / "train_state.npz"
    full_resume = bool(cfg.get("resume", False)) and ts_path.is_file()
    if full_resume:
        print(f"Resuming full train state from {ts_path}")
    elif cfg.get("resume", False):
        lora_tree, last_epoch = load_latest_lora(tune_root)
        if lora_tree is not None:
            print(f"Resuming LoRA from epoch {last_epoch} (weights only)")
            params_e = overlay_lora(params_e, lora_tree["elasticity"])
            params_p = overlay_lora(params_p, lora_tree["plasticity"])
            start_epoch = last_epoch + 1

    def con_log(e, l, en, pn, d, lr_e, lr_p):
        print(
            f"[constitutive] epoch {e}/{con.num_epochs} loss {l:.4e} "
            f"e-gd {en:.2e} p-gd {pn:.2e} decay {d:.2f} "
            f"elp {timer.measure()}"
        )
        if metrics:
            metrics.log(
                e, stage=2.0, loss_rgb=l, grad_norm_elasticity=en,
                grad_norm_plasticity=pn, lr_decay=d, lr_elasticity=lr_e,
                lr_plasticity=lr_p,
            )

    keep = int(con.get("num_lora_ckpts", 3))
    result = finetune_constitutive(
        scene_c,
        init_v,
        con.to_dict(),
        params_e,
        params_p,
        checkpoint_fn=(
            lambda e, a, b, l: save_lora_checkpoint(
                tune_root, e, elasticity, plasticity, a, b, l, keep
            )
        ) if primary else None,
        log_fn=con_log,
        start_epoch=start_epoch,
        train_state_path=ts_path,
        resume_state=full_resume,
        write_state=primary,
    )
    if metrics:
        metrics.close()
    print("Finetuning ends.")
    return result


if __name__ == "__main__":
    main()
