"""Real-world registration CLI: fit a global Sim(3) aligning the raw 3DGS
reconstruction to the first video frame, then transform sampled particles.

Mirrors ``experiments/regist.py`` in the reference repo (two idempotent
stages: regist_gaussians -> registered_params.npz +
registered_kernels.ply; regist_particles -> registered_particles.ply).

    python -m neuma_tpu.apps.regist -c configs/realworld/regist-bun.yaml
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..data.ply import save_ply_points
from ..data.readers import VideoDataset
from ..data.sampling import sample_particles
from ..render.gaussians import GaussianPack
from ..render.rasterize import RasterConfig
from ..train.register import (
    RegisterConfig,
    RegistrationResult,
    apply_sim3,
    apply_sim3_points,
    register_gaussians,
)
from ..utils.config import load_config
from ..utils.logging import Logger
from .common import background_color


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", "-c", type=str, required=True)
    p.add_argument("--set", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, args.set)

    exp_root = Path(cfg.root) / cfg.name
    exp_root.mkdir(parents=True, exist_ok=True)
    cfg.save(exp_root / "config.yaml")
    Logger.tee(exp_root / "log.txt")

    params_path = exp_root / "registered_params.npz"
    kernels_path = exp_root / "registered_kernels.ply"
    particles_path = exp_root / "registered_particles.ply"

    background, _ = background_color(cfg)

    # Stage A: fit the Sim(3) on the first frame (idempotent).
    if params_path.is_file() and kernels_path.is_file():
        print("Registration already done; loading saved Sim(3).")
        d = np.load(params_path)
        params = {k: jnp.asarray(d[k]) for k in ("r", "t", "s")}
        origin = d["origin"]
    else:
        vd_cfg = cfg.video_data.to_dict()
        vd_cfg["data"]["init_frame"] = vd_cfg["data"].get("init_frame", 0)
        dataset = VideoDataset(vd_cfg)
        first_step = dataset.steps[0]
        cameras = [
            dataset.get(v, first_step).camera for v in dataset.views
        ]
        gt = jnp.asarray(
            np.stack(
                [dataset.get(v, first_step).image for v in dataset.views]
            )
        )

        pack = GaussianPack.from_ply(
            cfg.gaussian.kernels_path, cfg.gaussian.sh_degree
        )
        reg = cfg.register
        fit_cfg = RegisterConfig(
            init_r_deg=tuple(reg.get("INIT_R", (0, 0, 0))),
            init_t=tuple(reg.get("INIT_T", (0, 0, 0))),
            init_s=float(reg.get("INIT_S", 1.0)),
            lr_r=float(reg.get("lr_r", 1e-3)),
            lr_t=float(reg.get("lr_t", 1e-3)),
            lr_s=float(reg.get("lr_s", 1e-3)),
            iterations=int(reg.get("iterations", 20000)),
            lambda_dssim=float(reg.get("lambda_dssim", 0.0)),
            learning_rate_alpha=float(
                reg.get("scheduler", {}).get("learning_rate_alpha", 0.05)
            ),
        )
        rcfg = RasterConfig(
            max_pairs=int(cfg.get("raster", {}).get("max_pairs", 1 << 18)),
            max_per_tile=int(
                cfg.get("raster", {}).get("max_per_tile", 512)
            ),
        )
        result: RegistrationResult = register_gaussians(
            pack,
            cameras,
            gt,
            fit_cfg,
            background,
            raster_cfg=rcfg,
            log_fn=lambda i, l, p: print(
                f"[regist] iter {i} loss {l:.5f}"
            ),
        )
        params = {k: jnp.asarray(v) for k, v in result.params.items()}
        origin = result.origin
        np.savez(
            params_path,
            **{k: np.asarray(v) for k, v in params.items()},
            origin=origin,
        )
        moved = apply_sim3(params, pack)
        moved.to_ply(kernels_path)
        print(f"Saved registered kernels -> {kernels_path}")

    # Stage B: sample mesh particles + apply the same Sim(3) (idempotent).
    if particles_path.is_file():
        print("Registered particles already exist; skipping.")
        return
    pd = cfg.particle_data
    particles = sample_particles(
        pd.mesh_path, pd.mesh_sample_mode, pd.mesh_sample_resolution
    ).astype(np.float32)
    moved_particles = np.asarray(
        apply_sim3_points(
            params, jnp.asarray(particles), jnp.asarray(origin)
        )
    )
    save_ply_points(particles_path, moved_particles)
    print(
        f"Saved {len(moved_particles)} registered particles -> "
        f"{particles_path}"
    )


if __name__ == "__main__":
    main()
