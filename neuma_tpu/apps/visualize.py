"""Interactive viewer CLI (reference ``experiments/visualization.py``):
pre-simulates the configured scene and serves the web viewer.

    python -m neuma_tpu.apps.visualize -c configs/demo/generalize.yaml \
        [--port 8080] [--frames 100]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..core.types import MPMConstants
from ..render.rasterize import RasterConfig
from ..utils.config import Config, load_config
from ..vis.instance import NeuMAInstance, SceneObject
from ..vis.viewer import DynamicViewer
from .common import TRAIN_EPS, background_color
from .inference import _load_object


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", "-c", type=str, required=True)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--substeps", type=int, default=1)
    p.add_argument("--set", nargs="*", default=[])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config, args.set)
    seed = int(cfg.get("seed", 42))

    background, _ = background_color(cfg)
    sim_cfg = cfg.sim.to_dict()
    sim_cfg.setdefault("eps", TRAIN_EPS)
    constants = MPMConstants.from_cfg(sim_cfg)

    objects = []
    for obj_cfg in cfg.objects:
        bundle = _load_object(
            Config(obj_cfg.to_dict()),
            args.frames * args.substeps,
            seed,
        )
        objects.append(
            SceneObject(
                name=obj_cfg.sim_data_name,
                gaussians=bundle["gaussians"],
                binding=bundle["binding"],
                elasticity=bundle["elasticity"],
                plasticity=bundle["plasticity"],
                params_e=bundle["pe"],
                params_p=bundle["pp"],
                init_data=bundle["init_data"],
                scaling_modifier=bundle["scaling"],
            )
        )

    rcfg = RasterConfig(
        max_pairs=int(cfg.get("raster", {}).get("max_pairs", 1 << 18)),
        max_per_tile=int(cfg.get("raster", {}).get("max_per_tile", 512)),
    )
    instance = NeuMAInstance(
        constants,
        objects,
        num_frames=args.frames,
        substeps=args.substeps,
        background=background,
        raster_cfg=rcfg,
    )
    print("Simulating rollout ...")
    instance.simulate()
    DynamicViewer(instance).serve(port=args.port)


if __name__ == "__main__":
    main()
