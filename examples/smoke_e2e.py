"""End-to-end smoke demo: fabricate a tiny synthetic scene on disk, run
the full two-stage grounding CLI (init velocity + LoRA), then the render
CLI over the trained outputs. Runs on whatever backend JAX selects
(TPU in this container; CPU elsewhere).

    python examples/smoke_e2e.py [--workdir DIR] [--size 64] \
        [--frames 4] [--epochs 5]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/tmp/neuma_smoke")
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--frames", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (the container sitecustomize "
        "overrides JAX_PLATFORMS, so an env var is not enough)",
    )
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import shutil

    work = Path(args.workdir)
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)

    rng = np.random.default_rng(0)

    # Reuse the fabricated-dataset helpers from the test suite.
    from test_apps import make_assets, make_synthetic_dataset, write_config

    data_path = work / "dataset"
    views = make_synthetic_dataset(
        data_path, rng, size=args.size, n_steps=args.frames + 1
    )
    kernels_path, mesh_path = make_assets(work, rng)
    cfg_path = write_config(work, kernels_path, mesh_path, data_path, views)

    # Scale the config up from the unit-test sizes.
    from neuma_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    cfg.velocity.num_epochs = args.epochs
    cfg.velocity.num_frames = min(args.frames, 3)
    cfg.constitution.num_epochs = args.epochs
    cfg.constitution.num_frames = args.frames
    cfg.save(cfg_path)

    from neuma_tpu.apps import finetune as finetune_app
    from neuma_tpu.apps import render as render_app

    t0 = time.time()
    result = finetune_app.main(["-c", str(cfg_path)])
    t_train = time.time() - t0
    print(f"[smoke] finetune done in {t_train:.1f}s  "
          f"losses={['%.4f' % l for l in result.losses]}")

    t0 = time.time()
    render_app.main(
        ["-c", str(cfg_path), "-s", "5", "-vn", "smoke", "-dv", views[0]]
    )
    print(f"[smoke] render done in {time.time() - t0:.1f}s")

    out = work / "logs" / "smoke" / "results" / "smoke"
    pngs = sorted(out.glob("*.png"))
    assert pngs, "no rendered frames produced"
    print(f"[smoke] produced {len(pngs)} frames under {out}")
    print(json.dumps({"ok": True, "train_s": t_train,
                      "frames": len(pngs)}))


if __name__ == "__main__":
    main()
