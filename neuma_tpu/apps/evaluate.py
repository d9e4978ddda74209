"""Image-quality evaluation CLI: PSNR / SSIM (/ LPIPS when available)
over rendered vs ground-truth frames with the reference's center-crop
protocol, plus side-by-side comparison video.

Mirrors ``experiments/evaluation.py`` in the reference repo: metrics on
crop [220:580]^2 of 800^2 synthetic renders, every ``skip`` frames,
written to ``<name>_metrics.txt``.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..train.losses import psnr as psnr_fn, ssim as ssim_fn
from ..utils.video import _natsorted, save_video


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--render_dir", "-r", type=str, required=True)
    p.add_argument("--gt_dir", "-g", type=str, required=True)
    p.add_argument("--render_glob", type=str, default="*.png")
    p.add_argument("--gt_glob", type=str, default="*.png")
    p.add_argument("--output", "-o", type=str, default=None)
    p.add_argument("--skip", type=int, default=1)
    p.add_argument(
        "--crop", nargs=4, type=int, default=[220, 580, 220, 580],
        help="y0 y1 x0 x1 center crop (reference evaluation.py:34-35)",
    )
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=-1)
    p.add_argument("--video", action="store_true")
    return p.parse_args(argv)


def _lpips_model(weights=None):
    """JAX LPIPS-VGG (train/lpips.py). Prefers the official ``lpips``
    torch package if installed; otherwise the in-tree implementation
    (vendored weights npz, or the labeled random-VGG fallback)."""
    try:
        import lpips  # optional official package

        model = lpips.LPIPS(net="vgg")

        def call(r, g):
            import torch

            with torch.no_grad():
                return float(
                    model(
                        torch.from_numpy(r.transpose(2, 0, 1)[None] * 2 - 1),
                        torch.from_numpy(g.transpose(2, 0, 1)[None] * 2 - 1),
                    )
                )

        return "lpips", call
    except Exception:
        from ..train.lpips import LPIPSMetric

        metric = LPIPSMetric(weights)
        return metric.name, lambda r, g: metric(
            r.transpose(2, 0, 1), g.transpose(2, 0, 1)
        )


def evaluate_frames(
    render_paths, gt_paths, crop, lpips_model=None
):
    lpips_name, lpips_call = lpips_model or ("lpips", None)
    from PIL import Image

    rows = []
    for rp, gp in zip(render_paths, gt_paths):
        r = np.asarray(Image.open(rp).convert("RGB"), np.float32) / 255.0
        g = np.asarray(Image.open(gp).convert("RGB"), np.float32) / 255.0
        y0, y1, x0, x1 = crop
        if r.shape[0] > y1 and r.shape[1] > x1:
            r = r[y0:y1, x0:x1]
            g = g[y0:y1, x0:x1]
        rj = jnp.asarray(r.transpose(2, 0, 1))
        gj = jnp.asarray(g.transpose(2, 0, 1))
        row = {
            "psnr": float(psnr_fn(rj, gj)),
            "ssim": float(ssim_fn(rj, gj)),
        }
        if lpips_call is not None:
            row[lpips_name] = lpips_call(r, g)
        rows.append(row)
    return rows


def main(argv=None):
    args = parse_args(argv)
    render_paths = _natsorted(
        Path(args.render_dir).glob(args.render_glob)
    )[:: args.skip]
    gt_paths = _natsorted(Path(args.gt_dir).glob(args.gt_glob))[:: args.skip]
    end = args.end if args.end > 0 else min(
        len(render_paths), len(gt_paths)
    )
    render_paths = render_paths[args.start : end]
    gt_paths = gt_paths[args.start : end]
    assert render_paths and len(render_paths) == len(gt_paths), (
        f"frame count mismatch: {len(render_paths)} vs {len(gt_paths)}"
    )

    rows = evaluate_frames(
        render_paths, gt_paths, args.crop, _lpips_model()
    )

    if args.video:
        # Side-by-side comparison video (reference evaluation.py writes
        # render|gt composites).
        from PIL import Image

        sbs_dir = Path(args.render_dir) / "side_by_side"
        sbs_dir.mkdir(exist_ok=True)
        for i, (rp, gp) in enumerate(zip(render_paths, gt_paths)):
            r = Image.open(rp).convert("RGB")
            g = Image.open(gp).convert("RGB")
            combo = Image.new("RGB", (r.width + g.width, r.height))
            combo.paste(r, (0, 0))
            combo.paste(g, (r.width, 0))
            combo.save(sbs_dir / f"sbs_{i:04d}.png")
        save_video(
            sbs_dir, "sbs_*.png",
            Path(args.render_dir) / "side_by_side.mp4",
        )
    keys = rows[0].keys()
    means = {k: float(np.mean([r[k] for r in rows])) for k in keys}
    out_path = Path(
        args.output or (Path(args.render_dir) / "metrics.txt")
    )
    with open(out_path, "w") as f:
        for k, v in means.items():
            f.write(f"{k}: {v:.6f}\n")
        f.write("\nper-frame:\n")
        for i, r in enumerate(rows):
            f.write(
                f"{i}: " + " ".join(f"{k}={v:.5f}" for k, v in r.items())
                + "\n"
            )
    print(" ".join(f"{k}={v:.4f}" for k, v in means.items()))
    print(f"Metrics written to {out_path}")
    return means


if __name__ == "__main__":
    main()
