"""End-to-end CLI smoke test: fabricate a NeuMA-Synthetic-style dataset
on disk and run the finetune app (both stages, tiny sizes), then the
render app on its outputs."""
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp


def make_synthetic_dataset(
    root: Path,
    rng,
    size=48,
    n_views=1,
    n_steps=3,
    subfolder="data_dynamic",
    views=None,
):
    """Fabricated dataset honoring the reader contract
    (dataset_readers.py:200-276): <subfolder>/<view>_<step:03d>.png +
    <subfolder>.json with c2w (OpenGL) + intrinsic."""
    from PIL import Image

    from neuma_tpu.render.camera import Camera, fov2focal

    sub = root / subfolder
    sub.mkdir(parents=True)
    meta = []
    if views is None:
        views = [f"d_{i}" for i in range(n_views)]
    for vi, view in enumerate(views):
        eye = np.array([0.5 + 0.3 * vi, 0.55, -1.2])
        cam = Camera.look_at(
            eye=eye, target=np.array([0.5, 0.5, 0.5]), fov=0.9,
            width=size, height=size,
        )
        # Reconstruct an OpenGL c2w that the reader maps back to this
        # camera: w2c rows from the stored (transposed) world_view.
        w2c = np.asarray(cam.world_view).T  # (4,4) column-vector W2V
        c2w = np.linalg.inv(w2c)
        c2w_gl = c2w.copy()
        c2w_gl[:3, 1:3] *= -1
        focal = fov2focal(cam.fov_x, size)
        intrinsic = [
            [focal, 0, size / 2],
            [0, focal, size / 2],
            [0, 0, 1],
        ]
        for step in range(n_steps):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            name = f"{view}_{step:03d}.png"
            Image.fromarray(img).save(sub / name)
            meta.append(
                {
                    "file_path": f"./{subfolder}/{name}",
                    "c2w": c2w_gl.tolist(),
                    "intrinsic": intrinsic,
                }
            )
    with open(root / f"{subfolder}.json", "w") as f:
        json.dump(meta, f)
    return views


def make_assets(root: Path, rng):
    """Kernels PLY + mesh OBJ in the unit-ish box."""
    from neuma_tpu.data.mesh import make_icosphere, TriMesh
    from neuma_tpu.render.gaussians import create_from_points

    mesh = make_icosphere(radius=0.25, subdivisions=2)
    mesh = TriMesh(
        vertices=mesh.vertices + np.array([0.5, 0.55, 0.5]),
        faces=mesh.faces,
    )
    mesh_path = root / "mesh.obj"
    mesh.export_obj(mesh_path)

    pts = mesh.sample_surface(80, rng).astype(np.float32)
    pack = create_from_points(
        pts, rng.random((80, 3)).astype(np.float32), sh_degree=2
    )
    kernels_path = root / "kernels.ply"
    pack.to_ply(kernels_path)
    return kernels_path, mesh_path


def write_config(root, kernels_path, mesh_path, data_path, views):
    import yaml

    cfg = {
        "seed": 42,
        "debug": False,
        "resume": False,
        "overwrite": False,
        "root": str(root / "logs"),
        "name": "smoke",
        "data_root": str(root / "sim_data"),
        "pretrained_ckpt": None,
        "gaussian": {
            "sh_degree": 2,
            "opacity_thres": 0.02,
            "confidence": 0.95,
            "max_particles": 8,
            "kernels_path": str(kernels_path),
        },
        "video_data": {
            "eval": False,
            "camera_type": "NeuMASynthetic",
            "data": {
                "path": str(data_path),
                "transformsfile": "data_dynamic.json",
                "white_background": True,
                "exclude_steps": [-1],
                "used_views": views,
            },
            "camera": {"resolution": 1, "data_device": "cpu"},
        },
        "sim": {
            "gravity": [0.0, -9.8, 0.0],
            "bc": "noslip",
            "num_grids": 16,
            "dt": 0.001,
            "bound": 1,
            "eps": 0.0,
            "skip_frame": 1,
        },
        "particle_data": {
            "shape": {
                "asset_root": None,
                "sort": None,
                "ori_bounds": [[0.2, 0.25, 0.2], [0.8, 0.85, 0.8]],
                "sim_bounds": [[0.2, 0.25, 0.2], [0.8, 0.85, 0.8]],
            },
            "rho": 1000.0,
            "clip_bound": 0.1,
            "mesh_path": str(mesh_path),
            "mesh_sample_mode": "uniform",
            "mesh_sample_resolution": 10,
        },
        "raster": {"max_pairs": 8192, "max_per_tile": 256, "segment": 16},
        "constitution": {
            "elasticity": {
                "layer_widths": [16, 16],
                "norm": None,
                "nonlinearity": "gelu",
                "no_bias": True,
                "normalize_input": True,
            },
            "elasticity_lr": 0.008,
            "elasticity_wd": 0.0,
            "elasticity_grad_max_norm": 1.0,
            "elasticity_scheduler": {
                "type": "cos",
                "max_steps": 2,
                "learning_rate_alpha": 0.025,
            },
            "plasticity": {
                "layer_widths": [16, 16],
                "norm": None,
                "alpha": 0.001,
                "nonlinearity": "gelu",
                "no_bias": True,
                "normalize_input": True,
            },
            "plasticity_lr": 0.0008,
            "plasticity_wd": 0.0,
            "plasticity_grad_max_norm": 1.0,
            "plasticity_scheduler": {
                "type": "cos",
                "max_steps": 2,
                "learning_rate_alpha": 0.025,
            },
            "warmup_step": 0,
            "decay_init": 0.5,
            "decay_final": 1.0,
            "decay_steps": 80,
            "lambda_max_decay": 0.33,
            "lora": {"r": 4, "alpha": 4},
            "num_epochs": 2,
            "substeps": 1,
            "num_frames": 2,
            "views": views,
        },
        "velocity": {
            "num_epochs": 2,
            "num_frames": 2,
            "substeps": 1,
            "lambda_reg": 0.005,
            "views": views,
            "lr": 0.5,
            "scheduler": {
                "type": "cos",
                "max_steps": 2,
                "learning_rate_alpha": 0.01,
            },
        },
    }
    cfg_path = root / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def test_finetune_and_render_apps(tmp_path, rng):
    from neuma_tpu.apps import finetune as finetune_app
    from neuma_tpu.apps import render as render_app

    data_path = tmp_path / "dataset"
    views = make_synthetic_dataset(data_path, rng)
    kernels_path, mesh_path = make_assets(tmp_path, rng)
    cfg_path = write_config(
        tmp_path, kernels_path, mesh_path, data_path, views
    )

    result = finetune_app.main(["-c", str(cfg_path)])
    assert result is not None
    assert all(np.isfinite(result.losses))

    exp_root = tmp_path / "logs" / "smoke"
    assert (exp_root / "finetune" / "init.npz").is_file()
    loras = list((exp_root / "finetune").glob("*_lora.npz"))
    assert loras, "no LoRA checkpoints written"

    # Render app on the trained outputs (few steps).
    render_app.main(
        [
            "-c", str(cfg_path),
            "-s", "3",
            "-vn", "smoketest",
            "-dv", views[0],
        ]
    )
    out = exp_root / "results" / "smoketest"
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 3


def test_evaluate_app(tmp_path, rng):
    from PIL import Image

    from neuma_tpu.apps import evaluate as eval_app

    rdir = tmp_path / "render"
    gdir = tmp_path / "gt"
    rdir.mkdir()
    gdir.mkdir()
    for i in range(3):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(rdir / f"f_{i:03d}.png")
        noisy = np.clip(
            img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(noisy).save(gdir / f"f_{i:03d}.png")
    means = eval_app.main(
        ["-r", str(rdir), "-g", str(gdir), "--crop", "0", "32", "0", "32"]
    )
    assert 20 < means["psnr"] < 50
    assert 0 < means["ssim"] <= 1

    # LPIPS provenance is pinned in the output: this container has
    # neither the official `lpips` package nor vendored VGG weights, so
    # the metric column MUST be the labeled random-VGG fallback — never
    # an ambiguous 'lpips' produced by random weights.
    try:
        import lpips  # noqa: F401

        expected = "lpips"
    except ImportError:
        from neuma_tpu.train.lpips import VENDORED_WEIGHTS

        expected = (
            "lpips_vgg" if VENDORED_WEIGHTS.is_file() else "lpips_vgg_rand"
        )
    lpips_keys = [k for k in means if k.startswith("lpips")]
    assert lpips_keys == [expected], means.keys()
    metrics_txt = (rdir / "metrics.txt").read_text()
    assert f"{expected}:" in metrics_txt
