"""Per-family e2e smokes on the actual translated configs.

Each test loads a real file from ``configs/`` (the 1:1 translations of
``/root/reference/experiments/configs/``), overrides only paths/sizes to
fabricated data, and drives the corresponding app end-to-end:

* synthetic family (``finetune-cc``): noslip grounding with the real
  pretrained plasticine base checkpoint (plasticity-active), both stages
  + the render app;
* demo family (``multiobj-bb-cc``): two-object ComposeMaterial inference
  from pre-populated asset dirs.

(The realworld finetune + regist families are covered in
``test_realcapture.py``; all 18 configs are schema-validated here.)
"""
from pathlib import Path

import numpy as np
import pytest
import yaml

from test_apps import make_assets, make_synthetic_dataset

CONFIGS = Path(__file__).resolve().parent.parent / "configs"
BASE_CKPTS = Path("/root/reference/experiments/base_models")


def load_cfg(rel):
    with open(CONFIGS / rel) as f:
        return yaml.safe_load(f)


def deep_update(base, upd):
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


ALL_CONFIGS = sorted(p.relative_to(CONFIGS) for p in CONFIGS.rglob("*.yaml"))


def test_all_reference_configs_translated():
    """configs/ mirrors /root/reference/experiments/configs/ 1:1."""
    ref = Path("/root/reference/experiments/configs")
    ref_names = sorted(
        str(p.relative_to(ref)) for p in ref.rglob("*.yaml")
    )
    ours = [str(p) for p in ALL_CONFIGS]
    assert ref_names == ours


@pytest.mark.parametrize("rel", [str(p) for p in ALL_CONFIGS])
def test_config_schema(rel):
    """Every translated config parses and carries the family's key
    sections with coherent types."""
    cfg = load_cfg(rel)
    assert isinstance(cfg.get("seed"), int)
    if "regist" in rel:
        assert "register" in cfg and "INIT_R" in cfg["register"]
        assert cfg["video_data"]["camera_type"] == "RealCapture"
    elif rel.startswith("demo/"):
        assert isinstance(cfg["objects"], list) and cfg["objects"]
        for obj in cfg["objects"]:
            assert "constitution" in obj and "particle_data" in obj
            assert "vel" in obj["particle_data"]
    else:
        assert "constitution" in cfg and "velocity" in cfg
        g = cfg["sim"]["num_grids"]
        if rel.startswith("realworld/"):
            assert g == 70 and cfg["sim"]["gravity"][2] == 9.8
            assert cfg["constitution"]["substeps"] == 20
        else:
            assert g == 32
    sim = cfg.get("sim")
    if sim:
        assert sim["bc"] in ("freeslip", "noslip")


@pytest.mark.skipif(
    not (BASE_CKPTS / "plasticine_0300.pt").is_file(),
    reason="reference base checkpoints unavailable",
)
def test_synthetic_cc_finetune_and_render(tmp_path, rng):
    """configs/synthetic/finetune-cc.yaml: plasticine base (plasticity-
    active), noslip, through both finetune stages and the render app."""
    from neuma_tpu.apps import finetune as finetune_app
    from neuma_tpu.apps import render as render_app

    data_path = tmp_path / "dataset"
    views = make_synthetic_dataset(
        data_path, rng, size=48, views=["d_2"], n_steps=4
    )
    kernels, mesh = make_assets(tmp_path, rng)

    cfg = load_cfg("synthetic/finetune-cc.yaml")
    deep_update(
        cfg,
        {
            "root": str(tmp_path / "logs"),
            "data_root": str(tmp_path / "sim_data"),
            "pretrained_ckpt": str(BASE_CKPTS / "plasticine_0300.pt"),
            "gaussian": {"sh_degree": 2, "kernels_path": str(kernels)},
            "video_data": {"data": {"path": str(data_path)}},
            "sim": {"num_grids": 16},
            "particle_data": {
                "shape": {
                    "ori_bounds": [[0.2, 0.25, 0.2], [0.8, 0.85, 0.8]],
                    "sim_bounds": [[0.2, 0.25, 0.2], [0.8, 0.85, 0.8]],
                },
                "mesh_path": str(mesh),
                "mesh_sample_mode": "uniform",
                "mesh_sample_resolution": 10,
            },
            "raster": {
                "max_pairs": 8192, "max_per_tile": 256, "segment": 16,
            },
            "constitution": {
                "num_epochs": 2,
                "num_frames": 2,
                "elasticity_scheduler": {"max_steps": 2},
                "plasticity_scheduler": {"max_steps": 2},
            },
            "velocity": {
                "num_epochs": 2,
                "num_frames": 2,
                "scheduler": {"max_steps": 2},
            },
        },
    )
    cfg_path = tmp_path / "cc.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    result = finetune_app.main(["-c", str(cfg_path)])
    assert result is not None and all(np.isfinite(result.losses))
    exp_root = tmp_path / "logs" / "claycat-v1"
    assert (exp_root / "finetune" / "init.npz").is_file()
    assert list((exp_root / "finetune").glob("*_lora.npz"))

    render_app.main(
        ["-c", str(cfg_path), "-s", "2", "-vn", "ccsmoke", "-dv", "d_2"]
    )
    assert len(list((exp_root / "results" / "ccsmoke").glob("*.png"))) == 2


@pytest.mark.parametrize(
    "rel,base",
    [
        ("synthetic/finetune-hb.yaml", "sand_0300.pt"),  # viscous honey
        ("synthetic/finetune-sf.yaml", "sand_0300.pt"),  # Drucker-Prager
        ("synthetic/finetune-jd.yaml", "jelly_0300.pt"),  # hyperelastic
        ("synthetic/finetune-rp.yaml", "plasticine_0300.pt"),  # von Mises
    ],
)
def test_synthetic_family_grounding_smoke(tmp_path, rng, rel, base):
    """Every remaining synthetic family (hb viscous / sf sand / jd
    jelly / rp rubber) drives BOTH finetune stages + the render app on
    its translated config — each exercises a different constitutive
    regime (VolumeElasticity+viscosity, Drucker-Prager, hyperelastic,
    von Mises) through its actual pretrained base."""
    if not (BASE_CKPTS / base).is_file():
        pytest.skip("reference base checkpoints unavailable")
    from neuma_tpu.apps import finetune as finetune_app
    from neuma_tpu.apps import render as render_app

    cfg = load_cfg(rel)
    exp_name = cfg["name"]
    view = cfg["velocity"]["views"][0]  # d_2 (hb/sf) or d_3 (jd/rp)

    data_path = tmp_path / "dataset"
    make_synthetic_dataset(
        data_path, rng, size=48, views=[view], n_steps=4
    )
    kernels, mesh = make_assets(tmp_path, rng)
    deep_update(
        cfg,
        {
            "root": str(tmp_path / "logs"),
            "data_root": str(tmp_path / "sim_data"),
            "pretrained_ckpt": str(BASE_CKPTS / base),
            "gaussian": {"sh_degree": 2, "kernels_path": str(kernels)},
            "video_data": {"data": {"path": str(data_path)}},
            "sim": {"num_grids": 16},
            "particle_data": {
                "shape": {
                    "ori_bounds": [[0.2, 0.25, 0.2], [0.8, 0.85, 0.8]],
                    "sim_bounds": [[0.2, 0.25, 0.2], [0.8, 0.85, 0.8]],
                },
                "mesh_path": str(mesh),
                "mesh_sample_mode": "uniform",
                "mesh_sample_resolution": 10,
            },
            "raster": {
                "max_pairs": 8192, "max_per_tile": 256, "segment": 16,
            },
            "constitution": {
                "num_epochs": 2,
                "num_frames": 2,
                "elasticity_scheduler": {"max_steps": 2},
                "plasticity_scheduler": {"max_steps": 2},
            },
            "velocity": {
                "num_epochs": 2,
                "num_frames": 2,
                "scheduler": {"max_steps": 2},
            },
        },
    )
    cfg_path = tmp_path / "family.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    result = finetune_app.main(["-c", str(cfg_path)])
    assert result is not None and all(np.isfinite(result.losses))
    exp_root = tmp_path / "logs" / exp_name
    assert (exp_root / "finetune" / "init.npz").is_file()
    assert list((exp_root / "finetune").glob("*_lora.npz"))

    render_app.main(
        ["-c", str(cfg_path), "-s", "2", "-vn", "smoke", "-dv", view]
    )
    assert len(list((exp_root / "results" / "smoke").glob("*.png"))) == 2


@pytest.mark.skipif(
    not (BASE_CKPTS / "jelly_0300.pt").is_file(),
    reason="reference base checkpoints unavailable",
)
def test_demo_multiobj_inference(tmp_path, rng):
    """configs/demo/multiobj-bb-cc.yaml: two-object ComposeMaterial
    rollout from pre-populated assets through the inference app."""
    from neuma_tpu.apps import inference as inference_app
    from neuma_tpu.data.prepare import prepare_simulation_data

    data_path = tmp_path / "dataset"
    make_synthetic_dataset(
        data_path, rng, size=48, views=["e_2"], n_steps=2,
        subfolder="eval_dynamic",
    )

    cfg = load_cfg("demo/multiobj-bb-cc.yaml")
    for i, obj in enumerate(cfg["objects"]):
        obj_dir = tmp_path / f"obj{i}"
        obj_dir.mkdir()
        kernels, mesh = make_assets(obj_dir, rng)
        asset_root = tmp_path / "assets" / obj["sim_data_name"]
        prepare_simulation_data(
            save_dir=asset_root,
            kernels_path=kernels,
            mesh_path=mesh,
            mesh_sample_mode="uniform",
            mesh_sample_resolution=8,
            sh_degree=2,
            max_particles=8,
        )
        obj["data_root"] = str(asset_root)
        obj["gaussian"]["sh_degree"] = 2
        obj["constitution"]["load_lora"] = None
        # Fabricated assets live in the unit box; identity remap keeps
        # the rescale assertion satisfied while the two objects still
        # occupy different sim regions.
        obj["particle_data"]["shape"]["ori_bounds"] = [
            [0.2, 0.25, 0.2], [0.8, 0.85, 0.8],
        ]
        obj["particle_data"]["shape"]["sim_bounds"] = (
            [[0.1, 0.3, 0.1], [0.45, 0.65, 0.45]]
            if i == 0
            else [[0.55, 0.3, 0.55], [0.9, 0.65, 0.9]]
        )
    deep_update(
        cfg,
        {
            "root": str(tmp_path / "results"),
            "video_data": {"data": {"path": str(data_path)}},
            "sim": {"num_grids": 16},
            "raster": {"max_pairs": 8192, "max_per_tile": 256},
        },
    )
    cfg_path = tmp_path / "multiobj.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    inference_app.main(
        [
            "-c", str(cfg_path),
            "-s", "2",
            "-vn", "mo",
            "-dv", "e_2",
            "-sp", "particles",
        ]
    )
    out = tmp_path / "results" / "mo"
    assert len(list((out / "images").glob("e_2_*.png"))) == 3
    assert list((out / "particles").glob("*.ply"))
