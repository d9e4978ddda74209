"""RealCapture/COLMAP reader coverage + real-world family e2e smokes.

Fabricates a miniature RealCapture dataset honoring the reference reader
contract (``modules/d3gs/scene/dataset_readers.py:279-365``): COLMAP
``sparse/0/cameras.bin`` PINHOLE intrinsics at the 4752x2672 capture
scale, ``cameras_calib.json`` Rodrigues extrinsics per view,
``dynamics/{view}_{step}.jpg`` frames (step NOT zero-padded) and
``dynamic_masks/{view}_{step}.png`` masks — then asserts the intrinsics
rescale, extrinsic recovery, mask compositing and ``read_mask_only``
semantics, and drives the registration + realworld-finetune apps through
the actual translated configs.
"""
import json
import struct
from pathlib import Path

import numpy as np
import pytest
import yaml

CONFIGS = Path(__file__).resolve().parent.parent / "configs"


def inv_rodrigues(R):
    """Rotation matrix -> axis-angle (log map), for fabricating rvecs."""
    theta = np.arccos(np.clip((np.trace(R) - 1) / 2, -1.0, 1.0))
    if theta < 1e-12:
        return np.zeros(3)
    axis = (
        np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
        )
        / (2 * np.sin(theta))
    )
    return axis * theta


def write_cameras_bin(path, fx, fy, cx, cy, width=4752, height=2672):
    """COLMAP binary cameras file with one PINHOLE camera (id 1)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))  # PINHOLE
        f.write(struct.pack("<4d", fx, fy, cx, cy))


def make_real_capture(
    root: Path,
    rng,
    views=("r_0", "r_1"),
    n_steps=3,
    width=96,
    height=64,
    fov=0.9,
):
    """Fabricated capture; cameras orbit the world point (0.5, 0.5, -0.5)
    (realworld ori_bounds put the object at negative z)."""
    from PIL import Image

    from neuma_tpu.render.camera import fov2focal

    (root / "sparse" / "0").mkdir(parents=True)
    (root / "dynamics").mkdir()
    (root / "dynamic_masks").mkdir()

    # Reader computes fx = params[0] * width / 4752 and pairs
    # fov_y = focal2fov(fx, height); pick capture-scale params so the
    # rescaled focals give the target fovs under that (quirky) pairing.
    f_for_fovy = fov2focal(fov, height)  # becomes rescaled params[0]
    f_for_fovx = fov2focal(fov, width)  # becomes rescaled params[1]
    write_cameras_bin(
        root / "sparse" / "0" / "cameras.bin",
        fx=f_for_fovy * 4752 / width,
        fy=f_for_fovx * 2672 / height,
        cx=4752 / 2,
        cy=2672 / 2,
    )

    target = np.array([0.5, 0.5, -0.5])
    calib = {}
    eyes = {}
    for vi, view in enumerate(views):
        eye = target + np.array(
            [1.4 * np.cos(0.8 * vi), 0.4, 1.4 * np.sin(0.8 * vi)]
        )
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        # world->cam rotation rows = camera axes (COLMAP: x right,
        # y down, z forward).
        R_wc = np.stack([right, down, fwd])
        calib[view] = {
            "rvecs": inv_rodrigues(R_wc).tolist(),
            "tvecs": (-R_wc @ eye).tolist(),
        }
        eyes[view] = eye
        for step in range(n_steps):
            img = (rng.random((height, width, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / "dynamics" / f"{view}_{step}.jpg"
            )
            mask = np.zeros((height, width), np.uint8)
            mask[height // 4 : -height // 4, width // 4 : -width // 4] = 255
            Image.fromarray(mask).save(
                root / "dynamic_masks" / f"{view}_{step}.png"
            )
    with open(root / "cameras_calib.json", "w") as f:
        json.dump(calib, f)
    return eyes


@pytest.fixture()
def capture(tmp_path, rng):
    root = tmp_path / "capture"
    root.mkdir()
    eyes = make_real_capture(root, rng)
    return root, eyes


def test_intrinsics_rescale_and_fov(capture):
    """fx = params[0]*width/4752 with the reference's fov pairing
    (dataset_readers.py:300-307)."""
    from neuma_tpu.data.readers import read_real_capture_cameras

    root, _ = capture
    info = read_real_capture_cameras(
        str(root), white_background=False, width=96, height=64
    )
    cam = info["records"][0].camera
    assert cam.width == 96 and cam.height == 64
    np.testing.assert_allclose(cam.fov_y, 0.9, rtol=1e-6)
    np.testing.assert_allclose(cam.fov_x, 0.9, rtol=1e-6)


def test_rodrigues_extrinsics_recover_camera_center(capture):
    from neuma_tpu.data.readers import read_real_capture_cameras

    root, eyes = capture
    info = read_real_capture_cameras(
        str(root), white_background=False, width=96, height=64
    )
    for rec in info["records"]:
        np.testing.assert_allclose(
            np.asarray(rec.camera.camera_center),
            eyes[rec.view],
            atol=1e-5,
        )


def test_mask_compositing(capture, rng):
    """rgb = img*mask + bg*(1-mask); black bg zeroes masked-out pixels."""
    from PIL import Image

    from neuma_tpu.data.readers import read_real_capture_cameras

    root, _ = capture
    info = read_real_capture_cameras(
        str(root), white_background=False, width=96, height=64,
        used_views=["r_0"],
    )
    rec = info["records"][0]
    img = np.array(
        Image.open(root / "dynamics" / f"r_0_{rec.step}.jpg")
    )
    mask = np.array(
        Image.open(root / "dynamic_masks" / f"r_0_{rec.step}.png")
    )
    expect = (img / 255.0) * (mask[:, :, None] / 255.0)
    np.testing.assert_allclose(
        rec.image, expect.transpose(2, 0, 1).astype(np.float32), atol=1e-6
    )
    # white background fills the masked-out region instead
    info_w = read_real_capture_cameras(
        str(root), white_background=True, width=96, height=64,
        used_views=["r_0"],
    )
    corner = info_w["records"][0].image[:, 0, 0]
    np.testing.assert_allclose(corner, 1.0, atol=1e-6)


def test_read_mask_only(capture):
    """Silhouette mode: image IS the mask repeated on 3 channels
    (dataset_readers.py:345-347)."""
    from neuma_tpu.data.readers import read_real_capture_cameras

    root, _ = capture
    info = read_real_capture_cameras(
        str(root), white_background=False, width=96, height=64,
        read_mask_only=True, used_views=["r_0"],
    )
    img = info["records"][0].image
    assert set(np.unique(img)) <= {0.0, 1.0}
    np.testing.assert_array_equal(img[0], img[1])
    np.testing.assert_array_equal(img[1], img[2])
    assert img[0, 32, 48] == 1.0 and img[0, 0, 0] == 0.0


def test_cameras_text_fallback(tmp_path, rng):
    """cameras.txt is parsed when cameras.bin is absent."""
    from neuma_tpu.data.readers import read_real_capture_cameras

    root = tmp_path / "cap2"
    root.mkdir()
    make_real_capture(root, rng, views=("r_0",), n_steps=1)
    cam_bin = root / "sparse" / "0" / "cameras.bin"
    from neuma_tpu.data.colmap import read_cameras_binary

    cams = read_cameras_binary(cam_bin)
    p = cams[1].params
    (root / "sparse" / "0" / "cameras.txt").write_text(
        f"# comment\n1 PINHOLE 4752 2672 {p[0]} {p[1]} {p[2]} {p[3]}\n"
    )
    cam_bin.unlink()
    info = read_real_capture_cameras(
        str(root), white_background=False, width=96, height=64
    )
    np.testing.assert_allclose(
        info["records"][0].camera.fov_y, 0.9, rtol=1e-6
    )


def test_exclude_steps_and_used_views(capture):
    from neuma_tpu.data.readers import read_real_capture_cameras

    root, _ = capture
    info = read_real_capture_cameras(
        str(root), white_background=False, width=96, height=64,
        exclude_steps=[-1, 1], used_views=["r_1"],
    )
    assert info["views"] == ["r_1"]
    assert info["steps"] == [0, 2]


# --------------------------------------------------------------------------
# Family e2e: the translated realworld configs through the real apps.
# --------------------------------------------------------------------------

def load_repo_config(rel) -> dict:
    with open(CONFIGS / rel) as f:
        return yaml.safe_load(f)


def deep_update(base: dict, upd: dict) -> dict:
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def make_kernels_and_mesh(root: Path, rng, center, extent=0.22):
    """Kernels PLY + mesh OBJ around ``center`` (world coords)."""
    from neuma_tpu.data.mesh import TriMesh, make_icosphere
    from neuma_tpu.render.gaussians import create_from_points

    mesh = make_icosphere(radius=extent, subdivisions=2)
    mesh = TriMesh(
        vertices=mesh.vertices + np.asarray(center), faces=mesh.faces
    )
    mesh_path = root / "mesh.obj"
    mesh.export_obj(mesh_path)
    pts = mesh.sample_surface(70, rng).astype(np.float32)
    pack = create_from_points(
        pts, rng.random((70, 3)).astype(np.float32), sh_degree=0
    )
    kernels_path = root / "kernels.ply"
    pack.to_ply(kernels_path)
    return kernels_path, mesh_path


def test_regist_app_on_translated_config(tmp_path, rng):
    """configs/realworld/regist-bun.yaml e2e on a fabricated capture."""
    from neuma_tpu.apps import regist as regist_app

    cap = tmp_path / "capture"
    cap.mkdir()
    make_real_capture(cap, rng)
    kernels, mesh = make_kernels_and_mesh(
        tmp_path, rng, center=(0.0, 0.0, 0.0), extent=1.0
    )

    cfg = load_repo_config("realworld/regist-bun.yaml")
    deep_update(
        cfg,
        {
            "root": str(tmp_path / "logs"),
            "name": "regist-smoke",
            "gaussian": {"kernels_path": str(kernels)},
            "particle_data": {
                "mesh_path": str(mesh),
                "mesh_sample_resolution": 8,
            },
            "video_data": {
                "data": {
                    "path": str(cap),
                    "used_views": ["r_0", "r_1"],
                    "width": 96,
                    "height": 64,
                }
            },
            "raster": {"max_pairs": 16384, "max_per_tile": 256},
            "register": {
                "iterations": 4,
                "INIT_R": [10, 0, 0],
                "INIT_T": [0.4, 0.4, -0.5],
                "INIT_S": 0.2,
            },
        },
    )
    cfg_path = tmp_path / "regist.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    regist_app.main(["-c", str(cfg_path)])
    out = tmp_path / "logs" / "regist-smoke"
    assert (out / "registered_params.npz").is_file()
    assert (out / "registered_kernels.ply").is_file()
    assert (out / "registered_particles.ply").is_file()
    # Idempotency: second run must be a no-op, not a refit.
    regist_app.main(["-c", str(cfg_path)])


def test_realworld_finetune_mask_only_e2e(tmp_path, rng):
    """configs/realworld/finetune-burger.yaml (read_mask_only, +z gravity,
    substeps>1, RealCapture reader) at tiny sizes through both stages."""
    from neuma_tpu.apps import finetune as finetune_app
    from neuma_tpu.data.ply import save_ply_points

    cap = tmp_path / "capture"
    cap.mkdir()
    make_real_capture(cap, rng, views=("r_0",), n_steps=4)
    # Object lives at negative z in world coords (burger ori_bounds
    # [0,0,-1.015]..[1,1,-0.015]); registered particles + kernels there.
    center = (0.5, 0.5, -0.5)
    kernels, _ = make_kernels_and_mesh(tmp_path, rng, center=center)
    pts = (
        rng.random((120, 3)).astype(np.float32) * 0.4
        + np.asarray(center, np.float32)
        - 0.2
    )
    particles_path = tmp_path / "registered_particles.ply"
    save_ply_points(particles_path, pts)

    cfg = load_repo_config("realworld/finetune-burger.yaml")
    deep_update(
        cfg,
        {
            "root": str(tmp_path / "logs"),
            "name": "burger-smoke",
            "data_root": str(tmp_path / "sim_data"),
            "pretrained_ckpt": None,
            "gaussian": {"kernels_path": str(kernels)},
            "video_data": {
                "data": {
                    "path": str(cap),
                    "used_views": ["r_0"],
                    "width": 96,
                    "height": 64,
                }
            },
            "sim": {"num_grids": 16},
            "particle_data": {"particles_path": str(particles_path)},
            "raster": {
                "max_pairs": 16384,
                "max_per_tile": 256,
                "segment": 16,
            },
            "constitution": {
                "num_epochs": 2,
                "num_frames": 2,
                "substeps": 2,
                "views": ["r_0"],
                "elasticity": {"layer_widths": [16, 16]},
                "plasticity": {"layer_widths": [16, 16]},
                "lora": {"r": 4, "alpha": 4},
                "elasticity_scheduler": {"max_steps": 2},
                "plasticity_scheduler": {"max_steps": 2},
            },
            "velocity": {
                "num_epochs": 2,
                "num_frames": 2,
                "substeps": 2,
                "views": ["r_0"],
                "scheduler": {"max_steps": 2},
            },
        },
    )
    cfg_path = tmp_path / "burger.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    result = finetune_app.main(["-c", str(cfg_path)])
    assert result is not None
    assert all(np.isfinite(result.losses))
    out = tmp_path / "logs" / "burger-smoke" / "finetune"
    assert (out / "init.npz").is_file()
    assert list(out.glob("*_lora.npz"))
