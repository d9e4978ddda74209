"""Golden parity: import the reference's OWN torch modules (CPU) and
diff them against our JAX implementations on identical inputs.

The reference at /root/reference is importable CPU-side for most pure
components; heavyweight deps it declares but doesn't need for these
code paths (omegaconf's DictConfig annotation, warp's SVD kernels,
plyfile/mediapy) are shimmed below. The warp SVD shim implements the
documented reference convention (wp.svd3 + det-sign fix folding
reflections into sigma_3, svd.py:76-92) with torch.linalg.svd; all
tested material outputs are invariant to the remaining joint column-sign
ambiguity.

Covers (VERDICT round-1 item 5): schedulers, SSIM, l1, camera
world_view/full_proj matrices, SH eval, 3DGS covariance build, COLMAP
binary parsing + qvec, loralib LinearLoRA forward, meta material
forwards (elasticity + plasticity, with the real pretrained jelly
checkpoint), and the synthetic dataset reader (poses + composited
pixels).
"""
import math
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference repo unavailable"
)


def _install_shims():
    if "omegaconf" not in sys.modules:
        m = types.ModuleType("omegaconf")
        m.DictConfig = dict
        m.OmegaConf = None
        sys.modules["omegaconf"] = m
    if "plyfile" not in sys.modules:
        m = types.ModuleType("plyfile")
        m.PlyData = object
        m.PlyElement = object
        sys.modules["plyfile"] = m
    if "mediapy" not in sys.modules:
        sys.modules["mediapy"] = types.ModuleType("mediapy")
    if "simple_knn" not in sys.modules:
        pkg = types.ModuleType("simple_knn")
        c = types.ModuleType("simple_knn._C")
        c.distCUDA2 = None
        pkg._C = c
        sys.modules["simple_knn"] = pkg
        sys.modules["simple_knn._C"] = c
    if "diff_gaussian_rasterization" not in sys.modules:
        m = types.ModuleType("diff_gaussian_rasterization")
        m.GaussianRasterizationSettings = object
        m.GaussianRasterizer = object
        sys.modules["diff_gaussian_rasterization"] = m
    if "modules.nclaw.warp" not in sys.modules:
        # torch implementation of the reference SVD convention
        # (svd.py:60-96): svd3 then flip U/V's last column (and sigma_3)
        # wherever det < 0; returns (U, sigma, Vh).
        import torch.nn as nn

        class SVD(nn.Module):
            def forward(self, F):
                U, S, Vh = torch.linalg.svd(F)
                V = Vh.transpose(-1, -2)
                du = torch.det(U)
                dv = torch.det(V)
                flip_u = (du < 0).to(F.dtype)
                flip_v = (dv < 0).to(F.dtype)
                su = 1.0 - 2.0 * flip_u  # +-1
                sv = 1.0 - 2.0 * flip_v
                U = torch.cat(
                    [U[..., :2], U[..., 2:] * su[..., None, None]], dim=-1
                )
                V = torch.cat(
                    [V[..., :2], V[..., 2:] * sv[..., None, None]], dim=-1
                )
                S = torch.cat(
                    [S[..., :2], S[..., 2:] * (su * sv)[..., None]], dim=-1
                )
                return U, S, V.transpose(-1, -2)

        m = types.ModuleType("modules.nclaw.warp")
        m.SVD = SVD
        m.Tape = None
        m.CondTape = None
        sys.modules["modules.nclaw.warp"] = m
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))


_install_shims()


class Ns(dict):
    """Attribute-access dict standing in for omegaconf DictConfig."""

    __getattr__ = dict.get

    def __setattr__(self, k, v):
        self[k] = v


# --------------------------------------------------------------------------
def test_scheduler_parity():
    """LR curves over 1000 steps vs the reference schedulers
    (scheduler/__init__.py:29-118), both types, with/without warmup."""
    from modules.tune.scheduler import fetch_scheduler

    from neuma_tpu.train.schedulers import fetch_schedule

    cases = [
        {"type": "cos", "max_steps": 1000, "learning_rate_alpha": 0.025},
        {"type": "cos", "max_steps": 1000, "learning_rate_alpha": 0.04,
         "warm_up_end": 50},
        {"type": "exp", "max_steps": 1000, "lr_final": 1e-4},
        {"type": "exp", "max_steps": 1000, "lr_final": 1e-4,
         "warmup_steps": 100, "ramp": "cosine"},
    ]
    lr_init = 0.008
    for cfg in cases:
        ref_sched_obj = fetch_scheduler(Ns(cfg))
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr_init)
        ref_sched = ref_sched_obj.get_scheduler(opt, lr_init)
        ours = fetch_schedule(dict(cfg), lr_init)
        ref_lrs, our_lrs = [], []
        for step in range(1000):
            ref_lrs.append(opt.param_groups[0]["lr"])
            our_lrs.append(float(ours(step)))
            opt.step()
            ref_sched.step()
        np.testing.assert_allclose(
            our_lrs, ref_lrs, rtol=1e-5, atol=1e-10,
            err_msg=f"scheduler mismatch for {cfg}",
        )


def test_ssim_parity(rng):
    """Windowed SSIM vs reference loss_utils.ssim (loss_utils.py:26-66)."""
    from modules.d3gs.utils.loss_utils import ssim as ref_ssim

    from neuma_tpu.train.losses import ssim as our_ssim

    a = rng.random((3, 48, 64)).astype(np.float32)
    b = np.clip(
        a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1
    )
    ref = float(ref_ssim(torch.from_numpy(a), torch.from_numpy(b)))
    ours = float(our_ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_l1_parity(rng):
    from modules.d3gs.utils.loss_utils import l1_loss as ref_l1

    from neuma_tpu.train.losses import l1_loss as our_l1

    a = rng.random((3, 32, 32)).astype(np.float32)
    b = rng.random((3, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(
        float(our_l1(jnp.asarray(a), jnp.asarray(b))),
        float(ref_l1(torch.from_numpy(a), torch.from_numpy(b))),
        atol=1e-7,
    )


def test_camera_matrix_parity(rng):
    """world_view/full_proj/camera_center vs the reference's matrix math
    (graphics_utils.getWorld2View2/getProjectionMatrix composed exactly
    as cameras.py:54-57 — the Camera class itself hardcodes .cuda() and
    cannot instantiate here)."""
    from modules.d3gs.utils.graphics_utils import (
        getProjectionMatrix,
        getWorld2View2,
    )

    from neuma_tpu.render.camera import Camera

    for i in range(5):
        # random rotation via QR
        A = rng.standard_normal((3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        R = Q  # reader convention: transposed w2c rotation
        T = rng.standard_normal(3)
        fovx, fovy = 0.8 + 0.1 * i, 0.7 + 0.05 * i
        znear, zfar = 0.01, 100.0
        # cameras.py:54-57 verbatim, minus .cuda():
        world_view = torch.tensor(
            getWorld2View2(R, T, np.zeros(3), 1.0)
        ).transpose(0, 1)
        proj = getProjectionMatrix(
            znear=znear, zfar=zfar, fovX=fovx, fovY=fovy
        ).transpose(0, 1)
        full_proj = (
            world_view.unsqueeze(0).bmm(proj.unsqueeze(0))
        ).squeeze(0)
        cam_center = world_view.inverse()[3, :3]

        ours = Camera.from_Rt(R, T, fovx, fovy, 32, 24)
        np.testing.assert_allclose(
            np.asarray(ours.world_view), world_view.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours.full_proj), full_proj.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours.camera_center), cam_center.numpy(), atol=1e-5
        )


def test_sh_eval_parity(rng):
    """SH basis combination vs reference sh_utils.eval_sh (deg 0-3)."""
    from modules.d3gs.utils.sh_utils import eval_sh

    from neuma_tpu.ops.sh import sh_basis

    dirs = rng.standard_normal((50, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for deg in range(4):
        k = (deg + 1) ** 2
        sh = rng.standard_normal((50, 3, k)).astype(np.float32)
        ref = eval_sh(
            deg, torch.from_numpy(sh), torch.from_numpy(dirs)
        ).numpy()
        basis = np.asarray(sh_basis(deg, jnp.asarray(dirs)))
        ours = np.einsum("nk,nck->nc", basis, sh)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_covariance_build_parity(rng):
    """R S S^T R^T packed covariance vs reference
    general_utils.build_scaling_rotation + strip (general_utils.py:107-139)."""
    from modules.d3gs.utils.general_utils import (
        build_scaling_rotation,
        strip_symmetric,
    )

    from neuma_tpu.render.gaussians import build_covariance

    n = 30
    scales = rng.random((n, 3)).astype(np.float32) * 0.2
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    # general_utils hardcodes device="cuda" in its torch.zeros calls;
    # strip the kwarg for this CPU run (the math is unchanged).
    from unittest import mock

    orig_zeros = torch.zeros

    def cpu_zeros(*a, **k):
        k.pop("device", None)
        return orig_zeros(*a, **k)

    with mock.patch.object(torch, "zeros", cpu_zeros):
        L = build_scaling_rotation(
            torch.from_numpy(scales), torch.from_numpy(quats)
        )
        ref = strip_symmetric(L @ L.transpose(1, 2)).numpy()
    ours = np.asarray(
        build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_colmap_parity(tmp_path, rng):
    """Binary cameras parsing + qvec2rotmat vs reference colmap_loader."""
    from modules.d3gs.scene.colmap_loader import (
        qvec2rotmat,
        read_intrinsics_binary,
    )

    from neuma_tpu.data.colmap import qvec_to_rotmat, read_cameras_binary
    from test_realcapture import write_cameras_bin

    p = tmp_path / "cameras.bin"
    write_cameras_bin(p, 3111.1, 3222.2, 2376.0, 1336.0)
    ref = read_intrinsics_binary(str(p))
    ours = read_cameras_binary(p)
    assert set(ref.keys()) == set(ours.keys()) == {1}
    assert ref[1].model == ours[1].model == "PINHOLE"
    assert (ref[1].width, ref[1].height) == (ours[1].width, ours[1].height)
    np.testing.assert_allclose(ours[1].params, ref[1].params)

    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    np.testing.assert_allclose(
        qvec_to_rotmat(q), qvec2rotmat(q), atol=1e-12
    )


def test_loralib_linear_parity(rng):
    """LinearLoRA forward (unmerged, train mode) vs our tree-surgery
    LoRA on identical weights (loralib.py:162-224)."""
    from modules.nclaw.material.loralib import LinearLoRA

    from neuma_tpu.nn.mlp import apply_linear, merge_lora

    in_dim, out_dim, r, alpha = 13, 7, 4, 16
    ref = LinearLoRA(
        in_dim, out_dim, r=r, lora_alpha=alpha, bias=False
    )
    with torch.no_grad():
        ref.lora_B.copy_(torch.randn(out_dim, r) * 0.3)
    ref.train()

    params = {
        "kernel": jnp.asarray(ref.weight.detach().numpy().T),
        "lora_a": jnp.asarray(ref.lora_A.detach().numpy().T),
        "lora_b": jnp.asarray(ref.lora_B.detach().numpy().T),
        "lora_scale": jnp.float32(alpha / r),
    }
    x = rng.standard_normal((9, in_dim)).astype(np.float32)
    ref_y = ref(torch.from_numpy(x)).detach().numpy()
    our_y = np.asarray(apply_linear(params, jnp.asarray(x)))
    np.testing.assert_allclose(our_y, ref_y, rtol=1e-5, atol=1e-6)

    # eval() merges the weights in the reference; merge_lora must agree.
    ref.eval()
    merged_y = ref(torch.from_numpy(x)).detach().numpy()
    our_merged = np.asarray(
        apply_linear(merge_lora(params), jnp.asarray(x))
    )
    np.testing.assert_allclose(our_merged, merged_y, rtol=1e-4, atol=1e-5)


BASE_CKPT = REF / "experiments" / "base_models" / "jelly_0300.pt"


@pytest.mark.skipif(not BASE_CKPT.is_file(), reason="no base checkpoint")
def test_meta_material_forward_parity(rng):
    """InvariantFull elasticity + plasticity forwards with the REAL
    pretrained jelly checkpoint, reference module vs ours
    (meta.py:196-221, 467-489)."""
    from modules.nclaw.material.meta import (
        InvariantFullMetaElasticity as RefE,
        InvariantFullMetaPlasticity as RefP,
    )

    from neuma_tpu.data.torch_ckpt import load_base_model
    from neuma_tpu.materials import (
        InvariantFullMetaElasticity,
        InvariantFullMetaPlasticity,
        MetaMaterialConfig,
    )

    cfg = Ns(
        layer_widths=[64, 64],
        norm=None,
        nonlinearity="gelu",
        no_bias=True,
        normalize_input=True,
        alpha=1e-3,
    )
    ref_e = RefE(cfg)
    ref_p = RefP(cfg)
    ckpt = torch.load(BASE_CKPT, map_location="cpu")
    ref_e.load_state_dict(ckpt["elasticity"])
    ref_p.load_state_dict(ckpt["plasticity"])
    ref_e.eval(), ref_p.eval()

    mcfg = MetaMaterialConfig(
        layer_widths=(64, 64),
        norm=None,
        nonlinearity="gelu",
        no_bias=True,
        normalize_input=True,
        alpha=1e-3,
    )
    ours_e = InvariantFullMetaElasticity(mcfg)
    ours_p = InvariantFullMetaPlasticity(mcfg)
    pe, pp = load_base_model(BASE_CKPT, num_layers=2)

    F = (
        np.eye(3, dtype=np.float32)[None]
        + 0.15 * rng.standard_normal((40, 3, 3)).astype(np.float32)
    )
    with torch.no_grad():
        ref_stress = ref_e(torch.from_numpy(F)).numpy()
        ref_Fp = ref_p(torch.from_numpy(F)).numpy()
    our_stress = np.asarray(ours_e.apply(pe, jnp.asarray(F)))
    our_Fp = np.asarray(ours_p.apply(pp, jnp.asarray(F)))
    # float32 SVD paths differ in the last couple of ulps; stresses sit
    # at ~1e4 magnitude, so compare at 1e-3 relative.
    np.testing.assert_allclose(
        our_stress, ref_stress, rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(our_Fp, ref_Fp, rtol=1e-3, atol=1e-5)


def test_synthetic_reader_parity(tmp_path, rng):
    """readNeuMASyntheticCameras (dataset_readers.py:200-276) vs our
    reader on a fabricated dataset: poses, fovs, composited pixels."""
    from modules.d3gs.scene.dataset_readers import readNeuMASyntheticCameras

    from neuma_tpu.data.readers import read_neuma_synthetic_cameras
    from test_apps import make_synthetic_dataset

    root = tmp_path / "ds"
    make_synthetic_dataset(root, rng, size=32, n_views=2, n_steps=2)

    # The reference builds composited frames via
    # Image.fromarray(np.array(arr*255, dtype=np.byte), "RGB")
    # (dataset_readers.py) — int8 input that modern PIL rejects; older
    # PIL reinterpreted the buffer as uint8. Reproduce that behavior.
    from unittest import mock

    from PIL import Image

    orig_fromarray = Image.fromarray

    def compat_fromarray(obj, mode=None):
        if isinstance(obj, np.ndarray) and obj.dtype == np.int8:
            obj = obj.view(np.uint8)
        return orig_fromarray(obj, mode)

    with mock.patch.object(Image, "fromarray", compat_fromarray):
        ref = readNeuMASyntheticCameras(
            str(root), "data_dynamic.json", True, ".png"
        )
    ours = read_neuma_synthetic_cameras(
        root, "data_dynamic.json", True, ".png"
    )
    assert ref["views"] == ours["views"]
    assert ref["steps"] == ours["steps"]
    for rc, oc in zip(ref["cam_infos"], ours["records"]):
        assert (rc.view, rc.step) == (oc.view, oc.step)
        np.testing.assert_allclose(
            np.asarray(oc.camera.fov_x), rc.FovX, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(oc.camera.fov_y), rc.FovY, rtol=1e-6
        )
        # Build the same world_view the training stack derives.
        from neuma_tpu.render.camera import Camera

        ref_cam_ours = Camera.from_Rt(
            rc.R, rc.T, rc.FovX, rc.FovY, rc.width, rc.height
        )
        np.testing.assert_allclose(
            np.asarray(oc.camera.world_view),
            np.asarray(ref_cam_ours.world_view),
            atol=1e-5,
        )
        ref_img = np.asarray(rc.image, np.float32) / 255.0
        np.testing.assert_allclose(
            oc.image.transpose(1, 2, 0), ref_img, atol=1.0 / 255.0
        )


def test_pixel_gradient_parity_vs_torch_compositor(rng):
    """d(pixels)/d(opacity, colors) of the full rasterizer vs a
    torch-autograd re-execution of the brute-force CUDA-semantics
    compositor (straight-through 0.99 alpha cap = the CUDA backward
    quirk; per-pixel transmittance freeze at 1e-4)."""
    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_rasterize import make_scene

    from neuma_tpu.render.rasterize import (
        RasterConfig,
        _project,
        rasterize,
    )

    means3d, cov, opacity, colors, cam = make_scene(rng, n=18, size=24)
    bg = jnp.asarray([0.3, 0.2, 0.1])
    cfg = RasterConfig(
        max_pairs=4096, max_per_tile=32, segment=8, backend="jnp"
    )
    W = jnp.asarray(
        rng.standard_normal((3, cam.height, cam.width)), jnp.float32
    )

    def loss(op, col):
        img = rasterize(
            means3d, cov, op, cam, bg, colors_precomp=col, cfg=cfg
        )
        return jnp.sum(img * W)

    d_op, d_col = jax.jit(jax.grad(loss, argnums=(0, 1)))(opacity, colors)

    # torch side: projection constants from our _project, compositing
    # re-derived with torch autograd.
    depth, visible, mean2d, conic, radius = jax.jit(_project)(
        means3d, cov, cam
    )
    depth = np.asarray(depth)
    visible = np.asarray(visible)
    m2d = torch.tensor(np.asarray(mean2d), dtype=torch.float64)
    con = torch.tensor(np.asarray(conic), dtype=torch.float64)
    rad = np.asarray(radius)
    op_t = torch.tensor(
        np.asarray(opacity).reshape(-1), dtype=torch.float64,
        requires_grad=True,
    )
    col_t = torch.tensor(
        np.asarray(colors), dtype=torch.float64, requires_grad=True
    )
    Wt = torch.tensor(np.asarray(W), dtype=torch.float64)
    bg_t = torch.tensor(np.asarray(bg), dtype=torch.float64)

    H, Wd = cam.height, cam.width
    order = np.argsort(np.where(visible, depth, np.inf))
    ys, xs = np.meshgrid(np.arange(H), np.arange(Wd), indexing="ij")
    px = torch.tensor(xs.reshape(-1), dtype=torch.float64)
    py = torch.tensor(ys.reshape(-1), dtype=torch.float64)
    tile_x = (xs // 16).reshape(-1)
    tile_y = (ys // 16).reshape(-1)

    T = torch.ones(H * Wd, dtype=torch.float64)
    C = torch.zeros(H * Wd, 3, dtype=torch.float64)
    done = torch.zeros(H * Wd, dtype=torch.bool)
    for g in order:
        if not visible[g] or rad[g] <= 0:
            continue
        m2 = m2d[g]
        in_rect = (
            (np.floor((float(m2[0]) - rad[g]) / 16) <= tile_x)
            & (tile_x <= np.floor((float(m2[0]) + rad[g] + 15) / 16) - 1)
            & (np.floor((float(m2[1]) - rad[g]) / 16) <= tile_y)
            & (tile_y <= np.floor((float(m2[1]) + rad[g] + 15) / 16) - 1)
        )
        in_rect = torch.tensor(in_rect)
        dx = m2[0] - px
        dy = m2[1] - py
        power = (
            -0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
            - con[g, 1] * dx * dy
        )
        alpha_raw = op_t[g] * torch.exp(power)
        # CUDA quirk: forward caps at 0.99, backward ignores the cap.
        alpha = alpha_raw + (
            torch.clamp_max(alpha_raw, 0.99) - alpha_raw
        ).detach()
        guards = in_rect & (power <= 0.0) & (alpha.detach() >= 1.0 / 255.0)
        test_T = T * (1.0 - alpha)
        contribute = guards & ~done & (test_T.detach() >= 1e-4)
        w = torch.where(contribute, alpha * T, torch.zeros(()))
        C = C + w[:, None] * col_t[g][None, :]
        T = torch.where(contribute, test_T, T)
        done = done | (guards & (test_T.detach() < 1e-4))
    img_t = C + T[:, None] * bg_t[None, :]
    loss_t = (img_t.reshape(H, Wd, 3).permute(2, 0, 1) * Wt).sum()
    loss_t.backward()

    np.testing.assert_allclose(
        np.asarray(d_col), col_t.grad.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_op).reshape(-1), op_t.grad.numpy(), atol=1e-4
    )
