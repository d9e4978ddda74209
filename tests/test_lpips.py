"""LPIPS-VGG: JAX implementation vs a hand-built torch reference.

Pretrained weights are unavailable in this container (no egress), so the
*architecture* is golden-tested: a torchvision-layout VGG16 + the LPIPS
v0.1 formula are re-implemented in torch here, loaded with the SAME
(random) weights as the JAX path, and the two must agree to float
precision. If the official ``lpips`` package is present the test also
compares against it directly (skipped otherwise).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neuma_tpu.train.lpips import (
    LPIPSParams,
    VGG16_STAGES,
    _SHIFT,
    _SCALE,
    _init_random,
    lpips,
)

torch = pytest.importorskip("torch")


def torch_lpips_reference(params: LPIPSParams, img0, img1):
    """Independent torch re-implementation of scaling + VGG16 taps +
    unit-normalize + heads + spatial mean (lpips v0.1 semantics)."""
    import torch.nn.functional as F

    def features(x):
        taps = []
        i = 0
        for si, (c_out, n) in enumerate(VGG16_STAGES):
            if si > 0:
                x = F.max_pool2d(x, 2, 2)
            for _ in range(n):
                w, b = params.convs[i]
                x = F.conv2d(
                    x, torch.from_numpy(w), torch.from_numpy(b), padding=1
                )
                x = F.relu(x)
                i += 1
            taps.append(x)
        return taps

    shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
    scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)
    x0 = (torch.from_numpy(img0) * 2 - 1 - shift) / scale
    x1 = (torch.from_numpy(img1) * 2 - 1 - shift) / scale

    def unit(x):
        return x / (torch.sqrt((x * x).sum(1, keepdim=True)) + 1e-10)

    total = 0.0
    for t0, t1, head in zip(features(x0), features(x1), params.heads):
        d = (unit(t0) - unit(t1)) ** 2
        w = torch.from_numpy(head).view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean(dim=(1, 2))
    return total.numpy()


def test_lpips_matches_torch_reference(rng):
    params = _init_random(seed=3)
    img0 = rng.random((2, 3, 40, 48)).astype(np.float32)
    img1 = rng.random((2, 3, 40, 48)).astype(np.float32)
    ours = np.asarray(lpips(jnp.asarray(img0), jnp.asarray(img1), params))
    ref = torch_lpips_reference(params, img0, img1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_lpips_basic_properties(rng):
    params = _init_random()
    img = rng.random((1, 3, 32, 32)).astype(np.float32)
    same = np.asarray(lpips(jnp.asarray(img), jnp.asarray(img), params))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    other = np.clip(img + 0.3 * rng.standard_normal(img.shape), 0, 1)
    diff = np.asarray(
        lpips(jnp.asarray(img), jnp.asarray(other.astype(np.float32)), params)
    )
    assert diff > same


def test_lpips_metric_wrapper_and_evaluate_app(tmp_path, rng):
    """Evaluate CLI reports the metric under its honest name when no
    pretrained weights are vendored."""
    from PIL import Image

    from neuma_tpu.apps import evaluate as eval_app

    rdir, gdir = tmp_path / "r", tmp_path / "g"
    rdir.mkdir(), gdir.mkdir()
    for i in range(2):
        a = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(a).save(rdir / f"f_{i:03d}.png")
        b = np.clip(
            a.astype(int) + rng.integers(-12, 12, a.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(b).save(gdir / f"f_{i:03d}.png")
    means = eval_app.main(
        ["-r", str(rdir), "-g", str(gdir), "--crop", "0", "40", "0", "40"]
    )
    lpips_keys = [k for k in means if k.startswith("lpips")]
    assert lpips_keys, f"no lpips metric reported: {means}"
    # Honest naming: without vendored weights this must be the _rand tag.
    from neuma_tpu.train.lpips import VENDORED_WEIGHTS

    if not VENDORED_WEIGHTS.is_file():
        try:
            import lpips  # noqa: F401  official package present
        except ImportError:
            assert lpips_keys == ["lpips_vgg_rand"]
    assert np.isfinite(means[lpips_keys[0]])


@pytest.mark.skipif(
    pytest.importorskip("importlib").util.find_spec("lpips") is None,
    reason="official lpips package not installed",
)
def test_lpips_matches_official_package(rng):
    """With the official package + vendored npz, values match to 1e-4."""
    import lpips as lpips_pkg

    from neuma_tpu.train.lpips import export_torch_lpips_to_npz, load_lpips_params

    npz = "/tmp/lpips_vgg_test.npz"
    export_torch_lpips_to_npz(npz)
    params = load_lpips_params(npz)
    img0 = rng.random((1, 3, 64, 64)).astype(np.float32)
    img1 = rng.random((1, 3, 64, 64)).astype(np.float32)
    ours = float(lpips(jnp.asarray(img0), jnp.asarray(img1), params)[0])
    model = lpips_pkg.LPIPS(net="vgg")
    theirs = float(
        model(
            torch.from_numpy(img0 * 2 - 1), torch.from_numpy(img1 * 2 - 1)
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
