"""LPIPS-VGG perceptual metric in pure JAX.

Replaces the reference's ``torchmetrics`` LPIPS-VGG usage
(``experiments/evaluation.py:27-98``). Architecture follows the official
LPIPS v0.1 implementation (Zhang et al., CVPR 2018):

* input scaling layer: ``(x*2-1 - shift) / scale`` with the published
  shift/scale constants;
* torchvision-layout VGG16 (conv 3x3 pad 1 + ReLU, maxpool2) tapped at
  relu1_2, relu2_2, relu3_3, relu4_3, relu5_3;
* per-layer channel unit-normalization, squared difference, 1x1
  non-negative linear heads, spatial mean, sum over layers.

Weights: this container has no network egress and no vendored VGG/LPIPS
checkpoints, so pretrained values cannot be shipped. Three sources, in
order:

1. an ``lpips_vgg.npz`` next to this file (vendor it with
   ``export_torch_lpips_to_npz`` on a machine that has the ``lpips``
   package);
2. a user-supplied npz path;
3. a clearly-labeled deterministic random-weights fallback
   (``lpips_vgg_rand``) — random VGG features are a known-serviceable
   perceptual distance (the LPIPS paper's own `rand` baseline), but the
   metric name makes the difference impossible to miss.

The architecture (not the values) is golden-tested against a hand-built
torch VGG16+LPIPS with identical weights in
``tests/test_lpips.py`` (torch is CPU-importable here).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# VGG16 configuration: (out_channels, n_convs) per stage; taps after the
# last ReLU of each stage.
VGG16_STAGES: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3),
)

# Official LPIPS scaling layer constants (lpips/lpips.py ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VENDORED_WEIGHTS = Path(__file__).resolve().parent / "lpips_vgg.npz"


@dataclasses.dataclass
class LPIPSParams:
    convs: List[Tuple[np.ndarray, np.ndarray]]  # [(OIHW kernel, bias)]
    heads: List[np.ndarray]  # [(C,) nonneg linear weights] per tap
    pretrained: bool


def _init_random(seed: int = 0) -> LPIPSParams:
    """Deterministic kaiming-style random VGG + uniform heads."""
    rng = np.random.default_rng(seed)
    convs = []
    c_in = 3
    for c_out, n in VGG16_STAGES:
        for _ in range(n):
            fan_in = c_in * 9
            w = rng.normal(
                0.0, np.sqrt(2.0 / fan_in), (c_out, c_in, 3, 3)
            ).astype(np.float32)
            b = np.zeros(c_out, np.float32)
            convs.append((w, b))
            c_in = c_out
    heads = [
        np.full((c, 1), 1.0 / c, np.float32)
        for c, _ in VGG16_STAGES
    ]
    heads = [h.reshape(-1) for h in heads]
    return LPIPSParams(convs=convs, heads=heads, pretrained=False)


def load_lpips_params(path: Optional[Path] = None) -> LPIPSParams:
    """npz layout: conv{i}_w (OIHW), conv{i}_b, head{j}_w (C,)."""
    p = Path(path) if path is not None else VENDORED_WEIGHTS
    if not p.is_file():
        return _init_random()
    d = np.load(p)
    convs = [
        (d[f"conv{i}_w"], d[f"conv{i}_b"])
        for i in range(sum(n for _, n in VGG16_STAGES))
    ]
    heads = [d[f"head{j}_w"].reshape(-1) for j in range(len(VGG16_STAGES))]
    return LPIPSParams(convs=convs, heads=heads, pretrained=True)


def export_torch_lpips_to_npz(out_path) -> None:
    """Offline converter: run where the ``lpips`` pip package (and its
    pretrained weights) are available, then vendor the npz next to this
    file. Maps lpips.LPIPS(net='vgg') state to the npz layout above."""
    import lpips as lpips_pkg  # noqa: F401  (optional dependency)
    import torch

    model = lpips_pkg.LPIPS(net="vgg")
    feats = model.net.slice1, model.net.slice2, model.net.slice3, \
        model.net.slice4, model.net.slice5
    arrays = {}
    i = 0
    for sl in feats:
        for layer in sl:
            if isinstance(layer, torch.nn.Conv2d):
                arrays[f"conv{i}_w"] = layer.weight.detach().numpy()
                arrays[f"conv{i}_b"] = layer.bias.detach().numpy()
                i += 1
    for j, lin in enumerate(model.lins):
        arrays[f"head{j}_w"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1)
        )
    np.savez(out_path, **arrays)


def _vgg_features(params: LPIPSParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, 3, H, W) already scaled. Returns the 5 tapped maps."""
    taps = []
    i = 0
    for si, (c_out, n) in enumerate(VGG16_STAGES):
        if si > 0:
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, 2, 2),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            )
        for _ in range(n):
            w, b = params.convs[i]
            x = jax.lax.conv_general_dilated(
                x,
                jnp.asarray(w),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + jnp.asarray(b)[None, :, None, None]
            x = jax.nn.relu(x)
            i += 1
        taps.append(x)
    return taps


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    params: LPIPSParams,
) -> jnp.ndarray:
    """LPIPS distance per batch element.

    Args:
        img0/img1: (N, 3, H, W) or (3, H, W), values in [0, 1] (the
        torchmetrics/evaluation.py convention with normalize=True).
    """
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    # [0,1] -> [-1,1] -> scaling layer.
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    x0 = (img0 * 2.0 - 1.0 - shift) / scale
    x1 = (img1 * 2.0 - 1.0 - shift) / scale

    f0 = _vgg_features(params, x0)
    f1 = _vgg_features(params, x1)
    total = 0.0
    for tap0, tap1, head in zip(f0, f1, params.heads):
        d = (_unit_normalize(tap0) - _unit_normalize(tap1)) ** 2
        w = jnp.asarray(head)[None, :, None, None]
        total = total + jnp.mean(
            jnp.sum(d * w, axis=1), axis=(1, 2)
        )
    return total


class LPIPSMetric:
    """Convenience wrapper with weight resolution + jit cache."""

    def __init__(self, weights_path: Optional[Path] = None):
        self.params = load_lpips_params(weights_path)
        self.name = "lpips_vgg" if self.params.pretrained else "lpips_vgg_rand"
        if not self.params.pretrained:
            print(
                "WARNING: no pretrained LPIPS-VGG weights found "
                f"(looked for {weights_path or VENDORED_WEIGHTS}); using "
                "the deterministic random-VGG fallback. The metric is "
                "reported as 'lpips_vgg_rand' — vendor real weights via "
                "neuma_tpu.train.lpips.export_torch_lpips_to_npz for the "
                "reference protocol."
            )
        self._jit = jax.jit(lambda a, b: lpips(a, b, self.params))

    def __call__(self, img0, img1) -> float:
        return float(jnp.mean(self._jit(jnp.asarray(img0), jnp.asarray(img1))))
