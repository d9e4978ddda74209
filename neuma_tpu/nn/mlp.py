"""Minimal functional NN layer stack with LoRA for the material adaptors.

TPU-native redesign of the reference's ``MLPBlock`` stack and vendored
loralib (``modules/nclaw/material/meta.py:20-42`` and
``modules/nclaw/material/loralib.py`` in the reference repo): parameters
are plain nested-dict pytrees, layers are pure ``apply`` functions, and
LoRA is parameter-tree surgery (adding ``lora_a`` / ``lora_b`` leaves)
plus an optax-style trainability mask — no module mutation.

Conventions
-----------
* ``kernel`` is stored (in, out) — ``y = x @ kernel``; the torch reference
  stores (out, in). ``data/torch_ckpt.py`` transposes when importing.
* Init matches torch: xavier-uniform kernels, zero bias
  (``material/utils.py:47-54``), LoRA A kaiming-uniform(a=sqrt(5)) ==
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)), LoRA B zeros
  (``loralib.py:191-197``).
* ``gelu`` uses the exact (erf) formulation to match ``torch.nn.GELU``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


Params = Dict


def get_nonlinearity(name: Optional[str]) -> Callable:
    """Reference ``material/utils.py:6-21``."""
    if name is None:
        return lambda x: x
    key = name.casefold()
    if key == "relu":
        return jax.nn.relu
    if key == "tanh":
        return jnp.tanh
    if key in ("silu", "swish"):
        return jax.nn.silu
    if key == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if key == "elu":
        return jax.nn.elu
    raise ValueError(f"unexpected nonlinearity: {name}")


def _xavier_uniform(key, in_dim, out_dim, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(
        key, (in_dim, out_dim), dtype, minval=-bound, maxval=bound
    )


def init_linear(
    key,
    in_dim: int,
    out_dim: int,
    use_bias: bool,
    weight_norm: bool = False,
    dtype=jnp.float32,
) -> Params:
    kernel = _xavier_uniform(key, in_dim, out_dim, dtype)
    p: Params = {}
    if weight_norm:
        # torch weight_norm: w = g * v / ||v||, with ||.|| over the input dim
        # (norm per output unit). g initialized to ||v||.
        g = jnp.linalg.norm(kernel, axis=0, keepdims=True)  # (1, out)
        p["kernel_v"] = kernel
        p["kernel_g"] = g
    else:
        p["kernel"] = kernel
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def _effective_kernel(p: Params) -> jnp.ndarray:
    if "kernel_v" in p:
        v = p["kernel_v"]
        g = p["kernel_g"]
        return g * v / jnp.maximum(
            jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12
        )
    return p["kernel"]


def apply_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = _effective_kernel(p)
    y = x @ w
    if "lora_a" in p:
        # y += x @ A @ B * (alpha / r)   (loralib.py:216-222)
        y = y + (x @ p["lora_a"]) @ p["lora_b"] * p["lora_scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def add_lora(p: Params, key, r: int, alpha: float) -> Params:
    """Add LoRA leaves to a linear param dict (non-destructive copy).
    Matches loralib ``LinearLoRA.reset_parameters``: A ~ kaiming-uniform
    with a=sqrt(5) => U(+-1/sqrt(fan_in)), B = 0."""
    w = _effective_kernel(p)
    in_dim, out_dim = w.shape
    bound = 1.0 / math.sqrt(in_dim)
    new = dict(p)
    new["lora_a"] = jax.random.uniform(
        key, (in_dim, r), w.dtype, minval=-bound, maxval=bound
    )
    new["lora_b"] = jnp.zeros((r, out_dim), w.dtype)
    new["lora_scale"] = jnp.asarray(alpha / r, w.dtype)
    return new


def merge_lora(p: Params) -> Params:
    """Fold LoRA into the base kernel (inference-time merge,
    loralib.py:199-214)."""
    if "lora_a" not in p:
        return p
    new = dict(p)
    delta = p["lora_a"] @ p["lora_b"] * p["lora_scale"]
    if "kernel_v" in p:
        w = _effective_kernel(p) + delta
        new["kernel_v"] = w
        new["kernel_g"] = jnp.linalg.norm(w, axis=0, keepdims=True)
    else:
        new["kernel"] = p["kernel"] + delta
    for k in ("lora_a", "lora_b", "lora_scale"):
        new.pop(k)
    return new


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Mirrors the reference's constitution sub-config
    (``configs/synthetic/finetune-bb.yaml:63-94``)."""

    in_dim: int
    out_dim: int
    layer_widths: Sequence[int] = (64, 64)
    norm: Optional[str] = None  # None | 'wn' | 'ln'
    nonlinearity: Optional[str] = "gelu"
    no_bias: bool = True

    @property
    def weight_norm(self) -> bool:
        return self.norm is not None and self.norm.casefold() == "wn"


def init_mlp(key, cfg: MLPConfig, dtype=jnp.float32) -> Params:
    """Hidden MLPBlocks + a linear final layer (meta.py:58-86 pattern:
    hidden layers carry norm+nonlinearity, final layer has neither and —
    matching ``MLPBlock`` with norm=None — gets a bias iff not no_bias)."""
    widths = list(cfg.layer_widths)
    keys = jax.random.split(key, len(widths) + 1)
    layers: List[Params] = []
    w_in = cfg.in_dim
    # Hidden layers: bias only if (not no_bias and norm is None); with 'wn'
    # torch uses weight_norm(Linear(..., not no_bias)).
    for i, w_out in enumerate(widths):
        if cfg.weight_norm:
            use_bias = not cfg.no_bias
        else:
            use_bias = (not cfg.no_bias) and (cfg.norm is None)
        layers.append(
            init_linear(
                keys[i], w_in, w_out, use_bias, cfg.weight_norm, dtype
            )
        )
        w_in = w_out
    final = init_linear(
        keys[-1], w_in, cfg.out_dim, not cfg.no_bias, False, dtype
    )
    return {"layers": layers, "final": final}


def _apply_norm(norm: Optional[str], x: jnp.ndarray) -> jnp.ndarray:
    if norm is None or norm.casefold() == "wn":
        return x
    if norm.casefold() == "ln":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)
    raise ValueError(f"unexpected norm: {norm}")


def apply_mlp(params: Params, cfg: MLPConfig, x: jnp.ndarray) -> jnp.ndarray:
    act = get_nonlinearity(cfg.nonlinearity)
    for layer in params["layers"]:
        x = apply_linear(layer, x)
        x = _apply_norm(cfg.norm, x)
        x = act(x)
    return apply_linear(params["final"], x)


def add_lora_to_mlp(params: Params, key, r: int, alpha: float) -> Params:
    """Add LoRA to every linear in the MLP (reference
    ``replace_with_linear_lora``, loralib.py:52-59)."""
    n = len(params["layers"]) + 1
    keys = jax.random.split(key, n)
    new_layers = [
        add_lora(layer, keys[i], r, alpha)
        for i, layer in enumerate(params["layers"])
    ]
    return {
        "layers": new_layers,
        "final": add_lora(params["final"], keys[-1], r, alpha),
    }


def lora_mask(params: Params) -> Params:
    """Boolean pytree: True only for lora_a / lora_b leaves — the optax
    masked-update equivalent of ``mark_only_lora_as_trainable``
    (loralib.py:13-30). lora_scale stays frozen."""

    def mask_dict(p):
        if isinstance(p, dict):
            if "layers" in p or "final" in p:
                return {k: mask_dict(v) for k, v in p.items()}
            return {
                k: (k in ("lora_a", "lora_b")) for k in p
            }
        if isinstance(p, list):
            return [mask_dict(v) for v in p]
        return False

    return mask_dict(params)


def lora_params(params: Params) -> Params:
    """Extract only LoRA leaves (reference ``lora_state_dict``,
    loralib.py:33-49, bias='none')."""

    def extract(p):
        if isinstance(p, dict):
            if "layers" in p or "final" in p:
                return {k: extract(v) for k, v in p.items()}
            return {
                k: v for k, v in p.items() if k in ("lora_a", "lora_b")
            }
        if isinstance(p, list):
            return [extract(v) for v in p]
        return p

    return extract(params)
