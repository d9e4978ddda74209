"""Torch checkpoint interop: load the reference's pretrained NCLaw base
models and LoRA checkpoints into our param pytrees.

Reference formats:
* Base models ``{jelly,plasticine,sand}_0300.pt``: dict with keys
  'elasticity' / 'plasticity', each a torch state_dict of the
  InvariantFullMeta nets — ``layers.{i}.fc.weight`` (out, in) [+ .bias /
  weight-norm 'weight_g'/'weight_v'], ``final_layer.fc.weight``
  (reference finetune.py:620-623, meta.py:20-42).
* LoRA checkpoints ``{epoch}_lora.pt``: dict with 'elasticity' /
  'plasticity' / 'loss', each holding ``...fc.lora_A`` (r, in) and
  ``...fc.lora_B`` (out, r) (reference finetune.py:470-480,
  loralib.py:182-184).

Our layout (neuma_tpu.nn.mlp): kernel (in, out) = W.T, lora_a (in, r) =
A.T, lora_b (r, out) = B.T.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp


def _to_np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_file(path) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def mlp_params_from_state_dict(sd: Dict, num_layers: int) -> Dict:
    """Convert one InvariantFullMeta net's state_dict into our MLP param
    tree. Handles plain Linear, bias, and weight-norm variants."""

    def linear(prefix: str) -> Dict:
        p: Dict = {}
        if f"{prefix}.weight_v" in sd or f"{prefix}.parametrizations.weight.original1" in sd:
            if f"{prefix}.weight_v" in sd:
                v = _to_np(sd[f"{prefix}.weight_v"])
                g = _to_np(sd[f"{prefix}.weight_g"])
            else:  # torch >= 2.1 parametrize API
                v = _to_np(sd[f"{prefix}.parametrizations.weight.original1"])
                g = _to_np(sd[f"{prefix}.parametrizations.weight.original0"])
            # torch stores (out, in); norm over in-dim per out row.
            p["kernel_v"] = jnp.asarray(v.T)
            p["kernel_g"] = jnp.asarray(g.reshape(1, -1))
        else:
            p["kernel"] = jnp.asarray(_to_np(sd[f"{prefix}.weight"]).T)
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(_to_np(sd[f"{prefix}.bias"]))
        if f"{prefix}.lora_A" in sd:
            p["lora_a"] = jnp.asarray(_to_np(sd[f"{prefix}.lora_A"]).T)
            p["lora_b"] = jnp.asarray(_to_np(sd[f"{prefix}.lora_B"]).T)
        return p

    return {
        "layers": [linear(f"layers.{i}.fc") for i in range(num_layers)],
        "final": linear("final_layer.fc"),
    }


def load_base_model(path, num_layers: int = 2):
    """Load a NCLaw pretrained pair -> (elasticity_params,
    plasticity_params)."""
    ckpt = load_torch_file(path)
    pe = mlp_params_from_state_dict(ckpt["elasticity"], num_layers)
    pp = mlp_params_from_state_dict(ckpt["plasticity"], num_layers)
    return pe, pp


def merge_lora_state_dict(params: Dict, sd: Dict, num_layers: int,
                          r: int, alpha: float) -> Dict:
    """Overlay a reference LoRA checkpoint onto existing base params."""
    new = {"layers": [], "final": dict(params["final"])}
    for i in range(num_layers):
        layer = dict(params["layers"][i])
        pre = f"layers.{i}.fc"
        if f"{pre}.lora_A" in sd:
            layer["lora_a"] = jnp.asarray(_to_np(sd[f"{pre}.lora_A"]).T)
            layer["lora_b"] = jnp.asarray(_to_np(sd[f"{pre}.lora_B"]).T)
            layer["lora_scale"] = jnp.asarray(alpha / r, jnp.float32)
        new["layers"].append(layer)
    if "final_layer.fc.lora_A" in sd:
        new["final"]["lora_a"] = jnp.asarray(
            _to_np(sd["final_layer.fc.lora_A"]).T
        )
        new["final"]["lora_b"] = jnp.asarray(
            _to_np(sd["final_layer.fc.lora_B"]).T
        )
        new["final"]["lora_scale"] = jnp.asarray(alpha / r, jnp.float32)
    return new


def save_params_npz(path, params: Dict) -> None:
    """Flat npz serialization of a param pytree (framework-native
    checkpoint format; keys are /-joined paths)."""
    import jax

    flat = {}

    def walk(p, prefix):
        if isinstance(p, dict):
            for k, v in p.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(p, (list, tuple)):
            for i, v in enumerate(p):
                walk(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(p)

    walk(params, "")
    np.savez(path, **flat)


def load_params_npz(path) -> Dict:
    """Inverse of save_params_npz: rebuild the nested structure (list
    levels are detected by all-integer keys)."""
    data = np.load(path)
    tree: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [
                listify(node[str(i)]) for i in range(len(keys))
            ]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)
