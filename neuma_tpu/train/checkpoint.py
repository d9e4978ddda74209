"""Training checkpoint/resume utilities.

Covers the reference's checkpoint surface (SURVEY.md section 5.4 —
init.pt, LoRA ring buffer, config snapshot) and goes beyond it: full
training-state checkpoints INCLUDING optimizer state (the reference
never persists optimizer state, finetune.py:470-480), enabling exact
resume mid-stage.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax

from ..data.torch_ckpt import load_params_npz, save_params_npz


def save_train_state(
    path,
    step: int,
    params: Dict,
    opt_state: Any = None,
    extra: Optional[Dict] = None,
) -> None:
    """One-file npz checkpoint of arbitrary pytrees."""
    payload: Dict = {"step": np.int64(step), "params": params}
    if opt_state is not None:
        payload["opt_state"] = jax.tree_util.tree_map(
            np.asarray, opt_state
        )
    if extra:
        payload["extra"] = extra
    # Flatten opt_state (arbitrary nested optax tuples) via tree flatten
    # with a stored treedef is brittle across versions; store leaves +
    # rebuild against a reference structure at load time instead.
    leaves, _ = jax.tree_util.tree_flatten(payload)
    flat = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, **flat)


def load_train_state(path, template) -> Any:
    """Restore a checkpoint saved by ``save_train_state`` into the same
    pytree structure as ``template`` (params/opt_state trees from a
    freshly initialized trainer)."""
    data = np.load(path, allow_pickle=False)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class MetricsLogger:
    """Append-only JSONL scalar logger — the observability substitute for
    the reference's tensorboardX writer (finetune.py:463-468): one row
    per step with arbitrary scalar keys, easily plotted or tailed."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    def log(self, step: int, **scalars) -> None:
        row = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            row[k] = float(v)
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()
