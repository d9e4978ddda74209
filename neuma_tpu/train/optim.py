"""Optimizers: RAdam + strict global-norm clipping + LoRA masking.

The reference trains with ``torch.optim.RAdam`` and
``clip_grad_norm_(error_if_nonfinite=True)`` (finetune.py:317-327,
416-427); optax.radam implements the same rectified-Adam update. The
non-finite trap becomes a returned flag the caller can act on (the jitted
step cannot exit(1) mid-graph; the host loop raises).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax


def radam(
    learning_rate: Union[float, Callable],
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.radam(learning_rate, b1=b1, b2=b2, eps=eps),
        )
    return optax.radam(learning_rate, b1=b1, b2=b2, eps=eps)


def masked_radam(
    learning_rate: Union[float, Callable],
    mask,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Update only leaves where ``mask`` is True — the optax equivalent of
    ``mark_only_lora_as_trainable`` + an optimizer over
    ``filter(requires_grad, params)`` (finetune.py:317-318)."""
    return optax.masked(radam(learning_rate, weight_decay), mask)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def clip_by_global_norm_strict(
    grads, max_norm: float
) -> Tuple[object, jnp.ndarray, jnp.ndarray]:
    """Clip to max_norm; also report (norm, nonfinite flag) so the host
    loop can replicate the reference's error_if_nonfinite dump-and-exit
    (finetune.py:416-444)."""
    norm = optax.global_norm(grads)
    nonfinite = ~jnp.isfinite(norm)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    clipped = jax.tree_util.tree_map(lambda g: g * scale, grads)
    return clipped, norm, nonfinite
