"""LR schedules matching the reference's tune schedulers
(``modules/tune/scheduler/__init__.py``), as optax-compatible
step -> lr callables.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp


def cosine_decay_schedule(
    lr_init: float,
    max_steps: int,
    learning_rate_alpha: float = 0.05,
    warm_up_end: int = 0,
) -> Callable:
    """Reference ``CosineDecayScheduler`` (scheduler/__init__.py:76-102):
    linear warmup then cosine from 1 down to ``alpha`` of lr_init."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warm_up_end > 0:
            warm = step / warm_up_end
        else:
            warm = jnp.asarray(1.0)
        progress = (step - warm_up_end) / max(max_steps - warm_up_end, 1)
        alpha = learning_rate_alpha
        factor = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (
            1 - alpha
        ) + alpha
        return lr_init * jnp.where(step < warm_up_end, warm, factor)

    return schedule


def exponential_decay_schedule(
    lr_init: float,
    max_steps: int,
    lr_final: Optional[float] = None,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
    ramp: str = "linear",
) -> Callable:
    """Reference ``ExponentialDecayScheduler`` (scheduler/__init__.py:29-73):
    warmup (linear or cosine ramp) then log-linear interpolation
    lr_init -> lr_final."""
    if lr_final is None:
        lr_final = lr_init

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            frac = jnp.clip(step / warmup_steps, 0, 1)
            if ramp == "cosine":
                warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * jnp.sin(
                    0.5 * jnp.pi * frac
                )
            else:
                warm = lr_pre_warmup + (
                    lr_init - lr_pre_warmup
                ) * step / warmup_steps
        else:
            warm = jnp.asarray(lr_init)
        t = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0, 1
        )
        decayed = jnp.exp(
            math.log(lr_init) * (1 - t) + math.log(lr_final) * t
        )
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def fetch_schedule(cfg, lr_init: float) -> Callable:
    """Reference ``fetch_scheduler`` dispatch (scheduler/__init__.py:105-118)
    on ``cfg['type'] in ('exp', 'cos')``."""
    kind = cfg["type"]
    if kind == "cos":
        return cosine_decay_schedule(
            lr_init,
            max_steps=int(cfg.get("max_steps", 1e5)),
            learning_rate_alpha=float(cfg.get("learning_rate_alpha", 0.05)),
            warm_up_end=int(cfg.get("warm_up_end", 0)),
        )
    if kind == "exp":
        return exponential_decay_schedule(
            lr_init,
            max_steps=int(cfg.get("max_steps", 1e5)),
            lr_final=cfg.get("lr_final"),
            warmup_steps=int(cfg.get("warmup_steps", 0)),
            lr_pre_warmup=float(cfg.get("lr_pre_warmup", 1e-8)),
            ramp=str(cfg.get("ramp", "linear")),
        )
    raise ValueError(f"Scheduler {kind} not supported.")
