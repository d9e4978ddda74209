"""Rollout machinery: material-coupled MPM time stepping under lax.scan.

Replaces the reference's Python-level unrolled loop with cached per-step
Warp states (``MPMCacheDiffSim``, ``sim/interface.py:108-123``, driven by
``experiments/finetune.py:148-151``) with a compiled ``lax.scan`` whose
memory is managed by nested rematerialization (sqrt-N checkpointing) —
the TPU-idiomatic equivalent of the reference's grid rematerialization +
state caching (SURVEY.md section 5.7).

The per-step physics is:
    stress = elasticity(F)
    x, v, C, F = mpm_step(statics, x, v, C, F, stress)
    F = plasticity(F)
(reference finetune.py:149-151).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.types import MPMConstants, ParticleState, Statics
from .mpm import mpm_step, mpm_step_diff


def make_step_fn(
    constants: MPMConstants,
    statics: Statics,
    elasticity_apply: Callable,
    plasticity_apply: Callable,
    diff: bool = True,
) -> Callable:
    """Returns step(params_e, params_p, state) -> state."""
    step_impl = mpm_step_diff if diff else mpm_step

    def step(params_e, params_p, state: ParticleState) -> ParticleState:
        stress = elasticity_apply(params_e, state.F)
        state = step_impl(constants, statics, state, stress)
        F = plasticity_apply(params_p, state.F)
        return dataclasses.replace(state, F=F)

    return step


def rollout(
    step: Callable,
    params_e,
    params_p,
    state0: ParticleState,
    num_steps: int,
    substeps: int = 1,
    remat: bool = True,
) -> Tuple[ParticleState, ParticleState]:
    """Run ``num_steps`` frames of ``substeps`` sim steps each.

    Returns (final_state, per-frame stacked states (num_steps, ...)).
    With ``remat`` the inner substep scan is checkpointed so backward
    memory is O(frames + substeps) states instead of O(frames*substeps).
    """

    def frame_body(state, _):
        def sub_body(s, _):
            return step(params_e, params_p, s), None

        state, _ = jax.lax.scan(sub_body, state, None, length=substeps)
        return state, state

    body = jax.checkpoint(frame_body) if remat else frame_body
    final, traj = jax.lax.scan(body, state0, None, length=num_steps)
    return final, traj


def denormalize_points(
    x: jnp.ndarray, size, center
) -> jnp.ndarray:
    """Map sim-box coordinates back to world coordinates (reference
    ``denormalize_points_helper_func``, modules/nclaw/utils.py:110-135:
    world = (sim - center) / size)."""
    size = jnp.asarray(size, x.dtype)
    center = jnp.asarray(center, x.dtype)
    return (x - center) / size
