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

    def step(
        params_e, params_p, state: ParticleState, sort=None
    ) -> ParticleState:
        stress = elasticity_apply(params_e, state.F)
        state = step_impl(constants, statics, state, stress, sort)
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
    constants: Optional[MPMConstants] = None,
) -> Tuple[ParticleState, ParticleState]:
    """Run ``num_steps`` frames of ``substeps`` sim steps each.

    Returns (final_state, per-frame stacked states (num_steps, ...)).
    With ``remat`` the inner substep scan is checkpointed so backward
    memory is O(frames + substeps) states instead of O(frames*substeps).

    With ``constants`` (blocked-path grids, ``num_grids > 24``) the
    block sort is carried across the WHOLE rollout and refreshed per
    substep (rebuilt only when a particle crossed a block boundary) —
    see ``p2g_kernel.refresh_step_layouts``.
    """
    amortize = constants is not None and constants.num_grids > 24
    if amortize:
        from .p2g_kernel import build_step_layouts, refresh_step_layouts

        layouts0 = build_step_layouts(constants, state0.x)
    else:
        layouts0 = None

    def frame_body(carry, _):
        state, layouts = carry

        def sub_body(c, _):
            s, ly = c
            if ly is not None:
                ly, _ = refresh_step_layouts(constants, s.x, ly)
            return (step(params_e, params_p, s, ly), ly), None

        (state, layouts), _ = jax.lax.scan(
            sub_body, (state, layouts), None, length=substeps
        )
        return (state, layouts), state

    body = jax.checkpoint(frame_body) if remat else frame_body
    (final, _), traj = jax.lax.scan(
        body, (state0, layouts0), None, length=num_steps
    )
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
