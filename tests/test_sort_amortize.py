"""Amortized block sort (p2g_kernel.refresh_step_layouts): carrying one
``StepLayouts`` across a substep scan — refreshed elementwise each step,
fully rebuilt (via ``lax.cond``) only when a particle crossed a block
boundary — must be bit-for-bit invisible to both values and gradients
vs rebuilding the sort every step.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.sim.mpm import mpm_step, mpm_step_diff
from neuma_tpu.sim.p2g_kernel import (
    BLOCK,
    build_step_layouts,
    refresh_step_layouts,
)
from tests.test_blocked import _scene


def _rollout_fresh(constants, statics, state, stress, steps):
    for _ in range(steps):
        state = mpm_step(constants, statics, state, stress)
    return state


def _rollout_amortized(constants, statics, state, stress, steps):
    layouts = build_step_layouts(constants, state.x)
    reused = []
    for _ in range(steps):
        layouts, ok = refresh_step_layouts(constants, state.x, layouts)
        reused.append(ok)
        state = mpm_step(constants, statics, state, stress, layouts)
    return state, jnp.stack(reused)


def test_refreshed_layouts_match_fresh_sorts():
    constants, statics, state, stress = _scene(n=500, g=33, seed=3)
    steps = 4

    ref = jax.jit(
        lambda s: _rollout_fresh(constants, statics, s, stress, steps)
    )(state)
    out, _ = jax.jit(
        lambda s: _rollout_amortized(constants, statics, s, stress, steps)
    )(state)

    for name in ("x", "v", "C", "F"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            atol=1e-6,
            rtol=1e-5,
            err_msg=f"amortized-sort mismatch in {name}",
        )


def test_rebuild_fires_on_block_crossing():
    """A particle pushed across a block boundary between substeps must
    flip ``reused`` to False (full rebuild) and stay correct."""
    constants, statics, state, stress = _scene(n=300, g=33, seed=5)
    # Give every particle a velocity that moves it ~2 cells per step:
    # dt * v * inv_dx ~ 2 -> guaranteed block-boundary crossings.
    big_v = jnp.full_like(state.v, 2.0 / (constants.dt * constants.inv_dx))
    state = dataclasses.replace(state, v=big_v)
    steps = 3

    ref = jax.jit(
        lambda s: _rollout_fresh(constants, statics, s, stress, steps)
    )(state)
    out, reused = jax.jit(
        lambda s: _rollout_amortized(constants, statics, s, stress, steps)
    )(state)

    # Step 0 reuses (positions unchanged since the build); at least one
    # later step must rebuild.
    assert bool(reused[0])
    assert not bool(jnp.all(reused[1:]))
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(ref.x), atol=1e-6, rtol=1e-5
    )


def test_amortized_gradients_match():
    """Gradients through a scanned multi-substep rollout with the
    carried/refreshed layouts equal the per-step-sort gradients."""
    constants, statics, state, stress = _scene(n=400, g=33, seed=7)
    steps = 4

    def loss_fresh(v0, stress):
        st = dataclasses.replace(state, v=v0)

        def body(s, _):
            return mpm_step_diff(constants, statics, s, stress), None

        st, _ = jax.lax.scan(body, st, None, length=steps)
        return jnp.sum(st.x**2) + jnp.sum(st.v * st.C[:, 0, 0:1])

    def loss_amortized(v0, stress):
        st = dataclasses.replace(state, v=v0)
        layouts = build_step_layouts(constants, st.x)

        def body(c, _):
            s, ly = c
            ly, _ = refresh_step_layouts(constants, s.x, ly)
            s = mpm_step_diff(constants, statics, s, stress, ly)
            return (s, ly), None

        (st, _), _ = jax.lax.scan(body, (st, layouts), None, length=steps)
        return jnp.sum(st.x**2) + jnp.sum(st.v * st.C[:, 0, 0:1])

    l_ref, (gv_ref, gs_ref) = jax.jit(
        jax.value_and_grad(loss_fresh, argnums=(0, 1))
    )(state.v, stress)
    l_amo, (gv_amo, gs_amo) = jax.jit(
        jax.value_and_grad(loss_amortized, argnums=(0, 1))
    )(state.v, stress)

    np.testing.assert_allclose(float(l_amo), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gv_amo), np.asarray(gv_ref), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gs_amo), np.asarray(gs_ref), atol=1e-6, rtol=1e-5
    )
