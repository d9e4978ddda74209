"""Round-5 dissection of the TRAINER's sim cost at the realworld shape
(30k/70^3, substeps 20): the trainer runs make_packed_substep (flat
residuals, no frame replay) under a substep scan with per-substep
layout refresh — probe_realworld's sim rows time the UNfused
mpm_step_diff instead, so this probe measures what actually runs:

  * packed frame fwd           (scan of 20 packed substeps + refresh)
  * packed frame fwd+bwd       (grads wrt params_e, params_p, state)
  * same without layout refresh (fixed layouts -> refresh cost)
  * unfused frame fwd+bwd      (mpm_step_diff scan, padded residuals)

Slope timing over scan repetitions cancels dispatch.
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from neuma_tpu.core.types import ParticleState
from neuma_tpu.sim import mpm
from neuma_tpu.sim.p2g_kernel import (
    build_step_layouts,
    refresh_step_layouts,
)

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
pe, pp = scene.elasticity_params, scene.plasticity_params
constants, statics = scene.constants, scene.statics
x0 = scene.init_x
state0 = ParticleState.initial(x0, jnp.zeros_like(x0))
SUB = scene.substeps

packed = mpm.make_packed_substep(
    constants, statics,
    lambda a, F: scene.elasticity.apply(a, F),
    lambda b, F: scene.plasticity.apply(b, F),
)


def frame_packed(params_e, params_p, state, refresh=True):
    lay = build_step_layouts(constants, state.x)

    def sub(c, _):
        s, lay = c
        if refresh:
            lay, _ = refresh_step_layouts(constants, s.x, lay)
        s = packed(params_e, params_p, s, lay)
        return (s, lay), None

    (state, _), _ = jax.lax.scan(
        sub, (state, lay), None, length=SUB
    )
    return state


def frame_unfused(params_e, params_p, state):
    lay = build_step_layouts(constants, state.x)

    def sub(c, _):
        s, lay = c
        lay, _ = refresh_step_layouts(constants, s.x, lay)
        stress = scene.elasticity.apply(params_e, s.F)
        s = mpm.mpm_step_diff(constants, statics, s, stress, lay)
        s = dataclasses.replace(
            s, F=scene.plasticity.apply(params_p, s.F)
        )
        return (s, lay), None

    (state, _), _ = jax.lax.scan(
        sub, (state, lay), None, length=SUB
    )
    return state


def timed(label, make_fn, reps=3):
    f = jax.jit(make_fn())
    _ = float(jnp.sum(jax.tree_util.tree_leaves(f())[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(f())[0]))
        ts.append(time.perf_counter() - t0)
    per = min(ts) * 1000.0
    print(f"{label:44s}: {per:9.1f} ms", flush=True)
    return per


def fwd_case(frame, **kw):
    def make():
        def run():
            return frame(pe, pp, state0, **kw).x

        return run

    return make


def fwdbwd_case(frame, **kw):
    def make():
        def run():
            def loss(a, b, s):
                st = frame(a, b, s, **kw)
                return (
                    jnp.sum(st.x**2) + jnp.sum(st.v**2)
                    + jnp.sum(st.F**2)
                )

            return jax.value_and_grad(loss, argnums=(0, 1, 2))(
                pe, pp, state0
            )

        return run

    return make


t_pf = timed("packed frame fwd", fwd_case(frame_packed))
t_pfb = timed("packed frame fwd+bwd", fwdbwd_case(frame_packed))
t_pfb_nr = timed(
    "packed frame fwd+bwd (no refresh)",
    fwdbwd_case(frame_packed, refresh=False),
)
t_ufb = timed("unfused frame fwd+bwd", fwdbwd_case(frame_unfused))
print("-" * 60)
print(
    f"per substep: packed fwd {t_pf/SUB:.2f} | packed fwd+bwd "
    f"{t_pfb/SUB:.2f} | no-refresh {t_pfb_nr/SUB:.2f} | unfused "
    f"{t_ufb/SUB:.2f} ms"
)
