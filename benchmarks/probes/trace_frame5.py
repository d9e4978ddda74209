"""Capture a jax.profiler trace of the TRAINER's realworld frame:
packed substeps (+ per-substep refresh) under a 20-substep scan,
fwd+bwd — the thing that costs ~19 ms/substep while the isolated
substep costs ~10 (constant layouts let XLA hoist layout-derived
factor builds there; this trace shows what actually runs per substep).
"""
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


@jax.jit
def grad_frame(a, b, s):
    def loss(a, b, s):
        lay = build_step_layouts(constants, s.x)

        def sub(c, _):
            st, lay = c
            lay, _ = refresh_step_layouts(constants, st.x, lay)
            st = packed(a, b, st, lay)
            return (st, lay), None

        (st, _), _ = jax.lax.scan(sub, (s, lay), None, length=SUB)
        return jnp.sum(st.x**2) + jnp.sum(st.v**2) + jnp.sum(st.F**2)

    return jax.value_and_grad(loss, argnums=(0, 1, 2))(a, b, s)


out = grad_frame(pe, pp, state0)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = grad_frame(pe, pp, state0)
jax.block_until_ready(out)
print(f"frame fwd+bwd: {(time.perf_counter()-t0)*1000:.1f} ms")

with jax.profiler.trace("/tmp/trace_frame5b"):
    out = grad_frame(pe, pp, state0)
    jax.block_until_ready(out)
print("trace done")
