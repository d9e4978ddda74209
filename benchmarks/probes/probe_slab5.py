"""Round-5 slab-grid A/B on the real chip: packed frame fwd+bwd at the
realworld shape with the slab-space grid chain ON vs OFF, plus
loss/grad parity between the two."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

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


def make_frame():
    packed = mpm.make_packed_substep(
        constants, statics,
        lambda a, F: scene.elasticity.apply(a, F),
        lambda b, F: scene.plasticity.apply(b, F),
    )

    def grad_frame(a, b, s):
        def loss(a, b, s):
            lay = build_step_layouts(constants, s.x)

            def sub(c, _):
                st, lay = c
                lay, _ = refresh_step_layouts(constants, st.x, lay)
                st = packed(a, b, st, lay)
                return (st, lay), None

            (st, _), _ = jax.lax.scan(sub, (s, lay), None, length=SUB)
            return (
                jnp.sum(st.x**2) + jnp.sum(st.v**2) + jnp.sum(st.F**2)
            )

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(a, b, s)

    return jax.jit(grad_frame)


results = {}
for mode in ("off", "auto"):
    os.environ["NEUMA_SLAB_GRID"] = mode
    f = make_frame()
    out = f(pe, pp, state0)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(pe, pp, state0))
        best = min(best, time.perf_counter() - t0)
    results[mode] = out
    print(f"frame fwd+bwd slab={mode:5s}: {best*1000:8.1f} ms", flush=True)

la, ga = results["off"][0], results["off"][1]
lb, gb = results["auto"][0], results["auto"][1]
print("loss off/auto:", float(la), float(lb))
worst = 0.0
for a, b in zip(
    jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
):
    a, b = np.asarray(a), np.asarray(b)
    s = max(np.abs(a).max(), 1e-8)
    worst = max(worst, float(np.abs(a - b).max() / s))
print(f"worst relative grad diff: {worst:.2e}")
