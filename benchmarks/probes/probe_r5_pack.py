"""Round-5: isolate where the packed substep's fwd+bwd cost goes at the
realworld shape (30k/70^3).  probe_r5_sim showed packed 20.5 vs unfused
15.8 ms/substep fwd+bwd while probe_r5_mat showed the material layer is
~0.5 ms — so the ~4.7 ms delta is in the flat-pack plumbing, and the
~15 ms base is the step itself.  Slope timing (scan of N reps minus scan
of 1, divided) cancels dispatch.

Rows:
  * mpm_step_diff fwd+bwd         (step only, stress precomputed const)
  * unfused substep fwd+bwd       (elast -> step -> plast, plain AD)
  * packed substep fwd+bwd        (make_packed_substep)
  * pack/unpack round trip        (_pack_step_res + _unpack_step_res)
  * grid_op fwd+vjp               (70^3 elementwise)
  * refresh_step_layouts          (the per-substep refresh)
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
N = p["n_particles"]
x0 = scene.init_x
state0 = ParticleState.initial(x0, jnp.zeros_like(x0))
REPS = 10

lay0 = jax.jit(lambda x: build_step_layouts(constants, x))(x0)
jax.block_until_ready(lay0)

stress0 = jax.jit(lambda F: scene.elasticity.apply(pe, F))(state0.F)
jax.block_until_ready(stress0)

packed = mpm.make_packed_substep(
    constants, statics,
    lambda a, F: scene.elasticity.apply(a, F),
    lambda b, F: scene.plasticity.apply(b, F),
)


def slope(label, step_fn, carry0, reps=REPS, outer=3):
    def make(n):
        def run(c):
            def body(c, _):
                return step_fn(c), None

            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        return jax.jit(run)

    fs = [make(1), make(reps)]
    ts = []
    for f in fs:
        out = f(carry0)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(outer):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / (reps - 1) * 1000.0
    print(f"{label:36s}: {per:8.3f} ms", flush=True)
    return per


def mix_state(s, g):
    return ParticleState(
        x=s.x + 1e-20 * g.x, v=s.v + 1e-20 * g.v,
        C=s.C + 1e-20 * g.C, F=s.F + 1e-20 * g.F,
    )


# 1. step-only fwd+bwd (constant stress input each rep)
def step_only(s):
    def loss(st):
        out = mpm.mpm_step_diff(constants, statics, st, stress0, lay0)
        return jnp.sum(out.x**2) + jnp.sum(out.v**2) + jnp.sum(out.F**2)

    g = jax.grad(loss)(s)
    return mix_state(s, g)


slope("mpm_step_diff fwd+bwd", step_only, state0)


# 2. unfused substep fwd+bwd
def unfused(s):
    def loss(st):
        stress = scene.elasticity.apply(pe, st.F)
        out = mpm.mpm_step_diff(constants, statics, st, stress, lay0)
        F = scene.plasticity.apply(pp, out.F)
        return (
            jnp.sum(out.x**2) + jnp.sum(out.v**2) + jnp.sum(F**2)
        )

    g = jax.grad(loss)(s)
    return mix_state(s, g)


slope("unfused substep fwd+bwd", unfused, state0)


# 3. packed substep fwd+bwd
def packed_step(s):
    def loss(st):
        out = packed(pe, pp, st, lay0)
        return jnp.sum(out.x**2) + jnp.sum(out.v**2) + jnp.sum(out.F**2)

    g = jax.grad(loss)(s)
    return mix_state(s, g)


slope("packed substep fwd+bwd", packed_step, state0)


# 4. pack/unpack round trip of the step residuals
res0 = mpm._mpm_step_fwd(constants, statics, state0, stress0, lay0)[1]


def roundtrip(s):
    res = (
        res0[0], res0[1],
        dataclasses.replace(res0[2], x=s.x), res0[3], res0[4],
        res0[5], res0[6], res0[7], res0[8],
    )
    packed_res = mpm._pack_step_res(res)
    res2 = mpm._unpack_step_res(packed_res)
    s2 = res2[2]
    return dataclasses.replace(s, x=s.x + 1e-20 * s2.x)


slope("pack/unpack round trip", roundtrip, state0)


# 5. grid_op fwd + vjp
gm0, gmv0 = jax.jit(
    lambda s: mpm.p2g(constants, statics, s, stress0, "auto", lay0)
)(state0)
jax.block_until_ready((gm0, gmv0))


def gop(carry):
    gm, gmv = carry
    gv, vjp = jax.vjp(lambda m, mv: mpm.grid_op(constants, m, mv), gm, gmv)
    dm, dmv = vjp(gv)
    return (gm + 1e-20 * dm, gmv + 1e-20 * dmv)


slope("grid_op fwd+vjp", gop, (gm0, gmv0))


# 6. refresh
def refresh(carry):
    x, lay = carry
    lay2, _ = refresh_step_layouts(constants, x, lay)
    return (x + 1e-20 * lay2.sort.fx, lay2)


slope("refresh_step_layouts", refresh, (x0, lay0))
