"""Isolate the realworld substep backward gap at 30k/70^3 with
in-graph scan repetition (the tunneled dispatch costs ~27 ms, so every
op runs K times inside ONE jitted scan; slope timing cancels both the
dispatch and the scan carry overhead).

probe_step70 measures 13.9 ms for the bare mpm_step_diff fwd+bwd, but
the 20-substep frame loop pays ~37 ms/substep fwd+bwd; the candidates
are the material MLPs (SVD featurization) and the per-substep layout
refresh.
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
pe, pp = scene.elasticity_params, scene.plasticity_params

from neuma_tpu.core.types import ParticleState  # noqa: E402
from neuma_tpu.sim import mpm  # noqa: E402
from neuma_tpu.sim.p2g_kernel import (  # noqa: E402
    build_step_layouts,
    refresh_step_layouts,
)

constants, statics = scene.constants, scene.statics
x0 = scene.init_x
n = x0.shape[0]
state0 = ParticleState.initial(x0, jnp.zeros_like(x0))
key = jax.random.PRNGKey(0)
F0 = (
    jnp.eye(3)[None] + 0.02 * jax.random.normal(key, (n, 3, 3))
).astype(jnp.float32)
lay0 = jax.jit(lambda x: build_step_layouts(constants, x))(x0)


def slope_timed(label, fn, seed_arg, k1=3, k2=9):
    """fn(arg) -> pytree; run K times in one scan, perturbing the arg
    by the carry so XLA can't hoist; (t_k2 - t_k1) / (k2 - k1)."""

    def repeated(reps):
        @jax.jit
        def run(a0):
            def body(c, _):
                out = fn(jax.tree_util.tree_map(
                    lambda t: t + c * 1e-12 if t.dtype == jnp.float32
                    else t, a0))
                leaves = [
                    jnp.sum(l) for l in jax.tree_util.tree_leaves(out)
                    if l.dtype == jnp.float32
                ]
                return c + sum(leaves), None

            tot, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=reps
            )
            return tot

        _ = float(run(seed_arg))
        t0 = time.perf_counter()
        _ = float(run(seed_arg))
        t1 = time.perf_counter()
        _ = float(run(seed_arg))
        return min(t1 - t0, time.perf_counter() - t1)

    per = (repeated(k2) - repeated(k1)) / (k2 - k1) * 1000.0
    print(f"{label:40s}: {per:9.2f} ms", flush=True)
    return per


slope_timed(
    "elasticity fwd", lambda F: scene.elasticity.apply(pe, F), F0
)
slope_timed(
    "elasticity fwd+bwd",
    lambda F: jax.value_and_grad(
        lambda pr, Fi: jnp.sum(scene.elasticity.apply(pr, Fi) ** 2),
        argnums=(0, 1),
    )(pe, F),
    F0,
)
slope_timed(
    "plasticity fwd", lambda F: scene.plasticity.apply(pp, F), F0
)
slope_timed(
    "plasticity fwd+bwd",
    lambda F: jax.value_and_grad(
        lambda pr, Fi: jnp.sum(scene.plasticity.apply(pr, Fi) ** 2),
        argnums=(0, 1),
    )(pp, F),
    F0,
)

from neuma_tpu.ops.svd3 import svd3  # noqa: E402

slope_timed("svd3 fwd", lambda F: svd3(F), F0)
slope_timed(
    "svd3 fwd+bwd",
    lambda F: jax.value_and_grad(
        lambda Fi: sum(jnp.sum(t) for t in svd3(Fi))
    )(F),
    F0,
)

slope_timed(
    "refresh_step_layouts",
    lambda x: refresh_step_layouts(constants, x, lay0)[0],
    x0,
)


def substep(params_e, params_p, s, lay):
    lay, _ = refresh_step_layouts(constants, s.x, lay)
    stress = scene.elasticity.apply(params_e, s.F)
    s2 = mpm.mpm_step_diff(constants, statics, s, stress, lay)
    F = scene.plasticity.apply(params_p, s2.F)
    return dataclasses.replace(s2, F=F), lay


slope_timed(
    "substep fwd",
    lambda st: substep(pe, pp, st, lay0)[0],
    state0,
)
slope_timed(
    "substep fwd+bwd",
    lambda st: jax.value_and_grad(
        lambda pr, s: (
            lambda o: jnp.sum(o.x**2) + jnp.sum(o.v**2)
            + jnp.sum(o.F**2)
        )(substep(pr, pp, s, lay0)[0]),
        argnums=(0, 1),
    )(pe, st),
    state0,
    k1=2,
    k2=6,
)

stress0 = jax.jit(lambda F: scene.elasticity.apply(pe, F))(F0)
slope_timed(
    "step-only fwd+bwd (const stress)",
    lambda st: jax.value_and_grad(
        lambda s, sr: (
            lambda o: jnp.sum(o.x**2) + jnp.sum(o.v**2)
            + jnp.sum(o.F**2)
        )(mpm.mpm_step_diff(
            constants, statics, s,
            sr, refresh_step_layouts(constants, s.x, lay0)[0],
        )),
        argnums=(0, 1),
    )(st, stress0),
    state0,
    k1=2,
    k2=6,
)
