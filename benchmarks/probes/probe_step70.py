"""Slope-timed breakdown of the 30k/70^3 fwd+bwd step pieces on TPU."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.sim import mpm
from neuma_tpu.sim.blocked import _apic_bwd_impl, _forward_dispatch
from neuma_tpu.sim.p2g_kernel import block_sort, apic_gather_tpu


def slope(make, k1=4, k2=16, reps=3):
    r1, r2 = make(k1), make(k2)

    def best(r):
        r()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(r2) - best(r1)) / (k2 - k1)


rng = np.random.default_rng(0)
n, g = 30_000, 70
constants = MPMConstants(
    num_grids=g, bound=1, bc="noslip", dt=jnp.float32(1e-3),
    gravity=jnp.asarray([0, -9.8, 0], jnp.float32), eps=jnp.float32(6e-7),
)
statics = Statics(
    vol=jnp.full((n,), 2e-8, jnp.float32),
    rho=jnp.full((n,), 1000.0, jnp.float32),
    clip_bound=jnp.full((n,), 0.1, jnp.float32),
    enabled=jnp.ones((n,), jnp.int32),
)
x = jnp.asarray((0.3 + 0.4 * rng.random((n, 3))).astype(np.float32))
state = ParticleState.initial(x, jnp.zeros((n, 3), jnp.float32))
stress = jnp.asarray(1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32)
df = jnp.asarray(rng.standard_normal((g ** 3, 3)), jnp.float32) * 1e-3
du = jnp.asarray(rng.standard_normal((g ** 3,)), jnp.float32) * 1e-3
b3 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
A33 = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
gm1 = jnp.abs(jnp.asarray(rng.standard_normal((n,)), jnp.float32))


def timed(label, body):
    def make(K):
        @jax.jit
        def run(c0):
            def sbody(c, _):
                out = body(c)
                leaves = jax.tree_util.tree_leaves(out)
                probe = sum(jnp.sum(l) * 1e-12 for l in leaves)
                return c + probe.astype(jnp.float32), None

            c, _ = jax.lax.scan(sbody, c0, None, length=K)
            return c

        def go():
            _ = float(run(jnp.float32(0.0)))

        return go

    t = slope(make)
    print(f"{label:28s} {t*1e3:8.3f} ms")
    return t


timed("block_sort", lambda c: block_sort(constants, x + c * 1e-9))

sort0 = jax.jit(lambda xx: block_sort(constants, xx))(x)

timed(
    "scatter fwd (sorted)",
    lambda c: _forward_dispatch(
        constants, x + c * 1e-9, gm1, b3, A33, "auto", sort0
    ),
)
timed(
    "gather bwd derivs (sorted)",
    lambda c: apic_gather_tpu(
        constants, x + c * 1e-9, gm1, b3, A33, df, du,
        derivs=True, sort=sort0,
    ),
)
timed(
    "gather fwd g2p (sorted)",
    lambda c: apic_gather_tpu(
        constants, x + c * 1e-9, None,
        jnp.zeros_like(b3), jnp.zeros_like(A33), df, None,
        derivs=False, sort=sort0,
    ),
)
timed("grid_op", lambda c: mpm.grid_op(constants, du + c, df))
timed(
    "full step fwd",
    lambda c: mpm.mpm_step(
        constants, statics,
        ParticleState(x=state.x + c * 1e-9, v=state.v, C=state.C, F=state.F),
        stress,
    ),
)


def grad_body(c):
    st = ParticleState(
        x=state.x + c * 1e-9, v=state.v, C=state.C, F=state.F
    )

    def loss(stt, sr):
        out = mpm.mpm_step_diff(constants, statics, stt, sr)
        return jnp.sum(out.x ** 2) + jnp.sum(out.v ** 2)

    return jax.grad(loss, argnums=(0, 1))(st, stress)


timed("full step fwd+bwd", grad_body)
