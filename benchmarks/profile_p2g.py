"""P2G variant profiling at real-world sizes (70^3 grids).

Measures forward mpm_step and forward+backward step time for the p2g
variants/precisions to locate the 70^3 bottleneck (VERDICT round-1
weak item 1).

    python benchmarks/profile_p2g.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(f, *a, reps=5):
    out = f(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
    from neuma_tpu.sim import mpm

    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    for n, g in ((30_000, 70), (100_000, 64), (30_000, 32)):
        x = jnp.asarray((0.3 + 0.4 * rng.random((n, 3))).astype(np.float32))
        state = ParticleState.initial(x, jnp.zeros((n, 3), jnp.float32))
        constants = MPMConstants(
            num_grids=g, bound=1, bc="noslip",
            dt=jnp.float32(1e-3),
            gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
            eps=jnp.float32(6e-7),
        )
        statics = Statics(
            vol=jnp.full((n,), 2e-8, jnp.float32),
            rho=jnp.full((n,), 1000.0, jnp.float32),
            clip_bound=jnp.full((n,), 0.1, jnp.float32),
            enabled=jnp.ones((n,), jnp.int32),
        )
        stress = jnp.asarray(
            1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32
        )
        K = 10

        def make_fwd(method):
            @jax.jit
            def run(state, stress):
                def body(s, _):
                    gm, gmv = mpm.p2g(constants, statics, s, stress,
                                      method=method)
                    gv = mpm.grid_op(constants, gm, gmv)
                    s2 = mpm.g2p(constants, statics, s, gv)
                    return s2, None

                s, _ = jax.lax.scan(body, state, None, length=K)
                return s.x

            return run

        # p2g-only (isolate from g2p)
        def make_p2g_only(method):
            @jax.jit
            def run(state, stress):
                def body(c, _):
                    gm, gmv = mpm.p2g(
                        constants, statics,
                        ParticleState(x=state.x + c * 1e-6, v=state.v,
                                      C=state.C, F=state.F),
                        stress, method=method)
                    return c + jnp.sum(gm) * 0, (jnp.sum(gm), jnp.sum(gmv))

                c, outs = jax.lax.scan(body, jnp.float32(0), None, length=K)
                return outs

            return run

        @jax.jit
        def grad_step(state, stress):
            def loss(st, sr):
                def body(carry, _):
                    s = carry
                    s2 = mpm.mpm_step_diff(constants, statics, s, sr)
                    return s2, None

                s, _ = jax.lax.scan(body, st, None, length=K)
                return jnp.sum(s.x ** 2) + jnp.sum(s.v ** 2)

            return jax.grad(loss, argnums=(0, 1))(state, stress)

        rows = {}
        for method in ("matmul", "scatter"):
            try:
                t = timeit(make_p2g_only(method), state, stress)
                rows[f"p2g_{method}"] = t / K * 1e3
            except Exception as e:
                rows[f"p2g_{method}"] = f"err {type(e).__name__}"
        t = timeit(make_fwd("auto"), state, stress)
        rows["fwd_step"] = t / K * 1e3
        t = timeit(grad_step, state, stress)
        rows["grad_step"] = t / K * 1e3

        print(f"n={n} g={g}:")
        for k, v in rows.items():
            if isinstance(v, float):
                print(f"  {k:16s} {v:8.3f} ms  "
                      f"({n / v * 1000 / 1e6:.2f}M particle-steps/s)")
            else:
                print(f"  {k:16s} {v}")


if __name__ == "__main__":
    main()
