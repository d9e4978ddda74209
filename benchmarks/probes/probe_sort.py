"""Probe: cost of build_chunk_layout / its pieces on TPU (slope method)."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.core.types import MPMConstants
from neuma_tpu.sim.p2g_kernel import build_chunk_layout


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
for n, g in ((10_000, 32), (30_000, 70)):
    constants = MPMConstants(
        num_grids=g, bound=1, bc="noslip", dt=jnp.float32(1e-3),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    x = jnp.asarray((0.3 + 0.4 * rng.random((n, 3))).astype(np.float32))

    def make_layout(K):
        @jax.jit
        def run(xx):
            def body(c, _):
                layout, base, fx, loc = build_chunk_layout(constants, xx)
                return c + 1e-12 * layout.src[0].astype(jnp.float32), (
                    jnp.sum(layout.src) + jnp.sum(layout.dest)
                )

            c, o = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c + jnp.sum(o[0]).astype(jnp.float32)

        def go():
            _ = float(run(x))

        return go

    t = slope(make_layout)
    print(f"n={n} g={g}: build_chunk_layout {t*1e3:.3f} ms")

    def make_sortonly(K):
        @jax.jit
        def run(xx):
            def body(c, _):
                p_x = (xx + c * 1e-12) * constants.inv_dx
                base = jnp.floor(p_x - 0.5).astype(jnp.int32)
                blk = jnp.clip(base, 0, g - 1) // 14
                nb = -(-g // 14)
                bid = (blk[:, 0] * nb + blk[:, 1]) * nb + blk[:, 2]
                perm = jnp.argsort(bid)
                inv = jnp.argsort(perm)
                return c + 1e-12 * perm[0].astype(jnp.float32), jnp.sum(inv)

            c, o = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c + jnp.sum(o).astype(jnp.float32)

        def go():
            _ = float(run(x))

        return go

    t = slope(make_sortonly)
    print(f"n={n} g={g}: two argsorts       {t*1e3:.3f} ms")
