"""Cost of pack_payload pieces at 30k/70^3 (slope method)."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.core.types import MPMConstants
from neuma_tpu.sim.p2g_kernel import (
    block_sort, build_chunk_layout, pack_payload, GATHER_CHUNK,
)


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


def timed(label, body, *args):
    def make(K):
        @jax.jit
        def run(a):
            def sbody(c, _):
                out = body(c, *args)
                leaves = jax.tree_util.tree_leaves(out)
                probe = sum(
                    jnp.sum(l).astype(jnp.float32) * 1e-12 for l in leaves
                )
                return c + probe, None

            c, _ = jax.lax.scan(sbody, a, None, length=K)
            return c

        def go():
            _ = float(run(jnp.float32(0.0)))

        return go

    print(f"{label:30s} {slope(make)*1e3:8.3f} ms")


rng = np.random.default_rng(0)
n, g = 30_000, 70
constants = MPMConstants(
    num_grids=g, bound=1, bc="noslip", dt=jnp.float32(1e-3),
    gravity=jnp.asarray([0, -9.8, 0], jnp.float32), eps=jnp.float32(6e-7),
)
x = jnp.asarray((0.3 + 0.4 * rng.random((n, 3))).astype(np.float32))
gm = jnp.abs(jnp.asarray(rng.standard_normal((n,)), jnp.float32))
b = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
A = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
sort0 = jax.jit(lambda xx: block_sort(constants, xx))(x)

for chunk, lab in ((512, "scatter C=512"), (GATHER_CHUNK, "gather C=256")):
    layout, base, fx, loc = jax.jit(
        lambda xx: build_chunk_layout(constants, xx, chunk=chunk, sort=sort0)
    )(x)

    timed(
        f"pack_payload {lab}",
        lambda c, lay=layout: pack_payload(
            constants, lay, fx + c * 1e-12, loc, gm, b, A
        ),
    )
    timed(
        f"  src row-gather only {lab}",
        lambda c, lay=layout: (
            (fx.reshape(n, 3) + c * 1e-12)[
                jnp.clip(lay.src, 0, n - 1)
            ],
            b[jnp.clip(lay.src, 0, n - 1)],
            A.reshape(n, 9)[jnp.clip(lay.src, 0, n - 1)],
        ),
    )
    timed(
        f"  concat(N,44) only {lab}",
        lambda c: jnp.concatenate(
            [
                fx + c * 1e-12, loc.astype(jnp.float32).reshape(n, 9),
                b, A.reshape(n, 9), gm[:, None],
                jnp.zeros((n, 1), jnp.float32), fx, fx, fx, fx,
            ],
            axis=1,
        ),
    )
