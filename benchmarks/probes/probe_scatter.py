"""Breakdown of the blocked scatter fwd + gather bwd at 30k/70^3."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.core.types import MPMConstants
from neuma_tpu.sim.blocked import _fold_blocks, BLOCK
from neuma_tpu.sim.p2g_kernel import (
    S, block_sort, build_chunk_layout, pack_payload, run_p2g_fwd,
    run_apic_gather, unfold_blocks, GATHER_CHUNK, _fold,
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


def timed(label, body):
    def make(K):
        @jax.jit
        def run(a):
            def sbody(c, _):
                out = body(c)
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

    print(f"{label:34s} {slope(make)*1e3:8.3f} ms")


rng = np.random.default_rng(0)
n, g = 30_000, 70
constants = MPMConstants(
    num_grids=g, bound=1, bc="noslip", dt=jnp.float32(1e-3),
    gravity=jnp.asarray([0, -9.8, 0], jnp.float32), eps=jnp.float32(6e-7),
)
x = jnp.asarray((0.3 + 0.4 * rng.random((n, 3))).astype(np.float32))
gm = jnp.abs(jnp.asarray(rng.standard_normal((n,)), jnp.float32))
b3 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
A33 = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
df = jnp.asarray(rng.standard_normal((g ** 3, 3)), jnp.float32) * 1e-3
du = jnp.asarray(rng.standard_normal((g ** 3,)), jnp.float32) * 1e-3

sort0 = jax.jit(lambda xx: block_sort(constants, xx))(x)
layout, base, fx, loc = jax.jit(
    lambda xx: build_chunk_layout(constants, xx, sort=sort0)
)(x)
payload = jax.jit(
    lambda c: pack_payload(constants, layout, fx, loc, gm, b3, A33)
)(0)
nb = -(-70 // 14)
M = -(-30000 // 512) + nb ** 3
M2 = -(-30000 // 256) + nb ** 3

timed("carve layout (given sort)",
      lambda c: build_chunk_layout(constants, x + c * 1e-12, sort=sort0))
timed("fwd kernel only",
      lambda c: run_p2g_fwd(payload + c * 1e-12, M))
partials = jax.jit(lambda: run_p2g_fwd(payload, M))()
timed("scatter-add partials -> blocks",
      lambda c: jnp.zeros((nb ** 3, 4, S, S * S), jnp.float32)
      .at[layout.c2b].add(partials + c * 1e-12))
pb = jax.jit(
    lambda: jnp.zeros((nb ** 3, 4, S, S * S), jnp.float32)
    .at[layout.c2b].add(partials)
)()
timed("fold blocks -> grid",
      lambda c: _fold_blocks(
          (pb + c * 1e-12).reshape(nb ** 3, 4, S, S, S)
          .transpose(0, 2, 3, 4, 1), (g, g, g), (nb, nb, nb), BLOCK))

# gather side
layout2, _, fx2, loc2 = jax.jit(
    lambda xx: build_chunk_layout(
        constants, xx, chunk=GATHER_CHUNK, sort=sort0
    )
)(x)
payload2 = jax.jit(
    lambda c: pack_payload(constants, layout2, fx2, loc2, gm, b3, A33)
)(0)
grid_ch = jnp.concatenate([df, du[:, None]], axis=1)
timed("unfold grid -> slabs",
      lambda c: unfold_blocks(grid_ch + c * 1e-12, (g, g, g), (nb, nb, nb)))
slabs = jax.jit(lambda: unfold_blocks(grid_ch, (g, g, g), (nb, nb, nb)))()
timed("gather kernel (derivs)",
      lambda c: run_apic_gather(
          payload2 + c * 1e-12, slabs, layout2.c2b, M2,
          float(constants.inv_dx), True))
out = jax.jit(
    lambda: run_apic_gather(
        payload2, slabs, layout2.c2b, M2,
        float(constants.inv_dx), True)
)()
timed("dest row-gather",
      lambda c: (out + c * 1e-12)[layout2.dest])
