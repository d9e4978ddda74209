"""Split the blocked gather/scatter timings into glue vs kernel:
pack_payload, unfold_blocks, the Pallas kernels alone, the dest
un-permute, and the fold — each slope-timed on the real TPU at the
realworld 30k/70^3 shape."""
import sys as _sys
import time
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.core.types import MPMConstants
from neuma_tpu.sim.p2g_kernel import (
    BLOCK,
    CHUNK,
    GATHER_CHUNK,
    _cdiv,
    _fold,
    block_sort,
    build_chunk_layout,
    pack_payload,
    run_apic_gather,
    run_p2g_fwd,
    unfold_blocks,
)

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
df = jnp.asarray(rng.standard_normal((g ** 3, 3)), jnp.float32)
du = jnp.asarray(rng.standard_normal((g ** 3,)), jnp.float32)

sort = jax.jit(lambda xx: block_sort(constants, xx))(x)
nbs = (_cdiv(g, BLOCK),) * 3

lay_g, _, _, _ = jax.jit(
    lambda xx: build_chunk_layout(constants, xx, chunk=GATHER_CHUNK,
                                  sort=sort)
)(x)
lay_s, _, _, _ = jax.jit(
    lambda xx: build_chunk_layout(constants, xx, chunk=CHUNK, sort=sort)
)(x)
Mg = lay_g.c2b.shape[0]
Ms = lay_s.c2b.shape[0]
print(f"gather chunks {Mg} x {GATHER_CHUNK} = {Mg*GATHER_CHUNK} slots; "
      f"scatter chunks {Ms} x {CHUNK} = {Ms*CHUNK} slots; n={n}")

payload_g = jax.jit(
    lambda: pack_payload(constants, lay_g, sort.fx, sort.loc, gm, b, A)
)()
payload_s = jax.jit(
    lambda: pack_payload(constants, lay_s, sort.fx, sort.loc, gm, b, A)
)()
grid_ch = jnp.concatenate([df, du[:, None]], axis=1)
slabs = jax.jit(
    lambda: unfold_blocks(grid_ch, (g, g, g), nbs)
)()
partials = jax.jit(lambda: run_p2g_fwd(payload_s, Ms))()


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
    print(f"{label:34s} {t*1e3:8.3f} ms")
    return t


timed(
    "pack_payload (gather layout)",
    lambda c: pack_payload(constants, lay_g, sort.fx + c * 1e-12,
                           sort.loc, gm, b, A),
)
timed(
    "unfold_blocks (grid -> slabs)",
    lambda c: unfold_blocks(grid_ch + c * 1e-12, (g, g, g), nbs),
)
timed(
    "gather KERNEL derivs",
    lambda c: run_apic_gather(
        payload_g + c * 1e-12, slabs, lay_g.c2b, Mg,
        float(constants.inv_dx), True,
    ),
)
timed(
    "gather KERNEL no-derivs",
    lambda c: run_apic_gather(
        payload_g + c * 1e-12, slabs, lay_g.c2b, Mg,
        float(constants.inv_dx), False,
    ),
)
out0 = jax.jit(
    lambda: run_apic_gather(payload_g, slabs, lay_g.c2b, Mg,
                            float(constants.inv_dx), True)
)()
timed("dest un-permute (out[dest])", lambda c: (out0 + c * 1e-12)[lay_g.dest])
timed(
    "pack_payload (scatter layout)",
    lambda c: pack_payload(constants, lay_s, sort.fx + c * 1e-12,
                           sort.loc, gm, b, A),
)
timed(
    "scatter KERNEL",
    lambda c: run_p2g_fwd(payload_s + c * 1e-12, Ms),
)
timed(
    "fold (partials -> grid)",
    lambda c: _fold(partials + c * 1e-12, lay_s.c2b, (g, g, g), nbs),
)
