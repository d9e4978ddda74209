"""A/B the lane-aware bitonic sort (ops/bitonic.py) against lax.sort at
the rasterizer's pair-build budgets.

In-graph repetition: each rep sorts ``k0 ^ (i * KNUTH)`` (fresh
pseudo-random input per rep, cheap to derive) and folds s[0] into the
carry so nothing can be hoisted or DCE'd.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from neuma_tpu.ops.bitonic import sort_i32

rng = np.random.default_rng(0)
REPS = 10
KNUTH = np.int32(-1640531527)  # 2654435761 mod 2^32, as int32


def bench(label, sorter, k0, reps=REPS, outer=3):
    def make(n):
        @jax.jit
        def run(k0):
            def body(i, acc):
                k = jnp.bitwise_and(
                    jnp.bitwise_xor(k0, i * KNUTH), jnp.int32(0x7FFFFFFF)
                )
                s = sorter(k)
                return acc + s[0] + s[-1]

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return run

    fs = [make(1), make(1 + reps)]
    ts = []
    for f in fs:
        out = f(k0)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(outer):
            t0 = time.perf_counter()
            jax.block_until_ready(f(k0))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / reps * 1000.0
    print(f"{label:36s}: {per:8.3f} ms", flush=True)
    return per


def lax_sorter(k):
    (s,) = jax.lax.sort((k,), num_keys=1)
    return s


for P in (1 << 16, 1 << 18):
    k0 = jnp.asarray(
        rng.integers(0, 1 << 31, size=P, dtype=np.int64), jnp.int32
    )
    bench(f"lax.sort      P=2^{P.bit_length()-1}", lax_sorter, k0)
    bench(f"bitonic       P=2^{P.bit_length()-1}", sort_i32, k0)

# parity on-device
P = 1 << 18
k = rng.integers(0, 1 << 31, size=P, dtype=np.int64).astype(np.int32)
out = np.asarray(jax.jit(sort_i32)(jnp.asarray(k)))
ref = np.sort(k)
print("parity:", bool((out == ref).all()))
