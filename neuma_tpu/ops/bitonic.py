"""Lane-aware bitonic sort for packed integer keys on TPU.

``jax.lax.sort`` on TPU lowers to a generic sorting routine that runs
~12 ms for 2^18 uint32 keys on v5e — far off the ~0.5 ms a
bandwidth-bound compare-exchange network would cost (the whole array is
1 MB; a bitonic network is 171 full passes = ~340 MB of traffic). This
module implements that network directly with XLA-friendly vector ops.
It is the pair-build sort for the rasterizer
(``render/rasterize.py::_sort_pairs_by_tile``), replacing the global
``lax.sort`` floor named in BENCHMARKS.md's round-4 headroom list.
Reference equivalent: the CUDA 64-bit radix sort behind the per-tile
ordered compositing of ``modules/tune/utils.py:323-421`` (upstream
NeuMA repo).

Layout: the (P,) key vector is viewed COLUMN-MAJOR as an (R, 128)
matrix with R = P // 128 — element ``i`` lives at (row ``i % R``, lane
``i // R``). Under this mapping the low ``log2(R)`` stride bits of the
bitonic network hit the ROW (sublane) axis, where compare-exchange is a
reshape + slice over major dims (free — no data movement, just
addressing), and only strides >= R touch the lane axis (28 of the 171
substages at P = 2^18, each one strided lane slice + concat). Row-major
would instead put 7 lane-level substages in EVERY stage (~100+ lane
shuffles).

Keys must be non-negative int32 (< 2^31): the rasterizer packs
``tile_id << bits_p | pair_idx`` into at most 31 bits (guarded by the
caller). Comparisons run as signed int32, which orders non-negative
values identically to uint32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _cmpex(x, j, k, R, m):
    """One compare-exchange substage: partner = index ^ j, ascending
    where (index & k) == 0, for x the (R, LANES) column-major view."""
    if j < R:
        # Row-stride substage: rows r and r + j swap candidates.
        g = R // (2 * j)
        v = x.reshape(g, 2, j, LANES)
        lo, hi = v[:, 0], v[:, 1]  # (g, j, LANES)
        if k < R:
            # asc depends on a row bit: r_lo = gi*2j + rj, bit log2(k).
            gi = jax.lax.broadcasted_iota(jnp.int32, (g, j, LANES), 0)
            rj = jax.lax.broadcasted_iota(jnp.int32, (g, j, LANES), 1)
            r_lo = gi * (2 * j) + rj
            asc = (r_lo & k) == 0
        else:
            # asc depends on a lane bit: index = l*R + r, and k >= R is
            # a pure lane bit (R, k powers of two).
            lane = jax.lax.broadcasted_iota(jnp.int32, (g, j, LANES), 2)
            asc = ((lane * R) & k) == 0
        mn = jnp.minimum(lo, hi)
        mx = jnp.maximum(lo, hi)
        new_lo = jnp.where(asc, mn, mx)
        new_hi = jnp.where(asc, mx, mn)
        return jnp.stack([new_lo, new_hi], axis=1).reshape(R, LANES)

    # Lane-stride substage: lanes l and l + j//R swap candidates.
    jl = j // R
    gl = LANES // (2 * jl)
    v = x.reshape(R, gl, 2, jl)
    lo, hi = v[:, :, 0], v[:, :, 1]  # (R, gl, jl)
    # index = l*R + r with l = gi*2jl + half*jl + lj; (index & k): k >= j
    # >= R is a lane bit, so asc depends on l_lo's bit log2(k // R).
    kl = k // R
    gi = jax.lax.broadcasted_iota(jnp.int32, (R, gl, jl), 1)
    lj = jax.lax.broadcasted_iota(jnp.int32, (R, gl, jl), 2)
    l_lo = gi * (2 * jl) + lj
    asc = (l_lo & kl) == 0
    mn = jnp.minimum(lo, hi)
    mx = jnp.maximum(lo, hi)
    new_lo = jnp.where(asc, mn, mx)
    new_hi = jnp.where(asc, mx, mn)
    return jnp.stack([new_lo, new_hi], axis=2).reshape(R, LANES)


def sortable(n: int) -> bool:
    """True when :func:`sort_i32` handles length ``n``: a power of two
    with at least one full (LANES, LANES) tile."""
    return n >= LANES * LANES and (n & (n - 1)) == 0


def sort_i32(keys: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of (P,) non-negative int32 keys, P = 2^m >= 2^14.

    Pure jnp — runs on any backend (CPU tests use it directly); on TPU
    every substage is a fused min/max/select pass over a 4·P-byte
    array."""
    P = keys.shape[0]
    assert sortable(P), f"sort_i32 needs pow2 length >= {LANES*LANES}: {P}"
    m = int(P).bit_length() - 1
    R = P // LANES
    # Column-major view: x[r, l] = keys[l*R + r].
    x = keys.reshape(LANES, R).T
    for kk in range(1, m + 1):
        k = 1 << kk
        for jj in range(kk - 1, -1, -1):
            x = _cmpex(x, 1 << jj, k, R, m)
    return x.T.reshape(P)


def sort_pairs_u32(key: jnp.ndarray) -> jnp.ndarray:
    """Sort (P,) uint32 keys with values < 2^31 (the rasterizer's packed
    ``tile << bits_p | pair`` keys). Returns sorted uint32."""
    s = sort_i32(key.astype(jnp.int32))
    return s.astype(jnp.uint32)
