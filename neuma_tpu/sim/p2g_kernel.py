"""Pallas TPU kernels for the grid-blocked APIC scatter (sim/blocked.py).

The jnp blocked path materializes the per-chunk one-hot spline matrices
and (C, S^2) outer products in HBM (~0.5 GB round trip per step at 70^3)
and pays ~7 ms in row gathers for the chunked payload. This module
removes both:

* the chunk layout is *padded*: each block's particle run is padded to a
  multiple of the chunk size C, so chunk i is exactly rows
  ``[i*C, (i+1)*C)`` of the padded payload — a plain ``BlockSpec`` block
  that Pallas double-buffers from HBM with no gather;
* the per-chunk compute (one-hot builds, spline outer products,
  separable matmuls) runs entirely in VMEM: HBM sees only the payload
  read (~128 B/particle-slot) and the (M, 4, S, S^2) partial-block
  write.

Mosaic notes (validated on v5e): 3D reshapes like (C, S, S) -> (C, S^2)
are unsupported, so the outer products are built directly at (C, S^2)
with integer-iota one-hots (q//S == ly) * (q%S == lz); matmuls use
``precision=HIGHEST`` (default MXU passes are bf16 — a 1e-1-level error
on spline sums).

Reference spec: ``modules/nclaw/sim/mpm.py:321-371``; TPU-native
redesign, not a translation.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import MPMConstants

BLOCK = 14
S = BLOCK + 2  # 16: padded block side; S^2 = 256 lanes, power of two
CHUNK = 512

# payload column layout (44 used, padded to 48)
_W0 = 0        # 9: spline weights, 3 taps x 3 axes (x taps 0-2, y 3-5, z 6-8)
_L0 = 9       # 9: local tap grid lines (as f32 ints)
_BE0 = 18     # 3: b_eff = b - (A @ fx) * dx
_AC0 = 21     # 9: a_cols = A * dx, row-major
_GM = 30      # 1: mass channel value
_WD0 = 32     # 9: spline weight derivatives d w / d fx
_FX0 = 41     # 3: fx
_COLS = 48


class ChunkLayout(NamedTuple):
    """Static-shape chunked layout of particles sorted by grid block."""

    src: jnp.ndarray    # (M*C,) source particle index per padded slot
    valid: jnp.ndarray  # (M*C,) 1.0 for live slots
    c2b: jnp.ndarray    # (M,) block id per chunk
    dest: jnp.ndarray   # (N,) padded slot of each particle
    num_chunks: int     # M (static)
    nb: int             # blocks per axis (static)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def build_chunk_layout(
    constants: MPMConstants, x: jnp.ndarray, block: int = BLOCK, chunk: int = CHUNK
) -> Tuple[ChunkLayout, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort particles by grid block and carve into C-sized padded chunks.

    Returns (layout, base, fx, loc) where base/fx are the stencil
    geometry and loc the per-particle local tap lines (N, 3, 3).
    """
    g = constants.num_grids
    nb = _cdiv(g, block)
    NB = nb ** 3
    n = x.shape[0]
    C = chunk
    M = _cdiv(n, C) + NB
    dtype = x.dtype

    p_x = x * constants.inv_dx
    base = jnp.floor(p_x - 0.5).astype(jnp.int32)
    fx = p_x - base.astype(dtype)

    blk = jnp.clip(base, 0, g - 1) // block
    bid = (blk[:, 0] * nb + blk[:, 1]) * nb + blk[:, 2]
    taps = jnp.clip(
        base[:, :, None] + jnp.arange(3, dtype=jnp.int32)[None, None, :],
        0,
        g - 1,
    )
    loc = taps - (blk * block)[:, :, None]  # (N, 3, 3) in [0, S)

    perm = jnp.argsort(bid)
    sbid = bid[perm]
    bins = jnp.arange(NB, dtype=sbid.dtype)
    bstart = jnp.searchsorted(sbid, bins, side="left")
    counts = jnp.searchsorted(sbid, bins, side="right") - bstart
    nchunk = (counts + C - 1) // C
    cum = jnp.cumsum(nchunk)

    cid = jnp.arange(M, dtype=jnp.int32)
    c2b = jnp.searchsorted(cum, cid, side="right")
    in_range = c2b < NB
    c2b = jnp.minimum(c2b, NB - 1).astype(jnp.int32)
    prev_chunks = jnp.where(c2b > 0, cum[jnp.maximum(c2b - 1, 0)], 0)
    rank = cid - prev_chunks
    start = bstart[c2b] + rank * C
    cnt = jnp.clip(counts[c2b] - rank * C, 0, C) * in_range

    lane = jnp.arange(C, dtype=jnp.int32)
    slot = start[:, None] + lane[None, :]
    valid = (lane[None, :] < cnt[:, None]).reshape(-1).astype(dtype)
    src = perm[jnp.clip(slot, 0, n - 1)].reshape(-1)  # (M*C,)

    # Inverse map: particle -> padded slot (for scattering results back).
    inv_perm = jnp.argsort(perm)
    dest = C * jnp.where(bid > 0, cum[jnp.maximum(bid - 1, 0)], 0) + (
        inv_perm - bstart[bid]
    )
    return ChunkLayout(src, valid, c2b, dest, M, nb), base, fx, loc


def pack_payload(
    constants: MPMConstants,
    layout: ChunkLayout,
    fx: jnp.ndarray,
    loc: jnp.ndarray,
    gm: Optional[jnp.ndarray],
    b: jnp.ndarray,
    A: jnp.ndarray,
) -> jnp.ndarray:
    """Assemble the padded (M*C, 48) chunk payload."""
    n = fx.shape[0]
    dtype = fx.dtype
    wa = 1.5 - fx
    wb = fx - 1.0
    wc = fx - 0.5
    w = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], axis=-1)
    wd = jnp.stack([-wa, -2.0 * wb, wc], axis=-1)

    dxc = constants.dx
    b_eff = b - jnp.einsum("nij,nj->ni", A, fx) * dxc
    a_cols = A * dxc

    cols = [
        w.reshape(n, 9),
        loc.astype(dtype).reshape(n, 9),
        b_eff,
        a_cols.reshape(n, 9),
        (gm if gm is not None else jnp.zeros((n,), dtype))[:, None],
        jnp.zeros((n, 1), dtype),
        wd.reshape(n, 9),
        fx,
        jnp.zeros((n, _COLS - 44), dtype),
    ]
    payload = jnp.concatenate(cols, axis=1)
    padded = payload[layout.src] * layout.valid[:, None]
    return padded


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _p2g_fwd_kernel(p_ref, out_ref):
    C = p_ref.shape[0]
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST

    def col(j):
        return p_ref[:, j][:, None]  # (C, 1)

    idxS = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (C, S * S), 1)
    qdiv = q >> 4  # S = 16
    qmod = q & (S - 1)

    # x-axis one-hots at (C, S)
    Wx = jnp.zeros((C, S), f32)
    Wix = jnp.zeros((C, S), f32)
    for t in range(3):
        oh = (idxS == col(_L0 + t).astype(jnp.int32)).astype(f32)
        wt = col(_W0 + t)
        Wx += wt * oh
        if t:
            Wix += float(t) * wt * oh

    # y/z one-hots directly at (C, S^2): y on q//S, z on q%S
    yz = jnp.zeros((C, S * S), f32)
    yz_i = jnp.zeros((C, S * S), f32)
    yrep = jnp.zeros((C, S * S), f32)
    yrep_i = jnp.zeros((C, S * S), f32)
    ztil = jnp.zeros((C, S * S), f32)
    ztil_k = jnp.zeros((C, S * S), f32)
    for t in range(3):
        ohy = (qdiv == col(_L0 + 3 + t).astype(jnp.int32)).astype(f32)
        ohz = (qmod == col(_L0 + 6 + t).astype(jnp.int32)).astype(f32)
        wy = col(_W0 + 3 + t)
        wz = col(_W0 + 6 + t)
        yrep += wy * ohy
        ztil += wz * ohz
        if t:
            yrep_i += float(t) * wy * ohy
            ztil_k += float(t) * wz * ohz
    yz = yrep * ztil
    yz_i = yrep_i * ztil
    yz_k = yrep * ztil_k

    def dott(lhs, rhs):
        return jax.lax.dot_general(
            lhs,
            rhs,
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=prec,
        )

    for r in range(3):
        lhs = (
            yz * col(_BE0 + r)
            + yz_i * col(_AC0 + 3 * r + 1)
            + yz_k * col(_AC0 + 3 * r + 2)
        )
        term = dott(Wx, lhs) + dott(Wix, yz * col(_AC0 + 3 * r))
        out_ref[0, r] = term
    out_ref[0, 3] = dott(Wx * col(_GM), yz)


def run_p2g_fwd(payload: jnp.ndarray, M: int, interpret: bool = False):
    """payload (M*C, 48) -> partial blocks (M, 4, S, S^2)."""
    C = payload.shape[0] // M
    return pl.pallas_call(
        _p2g_fwd_kernel,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((C, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 4, S, S * S), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, 4, S, S * S), jnp.float32),
        interpret=interpret,
    )(payload)


def _fold(partials: jnp.ndarray, c2b: jnp.ndarray, g: int, nb: int):
    """(M, 4, S, S^2) partial chunks -> (g^3, 4) grid via per-block
    accumulation + static halo fold (see blocked._fold_blocks)."""
    from .blocked import _fold_blocks

    M = partials.shape[0]
    NB = nb ** 3
    pb = jnp.zeros((NB, 4, S, S * S), partials.dtype).at[c2b].add(partials)
    pb = pb.reshape(NB, 4, S, S, S).transpose(0, 2, 3, 4, 1)
    return _fold_blocks(pb, g, nb, BLOCK).reshape(g ** 3, 4)


def p2g_blocked_pallas(
    constants: MPMConstants,
    x: jnp.ndarray,
    gm: Optional[jnp.ndarray],
    b: jnp.ndarray,
    A: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Pallas-fused blocked APIC scatter. Same contract as
    ``blocked._blocked_forward``."""
    layout, base, fx, loc = build_chunk_layout(constants, x)
    payload = pack_payload(constants, layout, fx, loc, gm, b, A)
    partials = run_p2g_fwd(payload, layout.num_chunks, interpret=interpret)
    grid = _fold(partials, layout.c2b, constants.num_grids, layout.nb)
    grid_f = grid[:, :3]
    grid_m = grid[:, 3] if gm is not None else None
    return grid_m, grid_f
