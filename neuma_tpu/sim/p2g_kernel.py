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

from ..core.types import GridGeom, MPMConstants

import os as _os

# MXU precision for the in-kernel f32 contractions. XLA's HIGHEST is a
# 6-pass bf16 decomposition on v5e (and Mosaic rejects Precision.HIGH),
# so "high3" implements the 3-pass split by hand: a = a_hi + a_lo with
# a_hi = bf16(a), then a@b = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi — the
# same ~2^-21 operand reconstruction at HALF the MXU passes. The
# stacked channel-combine dots of the derivs gather are MXU-bound, so
# this is ~2x on the sim backward's hot kernel. Knob for A/B.
_PREC_MODE = _os.environ.get("NEUMA_KERNEL_PREC", "high3")
_PREC_TABLE = {
    "default": jax.lax.Precision.DEFAULT,
    "high3": jax.lax.Precision.HIGHEST,  # high3 overrides via _kdot
    "highest": jax.lax.Precision.HIGHEST,
}
if _PREC_MODE not in _PREC_TABLE:
    raise ValueError(
        f"NEUMA_KERNEL_PREC={_PREC_MODE!r}: valid modes are "
        f"{sorted(_PREC_TABLE)} (XLA's Precision.HIGH is rejected by "
        "Mosaic; 'high3' is the manual 3-pass bf16 split)"
    )
_PREC = _PREC_TABLE[_PREC_MODE]


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _kdot(a, b, dims):
    """In-kernel f32 dot at the configured precision (see _PREC_MODE)."""
    if _PREC_MODE != "high3":
        return jax.lax.dot_general(
            a, b, dims,
            preferred_element_type=jnp.float32, precision=_PREC,
        )
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)

BLOCK = 14
S = BLOCK + 2  # 16: padded block side; S^2 = 256 lanes, power of two
# Chunk sizes trade padding waste (every nonempty block pads its last
# chunk: expected waste ~ NB * C / 2 slots) against per-chunk fixed
# costs; env-tunable for hardware A/B (measured defaults below).
CHUNK = int(_os.environ.get("NEUMA_SCATTER_CHUNK", "128"))

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
    """Static-shape chunked layout of particles sorted by grid block.
    All leaves are arrays (pytree-safe through custom-VJP residuals);
    the chunk count is ``c2b.shape[0]`` and blocks-per-axis derives from
    ``constants`` (``_cdiv(num_grids, BLOCK)``)."""

    src: jnp.ndarray    # (M*C,) source particle index per padded slot
    valid: jnp.ndarray  # (M*C,) 1.0 for live slots
    c2b: jnp.ndarray    # (M,) block id per chunk
    dest: jnp.ndarray   # (N,) padded slot of each particle


class BlockSort(NamedTuple):
    """Block-sorted particle order + stencil geometry, shared by every
    scatter/gather primitive inside one MPM step (the argsort and
    searchsorteds are the expensive part of the layout — rebuilding them
    up to 7x per fwd+bwd step was ~40% of the step). All leaves are
    arrays so the pytree threads through ``custom_vjp`` residuals; the
    (static) blocks-per-axis count is derived from ``constants``."""

    perm: jnp.ndarray      # (N,) block-sorted order
    inv_perm: jnp.ndarray  # (N,) rank of each particle in sorted order
    bstart: jnp.ndarray    # (NB,) first sorted index of each block
    counts: jnp.ndarray    # (NB,) particles per block
    bid: jnp.ndarray       # (N,) flat block id per particle
    base: jnp.ndarray      # (N, 3) stencil base cell
    fx: jnp.ndarray        # (N, 3) fractional position
    loc: jnp.ndarray       # (N, 3, 3) local tap grid lines in [0, S)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _sort_geometry(
    constants: MPMConstants,
    x: jnp.ndarray,
    block: int = BLOCK,
    geom: Optional[GridGeom] = None,
):
    """The cheap, elementwise half of :func:`block_sort`: stencil base,
    fractional position, local tap lines, and flat block id per
    particle. Re-run every substep by :func:`refresh_step_layouts`;
    the expensive argsort half only re-runs when a ``bid`` changed."""
    g = constants.num_grids
    dims = (g, g, g) if geom is None else geom.dims
    nbx, nby, nbz = (_cdiv(d, block) for d in dims)
    dtype = x.dtype

    p_x = x * constants.inv_dx
    base = jnp.floor(p_x - 0.5).astype(jnp.int32)
    fx = p_x - base.astype(dtype)

    taps = jnp.clip(
        base[:, :, None] + jnp.arange(3, dtype=jnp.int32)[None, None, :],
        0,
        g - 1,
    )
    if geom is None:
        blk = jnp.clip(base, 0, g - 1) // block
        loc = taps - (blk * block)[:, :, None]  # (N, 3, 3) in [0, S)
    else:
        dims_arr = jnp.asarray(dims, jnp.int32)
        bloc = jnp.clip(
            jnp.clip(base, 0, g - 1) - geom.origin[None, :],
            0,
            dims_arr - 1,
        )
        blk = bloc // block
        tl = taps - geom.origin[None, :, None]
        loc = tl - (blk * block)[:, :, None]
        in_view = (
            (tl >= 0)
            & (tl < dims_arr[None, :, None])
            & (loc >= 0)
            & (loc < block + 2)
        )
        loc = jnp.where(in_view, loc, -1)
    bid = (blk[:, 0] * nby + blk[:, 1]) * nbz + blk[:, 2]
    return base, fx, loc, bid, nbx * nby * nbz


def block_sort(
    constants: MPMConstants,
    x: jnp.ndarray,
    block: int = BLOCK,
    geom: Optional[GridGeom] = None,
) -> BlockSort:
    """One argsort by flat block id + bucket ranges + stencil geometry.

    With a ``geom`` view, block ids and local tap lines are computed in
    view-local coordinates; taps outside the view get line -1 (the
    kernels' one-hots never fire for them, so they contribute nothing —
    they belong to a neighboring shard's view)."""
    n = x.shape[0]
    base, fx, loc, bid, NB = _sort_geometry(constants, x, block, geom)

    idx = jnp.arange(n, dtype=jnp.int32)
    if n * NB <= (1 << 25):
        # Counting sort over the NB block buckets: a one-hot cumsum
        # gives every particle its stable rank within its block (same
        # order as a stable argsort — by bid, ties by index) with no
        # sort network at all; one scatter materializes the
        # permutation. Transient cost: (N, NB) ints.
        onehot = (
            bid[:, None] == jnp.arange(NB, dtype=bid.dtype)[None, :]
        ).astype(jnp.int32)
        incl = jnp.cumsum(onehot, axis=0)
        counts = incl[-1]
        rank = jnp.take_along_axis(incl, bid[:, None], axis=1)[:, 0] - 1
        bstart = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        inv_perm = bstart[bid] + rank
        perm = jnp.zeros((n,), jnp.int32).at[inv_perm].set(idx)
    else:
        # Large N x NB: the one-hot table would dominate memory — fall
        # back to the sort network.
        perm = jnp.argsort(bid)
        sbid = bid[perm]
        bins = jnp.arange(NB, dtype=sbid.dtype)
        bstart = jnp.searchsorted(sbid, bins, side="left")
        counts = jnp.searchsorted(sbid, bins, side="right") - bstart
        inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(idx)
    return BlockSort(perm, inv_perm, bstart, counts, bid, base, fx, loc)


def build_chunk_layout(
    constants: MPMConstants,
    x: jnp.ndarray,
    block: int = BLOCK,
    chunk: int = CHUNK,
    sort: Optional[BlockSort] = None,
    geom: Optional[GridGeom] = None,
) -> Tuple[ChunkLayout, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Carve the block-sorted order into C-sized padded chunks.

    Returns (layout, base, fx, loc) where base/fx are the stencil
    geometry and loc the per-particle local tap lines (N, 3, 3).
    ``sort`` (from :func:`block_sort`) is rebuilt when not supplied.
    """
    g = constants.num_grids
    dims = (g, g, g) if geom is None else geom.dims
    NB = 1
    for d in dims:
        NB *= _cdiv(d, block)
    n = x.shape[0]
    C = chunk
    M = _cdiv(n, C) + NB
    dtype = x.dtype

    if sort is None:
        sort = block_sort(constants, x, block, geom=geom)
    perm, bstart, counts, bid = sort.perm, sort.bstart, sort.counts, sort.bid

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
    dest = C * jnp.where(bid > 0, cum[jnp.maximum(bid - 1, 0)], 0) + (
        sort.inv_perm - bstart[bid]
    )
    return ChunkLayout(src, valid, c2b, dest), sort.base, sort.fx, sort.loc


class StepLayouts(NamedTuple):
    """The shared per-step sort plus BOTH pre-carved chunk layouts (the
    scatter kernels' CHUNK and the gather kernels' GATHER_CHUNK). Built
    once in ``mpm_step``; the carve alone is ~0.7 ms at 30k particles
    and used to run five times per fwd+bwd step."""

    sort: BlockSort
    scatter: ChunkLayout  # chunk == CHUNK
    gather: ChunkLayout   # chunk == GATHER_CHUNK


def build_step_layouts(
    constants: MPMConstants,
    x: jnp.ndarray,
    geom: Optional[GridGeom] = None,
) -> StepLayouts:
    sort = block_sort(constants, x, geom=geom)
    scatter, _, _, _ = build_chunk_layout(
        constants, x, chunk=CHUNK, sort=sort, geom=geom
    )
    gather, _, _, _ = build_chunk_layout(
        constants, x, chunk=GATHER_CHUNK, sort=sort, geom=geom
    )
    return StepLayouts(sort, scatter, gather)


def refresh_step_layouts(
    constants: MPMConstants,
    x: jnp.ndarray,
    stale: StepLayouts,
    geom: Optional[GridGeom] = None,
) -> Tuple[StepLayouts, jnp.ndarray]:
    """Amortize the per-step block sort across a substep scan.

    CFL keeps particle motion well under one cell per substep, so a
    particle's flat block id (blocks are ``BLOCK`` = 14 cells wide)
    rarely changes between substeps — but the tap window has zero
    slack (a 3-tap stencil in an S=16 slab over a 14-cell core), so a
    stale sort is valid EXACTLY when every bid is unchanged. This
    recomputes the cheap elementwise geometry (base/fx/loc/bid) from
    the fresh positions, and only when some bid moved does ``lax.cond``
    take the full rebuild branch (argsort + searchsorteds + both chunk
    carvings).

    Returns ``(layouts, reused)`` — carry ``layouts`` through the scan;
    ``reused`` is a () bool (False on the substeps that re-sorted), for
    telemetry only. Gradients: callers pass the result into custom-VJP
    primitives whose sort cotangent is zeroed, and the geometry is
    recomputed from ``stop_gradient(x)``, so no AD path leaks through
    the layout refresh.
    """
    xs = jax.lax.stop_gradient(x)
    base, fx, loc, bid, _ = _sort_geometry(constants, xs, BLOCK, geom)
    reused = jnp.all(bid == stale.sort.bid)

    def reuse(_):
        return StepLayouts(
            stale.sort._replace(base=base, fx=fx, loc=loc),
            stale.scatter,
            stale.gather,
        )

    def rebuild(_):
        return build_step_layouts(constants, xs, geom)

    return jax.lax.cond(reused, reuse, rebuild, None), reused


def _resolve_layout(
    constants: MPMConstants, x: jnp.ndarray, chunk: int, shared, geom=None
) -> Tuple[ChunkLayout, BlockSort]:
    """shared may be None, a BlockSort, or a StepLayouts. Callers
    passing a shared sort/layout must have built it with the SAME
    ``geom`` (the per-step layouts are view-local)."""
    if isinstance(shared, StepLayouts):
        if chunk == CHUNK:
            return shared.scatter, shared.sort
        if chunk == GATHER_CHUNK:
            return shared.gather, shared.sort
        shared = shared.sort
    if shared is None:
        shared = block_sort(constants, x, geom=geom)
    layout, _, _, _ = build_chunk_layout(
        constants, x, chunk=chunk, sort=shared, geom=geom
    )
    return layout, shared


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

def _axis_rows(col, a, idxS):
    """Per-axis (C, S) one-hot weight rows (plain + tap-offset-weighted)
    from the payload's weight + local-line columns."""
    f32 = jnp.float32
    C = idxS.shape[0]
    W = jnp.zeros((C, S), f32)
    Wi = jnp.zeros((C, S), f32)
    for t in range(3):
        oh = (idxS == col(_L0 + 3 * a + t).astype(jnp.int32)).astype(f32)
        wt = col(_W0 + 3 * a + t)
        W += wt * oh
        if t:
            Wi += float(t) * wt * oh
    return W, Wi


def _p2g_fwd_kernel(p_ref, out_ref):
    C = p_ref.shape[0]
    f32 = jnp.float32

    def col(j):
        return p_ref[:, j][:, None]  # (C, 1)

    idxS = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)

    # x-axis one-hots at (C, S)
    Wx, Wix = _axis_rows(col, 0, idxS)

    # y/z one-hots directly at (C, S^2): y on q//S, z on q%S. (Two
    # structured-expansion variants were measured on v5e and LOST:
    # full MXU one-hot expansion 15.1 -> 17.0 ms per step, and
    # lane-tile-z + expansion-dot-y 11.8 -> 13.2 ms — the direct
    # 3-tap builds win despite the (C, S^2) VPU footprint.)
    q = jax.lax.broadcasted_iota(jnp.int32, (C, S * S), 1)
    qdiv = q >> 4  # S = 16
    qmod = q & (S - 1)
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
        return _kdot(lhs, rhs, (((0,), (0,)), ((), ())))

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


def _fold(partials: jnp.ndarray, c2b: jnp.ndarray, dims, nbs):
    """(M, 4, S, S^2) partial chunks -> (num_cells, 4) grid via
    per-block accumulation + static halo fold (see
    blocked._fold_blocks)."""
    from .blocked import _fold_blocks

    NB = nbs[0] * nbs[1] * nbs[2]
    pb = jnp.zeros((NB, 4, S, S * S), partials.dtype).at[c2b].add(partials)
    pb = pb.reshape(NB, 4, S, S, S).transpose(0, 2, 3, 4, 1)
    return _fold_blocks(pb, dims, nbs, BLOCK).reshape(
        dims[0] * dims[1] * dims[2], 4
    )


def p2g_blocked_pallas(
    constants: MPMConstants,
    x: jnp.ndarray,
    gm: Optional[jnp.ndarray],
    b: jnp.ndarray,
    A: jnp.ndarray,
    interpret: bool = False,
    sort: Optional[BlockSort] = None,
    geom: Optional[GridGeom] = None,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Pallas-fused blocked APIC scatter. Same contract as
    ``blocked._blocked_forward``. ``sort`` may be a BlockSort or a
    pre-carved StepLayouts (built with the same ``geom``)."""
    g = constants.num_grids
    dims = (g, g, g) if geom is None else geom.dims
    layout, bsort = _resolve_layout(constants, x, CHUNK, sort, geom)
    payload = pack_payload(
        constants, layout, bsort.fx, bsort.loc, gm, b, A
    )
    partials = run_p2g_fwd(payload, layout.c2b.shape[0], interpret=interpret)
    nbs = tuple(_cdiv(d, BLOCK) for d in dims)
    grid = _fold(partials, layout.c2b, dims, nbs)
    grid_f = grid[:, :3]
    grid_m = grid[:, 3] if gm is not None else None
    return grid_m, grid_f


# --------------------------------------------------------------------------
# gather/contraction kernel: the transpose structure
# --------------------------------------------------------------------------
#
# One kernel serves three roles (identical contraction structure):
#   * p2g backward: slab = (f-cotangent, m-cotangent), payload carries the
#     forward (gm, b_eff, a_cols) -> outputs (dgm, db, dA, dx)
#   * g2p forward:  slab = (grid_v, 0), zero (gm, b, A), derivs=False ->
#     db IS new_v and dA IS new_C / (4 inv_dx^2)
#   * g2p backward (position path): slab = (grid_v, 0), payload carries
#     (b = v-cotangent, A = kappa * C-cotangent) -> dx is the position
#     cotangent through the spline weights + dpos
#
# Per particle with slab values r_o (3) / u_o (1) at tap o:
#   dgm  = sum_o W_o u_o
#   db   = sum_o W_o r_o
#   dA   = sum_o W_o r_o (x) dpos_o
#   dx_a = inv_dx * sum_o (dW/dfx_a)_o s_o  -  sum_o W_o (A^T r_o)_a
#   s_o  = u_o gm + r_o . (b_eff + sum_c a_col_c o_c)
# Each tap-sum sum_o ax_i ay_j az_k T[cell_o] factorizes as
#   rowsum( xy_onehot(C, S^2) * dot(az_onehot (C,S), slab (4 S^2, S)^T)[ch] )
# — the z contraction rides the MXU, x/y live on the 256-lane dim.

_OUT_COLS = 16  # dgm | db (3) | dA (9) | dx (3)


def _make_gather_kernel(derivs: bool, inv_dx: float):
    """Tap-gather kernel: one (C,)-chunk of particles reads its block
    slab and contracts the 27 B-spline taps against the slab channels.
    (A fused two-problem variant that shared the one-hot factor build
    between the p2g adjoint and the g2p position adjoint was measured
    on v5e and LOST — 14.6 vs 13.9 ms per 70³ step — so the backward
    runs two single-problem passes.)"""
    dxc = 1.0 / inv_dx

    def kernel(c2b_ref, p_ref, slab_ref, out_ref):
        C = p_ref.shape[0]
        f32 = jnp.float32

        def col(j):
            return p_ref[:, j][:, None]

        if True:
            # (ch, S, S, S) -> (S, ch*S*S): z-lines as contraction rows.
            # The transpose buys the canonical (C,S)@(S,K) dot form —
            # the ((1,),(1,)) contraction silently ignores HIGHEST
            # precision on v5e (bf16 passes, ~4e-3 error after the
            # dpos cancellation).
            n_ch = 4
            slabT = slab_ref[0].reshape(n_ch * S * S, S).T

            idxS = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
            q = jax.lax.broadcasted_iota(jnp.int32, (C, S * S), 1)
            qdiv = q >> 4
            qmod = q & (S - 1)

            # per-axis one-hot factors
            def factors(axis, pattern):
                w0, l0, d0 = (
                    _W0 + 3 * axis, _L0 + 3 * axis, _WD0 + 3 * axis
                )
                fxa = col(_FX0 + axis)
                plain = jnp.zeros((C, S * S), f32)
                off = jnp.zeros((C, S * S), f32)
                der = jnp.zeros((C, S * S), f32) if derivs else None
                der_off = (
                    jnp.zeros((C, S * S), f32) if derivs else None
                )
                for t in range(3):
                    oh = (
                        pattern == col(l0 + t).astype(jnp.int32)
                    ).astype(f32)
                    a = col(w0 + t) * oh
                    plain += a
                    if t:
                        off += float(t) * a
                    if derivs:
                        bm = col(d0 + t) * oh
                        der += bm
                        if t:
                            der_off += float(t) * bm
                # (t - fx) weighting: per-ELEMENT each column holds
                # one tap's w, so off - fx*plain = w*(t - fx) with
                # no large cancelling sums (the catastrophic form
                # would subtract AFTER the tap reductions).
                dpos = off - fxa * plain
                return plain, off, dpos, der, der_off

            X, Xi, Xp, Xd, Xdi = factors(0, qdiv)
            Y, Yj, Yp, Yd, Ydj = factors(1, qmod)

            # z one-hots at (C, S) for the MXU contraction
            Z = jnp.zeros((C, S), f32)
            Zk = jnp.zeros((C, S), f32)
            Zd = jnp.zeros((C, S), f32) if derivs else None
            Zdk = jnp.zeros((C, S), f32) if derivs else None
            fz = col(_FX0 + 2)
            for t in range(3):
                oh = (idxS == col(_L0 + 6 + t).astype(jnp.int32)).astype(f32)
                a = col(_W0 + 6 + t) * oh
                Z += a
                if t:
                    Zk += float(t) * a
                if derivs:
                    bm = col(_WD0 + 6 + t) * oh
                    Zd += bm
                    if t:
                        Zdk += float(t) * bm
            Zp = Zk - fz * Z  # per-element w*(t - fz), see factors()

            def zdot(zmat):
                # (C, 4*S*S); channel ch at cols [ch*S*S:(ch+1)*S*S]
                return _kdot(zmat, slabT, (((1,), (0,)), ((), ())))

            Tz = zdot(Z)
            Tzp = zdot(Zp)

            def red(xy, T, ch):
                return jnp.sum(
                    xy * T[:, ch * S * S : (ch + 1) * S * S],
                    axis=1,
                    keepdims=True,
                )

            xy = X * Y
            xy_ix = Xi * Y
            xy_jy = X * Yj
            xy_px = Xp * Y
            xy_py = X * Yp

            db = [red(xy, Tz, r) for r in range(3)]
            dgm = red(xy, Tz, 3)
            out_ref[:, 0] = dgm[:, 0]
            for r in range(3):
                out_ref[:, 1 + r] = db[r][:, 0]
                # dA[r, c] = dx * sum_o W (t_c - fx_c) r  — the (t - fx)
                # weighting lives inside the one-hot factor, so no
                # O(1)-O(1) cancellation
                out_ref[:, 4 + 3 * r + 0] = (dxc * red(xy_px, Tz, r))[:, 0]
                out_ref[:, 4 + 3 * r + 1] = (dxc * red(xy_py, Tz, r))[:, 0]
                out_ref[:, 4 + 3 * r + 2] = (dxc * red(xy, Tzp, r))[:, 0]

            if not derivs:
                out_ref[:, 13] = jnp.zeros((C,), f32)
                out_ref[:, 14] = jnp.zeros((C,), f32)
                out_ref[:, 15] = jnp.zeros((C,), f32)
                return

            xy_dx = Xd * Y
            xy_dix = Xdi * Y
            xy_dx_jy = Xd * Yj
            xy_dy = X * Yd
            xy_ix_dy = Xi * Yd
            xy_djy = X * Ydj

            gmc = col(_GM)
            # dx needs, per deriv axis, 13 per-channel (C, S^2)
            # multiply+rowsum reductions; since the channel coefficients
            # (gm, b_eff, a_cols) are per-particle scalars, combine them
            # INSIDE the z-contraction instead: lhs row c is the
            # concatenation of coef_ch(c) * zweight(c, :) blocks, rhs is
            # the matching stack of (S, S^2) slab slices. 4 tiny MXU
            # dots replace 30 VPU reductions (and the wide Tzk/Tzd/Tzdk
            # zdots disappear).
            def zslab(ch):
                return slabT[:, ch * S * S : (ch + 1) * S * S]  # (S, S^2)

            def stack_dot(lhs_blocks, rhs_blocks):
                lhs = jnp.concatenate(lhs_blocks, axis=1)  # (C, 16*k)
                rhs = jnp.concatenate(rhs_blocks, axis=0)  # (16*k, S^2)
                return _kdot(lhs, rhs, (((1,), (0,)), ((), ())))  # (C, S^2)

            # rhs stacks are shared between the plain and the
            # z-derivative variants (rows are slab slices only).
            rhs_s = [zslab(3), zslab(0), zslab(1), zslab(2),
                     zslab(0), zslab(1), zslab(2)]
            rhs_a = [zslab(0), zslab(1), zslab(2)]

            def smat(zmat, zkmat):
                # gm*ch3 + sum_r b_eff_r*ch_r (z-weight) + a_r2*ch_r
                # (k-weighted z)
                return stack_dot(
                    [gmc * zmat]
                    + [col(_BE0 + r) * zmat for r in range(3)]
                    + [col(_AC0 + 3 * r + 2) * zkmat for r in range(3)],
                    rhs_s,
                )

            def amat(cidx, zmat):
                return stack_dot(
                    [col(_AC0 + 3 * r + cidx) * zmat for r in range(3)],
                    rhs_a,
                )

            Smat = smat(Z, Zk)
            A0m = amat(0, Z)
            A1m = amat(1, Z)
            Smat_d = smat(Zd, Zdk)
            A0md = amat(0, Zd)
            A1md = amat(1, Zd)

            def rsum(xy_f, mat):
                return jnp.sum(xy_f * mat, axis=1, keepdims=True)

            # one cross-lane reduction per deriv axis (the three terms
            # combine elementwise before the rowsum)
            dxv = [
                rsum(xy_dx * Smat + xy_dix * A0m + xy_dx_jy * A1m, 1.0),
                rsum(xy_dy * Smat + xy_ix_dy * A0m + xy_djy * A1m, 1.0),
                rsum(xy * Smat_d + xy_ix * A0md + xy_jy * A1md, 1.0),
            ]

            for a in range(3):
                # minus term: - sum_i A[i, a] db_i  (A = a_cols / dx)
                minus = jnp.zeros((C, 1), f32)
                for i2 in range(3):
                    minus += col(_AC0 + 3 * i2 + a) * db[i2]
                out_ref[:, 13 + a] = (
                    inv_dx * dxv[a] - inv_dx * minus
                )[:, 0]

    return kernel


def _unfold_axis(x: jnp.ndarray, nb: int) -> jnp.ndarray:
    """(..., nb*BLOCK + 2, rest) -> (..., nb, S, rest): slab b covers
    lines [b*BLOCK, b*BLOCK + S) — block core (reshape) plus the next
    block's first two lines (shifted reshape). Inverse of
    ``blocked._fold_axis``; pure reshapes/pads."""
    B = BLOCK
    core = x[..., : nb * B, :]
    core = core.reshape(x.shape[:-2] + (nb, B) + x.shape[-1:])
    head = x[..., B:, :]  # (..., (nb-1)*B + 2, rest)
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, B - 2)
    head = jnp.pad(head, pad).reshape(
        x.shape[:-2] + (nb, B) + x.shape[-1:]
    )[..., :2, :]
    return jnp.concatenate([core, head], axis=-2)

def unfold_blocks(
    grid_ch: jnp.ndarray, dims, nbs, ch_out: int = 4
) -> jnp.ndarray:
    """(num_cells, ch) grid view -> per-block (NB, ch_out, S, S, S)
    slabs (the inverse of ``blocked._fold_blocks``): slab[b] covers grid
    lines ``[b*BLOCK, b*BLOCK + S)`` per axis, zero-padded past the
    boundary. Pure reshape/pad axis unfolds. ``dims``/``nbs`` are the
    per-axis view extents and block counts (x-major flat block order)."""
    gx, gy, gz = dims
    nbx, nby, nbz = nbs
    ch = grid_ch.shape[1]
    gpx, gpy, gpz = (n * BLOCK + 2 for n in nbs)
    arr = jnp.moveaxis(grid_ch.reshape(gx, gy, gz, ch), -1, 0)
    if ch < ch_out:
        arr = jnp.pad(arr, ((0, ch_out - ch), (0, 0), (0, 0), (0, 0)))
    arr = jnp.pad(
        arr, ((0, 0), (0, gpx - gx), (0, gpy - gy), (0, gpz - gz))
    )  # (ch, gpx, gpy, gpz)
    t = _unfold_axis(arr[..., None], nbz)  # (ch, gpx, gpy, nbz, Sz, 1)
    t = t.reshape(ch_out, gpx, gpy, nbz * S)
    t = _unfold_axis(t, nby)  # (ch, gpx, nby, Sy, nbz*Sz)
    t = t.reshape(ch_out, gpx, nby * S * nbz * S)
    t = _unfold_axis(t, nbx)  # (ch, nbx, Sx, nby*Sy*nbz*Sz)
    t = t.reshape(ch_out, nbx, S, nby, S, nbz, S)
    t = t.transpose(1, 3, 5, 0, 2, 4, 6)
    return t.reshape(nbx * nby * nbz, ch_out, S, S, S)


def run_apic_gather(
    payload: jnp.ndarray,
    slabs: jnp.ndarray,
    c2b: jnp.ndarray,
    M: int,
    inv_dx: float,
    derivs: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """payload (M*C, 48), slabs (NB, 4, S, S, S), c2b (M,) ->
    per-slot results (M*C, 16). Consecutive chunks of the same block
    reuse the resident slab (Pallas skips the reload when the block
    index is unchanged)."""
    C = payload.shape[0] // M
    kernel = _make_gather_kernel(derivs, inv_dx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M,),
        in_specs=[
            pl.BlockSpec(
                (C, _COLS), lambda i, c2b: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4, S, S, S),
                lambda i, c2b: (c2b[i], 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, _OUT_COLS), lambda i, c2b: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M * C, _OUT_COLS), jnp.float32),
        interpret=interpret,
    )(c2b, payload, slabs)
    return out


# smaller chunk: the derivs kernel holds ~30 (C, S^2) live
GATHER_CHUNK = int(_os.environ.get("NEUMA_GATHER_CHUNK", "128"))


def apic_gather_tpu(
    constants: MPMConstants,
    x: jnp.ndarray,
    gm: Optional[jnp.ndarray],
    b: jnp.ndarray,
    A: jnp.ndarray,
    df: jnp.ndarray,
    du: Optional[jnp.ndarray],
    derivs: bool = True,
    interpret: bool = False,
    sort: Optional[BlockSort] = None,
    geom: Optional[GridGeom] = None,
):
    """Blocked tap-gather: returns per-particle (dx (N,3), dgm (N,),
    db (N,3), dA (N,3,3)) against slab channels (df, du). ``sort`` may
    be a BlockSort or a pre-carved StepLayouts (same ``geom``)."""
    n = x.shape[0]
    g = constants.num_grids
    dims = (g, g, g) if geom is None else geom.dims
    layout, bsort = _resolve_layout(constants, x, GATHER_CHUNK, sort, geom)
    payload = pack_payload(
        constants, layout, bsort.fx, bsort.loc, gm, b, A
    )
    grid_ch = df if du is None else jnp.concatenate([df, du[:, None]], axis=1)
    nbs = tuple(_cdiv(d, BLOCK) for d in dims)
    slabs = unfold_blocks(grid_ch, dims, nbs)
    out = run_apic_gather(
        payload,
        slabs,
        layout.c2b,
        layout.c2b.shape[0],
        float(constants.inv_dx),
        derivs,
        interpret=interpret,
    )
    res = out[layout.dest]  # (N, 16)
    dgm = res[:, 0] if du is not None else None
    db = res[:, 1:4]
    dA = res[:, 4:13].reshape(n, 3, 3)
    dx = res[:, 13:16]
    return dx, dgm, db, dA




# --------------------------------------------------------------------------
# slab-space grid chain (round 5)
# --------------------------------------------------------------------------
#
# The fold -> dense grid -> unfold round trip between the scatter and
# gather kernels materialized channel-minor dense grids (f32[cells,3]
# tiles use 3 of 128 lanes -> ~42x padded arrays; the round-4 trace
# showed ~4 ms/substep of pure pad/slice/transpose churn at 70^3).
# Because every consumer of the dense grid is either elementwise
# (grid_op) or reads per-block slabs (the gather kernels), the step can
# stay in SLAB space end to end:
#
#   partials --scatter-add--> per-block sums --halo_add--> slabs
#     (slab b then holds exactly unfold(fold(partials))[b], i.e. a
#      consistent duplicated view of the dense grid)
#   grid_op applies per slab (elementwise; duplicates stay consistent),
#   and the gather kernels consume slabs directly.
#
# Slabs are carried in the MERGED form (NB, 4, S, S*S): the minor dim is
# S^2 = 256 (two full lane tiles, zero padding waste) vs S = 16 (8x
# padded) for the split form; one reshape to (NB, 4, S, S, S) happens at
# the kernel boundary. Addition order inside halo_add matches
# ``blocked._fold_blocks`` (z, then y, then x; core + carried tail per
# line) so slab values equal the dense path's bit for bit (commutative
# two-operand adds only).


def _shift_blocks(t, ax, direction):
    """Shift along a block axis: direction -1 brings block b+1's values
    to slot b (zero at the end), +1 brings b-1's (zero at the start)."""
    n = t.shape[ax]
    pad = [(0, 0)] * t.ndim
    if direction == -1:
        y = jax.lax.slice_in_dim(t, 1, n, axis=ax)
        pad[ax] = (0, 1)
    else:
        y = jax.lax.slice_in_dim(t, 0, n - 1, axis=ax)
        pad[ax] = (1, 0)
    return jnp.pad(y, pad)


def halo_add_slabs(pb: jnp.ndarray, nbs) -> jnp.ndarray:
    """Per-block partial sums -> halo-complete slabs (both
    (NB, CH, S, S*S) merged form).

    Per axis, slab line l of block b holds dense grid line 14*b + l:
    its value is the owning block's core plus the previous block's
    2-line tail (head lines) or the next block's core plus the own tail
    (tail lines) — exactly ``unfold(fold(pb))`` without the dense
    detour."""
    nbx, nby, nbz = nbs
    NB, ch = pb.shape[0], pb.shape[1]
    B = BLOCK
    t = pb.reshape(nbx, nby, nbz, ch, S, S * S)

    # -- z pass: z = lane % S. Head lines (z < 2) gain the previous
    # block's tail (z + 14); tail lines (z >= 14) are the NEXT block's
    # core plus the own tail (same operand order as _fold_axis).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 1, S * S), 5)
    zmod = lane % S
    prev = _shift_blocks(t, 2, +1)
    nxt = _shift_blocks(t, 2, -1)
    prev_tail = jnp.roll(prev, -B, axis=-1)  # lane l <- l + 14
    next_core = jnp.roll(nxt, B, axis=-1)  # lane l <- l - 14
    t = jnp.where(
        zmod < 2,
        t + prev_tail,
        jnp.where(zmod >= B, next_core + t, t),
    )

    # -- y pass: y = lane // S; contiguous lane ranges.
    prev = _shift_blocks(t, 1, +1)
    nxt = _shift_blocks(t, 1, -1)
    head = t[..., : 2 * S] + prev[..., B * S :]
    mid = t[..., 2 * S : B * S]
    tail = nxt[..., : 2 * S] + t[..., B * S :]
    t = jnp.concatenate([head, mid, tail], axis=-1)

    # -- x pass: the S (sublane) axis.
    prev = _shift_blocks(t, 0, +1)
    nxt = _shift_blocks(t, 0, -1)
    head = (
        jax.lax.slice_in_dim(t, 0, 2, axis=4)
        + jax.lax.slice_in_dim(prev, B, S, axis=4)
    )
    mid = jax.lax.slice_in_dim(t, 2, B, axis=4)
    tail = (
        jax.lax.slice_in_dim(nxt, 0, 2, axis=4)
        + jax.lax.slice_in_dim(t, B, S, axis=4)
    )
    t = jnp.concatenate([head, mid, tail], axis=4)
    return t.reshape(NB, ch, S, S * S)


def p2g_slab_scatter(
    constants: MPMConstants,
    x: jnp.ndarray,
    gm: Optional[jnp.ndarray],
    b: jnp.ndarray,
    A: jnp.ndarray,
    sort=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked APIC scatter straight to halo-complete slabs
    (NB, 4, S, S*S): the slab-space replacement for
    ``p2g_blocked_pallas`` + ``unfold_blocks`` (channel 3 carries mass,
    zero when ``gm`` is None). Full-cube views only (``geom=None``)."""
    g = constants.num_grids
    dims = (g, g, g)
    nbs = tuple(_cdiv(d, BLOCK) for d in dims)
    NB = nbs[0] * nbs[1] * nbs[2]
    layout, bsort = _resolve_layout(constants, x, CHUNK, sort, None)
    payload = pack_payload(constants, layout, bsort.fx, bsort.loc, gm, b, A)
    M = layout.c2b.shape[0]
    partials = run_p2g_fwd(payload, M, interpret=interpret)
    pb = (
        jnp.zeros((NB, 4, S, S * S), partials.dtype)
        .at[layout.c2b]
        .add(partials)
    )
    return halo_add_slabs(pb, nbs)


def gather_from_slabs(
    constants: MPMConstants,
    x: jnp.ndarray,
    slabs: jnp.ndarray,
    gm: Optional[jnp.ndarray],
    b: jnp.ndarray,
    A: jnp.ndarray,
    derivs: bool = True,
    sort=None,
    interpret: bool = False,
):
    """Blocked tap-gather against pre-built merged slabs — the
    slab-space ``apic_gather_tpu`` (no dense grid, no unfold). Returns
    (dx, dgm, db, dA) like ``apic_gather_tpu``."""
    n = x.shape[0]
    NB = slabs.shape[0]
    layout, bsort = _resolve_layout(constants, x, GATHER_CHUNK, sort, None)
    payload = pack_payload(constants, layout, bsort.fx, bsort.loc, gm, b, A)
    out = run_apic_gather(
        payload,
        slabs.reshape(NB, 4, S, S, S),
        layout.c2b,
        layout.c2b.shape[0],
        float(constants.inv_dx),
        derivs,
        interpret=interpret,
    )
    res = out[layout.dest]  # (N, 16)
    dgm = res[:, 0] if gm is not None else None
    db = res[:, 1:4]
    dA = res[:, 4:13].reshape(n, 3, 3)
    dx = res[:, 13:16]
    return dx, dgm, db, dA
