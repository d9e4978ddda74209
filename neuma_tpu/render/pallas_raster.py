"""Pallas TPU kernels for the Particle-GS tile compositing core.

The pure-jnp composite (``rasterize.py``) pays ``max_per_tile`` dense
slots for EVERY tile while mean occupancy is ~10; these kernels walk each
tile's actual pair range (scalar-prefetched offsets into the depth/tile-
sorted pair arrays), so work is proportional to the real pair count —
the TPU equivalent of diff-gaussian-rasterization's per-tile loop.

Forward semantics match the CUDA renderCUDA loop exactly (power > 0
skip, alpha < 1/255 skip, alpha cap 0.99, terminate the pixel BEFORE a
contribution would push transmittance below 1e-4) and record the
per-pixel last-contributor index for the backward sweep.

Backward replicates the CUDA backward: reverse sweep reconstructing
transmittance by division, suffix accumulators for d alpha, and the CUDA
quirk that the 0.99 alpha cap is ignored in the gradient chain
(dL/dG = opacity * dL/dalpha unconditionally).

Layout notes for Mosaic: TPU block shapes need the sublane dim divisible
by 8, so each grid step processes a GROUP of 8 tiles (padding tiles carry
empty pair ranges via a repeated final offset and produce T=1/C=0).
Pair-level gradients are emitted per pair (collision-free, CHUNK-aligned
tile ranges so backward DMA writes never cross tiles) and reach
per-gaussian gradients through the caller's gather transpose.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PIX = TILE * TILE  # 256
CHUNK = 8  # pairs per DMA'd block (f32 sublane-aligned)
GROUP = 8  # tiles per grid step (sublane divisibility)
PAIR_W = 16  # packed pair feature width:
# [0]=mean2d.x [1]=mean2d.y [2]=conic.a [3]=conic.b [4]=conic.c
# [5]=opacity  [6:9]=rgb    [9:]=pad


def _pixel_coords(t, tiles_x: int):
    """(1, PIX) f32 pixel x/y coordinates of tile ``t``."""
    tx = (t % tiles_x) * TILE
    ty = (t // tiles_x) * TILE
    local = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    lx = (local % TILE) + tx
    ly = (local // TILE) + ty
    return lx.astype(jnp.float32), ly.astype(jnp.float32)


def _fwd_kernel(
    starts_ref,  # scalar prefetch: (num_tiles_pad+1,) int32 pair offsets
    pairs_hbm,  # (P, PAIR_W) f32 in ANY/HBM
    t_out,  # (GROUP, PIX)
    c_out,  # (GROUP, 3*PIX)
    last_out,  # (GROUP, PIX) int32 last contributor (pair idx), -1 none
    scratch,  # (CHUNK, PAIR_W) VMEM
    sem,  # DMA semaphore
    *,
    tiles_x: int,
):
    p = pl.program_id(0)

    def tile_body(j, _):
        t = p * GROUP + j
        start = starts_ref[t]
        end = starts_ref[t + 1]
        n = end - start
        px, py = _pixel_coords(t, tiles_x)

        def chunk_body(ci, carry):
            P_run, c0, c1, c2, done, last = carry
            base = start + ci * CHUNK
            copy = pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(base, CHUNK)], scratch, sem
            )
            copy.start()
            copy.wait()

            def pair_body(i, inner):
                P_run, c0, c1, c2, done, last = inner
                live = (ci * CHUNK + i) < n
                mx = scratch[i, 0]
                my = scratch[i, 1]
                ca = scratch[i, 2]
                cb = scratch[i, 3]
                cc = scratch[i, 4]
                op = scratch[i, 5]
                dx = mx - px
                dy = my - py
                power = (
                    -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                )
                alpha = jnp.minimum(0.99, op * jnp.exp(power))
                valid = (
                    live & (power <= 0.0) & (alpha >= (1.0 / 255.0))
                )
                test_T = P_run * (1.0 - alpha)
                crossing = valid & (test_T < 1e-4)
                # done carried as a f32 mask (bool vector carries fail
                # Mosaic's scf.for legalization)
                contribute = valid & (~crossing) & (done < 0.5)
                a_eff = jnp.where(contribute, alpha, 0.0)
                w = a_eff * P_run
                c0 = c0 + w * scratch[i, 6]
                c1 = c1 + w * scratch[i, 7]
                c2 = c2 + w * scratch[i, 8]
                P_run = P_run * (1.0 - a_eff)
                last = jnp.where(contribute, base + i, last)
                done = jnp.maximum(
                    done, jnp.where(crossing, 1.0, 0.0)
                )
                return P_run, c0, c1, c2, done, last

            return jax.lax.fori_loop(0, CHUNK, pair_body, carry)

        ones = jnp.ones((1, PIX), jnp.float32)
        zeros = jnp.zeros((1, PIX), jnp.float32)
        n_chunks = pl.cdiv(n, CHUNK)
        P_run, c0, c1, c2, done, last = jax.lax.fori_loop(
            0,
            n_chunks,
            chunk_body,
            (
                ones,
                zeros,
                zeros,
                zeros,
                jnp.zeros((1, PIX), jnp.float32),
                jnp.full((1, PIX), -1, jnp.int32),
            ),
        )
        t_out[pl.ds(j, 1), :] = P_run
        c_out[pl.ds(j, 1), 0:PIX] = c0
        c_out[pl.ds(j, 1), PIX : 2 * PIX] = c1
        c_out[pl.ds(j, 1), 2 * PIX : 3 * PIX] = c2
        last_out[pl.ds(j, 1), :] = last
        return 0

    jax.lax.fori_loop(0, GROUP, tile_body, 0)


def _bwd_kernel(
    starts_ref,  # scalar prefetch
    pairs_hbm,  # (P, PAIR_W) ANY
    t_final_ref,  # (GROUP, PIX) forward T
    last_ref,  # (GROUP, PIX) int32 last contributor
    dt_ref,  # (GROUP, PIX) dL/dT
    dc_ref,  # (GROUP, 3*PIX) dL/dC
    dpairs_hbm,  # out (P, PAIR_W) ANY per-pair grads
    scratch,  # (CHUNK, PAIR_W) VMEM pair data
    gscratch,  # (CHUNK, PAIR_W) VMEM pair grads
    sem,
    wsem,
    *,
    tiles_x: int,
):
    p = pl.program_id(0)

    def tile_body(j, _):
        t = p * GROUP + j
        start = starts_ref[t]
        end = starts_ref[t + 1]
        n = end - start
        px, py = _pixel_coords(t, tiles_x)
        T_final = t_final_ref[pl.ds(j, 1), :]
        last = last_ref[pl.ds(j, 1), :]
        dT = dt_ref[pl.ds(j, 1), :]
        dc0 = dc_ref[pl.ds(j, 1), 0:PIX]
        dc1 = dc_ref[pl.ds(j, 1), PIX : 2 * PIX]
        dc2 = dc_ref[pl.ds(j, 1), 2 * PIX : 3 * PIX]

        n_chunks = pl.cdiv(n, CHUNK)

        def chunk_body(cj, carry):
            T_cur, s_dot = carry
            ci = n_chunks - 1 - cj  # reverse chunk order
            base = start + ci * CHUNK
            copy = pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(base, CHUNK)], scratch, sem
            )
            copy.start()
            copy.wait()

            def pair_body(pj, inner):
                T_cur, s_dot = inner
                i = CHUNK - 1 - pj  # reverse within chunk
                pair_idx = base + i
                live = pair_idx < end
                mx = scratch[i, 0]
                my = scratch[i, 1]
                ca = scratch[i, 2]
                cb = scratch[i, 3]
                cc = scratch[i, 4]
                op = scratch[i, 5]
                r = scratch[i, 6]
                g = scratch[i, 7]
                b = scratch[i, 8]
                dx = mx - px
                dy = my - py
                power = (
                    -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                )
                G = jnp.exp(power)
                alpha = jnp.minimum(0.99, op * G)
                valid = (
                    live & (power <= 0.0) & (alpha >= (1.0 / 255.0))
                )
                contribute = valid & (pair_idx <= last)

                # Reconstruct exclusive transmittance by division
                # (alpha <= 0.99 so 1 - alpha >= 0.01).
                T_excl = jnp.where(
                    contribute, T_cur / (1.0 - alpha), T_cur
                )
                a_eff = jnp.where(contribute, alpha, 0.0)

                w = a_eff * T_excl
                dL_dr = w * dc0
                dL_dg = w * dc1
                dL_db = w * dc2

                inv_1ma = 1.0 / (1.0 - alpha)
                dL_dalpha = jnp.where(
                    contribute,
                    T_excl * (r * dc0 + g * dc1 + b * dc2)
                    - s_dot * inv_1ma
                    - T_final * inv_1ma * dT,
                    0.0,
                )
                # CUDA quirk: 0.99 cap ignored in the chain.
                dL_dop = G * dL_dalpha
                dL_dpower = op * G * dL_dalpha

                dL_dca = -0.5 * dx * dx * dL_dpower
                dL_dcb = -dx * dy * dL_dpower
                dL_dcc = -0.5 * dy * dy * dL_dpower
                dL_ddx = -(ca * dx + cb * dy) * dL_dpower
                dL_ddy = -(cc * dy + cb * dx) * dL_dpower

                gscratch[i, 0] = jnp.sum(dL_ddx)
                gscratch[i, 1] = jnp.sum(dL_ddy)
                gscratch[i, 2] = jnp.sum(dL_dca)
                gscratch[i, 3] = jnp.sum(dL_dcb)
                gscratch[i, 4] = jnp.sum(dL_dcc)
                gscratch[i, 5] = jnp.sum(dL_dop)
                gscratch[i, 6] = jnp.sum(dL_dr)
                gscratch[i, 7] = jnp.sum(dL_dg)
                gscratch[i, 8] = jnp.sum(dL_db)
                for col in range(9, PAIR_W):
                    gscratch[i, col] = 0.0

                s_dot = s_dot + jnp.where(
                    contribute,
                    a_eff * (r * dc0 + g * dc1 + b * dc2) * T_excl,
                    0.0,
                )
                return T_excl, s_dot

            T_cur, s_dot = jax.lax.fori_loop(
                0, CHUNK, pair_body, (T_cur, s_dot)
            )
            wcopy = pltpu.make_async_copy(
                gscratch, dpairs_hbm.at[pl.ds(base, CHUNK)], wsem
            )
            wcopy.start()
            wcopy.wait()
            return T_cur, s_dot

        jax.lax.fori_loop(
            0,
            n_chunks,
            chunk_body,
            (T_final, jnp.zeros((1, PIX), jnp.float32)),
        )
        return 0

    jax.lax.fori_loop(0, GROUP, tile_body, 0)


def _pack_pairs(pair_mean2d, pair_conic, pair_opacity, pair_colors):
    """Pack per-pair features into (P, PAIR_W). Padding pairs must carry
    opacity 0 (=> alpha < 1/255 => skipped by the kernels)."""
    P = pair_mean2d.shape[0]
    return jnp.concatenate(
        [
            pair_mean2d,
            pair_conic,
            pair_opacity[:, None],
            pair_colors,
            jnp.zeros((P, PAIR_W - 9), jnp.float32),
        ],
        axis=1,
    )


def _padded_starts(tile_start, num_tiles):
    """Pad the offsets array so padded tiles get empty ranges."""
    num_pad = ((num_tiles + GROUP - 1) // GROUP) * GROUP
    if num_pad == num_tiles:
        return tile_start, num_pad
    pad = jnp.broadcast_to(tile_start[-1:], (num_pad - num_tiles,))
    return jnp.concatenate([tile_start, pad]), num_pad


def _composite_fwd_impl(
    pair_mean2d, pair_conic, pair_opacity, pair_colors,
    tile_start, tiles_x, interpret,
):
    pairs = _pack_pairs(
        pair_mean2d, pair_conic, pair_opacity, pair_colors
    )
    num_tiles = tile_start.shape[0] - 1
    starts_pad, num_pad = _padded_starts(tile_start, num_tiles)
    P = pairs.shape[0]
    assert P % CHUNK == 0, f"pair count {P} must be a multiple of {CHUNK}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_pad // GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((GROUP, PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 3 * PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, PAIR_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    T, C, last = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x),
        out_shape=(
            jax.ShapeDtypeStruct((num_pad, PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_pad, 3 * PIX), jnp.float32),
            jax.ShapeDtypeStruct((num_pad, PIX), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_pad, pairs)
    return T[:num_tiles], C[:num_tiles], last[:num_tiles]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def composite_pairs_tpu(
    pair_mean2d,  # (P, 2) gathered per pair (padding: anything)
    pair_conic,  # (P, 3)
    pair_opacity,  # (P,) — MUST be 0 for padding slots
    pair_colors,  # (P, 3)
    tile_start,  # (num_tiles+1,) int32, CHUNK-aligned tile ranges
    tiles_x: int,
    interpret: bool = False,
):
    """Per-tile compositing core. Returns (T (num_tiles, 256),
    C (num_tiles, 768)). ``tile_start`` ranges MUST be CHUNK-aligned so
    backward DMA writes never cross tile boundaries."""
    T, C, _ = _composite_fwd_impl(
        pair_mean2d, pair_conic, pair_opacity, pair_colors,
        tile_start, tiles_x, interpret,
    )
    return T, C


def _composite_vjp_fwd(
    pair_mean2d, pair_conic, pair_opacity, pair_colors,
    tile_start, tiles_x, interpret,
):
    T, C, last = _composite_fwd_impl(
        pair_mean2d, pair_conic, pair_opacity, pair_colors,
        tile_start, tiles_x, interpret,
    )
    res = (
        pair_mean2d, pair_conic, pair_opacity, pair_colors,
        tile_start, T, last,
    )
    return (T, C), res


def _composite_vjp_bwd(tiles_x, interpret, res, cots):
    (
        pair_mean2d, pair_conic, pair_opacity, pair_colors,
        tile_start, T, last,
    ) = res
    dT, dC = cots
    pairs = _pack_pairs(
        pair_mean2d, pair_conic, pair_opacity, pair_colors
    )
    num_tiles = tile_start.shape[0] - 1
    starts_pad, num_pad = _padded_starts(tile_start, num_tiles)
    P = pairs.shape[0]

    def pad_rows(x, fill=0.0):
        if num_pad == num_tiles:
            return x
        return jnp.concatenate(
            [
                x,
                jnp.full(
                    (num_pad - num_tiles,) + x.shape[1:], fill, x.dtype
                ),
            ]
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_pad // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pairs
            pl.BlockSpec((GROUP, PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),  # T
            pl.BlockSpec((GROUP, PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),  # last
            pl.BlockSpec((GROUP, PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),  # dT
            pl.BlockSpec((GROUP, 3 * PIX), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),  # dC
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, PAIR_W), jnp.float32),
            pltpu.VMEM((CHUNK, PAIR_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dpairs = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x),
        out_shape=jax.ShapeDtypeStruct((P, PAIR_W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        starts_pad,
        pairs,
        pad_rows(T, 1.0),
        pad_rows(last, -1),
        pad_rows(dT),
        pad_rows(dC),
    )

    # Rows beyond the last tile range are never written by any grid step:
    # zero them (and any NaN garbage) explicitly.
    row = jnp.arange(P, dtype=jnp.int32)
    in_range = row < tile_start[-1]
    dpairs = jnp.where(in_range[:, None], dpairs, 0.0)

    d_mean2d = dpairs[:, 0:2]
    d_conic = dpairs[:, 2:5]
    d_opacity = dpairs[:, 5]
    d_colors = dpairs[:, 6:9]
    d_tile_start = np.zeros(tile_start.shape, jax.dtypes.float0)
    return (d_mean2d, d_conic, d_opacity, d_colors, d_tile_start)


composite_pairs_tpu.defvjp(_composite_vjp_fwd, _composite_vjp_bwd)
