"""Differentiable tile-based 3D Gaussian splatting rasterizer in JAX.

TPU-native replacement for the CUDA ``diff-gaussian-rasterization``
extension (component N2 in SURVEY.md; wrapped by the reference at
``modules/d3gs/gaussian_renderer/__init__.py`` and
``modules/tune/utils.py:323-421``). Faithful to the CUDA forward's
numerics:

* EWA projection with the 1.3x tan-fov frustum clamp and the +0.3
  low-pass added to the 2D covariance diagonal;
* per-tile depth-ordered front-to-back alpha compositing with the exact
  guard set: skip if ``power > 0`` or ``alpha < 1/255``; terminate the
  pixel BEFORE a contribution would push transmittance below 1e-4;
  ``alpha`` capped at 0.99;
* SH -> RGB with the +0.5 offset and clamp-at-zero;
* background composited as ``C + T_final * bg``.

Design: gaussians are depth-sorted globally (which induces the same
per-tile order as the CUDA per-tile sort), binned into 16x16-pixel tiles
via a static-size (gaussian, tile) pair expansion + one argsort, then a
``lax.scan`` over padded per-tile slots composites all tiles in lockstep
on the VPU. Differentiable end-to-end by scan AD; segments are
rematerialized (``jax.checkpoint``) so residual memory stays at the
carry size instead of O(slots x pixels).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import sh_basis
from .camera import Camera

TILE = 16


@jax.custom_jvp
def _cap_alpha(a):
    """alpha = min(0.99, a) with the CUDA backward quirk: the cap is
    ignored in the chain (renderCUDA's backward multiplies by G/op as if
    uncapped), so the gradient passes straight through even above 0.99.
    The Pallas backward replicates the same quirk (pallas_raster.py
    "CUDA quirk" branch); this keeps both backends' gradients identical
    in the saturated-opacity regime."""
    return jnp.minimum(0.99, a)


@_cap_alpha.defjvp
def _cap_alpha_jvp(primals, tangents):
    (a,), (da,) = primals, tangents
    return jnp.minimum(0.99, a), da


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterization bounds (set per scene/workload)."""

    max_pairs: int = 262144  # total (gaussian, tile) pairs after culling
    max_per_tile: int = 1024  # compositing depth per tile (jnp backend)
    segment: int = 32  # scan slots per remat segment (jnp backend)
    scale_modifier: float = 1.0
    # 'auto': Pallas kernels on TPU, jnp composite elsewhere.
    # 'jnp' | 'pallas' | 'pallas_interpret' force a backend.
    backend: str = "auto"
    # Transpose of the per-pair feature gather (Pallas backend):
    # * 'scatter' — AD's (P, 9) scatter-add into per-gaussian rows.
    # * 'segsum'  — segmented-doubling reduction over the contiguous
    #   per-gaussian pair runs of the pre-binned layout (exact tree
    #   sums, no scatter-add in the backward; the builder pays one
    #   int32 permutation scatter in the forward, saved under the
    #   'raster_pairs' remat policy).
    pair_grad: str = "scatter"
    # Pair binning strategy: 'counting' (two-level counting sort —
    # short row-local sorts + prefix sums + direct placement, breaking
    # the O(max_pairs log max_pairs) global-sort floor) or 'sort' (one
    # packed-key bitonic sort over the full budget). Both produce
    # identical tile lists. 'auto' picks by budget: counting wins below
    # 1<<17 on v5e, the global packed sort above (measured round 3 —
    # the counting binner's placement scatter loses at big budgets).
    pair_binning: str = "auto"
    # Optional image-tile sharding (jnp backend): a
    # jax.sharding.NamedSharding whose PartitionSpec names the mesh axis
    # to split the tile dimension over — tiles composite independently,
    # so GSPMD splits the whole segment scan across devices while the
    # (small) gaussian attribute tables stay replicated. See
    # parallel/sharding.py::tile_sharding and tests/test_parallel.py.
    tile_sharding: Optional[object] = None

    def __post_init__(self):
        # The pair builders divide pair offsets exactly in f32
        # (_pair_tile_ids); past 2^24 the quotient silently rounds and
        # tile ids go wrong — and the overflow errors tell users to
        # raise max_pairs, so guard the ceiling loudly.
        assert self.max_pairs < (1 << 24), (
            f"max_pairs ({self.max_pairs}) must stay below 2^24: pair "
            "placement relies on exact f32 integer arithmetic"
        )
        # Enum-ish knobs fail loudly (a typo'd opt-in must not silently
        # fall back to the default strategy).
        if self.backend not in ("auto", "jnp", "pallas",
                                "pallas_interpret"):
            raise ValueError(f"unknown backend: {self.backend!r}")
        if self.pair_binning not in ("auto", "counting", "sort"):
            raise ValueError(
                f"unknown pair_binning: {self.pair_binning!r}"
            )
        if self.pair_grad not in ("scatter", "segsum"):
            raise ValueError(f"unknown pair_grad: {self.pair_grad!r}")

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "jnp"


def _project(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: Camera,
):
    """Per-gaussian projection: returns (depth, in_frustum, mean2d, conic,
    radius). Mirrors the CUDA ``preprocess`` kernel."""
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)

    p_view = hom @ camera.world_view  # (N, 4)
    depth = p_view[:, 2]
    in_frustum = depth > 0.2

    p_hom = hom @ camera.full_proj
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    # ndc2Pix (CUDA): ((ndc + 1) * S - 1) * 0.5
    mean2d = jnp.stack(
        [
            ((p_proj[:, 0] + 1.0) * camera.width - 1.0) * 0.5,
            ((p_proj[:, 1] + 1.0) * camera.height - 1.0) * 0.5,
        ],
        axis=1,
    )

    # EWA: J W Sigma W^T J^T with the CUDA frustum clamp on t.x/t.z.
    focal_x = camera.focal_x
    focal_y = camera.focal_y
    tx, ty, tz = p_view[:, 0], p_view[:, 1], p_view[:, 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * camera.tan_fov_x
    limy = 1.3 * camera.tan_fov_y
    txtz = jnp.clip(tx / tz, -limx, limx)
    tytz = jnp.clip(ty / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # J rows as (N,) lanes (avoids materializing (N, 2, 3) stacks and
    # batched tiny matmuls — scalarized EWA keeps everything in fused
    # full-lane elementwise ops, like the sim's material layer).
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # World->camera rotation: p_cam = p @ world_view[:3,:3] (row-vector
    # convention) => column-vector R_wc = world_view[:3,:3]^T.
    W = camera.world_view[:3, :3].T  # (3, 3)
    # T = J @ W with J = [[j00, 0, j02], [0, j11, j12]]:
    #   T[0, c] = j00 W[0, c] + j02 W[2, c]
    #   T[1, c] = j11 W[1, c] + j12 W[2, c]
    t0 = [j00 * W[0, c] + j02 * W[2, c] for c in range(3)]
    t1 = [j11 * W[1, c] + j12 * W[2, c] for c in range(3)]

    # cov2d = T Sigma T^T, Sigma packed as (xx, xy, xz, yy, yz, zz).
    sxx, sxy, sxz = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    syy, syz, szz = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]

    def sig_row(u):
        return (
            u[0] * sxx + u[1] * sxy + u[2] * sxz,
            u[0] * sxy + u[1] * syy + u[2] * syz,
            u[0] * sxz + u[1] * syz + u[2] * szz,
        )

    s0 = sig_row(t0)
    s1 = sig_row(t1)
    # Low-pass filter: each splat is at least ~1px wide (CUDA +0.3).
    a = s0[0] * t0[0] + s0[1] * t0[1] + s0[2] * t0[2] + 0.3
    b = s0[0] * t1[0] + s0[1] * t1[1] + s0[2] * t1[2]
    c = s1[0] * t1[0] + s1[1] * t1[1] + s1[2] * t1[2] + 0.3
    det = a * c - b * b
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))
    radius = jnp.where(in_frustum & det_ok, radius, 0.0)
    return depth, in_frustum & det_ok, mean2d, conic, radius


def _sh_colors(
    shs: jnp.ndarray,
    means3d: jnp.ndarray,
    campos: jnp.ndarray,
    sh_degree: int,
) -> jnp.ndarray:
    """SH -> clamped RGB (CUDA ``computeColorFromSH``). The clamp's zero
    gradient where rgb + 0.5 < 0 falls out of jnp.maximum automatically."""
    d = means3d - campos[None, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    basis = sh_basis(sh_degree, d)  # (N, k)
    k = (sh_degree + 1) ** 2
    rgb = jnp.einsum("nkc,nk->nc", shs[:, :k, :], basis)
    return jnp.maximum(rgb + 0.5, 0.0)


def _sort_pairs_by_tile(tile_id, gid_c, num_tiles, max_pairs):
    """Stable sort of the pair list by tile id.

    Pairs are generated in depth-rank order, so a stable tile sort
    yields per-tile depth order (the CUDA 64-bit radix sort semantics).
    When (tile bits + pair bits) fit in a uint32, the stable sort-with-
    payload is replaced by a SINGLE-key sort of packed
    ``tile_id << bits_p | pair_idx`` keys — about half the sort traffic
    on TPU (this sort is the pair-build hot spot).

    Returns (sorted_tile, sorted_gid).
    """
    bits_p = max(int(max_pairs - 1).bit_length(), 1)
    bits_t = max(int(num_tiles).bit_length(), 1)  # dummy id == num_tiles
    pair_idx = jnp.arange(max_pairs, dtype=jnp.uint32)
    if bits_p + bits_t <= 32:
        key = (
            tile_id.astype(jnp.uint32) << np.uint32(bits_p)
        ) | pair_idx
        (sorted_key,) = jax.lax.sort((key,), num_keys=1)
        pair_order = (
            sorted_key & jnp.uint32((1 << bits_p) - 1)
        ).astype(jnp.int32)
        sorted_tile = (sorted_key >> np.uint32(bits_p)).astype(jnp.int32)
    else:
        pair_order = jnp.argsort(tile_id, stable=True)
        sorted_tile = tile_id[pair_order]
    sorted_gid = gid_c[pair_order]
    return sorted_tile, sorted_gid, pair_order


PAIR_SEG = 512  # row length for the two-level counting sort


def _counting_ok(max_pairs: int) -> bool:
    """The counting binner packs (tile, lane) row keys, so rows must be
    a power-of-two length dividing the budget; odd budgets fall back to
    the global sort."""
    seg = min(PAIR_SEG, max_pairs)
    return seg > 0 and (seg & (seg - 1)) == 0 and max_pairs % seg == 0


def _use_counting(cfg: "RasterConfig") -> bool:
    """Resolve the pair-binning strategy (see RasterConfig)."""
    if not _counting_ok(cfg.max_pairs):
        return False
    if cfg.pair_binning == "auto":
        return cfg.max_pairs < (1 << 17)
    return cfg.pair_binning == "counting"


def _pair_slots(tile_id, num_tiles, max_pairs):
    """Two-level counting sort of the pair list by tile id — the
    sort-free replacement for :func:`_sort_pairs_by_tile`'s global
    bitonic sort (its log^2(max_pairs) compare-exchange passes were the
    pair-build hot spot).

    The budget is cut into ``PAIR_SEG``-length rows. Each row is sorted
    locally by a packed ``(tile << lane_bits) | lane`` key (short
    independent bitonic rows — ~(log2 seg)^2 passes instead of
    (log2 max_pairs)^2), run-length boundaries give every element its
    depth-stable rank within (row, tile), and a per-(row, tile) count
    table + exclusive prefix over rows turns that rank into the pair's
    final slot within its tile. Placement is then one direct scatter by
    the caller — counts -> prefix sum -> placement, no global sort.

    Returns ``(orig_idx, tile, slot, counts)`` where the first three are
    (max_pairs,) arrays in row-sorted layout (``orig_idx`` maps back to
    the original pair), ``slot`` is the depth-order position of the pair
    within its tile, and ``counts`` is (num_tiles + 1,) per-tile totals
    (the dummy bin collects invalid pairs).
    """
    seg = min(PAIR_SEG, max_pairs)
    assert max_pairs % seg == 0
    B = max_pairs // seg
    bits_l = seg.bit_length() - 1
    bits_t = max(int(num_tiles).bit_length(), 1)
    assert bits_t + bits_l <= 32, (
        f"too many tiles for packed row keys ({bits_t}+{bits_l} bits)"
    )

    lane = jnp.tile(jnp.arange(seg, dtype=jnp.uint32), B)
    key = ((tile_id.astype(jnp.uint32) << np.uint32(bits_l)) | lane).reshape(
        B, seg
    )
    (srows,) = jax.lax.sort((key,), dimension=1, num_keys=1)
    st = (srows >> np.uint32(bits_l)).astype(jnp.int32)  # tile per element
    sl = (srows & np.uint32(seg - 1)).astype(jnp.int32)  # original lane

    qpos = jnp.broadcast_to(jnp.arange(seg, dtype=jnp.int32)[None, :],
                            (B, seg))
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), st[:, 1:] != st[:, :-1]], axis=1
    )
    run_start = jax.lax.cummax(jnp.where(is_start, qpos, -1), axis=1)
    rank = qpos - run_start  # (B, seg) rank within (row, tile)

    # Per-(row, tile) counts: one add per run END (tiles are contiguous
    # within a sorted row, so (row, tile) indices are unique; masked
    # non-ends add zero in place).
    is_end = jnp.concatenate(
        [st[:, :-1] != st[:, 1:], jnp.ones((B, 1), bool)], axis=1
    )
    rows_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, seg)
    )
    cnt = (
        jnp.zeros((B, num_tiles + 1), jnp.int32)
        .at[rows_idx, st]
        .add(jnp.where(is_end, rank + 1, 0))
    )
    base = jnp.cumsum(cnt, axis=0) - cnt  # exclusive over rows
    counts = cnt.sum(axis=0)  # (num_tiles + 1,)

    slot = base[rows_idx, st] + rank
    orig_idx = (rows_idx * seg + sl).reshape(-1)
    return orig_idx, st.reshape(-1), slot.reshape(-1), counts


def _pair_attributes(order, x0s, y0s, w_t, starts, offsets, cfg,
                     tiles_x, tiles_y):
    """Per-pair (tile_id inputs, original gaussian id, run start) via
    three run-fills: expand per-gaussian values to per-pair without
    P-scale gathers by adding +v at each gaussian's first pair slot and
    -v at its end slot, then cumsum reconstructs the constant-per-run
    sequence (empty runs cancel in place; a run straddling the budget
    edge is masked invalid downstream). Geometry (tile-rect x0/y0/width)
    packs into one fill; 3 * bits(tiles) <= 30 up to 16K-pixel images."""
    b = max(int(tiles_x).bit_length(), int(tiles_y).bit_length())
    assert 3 * b <= 30, f"image too large for packed tile fill ({b} bits)"
    mask = (1 << b) - 1
    sc = jnp.clip(starts, 0, cfg.max_pairs)
    ec = jnp.clip(offsets, 0, cfg.max_pairs)
    packed_geo = (x0s << (2 * b)) | (y0s << b) | w_t
    # One batched (3, P) scatter + cumsum instead of three P-scans.
    vals = jnp.stack(
        [packed_geo, order.astype(jnp.int32), starts]
    )  # (3, N)
    acc = (
        jnp.zeros((3, cfg.max_pairs + 1), jnp.int32)
        .at[:, sc]
        .add(vals)
        .at[:, ec]
        .add(-vals)
    )[:, : cfg.max_pairs]
    fills = jnp.cumsum(acc, axis=1)
    pair_geo, pair_orig, pair_start = fills[0], fills[1], fills[2]
    x0p = pair_geo >> (2 * b)
    y0p = (pair_geo >> b) & mask
    twp = jnp.maximum(pair_geo & mask, 1)
    return x0p, y0p, twp, pair_orig, pair_start


def _pair_tile_ids(pair_idx, x0p, y0p, twp, pair_start, valid_pair, tiles_x,
                   num_tiles):
    k = pair_idx - pair_start
    # k // tw via exact f32 division (TPUs have no integer divide; a
    # variable-divisor int div expands to a multi-op sequence). Both
    # operands are exact in f32 (< 2^24) and tw >= 1, so floor of the
    # correctly-rounded quotient is the true integer quotient.
    ky = jnp.floor(k.astype(jnp.float32) / twp.astype(jnp.float32)).astype(
        jnp.int32
    )
    tile_x = x0p + (k - ky * twp)
    tile_y = y0p + ky
    return jnp.where(valid_pair, tile_y * tiles_x + tile_x, num_tiles)


def _tile_starts(sorted_tile, pair_idx, num_tiles):
    """First sorted position of each tile id (searchsorted left). Empty
    tiles resolve to the next nonempty tile's start; the dummy tile
    (id == num_tiles) caps the range.

    The binary search is log2(P) rounds of (num_tiles,)-sized gathers;
    the previous scatter-min + suffix cummin paid a P-indexed scatter
    (2.3 ms/view at 1<<18 in the round-5 trace — TPU scatters cost
    ~10 ns/index) while the search touches only num_tiles * log2(P)
    elements."""
    bins = jnp.arange(num_tiles + 1, dtype=sorted_tile.dtype)
    return jnp.searchsorted(sorted_tile, bins, side="left").astype(
        jnp.int32
    )


def _tile_ranges(mean2d, radius, width, height):
    """Tile rect per gaussian (inclusive-exclusive), CUDA ``getRect``."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    x0 = jnp.clip(((mean2d[:, 0] - radius) / TILE).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((mean2d[:, 1] - radius) / TILE).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(
        ((mean2d[:, 0] + radius + TILE - 1) / TILE).astype(jnp.int32),
        0,
        tiles_x,
    )
    y1 = jnp.clip(
        ((mean2d[:, 1] + radius + TILE - 1) / TILE).astype(jnp.int32),
        0,
        tiles_y,
    )
    return x0, y0, x1, y1, tiles_x, tiles_y


def _build_tile_lists(
    depth, visible, mean2d, radius, width, height, cfg: RasterConfig
):
    """Static-size duplicate-expand + sort: produces a (num_tiles,
    max_per_tile) matrix of gaussian indices in depth order (padding = -1).

    All shapes are static; pairs beyond max_pairs / max_per_tile are
    dropped, and the returned ``overflow`` flag reports when that
    happened so callers can fail loudly instead of training on wrong
    gradients (see ``rasterize_with_aux``)."""
    n = depth.shape[0]
    x0, y0, x1, y1, tiles_x, tiles_y = _tile_ranges(
        mean2d, radius, width, height
    )
    num_tiles = tiles_x * tiles_y

    # Depth-sort gaussians (global sort == per-tile order of the CUDA
    # per-tile radix sort).
    order = jnp.argsort(jnp.where(visible, depth, jnp.inf))
    x0s, x1s = x0[order], x1[order]
    y0s, y1s = y0[order], y1[order]
    vis_s = visible[order] & (radius[order] > 0)

    w_t = jnp.where(vis_s, x1s - x0s, 0)
    h_t = jnp.where(vis_s, y1s - y0s, 0)
    area = w_t * h_t  # (N,)
    offsets = jnp.cumsum(area)  # inclusive
    starts = offsets - area

    # Expand to pairs: pair j belongs to sorted-gaussian g(j) with local
    # tile slot k = j - starts[g]. All per-pair attributes come from
    # run-fills (scatter + cumsum), never P-scale gathers.
    pair_idx = jnp.arange(cfg.max_pairs, dtype=jnp.int32)
    valid_pair = pair_idx < offsets[-1]
    x0p, y0p, twp, pair_orig, pair_start = _pair_attributes(
        order, x0s, y0s, w_t, starts, offsets, cfg, tiles_x, tiles_y
    )
    tile_id = _pair_tile_ids(
        pair_idx, x0p, y0p, twp, pair_start, valid_pair, tiles_x, num_tiles
    )

    if _use_counting(cfg):
        # counts -> prefix -> direct placement: scatter each pair's
        # gaussian id straight to its (tile, depth-slot) matrix cell.
        orig, st, slot, counts_d = _pair_slots(
            tile_id, num_tiles, cfg.max_pairs
        )
        counts = counts_d[:num_tiles]
        gid = pair_orig[orig]
        dest = jnp.where(
            (st < num_tiles) & (slot < cfg.max_per_tile),
            st * cfg.max_per_tile + slot,
            num_tiles * cfg.max_per_tile,  # dropped
        )
        tile_mat = (
            jnp.full((num_tiles * cfg.max_per_tile,), -1, jnp.int32)
            .at[dest]
            .set(gid, mode="drop")
            .reshape(num_tiles, cfg.max_per_tile)
        )
    else:
        sorted_tile, sorted_gid, _ = _sort_pairs_by_tile(
            tile_id, pair_orig, num_tiles, cfg.max_pairs
        )

        # Per-tile ranges; the sorted pair array IS the concatenation of
        # per-tile depth-ordered lists, so the padded matrix is a pure
        # GATHER tile_mat[t, s] = sorted_gid[tile_start[t] + s].
        tile_start = _tile_starts(sorted_tile, pair_idx, num_tiles)
        counts = tile_start[1:] - tile_start[:-1]  # (num_tiles,)
        slots = jnp.arange(cfg.max_per_tile, dtype=jnp.int32)
        pos = tile_start[:-1, None] + slots[None, :]
        in_range = slots[None, :] < counts[:, None]
        gid_mat = sorted_gid[jnp.clip(pos, 0, cfg.max_pairs - 1)]
        tile_mat = jnp.where(in_range, gid_mat, -1)
    overflow = (offsets[-1] > cfg.max_pairs) | jnp.any(
        counts > cfg.max_per_tile
    )
    return tile_mat, tiles_x, tiles_y, overflow


def _build_aligned_pairs(
    depth, visible, mean2d, radius, width, height, cfg: RasterConfig
):
    """Pair layout for the Pallas backend: per-tile contiguous ranges in
    depth order, each tile's range padded to a multiple of the kernel
    CHUNK so backward DMA writes never cross tile boundaries.

    Returns (pair_gid (P,), counts (num_tiles,), tile_start
    (num_tiles+1,), tiles_x, tiles_y) with static
    P = max_pairs + CHUNK * num_tiles. Slots past a tile's true count
    carry arbitrary (in-range) gaussian ids; the kernels mask them with
    the per-tile ``counts`` (scalar-prefetched), so no (P,)-sized
    validity mask is ever materialized (it cost ~4 ms/view of pred
    copies at 1080p).
    """
    from .pallas_raster import CHUNK

    assert cfg.max_pairs % CHUNK == 0, (
        f"max_pairs ({cfg.max_pairs}) must be a multiple of the kernel "
        f"CHUNK ({CHUNK}) so tile ranges stay CHUNK-aligned"
    )
    n = depth.shape[0]
    x0, y0, x1, y1, tiles_x, tiles_y = _tile_ranges(
        mean2d, radius, width, height
    )
    num_tiles = tiles_x * tiles_y

    order = jnp.argsort(jnp.where(visible, depth, jnp.inf))
    x0s, x1s = x0[order], x1[order]
    y0s, y1s = y0[order], y1[order]
    vis_s = visible[order] & (radius[order] > 0)

    w_t = jnp.where(vis_s, x1s - x0s, 0)
    h_t = jnp.where(vis_s, y1s - y0s, 0)
    area = w_t * h_t
    offsets = jnp.cumsum(area)
    starts = offsets - area

    # Per-pair attributes via run-fills (scatter + cumsum) — both
    # searchsorted (log-P gather rounds) and P-scale attribute gathers
    # are slow on TPU.
    pair_idx = jnp.arange(cfg.max_pairs, dtype=jnp.int32)
    valid_pair = pair_idx < offsets[-1]
    x0p, y0p, twp, pair_orig, pair_start = _pair_attributes(
        order, x0s, y0s, w_t, starts, offsets, cfg, tiles_x, tiles_y
    )
    tile_id = _pair_tile_ids(
        pair_idx, x0p, y0p, twp, pair_start, valid_pair, tiles_x, num_tiles
    )

    counting = _use_counting(cfg)
    if counting:
        orig, st, slot, counts_d = _pair_slots(
            tile_id, num_tiles, cfg.max_pairs
        )
        counts = counts_d[:num_tiles]
    else:
        sorted_tile, sorted_gid, pair_order = _sort_pairs_by_tile(
            tile_id, pair_orig, num_tiles, cfg.max_pairs
        )
        raw_start = _tile_starts(sorted_tile, pair_idx, num_tiles)
        counts = raw_start[1:] - raw_start[:-1]

    # CHUNK-align each tile range.
    aligned = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned).astype(jnp.int32)]
    )

    # slot -> tile mapping via scatter + cummax run-fill at BLOCK
    # granularity (tile ranges are CHUNK-aligned). All per-slot values
    # are then (num_blocks, CHUNK) broadcasts of per-block scalars —
    # no per-pair gathers except the single fused id lookup. Empty
    # tiles (aligned count 0) share the next tile's start — route them
    # to the dummy slot; runs of empties resolve to the next non-empty
    # tile. Pad slots keep arbitrary in-range ids; the kernels' per-tile
    # count mask excludes them.
    P = cfg.max_pairs + CHUNK * num_tiles
    num_blocks = P // CHUNK
    if counting:
        # Direct placement: scatter each pair's gaussian id to
        # tile_start[tile] + depth-slot (counts -> prefix -> place).
        dest = jnp.where(
            st < num_tiles, tile_start[jnp.minimum(st, num_tiles - 1)] + slot,
            P,
        )
        pair_gid = (
            jnp.zeros((P,), jnp.int32)
            .at[dest]
            .set(pair_orig[orig], mode="drop")
        )
    else:
        blk_of_tile = tile_start[:-1] // CHUNK
        b_scatter = jnp.where(aligned > 0, blk_of_tile, num_blocks)
        b_marks = jnp.zeros(num_blocks + 1, jnp.int32).at[b_scatter].max(
            jnp.arange(num_tiles, dtype=jnp.int32)
        )[:num_blocks]
        tile_of_block = jax.lax.cummax(b_marks)  # (num_blocks,)
        # Per-block scalars (small gathers over num_blocks rows).
        tstart_b = tile_start[tile_of_block][:, None]
        pos_mat = (
            jnp.arange(num_blocks, dtype=jnp.int32)[:, None] * CHUNK
            + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
        )
        slot_mat = pos_mat - tstart_b
        rawstart_b = raw_start[tile_of_block][:, None]
        src = jnp.clip(rawstart_b + slot_mat, 0, cfg.max_pairs - 1)
        # sorted_gid already carries ORIGINAL gaussian ids (run-filled
        # before the sort), so placement is a single gather.
        pair_gid = sorted_gid[src].reshape(P).astype(jnp.int32)
    # Name the (small, integer) pair layout so rollout remat policies can
    # SAVE it instead of re-running the sorts (see train/grounding.py).
    from jax.ad_checkpoint import checkpoint_name

    pair_gid = checkpoint_name(pair_gid, "raster_pairs")
    counts = checkpoint_name(counts, "raster_pairs")
    tile_start = checkpoint_name(tile_start, "raster_pairs")
    overflow = offsets[-1] > cfg.max_pairs

    glue = None
    if cfg.pair_grad == "segsum":
        # Backward-glue layout for the segmented-reduction transpose of
        # the pair-feature gather (see _gather_pair_feats): the final
        # slot of each ORIGINAL pair (P for dropped/invalid — points at
        # a zero pad row), the per-pair run id (the run-filled start is
        # constant within and unique across runs), the per-sorted-
        # gaussian run bounds, and the inverse depth permutation. All
        # integer, all forward-only, all saved under 'raster_pairs'.
        if counting:
            final_of_orig = (
                jnp.zeros((cfg.max_pairs,), jnp.int32).at[orig].set(dest)
            )
        else:
            valid_s = sorted_tile < num_tiles
            ts_c = jnp.minimum(sorted_tile, num_tiles - 1)
            pos_s = jnp.where(
                valid_s,
                tile_start[ts_c] + (pair_idx - raw_start[ts_c]),
                P,
            )
            final_of_orig = (
                jnp.zeros((cfg.max_pairs,), jnp.int32)
                .at[pair_order]
                .set(pos_s)
            )
        inv_order = (
            jnp.zeros((n,), jnp.int32)
            .at[order]
            .set(jnp.arange(n, dtype=jnp.int32))
        )
        glue = tuple(
            checkpoint_name(a, "raster_pairs")
            for a in (final_of_orig, pair_start, starts, offsets, inv_order)
        )
    return pair_gid, counts, tile_start, tiles_x, tiles_y, overflow, glue


@jax.custom_vjp
def _gather_pair_feats(feats, pair_gid, glue):
    """``feats[pair_gid]`` with a scatter-free transpose.

    AD's transpose of the (P, 9) pair-feature gather is a scatter-add
    into the (N, 9) per-gaussian rows — the dominant glue cost of the
    render backward at large pair budgets. This custom VJP instead maps
    the pair cotangents back to the PRE-BINNED layout (where each
    gaussian's pairs form one contiguous run) with a single gather, then
    reduces each run with a segmented Hillis-Steele doubling (exact tree
    sums — no prefix-difference cancellation), and un-permutes the
    depth sort with a final (N, 9) gather. ``glue`` comes from
    ``_build_aligned_pairs`` (cfg.pair_grad == 'segsum')."""
    del glue
    return feats[pair_gid]


def _gather_pair_feats_fwd(feats, pair_gid, glue):
    return feats[pair_gid], (feats.shape, pair_gid, glue)


def _gather_pair_feats_bwd(res, d_pf):
    (n, ch), pair_gid, glue = res[0], res[1], res[2]
    final_of_orig, run_id, g_starts, g_ends, inv_order = glue
    max_pairs = final_of_orig.shape[0]

    # Pair cotangents in pre-binned (per-gaussian contiguous) layout;
    # dropped/invalid pairs point at the zero pad row.
    d_pad = jnp.concatenate(
        [d_pf, jnp.zeros((1, ch), d_pf.dtype)], axis=0
    )
    s = d_pad[final_of_orig]  # (max_pairs, ch)

    # Segmented suffix doubling: after the loop, s[i] holds the tree sum
    # of its run's elements from i to the run end, so s[run start] is
    # the full per-gaussian sum. Trailing garbage "runs" past the live
    # prefix only ever add zero rows (their final_of_orig is P).
    step = 1
    while step < max_pairs:
        s_shift = jnp.concatenate(
            [s[step:], jnp.zeros((step, ch), s.dtype)], axis=0
        )
        r_shift = jnp.concatenate(
            [run_id[step:], jnp.full((step,), -1, run_id.dtype)]
        )
        s = s + jnp.where((run_id == r_shift)[:, None], s_shift, 0.0)
        step *= 2

    live = (g_ends > g_starts) & (g_starts < max_pairs)
    sums = s[jnp.clip(g_starts, 0, max_pairs - 1)]
    sums = jnp.where(live[:, None], sums, 0.0)
    d_feats = sums[inv_order]

    zero_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (
        d_feats,
        zero_int(pair_gid),
        jax.tree_util.tree_map(zero_int, glue),
    )


_gather_pair_feats.defvjp(_gather_pair_feats_fwd, _gather_pair_feats_bwd)


@jax.custom_vjp
def _gather_pair_feats_scatter(feats, pair_gid, live_gid):
    """``feats[pair_gid]`` whose transpose scatter-adds by ``live_gid``
    — identical to AD's transpose except that dead rows (pad slots past
    ``tile_start[-1]``, whose cotangents are unwritten kernel-output
    garbage) carry an out-of-bounds index and are dropped by the
    scatter, so no (P,)-sized validity mask is ever materialized."""
    del live_gid
    return feats[pair_gid]


def _gather_pair_feats_scatter_fwd(feats, pair_gid, live_gid):
    return feats[pair_gid], (feats.shape, pair_gid, live_gid)


def _gather_pair_feats_scatter_bwd(res, d_pf):
    (n, ch), pair_gid, live_gid = res
    d_feats = (
        jnp.zeros((n, ch), d_pf.dtype)
        .at[live_gid]
        .add(d_pf, mode="drop")
    )
    zero_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return d_feats, zero_int(pair_gid), zero_int(live_gid)


_gather_pair_feats_scatter.defvjp(
    _gather_pair_feats_scatter_fwd, _gather_pair_feats_scatter_bwd
)


def _composite(
    tile_mat: jnp.ndarray,  # (num_tiles, S) gaussian ids, -1 padded
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,  # (N,)
    colors: jnp.ndarray,  # (N, 3)
    tiles_x: int,
    tiles_y: int,
    width: int,
    height: int,
    cfg: RasterConfig,
):
    """Front-to-back alpha compositing for all tiles in lockstep.

    Exactly replicates the CUDA ``renderCUDA`` inner loop guards."""
    num_tiles = tiles_x * tiles_y

    if cfg.tile_sharding is not None:
        tile_mat = jax.lax.with_sharding_constraint(
            tile_mat, cfg.tile_sharding
        )

    # Pixel coordinates per tile: (num_tiles, 256, 2)
    t_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = (t_idx % tiles_x) * TILE
    ty = (t_idx // tiles_x) * TILE
    local = jnp.arange(TILE * TILE, dtype=jnp.int32)
    lx = local % TILE
    ly = local // TILE
    pix_x = tx[:, None] + lx[None, :]
    pix_y = ty[:, None] + ly[None, :]
    pix = jnp.stack([pix_x, pix_y], axis=-1).astype(jnp.float32)

    S = tile_mat.shape[1]
    seg = min(cfg.segment, S)
    n_seg = (S + seg - 1) // seg
    if n_seg * seg != S:  # pad the slot axis with -1 (dead slots)
        tile_mat = jnp.concatenate(
            [
                tile_mat,
                jnp.full((num_tiles, n_seg * seg - S), -1, tile_mat.dtype),
            ],
            axis=1,
        )
    seg_ids = tile_mat.reshape(
        num_tiles, n_seg, seg
    ).transpose(1, 0, 2)  # (n_seg, num_tiles, seg)

    # Compositing via prefix products instead of a per-slot sequential
    # scan: with the CUDA freeze semantics ("done" once transmittance
    # would cross 1e-4, crossing contribution excluded), a gaussian
    # contributes iff its INCLUSIVE prefix transmittance stays >= 1e-4 —
    # P is monotone nonincreasing, so the whole chunk composites with one
    # vectorized cumprod over the slot axis:
    #   P_i = P_carry * prod_{j<=i} (1 - alpha_eff_j)
    #   contribute_i = valid_i & (P_i >= 1e-4)
    #   C += sum_i contribute_i * alpha_i * color_i * P_{i-1}
    #   T_final = min over contributing P_i (tracked as running min)
    def segment_body(carry, ids_seg):
        P, C, Tmin = carry  # P: (tiles, 256) running product
        ids = ids_seg  # (tiles, seg)
        gid = jnp.clip(ids, 0)
        live = (ids >= 0)[:, :, None]  # (tiles, seg, 1)
        m2d = mean2d[gid]  # (tiles, seg, 2)
        con = conic[gid]  # (tiles, seg, 3)
        op = opacity[gid]  # (tiles, seg)
        col = colors[gid]  # (tiles, seg, 3)

        d = m2d[:, :, None, :] - pix[:, None, :, :]  # (tiles, seg, 256, 2)
        power = (
            -0.5
            * (
                con[:, :, None, 0] * d[..., 0] ** 2
                + con[:, :, None, 2] * d[..., 1] ** 2
            )
            - con[:, :, None, 1] * d[..., 0] * d[..., 1]
        )
        alpha = _cap_alpha(op[:, :, None] * jnp.exp(power))
        valid = live & (power <= 0.0) & (alpha >= (1.0 / 255.0))
        alpha_eff = jnp.where(valid, alpha, 0.0)  # (tiles, seg, 256)

        q = 1.0 - alpha_eff
        cum = jnp.cumprod(q, axis=1)  # inclusive prefix over slots
        P_incl = P[:, None, :] * cum  # (tiles, seg, 256)
        P_excl = jnp.concatenate(
            [P[:, None, :], P_incl[:, :-1, :]], axis=1
        )
        contribute = valid & (P_incl >= 1e-4)
        w = jnp.where(contribute, alpha_eff * P_excl, 0.0)
        C = C + jnp.einsum("tsp,tsc->tpc", w, col)
        Tmin = jnp.minimum(
            Tmin, jnp.min(jnp.where(contribute, P_incl, 1.0), axis=1)
        )
        P = P_incl[:, -1, :]
        return (P, C, Tmin), None

    P0 = jnp.ones((num_tiles, TILE * TILE), jnp.float32)
    C0 = jnp.zeros((num_tiles, TILE * TILE, 3), jnp.float32)
    Tmin0 = jnp.ones((num_tiles, TILE * TILE), jnp.float32)
    if cfg.tile_sharding is not None:
        P0, C0, Tmin0 = (
            jax.lax.with_sharding_constraint(a, cfg.tile_sharding)
            for a in (P0, C0, Tmin0)
        )

    (P, C, Tmin), _ = jax.lax.scan(
        jax.checkpoint(segment_body), (P0, C0, Tmin0), seg_ids
    )
    return Tmin, C, pix_x, pix_y


def rasterize(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    bg_color: jnp.ndarray,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    sh_degree: int = 3,
    cfg: RasterConfig = RasterConfig(),
) -> jnp.ndarray:
    """``rasterize_with_aux`` without the aux (see below)."""
    img, _ = rasterize_with_aux(
        means3d,
        cov3d,
        opacity,
        camera,
        bg_color,
        shs=shs,
        colors_precomp=colors_precomp,
        sh_degree=sh_degree,
        cfg=cfg,
    )
    return img


def rasterize_with_aux(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    bg_color: jnp.ndarray,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    sh_degree: int = 3,
    cfg: RasterConfig = RasterConfig(),
) -> Tuple[jnp.ndarray, dict]:
    """Render (3, H, W) image; aux carries ``overflow`` — a traced bool
    that fires when the scene exceeded the static ``max_pairs`` /
    ``max_per_tile`` budget and pairs were dropped (the image and its
    gradients are then wrong; training wrappers raise on it, forward
    apps warn).

    Args:
        means3d: (N, 3) world-space means.
        cov3d: (N, 6) packed symmetric 3D covariances (the NeuMA pipeline
            always passes precomputed, possibly F-deformed covariances —
            reference tune/utils.py:392-419).
        opacity: (N, 1) or (N,) activated opacity.
        shs: (N, n_coeff, 3) SH coefficients (exclusive with
            colors_precomp).
        colors_precomp: (N, 3) precomputed colors (e.g. the all-ones
            silhouette mode, reference tune/utils.py:390-404).
    """
    opacity = opacity.reshape(-1)
    depth, visible, mean2d, conic, radius = _project(
        means3d, cov3d, camera
    )
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        assert shs is not None, "need shs or colors_precomp"
        colors = _sh_colors(shs, means3d, camera.camera_center, sh_degree)

    backend = cfg.resolve_backend()
    if backend == "jnp":
        tile_mat, tiles_x, tiles_y, overflow = _build_tile_lists(
            depth, visible, mean2d, radius, camera.width, camera.height,
            cfg,
        )
        T, C, pix_x, pix_y = _composite(
            tile_mat,
            mean2d,
            conic,
            opacity,
            colors,
            tiles_x,
            tiles_y,
            camera.width,
            camera.height,
            cfg,
        )
    else:
        from .pallas_raster import PIX, composite_pairs_tpu

        (
            pair_gid, tile_counts, tile_start, tiles_x, tiles_y, overflow,
            glue,
        ) = _build_aligned_pairs(
            depth, visible, mean2d, radius, camera.width, camera.height,
            cfg,
        )
        # Differentiable gather: its transpose scatter-adds the pair
        # gradients from the Pallas backward into per-gaussian grads
        # (or, with pair_grad='segsum', runs the scatter-free segmented
        # reduction — see _gather_pair_feats). Packing the 9 feature
        # channels first makes that ONE (P, 9) gather/scatter pair
        # instead of four. Pad slots carry a real gaussian's features;
        # the kernels mask them by the scalar-prefetched tile counts.
        feats = jnp.concatenate(
            [mean2d, conic, opacity[:, None], colors], axis=1
        )
        if glue is not None:
            pf = _gather_pair_feats(feats, pair_gid, glue)
        else:
            # Rows past tile_start[-1] of the composite backward's
            # per-pair cotangents are unwritten garbage; route their
            # scatter index out of bounds so the transpose drops them.
            live_gid = jnp.where(
                jnp.arange(pair_gid.shape[0], dtype=jnp.int32)
                < tile_start[-1],
                pair_gid,
                feats.shape[0],
            )
            pf = _gather_pair_feats_scatter(feats, pair_gid, live_gid)
        T, Cflat = composite_pairs_tpu(
            pf,
            tile_start,
            tile_counts,
            tiles_x,
            backend == "pallas_interpret",
        )

        # Assemble per channel: the kernel's (tiles, 3*PIX) output keeps
        # the channels as separate 256-lane blocks — stacking them into
        # a (tiles, 256, 3) channel-minor array first (3 of 128 lanes
        # used, 42x padded) cost ~5 ms/view of relayout at 1080p.
        def assemble(flat):  # (num_tiles, PIX) -> (H', W')
            t = flat.reshape(tiles_y, tiles_x, TILE, TILE)
            return t.transpose(0, 2, 1, 3).reshape(
                tiles_y * TILE, tiles_x * TILE
            )

        img = jnp.stack(
            [
                assemble(
                    Cflat[:, c * PIX : (c + 1) * PIX] + T * bg_color[c]
                )
                for c in range(3)
            ]
        )
        return (
            img[:, : camera.height, : camera.width],
            {"overflow": overflow},
        )

    # Assemble tiles -> (3, H, W), crop padding, composite background.
    img = C + T[..., None] * bg_color[None, None, :]
    img = img.reshape(tiles_y, tiles_x, TILE, TILE, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        3, tiles_y * TILE, tiles_x * TILE
    )
    return img[:, : camera.height, : camera.width], {"overflow": overflow}
