"""Slope-timed cumulative stage breakdown of _build_aligned_pairs."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import create_from_points
from neuma_tpu.render.rasterize import (
    RasterConfig, _project, _sort_pairs_by_tile, _tile_ranges, TILE,
)
from neuma_tpu.render.pallas_raster import CHUNK


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


def timed(label, body, x):
    def make(K):
        @jax.jit
        def run(m):
            def sbody(c, _):
                out = body(m + c * 1e-9)
                leaves = jax.tree_util.tree_leaves(out)
                probe = sum(
                    jnp.sum(l).astype(jnp.float32) * 1e-12 for l in leaves
                )
                return c + probe, None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=K)
            return c

        def go():
            _ = float(run(x))

        return go

    t = slope(make)
    print(f"{label:34s} {t*1e3:8.3f} ms")


rng = np.random.default_rng(0)
n, img = 10_000, 800
pts = (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
g = create_from_points(pts, rng.random((n, 3)).astype(np.float32), 3)
cov = g.get_covariance()
cam = Camera.look_at(
    eye=np.array([0.5, 0.55, -1.6]), target=np.array([0.5, 0.5, 0.5]),
    fov=0.8, width=img, height=img,
)
x = jnp.asarray(pts)

for mp in (1 << 16, 1 << 18):
    cfg = RasterConfig(max_pairs=mp, max_per_tile=512)
    print(f"--- max_pairs = {mp}")

    def stage(upto):
        def body(m):
            depth, vis, m2d, conic, radius = _project(m, cov, cam)
            if upto == 0:
                return (depth,)
            x0, y0, x1, y1, tiles_x, tiles_y = _tile_ranges(
                m2d, radius, cam.width, cam.height
            )
            num_tiles = tiles_x * tiles_y
            order = jnp.argsort(jnp.where(vis, depth, jnp.inf))
            if upto == 1:
                return (order,)
            x0s, x1s = x0[order], x1[order]
            y0s, y1s = y0[order], y1[order]
            vis_s = vis[order] & (radius[order] > 0)
            w_t = jnp.where(vis_s, x1s - x0s, 0)
            h_t = jnp.where(vis_s, y1s - y0s, 0)
            area = w_t * h_t
            offsets = jnp.cumsum(area)
            starts = offsets - area
            pair_idx = jnp.arange(cfg.max_pairs, dtype=jnp.int32)
            scatter_pos = jnp.where(area > 0, starts, cfg.max_pairs)
            marks = jnp.zeros(cfg.max_pairs + 1, jnp.int32).at[
                scatter_pos
            ].max(jnp.arange(n, dtype=jnp.int32))[: cfg.max_pairs]
            gid_c = jax.lax.cummax(marks)
            if upto == 2:
                return (gid_c,)
            valid_pair = pair_idx < offsets[-1]
            k = pair_idx - starts[gid_c]
            tw = jnp.maximum(w_t[gid_c], 1)
            ky = jnp.floor(
                k.astype(jnp.float32) / tw.astype(jnp.float32)
            ).astype(jnp.int32)
            tile_x = x0s[gid_c] + (k - ky * tw)
            tile_y = y0s[gid_c] + ky
            tile_id = jnp.where(
                valid_pair, tile_y * tiles_x + tile_x, num_tiles
            )
            if upto == 3:
                return (tile_id,)
            sorted_tile, sorted_gid, _ = _sort_pairs_by_tile(
                tile_id, gid_c, num_tiles, cfg.max_pairs
            )
            if upto == 4:
                return (sorted_tile, sorted_gid)
            raw_start = jnp.searchsorted(
                sorted_tile,
                jnp.arange(num_tiles + 1, dtype=jnp.int32),
                side="left",
            )
            counts = raw_start[1:] - raw_start[:-1]
            aligned = ((counts + CHUNK - 1) // CHUNK) * CHUNK
            tile_start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(aligned).astype(jnp.int32)]
            )
            if upto == 5:
                return (tile_start, counts, raw_start, sorted_gid, order)
            from neuma_tpu.render.rasterize import _build_aligned_pairs

            return _build_aligned_pairs(
                depth, vis, m2d, radius, cam.width, cam.height, cfg
            )[:3]

        return body

    labels = [
        "project", "+depth argsort", "+run-fill gid", "+tile ids",
        "+packed sort", "+ranges/align", "full build",
    ]
    for i, lab in enumerate(labels):
        timed(lab, stage(i), x)
