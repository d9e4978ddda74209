"""Isolate the Pallas composite fwd/bwd cost at bench shapes."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import create_from_points
from neuma_tpu.render.rasterize import (
    RasterConfig, _build_aligned_pairs, _project, _sh_colors,
)
from neuma_tpu.render.pallas_raster import composite_pairs_tpu


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


rng = np.random.default_rng(0)
n, img = 10_000, 800
pts = (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
g = create_from_points(pts, rng.random((n, 3)).astype(np.float32), 3)
cov = g.get_covariance()
opac = g.get_opacity[:, 0]
shs = g.get_features
cam = Camera.look_at(
    eye=np.array([0.5, 0.55, -1.6]), target=np.array([0.5, 0.5, 0.5]),
    fov=0.8, width=img, height=img,
)
cfg = RasterConfig(max_pairs=1 << 16, max_per_tile=512)
x = jnp.asarray(pts)

depth, vis, m2d, conic, radius = jax.jit(lambda m: _project(m, cov, cam))(x)
pair_gid, pair_valid, tile_start, tiles_x, tiles_y, ovf, _ = jax.jit(
    lambda d, v, m2, r: _build_aligned_pairs(
        d, v, m2, r, cam.width, cam.height, cfg
    )
)(depth, vis, m2d, radius)
tiles_x, tiles_y = (800 + 15) // 16, (800 + 15) // 16
colors = jax.jit(lambda m: _sh_colors(shs, m, jnp.asarray(cam.camera_center), 3))(x)

pm = m2d[pair_gid]
pc = conic[pair_gid]
po = jnp.where(pair_valid, opac[pair_gid], 0.0)
pcol = colors[pair_gid]


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

    print(f"{label:28s} {slope(make)*1e3:8.3f} ms")


timed("pair feature gathers",
      lambda c: (m2d[pair_gid] + c * 1e-12, conic[pair_gid],
                 opac[pair_gid], colors[pair_gid]))
timed("composite fwd",
      lambda c: composite_pairs_tpu(
          pm + c * 1e-12, pc, po, pcol, tile_start, tiles_x, False))
timed("composite fwd+bwd",
      lambda c: jax.grad(
          lambda m: jnp.sum(
              composite_pairs_tpu(
                  m, pc, po, pcol, tile_start, tiles_x, False
              )[0]
          )
      )(pm + c * 1e-12))
timed("sh colors", lambda c: _sh_colors(
    shs, x + c * 1e-12, jnp.asarray(cam.camera_center), 3))
print("pairs:", int(jnp.sum(pair_valid)), "P:", pair_gid.shape[0],
      "tiles:", tiles_x, tiles_y)


def full_gather_grad(c):
    def loss(m2, co, op, colr):
        pm_ = m2[pair_gid]
        pc_ = co[pair_gid]
        po_ = jnp.where(pair_valid, op[pair_gid], 0.0)
        pl_ = colr[pair_gid]
        im, T, last = composite_pairs_tpu(
            pm_, pc_, po_, pl_, tile_start, tiles_x, False
        )
        return jnp.sum(im) + jnp.sum(T)

    return jax.grad(loss, argnums=(0, 1, 2, 3))(
        m2d + c * 1e-12, conic, opac, colors
    )


timed("gather+composite fwd+bwd", full_gather_grad)
