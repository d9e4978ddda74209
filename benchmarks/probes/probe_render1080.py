"""Phase split of the single-view 1080p render at the realworld shape
(30k gaussians, 1<<18 budget): projection, pair build, feature gather,
composite kernel fwd, full fwd, full fwd+bwd — slope-timed on TPU."""
import sys as _sys
import time
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import bench
from neuma_tpu.render.pallas_raster import composite_pairs_tpu
from neuma_tpu.render.rasterize import (
    RasterConfig,
    _build_aligned_pairs,
    _project,
    rasterize,
)

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
cov0 = scene.gaussians.get_covariance()
opac = scene.gaussians.get_opacity
x = scene.gaussians.xyz
cam = scene.cameras[0]
cp = jnp.ones((x.shape[0], 3), jnp.float32)
cfg = scene.raster_cfg


def slope(make, k1=3, k2=9, reps=3):
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
                probe = sum(
                    jnp.sum(l) * 1e-12
                    for l in leaves
                    if l.dtype != jnp.bool_
                )
                return c + probe.astype(jnp.float32), None

            c, _ = jax.lax.scan(sbody, c0, None, length=K)
            return c

        def go():
            _ = float(run(jnp.float32(0.0)))

        return go

    t = slope(make)
    print(f"{label:36s} {t*1e3:8.3f} ms")
    return t


d0, v0, m2d0, con0, rad0 = jax.jit(lambda m: _project(m, cov0, cam))(x)
built = jax.jit(
    lambda d, v, m, r: _build_aligned_pairs(
        d, v, m, r, cam.width, cam.height, cfg
    )
)(d0, v0, m2d0, rad0)
pair_gid, in_tile, tile_start = built[0], built[1], built[2]
feats0 = jnp.concatenate(
    [m2d0, con0, opac.reshape(-1)[:, None], cp], axis=1
)

timed("project", lambda c: _project(x + c * 1e-12, cov0, cam))
timed(
    "pair build (sort path)",
    lambda c: _build_aligned_pairs(
        d0 + c * 1e-12, v0, m2d0, rad0, cam.width, cam.height, cfg
    )[:3],
)
cfg_cnt = dataclasses.replace(cfg, pair_binning="counting")
timed(
    "pair build (counting path)",
    lambda c: _build_aligned_pairs(
        d0 + c * 1e-12, v0, m2d0, rad0, cam.width, cam.height, cfg_cnt
    )[:3],
)
timed("feats gather (P,9)", lambda c: (feats0 + c * 1e-12)[pair_gid])

pf0 = feats0[pair_gid]
pm, pc = pf0[:, 0:2], pf0[:, 2:5]
po = jnp.where(in_tile, pf0[:, 5], 0.0)
pcol = pf0[:, 6:9]
timed(
    "composite kernel fwd",
    lambda c: composite_pairs_tpu(
        pm + c * 1e-12, pc, po, pcol, tile_start, 120
    ),
)


def comp_grad(c):
    def loss(m, o):
        T, C = composite_pairs_tpu(m, o[0], o[1], o[2], tile_start, 120)
        return jnp.sum(T) + jnp.sum(C)

    return jax.grad(loss, argnums=(0,))(pm + c * 1e-12, (pc, po, pcol))


timed("composite kernel fwd+bwd", comp_grad)


def full_fwd(c):
    return rasterize(
        x + c * 1e-12, cov0, opac, cam, scene.background,
        colors_precomp=cp, cfg=cfg,
    )


timed("full render fwd", full_fwd)

for pg in ("scatter", "segsum"):
    cfg_pg = dataclasses.replace(cfg, pair_grad=pg)

    def full_grad(c, cfg_pg=cfg_pg):
        def loss(m):
            return jnp.sum(
                rasterize(
                    m, cov0, opac, cam, scene.background,
                    colors_precomp=cp, cfg=cfg_pg,
                ) ** 2
            )

        return jax.grad(loss)(x + c * 1e-12)

    timed(f"full render fwd+bwd ({pg})", full_grad)
