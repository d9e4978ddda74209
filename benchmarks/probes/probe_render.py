"""Slope-timed render fwd / fwd+bwd at bench shapes (10k, 800^2, 1<<16)."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import time

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import create_from_points
from neuma_tpu.render.rasterize import RasterConfig, rasterize


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
opac = g.get_opacity
shs = g.get_features
cam = Camera.look_at(
    eye=np.array([0.5, 0.55, -1.6]), target=np.array([0.5, 0.5, 0.5]),
    fov=0.8, width=img, height=img,
)
cfg = RasterConfig(max_pairs=1 << 16, max_per_tile=512)
bg = jnp.zeros(3)
x = jnp.asarray(pts)
tgt = jnp.asarray(rng.random((3, img, img)), jnp.float32)


def make_fwd(K):
    @jax.jit
    def run(m):
        def body(mm, _):
            im = rasterize(mm, cov, opac, cam, bg, shs=shs, sh_degree=3,
                           cfg=cfg)
            return mm + 1e-12 * im[0, 0, 0], None

        mm, _ = jax.lax.scan(body, m, None, length=K)
        return mm

    def go():
        _ = float(run(x).ravel()[0])

    return go


def make_grad(K):
    @jax.jit
    def run(m):
        def loss(mm):
            def body(c, _):
                im = rasterize(c, cov, opac, cam, bg, shs=shs,
                               sh_degree=3, cfg=cfg)
                return c + 1e-12 * im[0, 0, 0], jnp.mean((im - tgt) ** 2)

            c, losses = jax.lax.scan(body, mm, None, length=K)
            return jnp.sum(losses)

        return jax.grad(loss)(m)

    def go():
        _ = float(run(x).ravel()[0])

    return go


print(f"render fwd      {slope(make_fwd)*1e3:7.3f} ms")
print(f"render fwd+bwd  {slope(make_grad)*1e3:7.3f} ms")
