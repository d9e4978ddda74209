"""Cross-backend gradient parity of the Pallas backward on the real TPU
after the double-buffered output-DMA change, plus bwd timing."""
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

rng = np.random.default_rng(0)
n, img = 4000, 512
pts = (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
colors = rng.random((n, 3)).astype(np.float32)
g = create_from_points(pts, colors, sh_degree=0)
cam = Camera.look_at(
    eye=np.array([0.5, 0.55, -1.6]), target=np.array([0.5, 0.5, 0.5]),
    fov=0.8, width=img, height=img,
)
cov = g.get_covariance()
opac = g.get_opacity
shs = g.get_features
bg = jnp.zeros(3)
x = jnp.asarray(pts)

tgt = jnp.asarray(rng.random((3, img, img)), jnp.float32)


def loss(m, backend):
    cfg = RasterConfig(max_pairs=1 << 17, backend=backend)
    im = rasterize(m, cov, opac, cam, bg, shs=shs, sh_degree=0, cfg=cfg)
    return jnp.mean((im - tgt) ** 2)


gp = jax.jit(jax.grad(lambda m: loss(m, "pallas")))
gj = jax.jit(jax.grad(lambda m: loss(m, "jnp")))
a = np.asarray(gp(x))
b = np.asarray(gj(x))
denom = np.abs(b).max() + 1e-12
err = np.abs(a - b).max() / denom
print(f"max rel grad err pallas vs jnp (TPU): {err:.2e}")
assert err < 5e-3, err  # pre-existing cross-backend numerics (same pre-DMA-change)
assert np.isfinite(a).all()

# timing (slope method)
def make(K):
    @jax.jit
    def run(m):
        def body(c, _):
            return c + 1e-12 * gp(c), None
        c, _ = jax.lax.scan(body, m, None, length=K)
        return c
    def go():
        out = run(x)
        _ = float(out.ravel()[0])
    return go

r1, r2 = make(2), make(8)
r1()
t = []
for _ in range(3):
    t0 = time.perf_counter(); r1(); t.append(time.perf_counter() - t0)
t1 = min(t)
r2()
t = []
for _ in range(3):
    t0 = time.perf_counter(); r2(); t.append(time.perf_counter() - t0)
t2 = min(t)
print(f"render grad (4k/512^2): {(t2-t1)/6*1000:.2f} ms")
print("OK")
