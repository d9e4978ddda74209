"""Capture a jax.profiler trace of the realworld 3-view 1080p render
fwd+bwd (the bench's render path) for per-op attribution."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from neuma_tpu.render.rasterize import rasterize_with_aux

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)
opacity = scene.gaussians.get_opacity
k_xyz = scene.gaussians.xyz
cams = list(scene.cameras)


def render_views(means3d):
    outs = []
    for cam in cams:
        img, _ = rasterize_with_aux(
            means3d,
            cov0,
            opacity,
            cam,
            scene.background,
            colors_precomp=jnp.ones((k_xyz.shape[0], 3), jnp.float32),
            cfg=scene.raster_cfg,
        )
        outs.append(img)
    return jnp.stack(outs)


@jax.jit
def grad_render(m):
    def loss(m):
        return jnp.sum(render_views(m) ** 2)

    return jax.value_and_grad(loss)(m)


out = grad_render(k_xyz)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = grad_render(k_xyz)
jax.block_until_ready(out)
print(f"render 3x1080p fwd+bwd: {(time.perf_counter()-t0)*1000:.1f} ms")

with jax.profiler.trace("/tmp/trace_render5c"):
    out = grad_render(k_xyz)
    jax.block_until_ready(out)
print("trace done")
