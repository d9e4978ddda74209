"""Round-5: where does the ~12 ms/view pair build actually go at the
realworld render shape (30k gaussians, 1080p, 1<<18 budget)?

Rows (slope-timed inside one jit via fori repetition over perturbed
inputs):
  * lax.sort of 2^18 packed keys (direct dispatch timing too)
  * _build_aligned_pairs (full pair build, sort binning)
  * _build_aligned_pairs (counting binning)
  * projection+depth argsort alone
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
import neuma_tpu.render.rasterize as rz

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
cam = list(scene.cameras)[0]
cfg = scene.raster_cfg
N = scene.gaussians.xyz.shape[0]
cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)
xyz0 = scene.gaussians.xyz

print("max_pairs", cfg.max_pairs, "binning", cfg.pair_binning, flush=True)


def direct(label, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"[direct] {label:32s}: {best*1000:8.2f} ms", flush=True)
    return best * 1000


def slope(label, step_fn, carry0, reps=8, outer=3):
    def make(n):
        @jax.jit
        def run(c):
            def body(i, c):
                return step_fn(c, i)

            return jax.lax.fori_loop(0, n, body, c)

        return run

    fs = [make(1), make(1 + reps)]
    ts = []
    for f in fs:
        out = f(carry0)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(outer):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / reps * 1000.0
    print(f"[slope]  {label:32s}: {per:8.3f} ms", flush=True)
    return per


# direct dispatch floor
direct("noop (dispatch floor)", lambda x: x + 1, jnp.float32(1.0))

# direct lax.sort 2^18
rng = np.random.default_rng(0)
k18 = jnp.asarray(
    rng.integers(0, 1 << 31, size=1 << 18, dtype=np.int64), jnp.uint32
)
direct("lax.sort u32 2^18", lambda k: jax.lax.sort((k,), num_keys=1)[0], k18)

from neuma_tpu.ops.bitonic import sort_i32  # noqa: E402

direct("bitonic i32 2^18", lambda k: sort_i32(k.astype(jnp.int32)), k18)


def build(xyz, binning):
    c = dataclasses.replace(cfg, pair_binning=binning)
    depth, vis, mean2d, conic, radius = rz._project(xyz, cov0, cam)
    out = rz._build_aligned_pairs(
        depth, vis, mean2d, radius, cam.width, cam.height, c
    )
    return out


def build_step(binning):
    def step(c, i):
        xyz = c + 0.0
        pg, valid, ts, _, _, ovf, _ = build(xyz, binning)
        return c + 1e-20 * (
            pg[0].astype(jnp.float32) + ts[0].astype(jnp.float32)
        )

    return step


slope("aligned pairs (sort)", build_step("sort"), xyz0)
slope("aligned pairs (counting)", build_step("counting"), xyz0)


def proj_step(c, i):
    depth, vis, mean2d, conic, radius = rz._project(c, cov0, cam)
    order = jnp.argsort(jnp.where(vis, depth, jnp.inf))
    return c + 1e-20 * (order[0].astype(jnp.float32) + mean2d[0, 0])


slope("project + depth argsort", proj_step, xyz0)
