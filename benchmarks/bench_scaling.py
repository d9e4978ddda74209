"""Scaling benchmarks: particles/s through the MPM step and Mrays/s
through the rasterizer, across problem sizes (BASELINE.json operational
metrics). Run on TPU; also runs on the CPU mesh for sharding validation.

    python benchmarks/bench_scaling.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def steady(f, *a, reps=6):
    import jax

    out = f(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", type=str, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import RasterConfig, rasterize
    from neuma_tpu.sim.mpm import mpm_step

    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend()}
    dispatch = steady(jax.jit(lambda a: a + 1), jnp.float32(1.0))
    results["dispatch_overhead_s"] = dispatch

    # --- simulation throughput ------------------------------------------
    sim_rows = []
    for n, g in ((10_000, 32), (50_000, 32), (30_000, 70), (100_000, 64)):
        x = jnp.asarray(
            (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
        )
        state = ParticleState.initial(x, jnp.zeros((n, 3), jnp.float32))
        constants = MPMConstants(
            num_grids=g, bound=1, bc="noslip",
            dt=jnp.float32(1e-3),
            gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
            eps=jnp.float32(6e-7),
        )
        statics = Statics(
            vol=jnp.full((n,), 2e-8, jnp.float32),
            rho=jnp.full((n,), 1000.0, jnp.float32),
            clip_bound=jnp.full((n,), 0.1, jnp.float32),
            enabled=jnp.ones((n,), jnp.int32),
        )
        stress = jnp.asarray(
            1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32
        )

        # Two-K slope: time K1 and K2 steps inside one dispatch each;
        # the slope cancels the tunnel-dispatch overhead exactly
        # (state changes each iteration — no CSE hoisting).
        def make(K):
            @jax.jit
            def run(state, stress):
                def body(s, _):
                    return mpm_step(constants, statics, s, stress), None

                s, _ = jax.lax.scan(body, state, None, length=K)
                return s

            return run

        k1, k2 = 8, 24
        t1 = steady(make(k1), state, stress)
        t2 = steady(make(k2), state, stress)
        t = max((t2 - t1) / (k2 - k1), 1e-9)
        pps = n / t
        sim_rows.append(
            {"particles": n, "grid": g, "steps_per_s": 1.0 / t,
             "particle_steps_per_s": pps}
        )
        print(
            f"sim n={n} g={g}^3: {pps/1e6:.1f}M particle-steps/s "
            f"({1/t:.0f} steps/s)"
        )
    results["sim"] = sim_rows

    # --- rasterizer throughput ------------------------------------------
    rast_rows = []
    for n, img in ((10_000, 800), (50_000, 800), (100_000, 1024)):
        pts = (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
        colors = rng.random((n, 3)).astype(np.float32)
        g = create_from_points(pts, colors, sh_degree=3)
        cam = Camera.look_at(
            eye=np.array([0.5, 0.55, -1.6]),
            target=np.array([0.5, 0.5, 0.5]),
            fov=0.8, width=img, height=img,
        )
        cov = g.get_covariance()
        x = jnp.asarray(pts)
        opac = g.get_opacity
        shs = g.get_features
        cfg = RasterConfig(max_pairs=1 << 18)

        K = 8  # in-graph repetition: tunnel-dispatch noise / K

        @jax.jit
        def f(m, c):
            def body(mm, _):
                im = rasterize(
                    mm, c, opac, cam, jnp.ones(3), shs=shs, sh_degree=3,
                    cfg=cfg,
                )
                return mm + 1e-12 * im[0, 0, 0], None

            mm, _ = jax.lax.scan(body, m, None, length=K)
            return mm

        t = max((steady(f, x, cov) - dispatch) / K, 1e-9)
        mrays = img * img / t / 1e6
        rast_rows.append(
            {"gaussians": n, "image": img, "fps": 1.0 / t,
             "mrays_per_s": mrays}
        )
        print(
            f"raster n={n} {img}^2: {mrays:.0f} Mrays/s ({1/t:.1f} fps)"
        )
    results["raster"] = rast_rows

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"written {args.json}")
    return results


if __name__ == "__main__":
    main()
