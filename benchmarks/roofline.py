"""Roofline / speed-of-light accounting for the hot kernels.

For each hot phase (p2g, full sim step, sim fwd+bwd, pair build,
composite fwd, render fwd+bwd) this measures the achieved time on the
current backend and compares it with the analytic lower bound
max(flops/peak, bytes/peak_bw) from ``neuma_tpu.utils.roofline`` — the
*algorithmic minimum* work, so wasted kernel work shows up as
inefficiency, never as progress.

Timing uses the two-K slope method: each phase runs K times inside one
jitted ``lax.scan`` and is timed at two different K; the slope cancels
the fixed per-dispatch overhead (the axon tunnel adds ~43 ms per
dispatch and ``block_until_ready`` does not block on it).

    python benchmarks/roofline.py [--json out.json]
    python benchmarks/roofline.py --particles 30000 --grid 70  # realworld
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neuma_tpu.utils import roofline as rl  # noqa: E402


def slope_time(make_run, k1=4, k2=16, reps=3):
    """Time one iteration via the two-K slope: build jitted runners that
    iterate the body K times in-graph, time both, return
    (T(k2)-T(k1))/(k2-k1) — fixed dispatch overhead cancels."""
    run1, run2 = make_run(k1), make_run(k2)

    def best(run):
        _ = run()  # compile + warmup
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = run()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = best(run1), best(run2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", type=str, default=None)
    parser.add_argument("--particles", type=int, default=10_000)
    parser.add_argument("--grid", type=int, default=32)
    parser.add_argument("--img", type=int, default=800)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import (
        RasterConfig,
        _build_aligned_pairs,
        _project,
        rasterize,
    )
    from neuma_tpu.sim import mpm

    rng = np.random.default_rng(0)
    n, g, img = args.particles, args.grid, args.img

    # --- scene ----------------------------------------------------------
    x = jnp.asarray((0.4 + 0.2 * rng.random((n, 3))).astype(np.float32))
    state = ParticleState.initial(x, jnp.zeros((n, 3), jnp.float32))
    constants = MPMConstants(
        num_grids=g, bound=1, bc="noslip", dt=jnp.float32(1e-3),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), 2e-8, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )
    stress = jnp.asarray(1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32)

    rows = {}

    def scan_runner(body_fn, *carry):
        def make(K):
            @jax.jit
            def run_k(cargs):
                def body(c, _):
                    return body_fn(*c), None

                c, _ = jax.lax.scan(body, cargs, None, length=K)
                return c

            def run():
                out = run_k(carry)
                _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
                return out

            return run

        return slope_time(make)

    # --- p2g (fwd) ------------------------------------------------------
    def p2g_body(s, sr):
        gm, gmv = mpm.p2g(constants, statics, s, sr)
        # feed a tiny perturbation back so scan can't CSE the iterations
        s2 = ParticleState(x=s.x + 1e-12 * gm[0], v=s.v, C=s.C, F=s.F)
        return (s2, sr)

    t_p2g = scan_runner(p2g_body, state, stress)
    f_p2g, b_p2g = rl.p2g(n, g)
    rows["p2g_fwd"] = (t_p2g, f_p2g, b_p2g)

    # --- full sim step fwd ---------------------------------------------
    def step_body(s, sr):
        return (mpm.mpm_step(constants, statics, s, sr), sr)

    t_step = scan_runner(step_body, state, stress)
    f_step, b_step = rl.sim_step(n, g)
    rows["sim_step_fwd"] = (t_step, f_step, b_step)

    # --- sim step fwd+bwd ----------------------------------------------
    def make_grad(K):
        @jax.jit
        def grad_step(s, sr):
            def loss(st, srr):
                def body(c, _):
                    return (
                        mpm.mpm_step_diff(constants, statics, c, srr),
                        None,
                    )

                out, _ = jax.lax.scan(body, st, None, length=K)
                return jnp.sum(out.x**2)

            return jax.grad(loss, argnums=(0, 1))(s, sr)

        def run():
            out = grad_step(state, stress)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            return out

        return run

    t_grad = slope_time(make_grad)
    rows["sim_step_fwd_bwd"] = (t_grad, 3 * f_step, 3 * b_step)

    # --- rasterizer -----------------------------------------------------
    pack = create_from_points(
        np.asarray(x), rng.random((n, 3)).astype(np.float32), sh_degree=3
    )
    cov = pack.get_covariance()
    opac = pack.get_opacity
    shs = pack.get_features
    cam = Camera.look_at(
        eye=np.array([0.5, 0.55, -1.6]), target=np.array([0.5, 0.5, 0.5]),
        fov=0.8, width=img, height=img,
    )
    cfg = RasterConfig(max_pairs=1 << 18, max_per_tile=512)
    bg = jnp.zeros(3)
    means = jnp.asarray(x)

    def render_body(m):
        im = rasterize(m, cov, opac, cam, bg, shs=shs, sh_degree=3, cfg=cfg)
        return (m + 1e-12 * im[0, 0, 0],)

    t_render = scan_runner(render_body, means)

    def make_render_grad(K):
        @jax.jit
        def render_grad(m):
            def loss(mm):
                def body(c, _):
                    im = rasterize(
                        c, cov, opac, cam, bg, shs=shs, sh_degree=3, cfg=cfg
                    )
                    return c + 1e-12 * im[0, 0, 0], jnp.mean(im)

                c, losses = jax.lax.scan(body, mm, None, length=K)
                return jnp.sum(losses)

            return jax.grad(loss)(m)

        def run():
            out = render_grad(means)
            _ = float(out.ravel()[0])
            return out

        return run

    t_render_grad = slope_time(make_render_grad)

    def pair_body(m):
        depth, vis, m2d, conic, radius = _project(m, cov, cam)
        pg, valid, ts, tx, ty, ovf, _ = _build_aligned_pairs(
            depth, vis, m2d, radius, cam.width, cam.height, cfg
        )
        return (m + 1e-12 * pg[0],)

    t_pairs = scan_runner(pair_body, means)

    # actual pair count for the composite model
    depth, vis, m2d, conic, radius = jax.jit(
        lambda mm: _project(mm, cov, cam)
    )(means)
    out_pairs = jax.jit(
        lambda d, v, m2, r: _build_aligned_pairs(
            d, v, m2, r, cam.width, cam.height, cfg
        )
    )(depth, vis, m2d, radius)
    n_pairs = int(jnp.sum(out_pairs[1]))

    f_comp, b_comp = rl.composite(n_pairs, img, img)
    f_proj, b_proj = rl.projection(n)
    f_sh, b_sh = rl.sh_eval(n)
    f_pb, b_pb = rl.pair_build(n_pairs, cfg.max_pairs)
    f_fwd = f_comp + f_proj + f_sh + f_pb
    b_fwd = b_comp + b_proj + b_sh + b_pb
    rows["render_fwd(total)"] = (t_render, f_fwd, b_fwd)
    rows["render_fwd_bwd"] = (
        t_render_grad,
        3 * (f_comp + f_proj + f_sh) + f_pb,
        3 * (b_comp + b_proj + b_sh) + b_pb,
    )
    rows["pair_build"] = (t_pairs, f_pb + f_proj, b_pb + b_proj)

    out = {
        "backend": jax.default_backend(),
        "scene": {"particles": n, "grid": g, "img": img, "pairs": n_pairs},
        "phases": {},
    }
    print(f"backend={jax.default_backend()} n={n} g={g} img={img} "
          f"pairs={n_pairs}")
    for name, (t, f, b) in rows.items():
        sol = rl.sol_time(f, b)
        frac = sol / t if t > 0 else 0.0
        out["phases"][name] = {
            "ms": t * 1e3,
            "sol_ms": sol * 1e3,
            "of_light": frac,
            "gflops": f / 1e9,
            "mbytes": b / 1e6,
        }
        print(
            f"  {name:28s} {t*1e3:8.3f} ms   sol {sol*1e3:7.3f} ms   "
            f"{100*frac:5.1f}% of light   ({f/1e9:.2f} GF, {b/1e6:.1f} MB)"
        )

    if args.json:
        with open(args.json, "w") as fjson:
            json.dump(out, fjson, indent=1)
    return out


if __name__ == "__main__":
    main()
