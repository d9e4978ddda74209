"""Benchmark: full grounding step time (sim + render + backward) per frame.

Two scenarios, spanning both config families (SURVEY.md section 6):

* ``headline`` — BouncyBall-scale synthetic: ~10k particles, 32^3 grid,
  1 view at 800^2, substeps 1 (the reference's synthetic workload).
* ``realworld`` — real-capture shape (finetune-bun.yaml:41-115): 30k
  particles, 70^3 grid, substeps 20, THREE 1920x1080 mask views
  (read_mask_only -> silhouette rendering). Runs on the TPU backend
  only (it is a production-scale workload; set NEUMA_BENCH_REALWORLD=1
  to force it elsewhere).

Each scenario runs the jitted stage-2 loss+grad (elasticity MLP -> MPM
steps -> plasticity MLP -> binding -> Particle-GS render -> L2 loss ->
full BPTT) and reports milliseconds per rollout frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for
the headline scenario, with the realworld scenario nested under
"realworld" when it ran. The reference PyTorch+Warp pipeline publishes
no timing numbers (BASELINE.md) and no A100 is reachable from this
container, so ``vs_baseline`` reports the defensible anchor instead:
the measured **fraction of speed-of-light** — the analytic roofline
lower bound for this exact workload (``neuma_tpu/utils/roofline.py``)
divided by the measured per-frame time net of the container's ~43 ms
tunnel dispatch. 1.0 would mean the step runs at the hardware bound;
see BENCHMARKS.md for the per-kernel breakdown.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

SCENARIOS = {
    # n_particles, grid, frames, substeps, (w, h), n_views, force_mask,
    # max_pairs, max_per_tile
    "headline": dict(
        n_particles=10000, grid=32, frames=4, substeps=1,
        width=800, height=800, n_views=1, force_mask=False,
        max_pairs=1 << 16, max_per_tile=512,
    ),
    "realworld": dict(
        n_particles=30000, grid=70, frames=2, substeps=20,
        width=1920, height=1080, n_views=3, force_mask=True,
        max_pairs=1 << 18, max_per_tile=512,
    ),
}


def build_scene(p):
    import jax
    import jax.numpy as jnp

    from neuma_tpu.core.types import MPMConstants, Statics
    from neuma_tpu.materials import (
        InvariantFullMetaElasticity,
        InvariantFullMetaPlasticity,
        MetaMaterialConfig,
    )
    from neuma_tpu.render.binding import compute_binding_table
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.render.rasterize import RasterConfig
    from neuma_tpu.train.grounding import GroundingScene

    rng = np.random.default_rng(0)
    n = p["n_particles"]
    pts = (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)

    constants = MPMConstants(
        num_grids=p["grid"],
        bound=1,
        bc="noslip",
        dt=jnp.float32(1e-3 / p["substeps"]),
        gravity=jnp.asarray([0.0, -9.8, 0.0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), 2e-8, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )
    mat_cfg = MetaMaterialConfig(layer_widths=(64, 64))
    elasticity = InvariantFullMetaElasticity(mat_cfg)
    plasticity = InvariantFullMetaPlasticity(mat_cfg)
    pe = jax.tree_util.tree_map(
        lambda x: 0.05 * x, elasticity.init(jax.random.PRNGKey(0))
    )
    pp = jax.tree_util.tree_map(
        lambda x: 0.05 * x, plasticity.init(jax.random.PRNGKey(1))
    )
    pe = elasticity.init_lora(pe, jax.random.PRNGKey(2), r=16, alpha=16)
    pp = plasticity.init_lora(pp, jax.random.PRNGKey(3), r=16, alpha=16)

    gaussians = create_from_points(pts, colors, sh_degree=3)
    table = compute_binding_table(
        gaussians, jnp.asarray(pts), max_particles=10
    )
    cams = [
        Camera.look_at(
            eye=np.array(
                [0.5 + 1.6 * np.sin(2.1 * v), 0.55,
                 0.5 - 1.6 * np.cos(2.1 * v)]
            ),
            target=np.array([0.5, 0.5, 0.5]),
            fov=0.8,
            width=p["width"],
            height=p["height"],
        )
        for v in range(p["n_views"])
    ]
    raster_cfg = RasterConfig(
        max_pairs=p["max_pairs"], max_per_tile=p["max_per_tile"],
        segment=32,
    )

    return GroundingScene(
        constants=constants,
        statics=statics,
        elasticity=elasticity,
        plasticity=plasticity,
        elasticity_params=pe,
        plasticity_params=pp,
        gaussians=gaussians,
        binding=table,
        cameras=cams,
        gt_images=jnp.zeros(
            (p["frames"], p["n_views"], 3, p["height"], p["width"]),
            jnp.float32,
        ),
        init_x=jnp.asarray(pts),
        size=np.ones(3),
        center=np.zeros(3),
        background=jnp.ones(3),
        substeps=p["substeps"],
        pixel_loss="l2",
        force_mask_data=p["force_mask"],
        raster_cfg=raster_cfg,
    )


def run_scenario(name, p):
    import jax
    import jax.numpy as jnp

    from neuma_tpu.train.grounding import make_rollout_loss

    scene = build_scene(p)
    pe, pp = scene.elasticity_params, scene.plasticity_params
    frames = p["frames"]
    loss_fn = make_rollout_loss(scene)
    weights = jnp.ones(frames, jnp.float32)
    init_v = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)

    gt = scene.gt_images

    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda a, b, g: loss_fn(a, b, init_v, weights, gt_images=g),
            argnums=(0, 1),
            has_aux=True,
        )
    )

    # Warmup / compile.
    t_c0 = time.perf_counter()
    out = grad_fn(pe, pp, gt)
    loss_val = float(out[0][0])
    print(
        f"[bench:{name}] compile+first step: "
        f"{time.perf_counter()-t_c0:.1f}s loss={loss_val:.4f}",
        file=sys.stderr,
    )

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = grad_fn(pe, pp, gt)
        _ = float(out[0][0])  # force sync (block_until_ready is a no-op
        #                       on the tunneled axon backend)
    elapsed = time.perf_counter() - t0
    ms_per_frame = elapsed / (reps * frames) * 1000.0

    # --- distance to speed-of-light (see module docstring) -------------
    from neuma_tpu.render.rasterize import _build_aligned_pairs, _project
    from neuma_tpu.utils import roofline as rl

    probe = jnp.float32(1.0)
    sync = jax.jit(lambda a: a + 1)
    _ = float(sync(probe))
    t_d0 = time.perf_counter()
    for _ in range(5):
        _ = float(sync(probe))
    dispatch_ms = (time.perf_counter() - t_d0) / 5 * 1000.0
    net_ms = max(ms_per_frame - dispatch_ms / frames, 1e-6)

    cam = scene.cameras[0]
    cov = scene.gaussians.get_covariance()
    d, v, m2d, conic, radius = jax.jit(
        lambda mm: _project(mm, cov, cam)
    )(scene.init_x)
    pairs_out = jax.jit(
        lambda dd, vv, m2, r: _build_aligned_pairs(
            dd, vv, m2, r, cam.width, cam.height, scene.raster_cfg
        )
    )(d, v, m2d, radius)
    n_pairs = int(jnp.sum(pairs_out[1]))

    sol_ms = (
        rl.grounding_step_frame(
            p["n_particles"], p["grid"], cam.width, cam.height, n_pairs,
            scene.raster_cfg.max_pairs,
            substeps=p["substeps"], n_views=p["n_views"],
        )
        * 1000.0
    )
    vs_light = sol_ms / net_ms
    print(
        f"[bench:{name}] dispatch {dispatch_ms:.1f} ms/epoch, net "
        f"{net_ms:.1f} ms/frame, sol {sol_ms:.2f} ms/frame "
        f"({n_pairs} pairs)",
        file=sys.stderr,
    )
    return {
        "value": round(ms_per_frame, 3),
        "vs_baseline": round(vs_light, 4),
    }


def main():
    import jax

    head = run_scenario("headline", SCENARIOS["headline"])
    result = {
        "metric": "grounding_step_time_per_frame",
        "value": head["value"],
        "unit": "ms",
        "vs_baseline": head["vs_baseline"],
        # vs_baseline semantics (machine-readable; BENCH_r01 recorded a
        # 1.0 placeholder before this anchor was defined — see
        # BENCHMARKS.md "Headline" table): analytic speed-of-light
        # milliseconds divided by measured net (ex-tunnel-dispatch)
        # milliseconds per frame; 1.0 == hardware roofline.
        "baseline_semantics": "sol_ms/net_ms (roofline fraction; "
        "reference publishes no timings)",
    }
    want_rw = (
        jax.default_backend() == "tpu"
        or os.environ.get("NEUMA_BENCH_REALWORLD") == "1"
    )
    if want_rw:
        rw = run_scenario("realworld", SCENARIOS["realworld"])
        result["realworld"] = {
            "metric": "realcapture_step_time_per_frame",
            "value": rw["value"],
            "unit": "ms",
            "vs_baseline": rw["vs_baseline"],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
