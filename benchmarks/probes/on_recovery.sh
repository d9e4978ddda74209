#!/bin/bash
# Run when the TPU tunnel recovers: verify, headline (+realworld),
# kernel probes, round-3 A/B toggles, scaling, material recovery.
set -x
cd /root/repo

# 1. end-to-end sanity on the real backend
python examples/smoke_e2e.py --workdir /tmp/smoke_rec --size 48 --frames 3 --epochs 2 2>&1 | tail -1

# 2. headline + realworld scenarios (the driver metric)
python bench.py 2>&1 | grep -v WARNING | tail -3

# 3. 70^3 step probe (the dual-gather A/B ran 2026-08-18: fused LOST
#    14.6 vs 13.9 ms full step at every chunk size and was deleted)
python benchmarks/probes/probe_step70.py 2>&1 | grep -v WARNING | tail -8

# 4. round-3 A/B: counting vs sort pair binning (same bench, one flag)
python - <<'EOF' 2>&1 | tail -4
import time, jax, jax.numpy as jnp, numpy as np, dataclasses, sys
sys.path.insert(0, '.')
import bench
from neuma_tpu.render.rasterize import _build_aligned_pairs, _project, RasterConfig
p = bench.SCENARIOS['headline']
scene = bench.build_scene(p)
cam = scene.cameras[0]
cov = scene.gaussians.get_covariance()
d, v, m2d, conic, radius = jax.jit(lambda m: _project(m, cov, cam))(scene.init_x)
for mode in ('counting', 'sort'):
    for budget in (1 << 16, 1 << 18):
        cfg = RasterConfig(max_pairs=budget, max_per_tile=512, pair_binning=mode)
        f = jax.jit(lambda *a: _build_aligned_pairs(*a, cam.width, cam.height, cfg)[0])
        _ = f(d, v, m2d, radius).block_until_ready()
        # slope timing: K1/K2 scan reps cancel dispatch
        def timed(reps):
            g = jax.jit(lambda x: jax.lax.scan(lambda c, _: (c + f(d + c*1e-12, v, m2d, radius).sum(), None), x, None, length=reps)[0])
            _ = float(g(jnp.float32(0)))
            t0 = time.perf_counter(); _ = float(g(jnp.float32(0))); return time.perf_counter() - t0
        t = (timed(12) - timed(4)) / 8
        print(f'pair build {mode} @{budget>>10}k budget: {t*1000:.2f} ms')
EOF

# 5. amortized sort: scaling rows (expect 10k@32^3 back >= 6.8 M)
python benchmarks/bench_scaling.py 2>&1 | tail -8

# 6. material recovery at realistic scale (the capstone numbers)
python benchmarks/material_recovery.py --particles 10000 --grid 32 --frames 100 --substeps 1 --img 800 --epochs 60 2>&1 | tail -2
