#!/bin/bash
# Round-4 recovery runbook: when the TPU tunnel returns, measure the
# round-4 candidates in order of expected value. Each step is
# independently skippable; results drive which flags become defaults.
set -x
cd /root/repo

# 0. sanity
python - <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: a + 1)(jnp.float32(1))))
EOF

# 1. realworld residual dissection (new round-4 probe): where do the
#    ~150 ms/frame of non-sim non-render go?
python benchmarks/probes/probe_residual.py 2>&1 | grep -v WARNING | tail -8

# 2. glue-vs-kernel split of the blocked scatter/gather at 30k/70^3
python benchmarks/probes/probe_gather_parts.py 2>&1 | grep -v WARNING | tail -10

# 3. chunk-size A/B (padding waste vs per-chunk fixed cost):
#    30k particles / 125 blocks pad 3.1x at CHUNK=512
for SC in 512 256 128; do
  for GC in 256 128; do
    NEUMA_SCATTER_CHUNK=$SC NEUMA_GATHER_CHUNK=$GC \
      python benchmarks/probes/probe_step70.py 2>&1 | grep -v WARNING \
      | sed "s/^/[S=$SC G=$GC] /" | tail -7
  done
done

# 4. pair_grad segsum vs scatter A/B at the realworld shape (3x1080p,
#    1<<18): the render backward's scatter-add transpose vs the
#    segmented reduction. Uses probe_residual's tail timing under the
#    flag once the default question is settled; quick version:
python - <<'EOF' 2>&1 | grep -v WARNING | tail -6
import dataclasses, time, sys
sys.path.insert(0, '.')
import jax, jax.numpy as jnp
import bench
from neuma_tpu.render.rasterize import RasterConfig, rasterize

p = bench.SCENARIOS['realworld']
scene = bench.build_scene(p)
cov0 = scene.gaussians.get_covariance()
opac = scene.gaussians.get_opacity
x = scene.gaussians.xyz
cam = scene.cameras[0]
cp = jnp.ones((x.shape[0], 3), jnp.float32)
for pg in ('scatter', 'segsum'):
    for binning in ('sort', 'counting'):
        cfg = dataclasses.replace(scene.raster_cfg, pair_grad=pg,
                                  pair_binning=binning)
        def loss(m):
            return jnp.sum(rasterize(m, cov0, opac, cam, scene.background,
                                     colors_precomp=cp, cfg=cfg) ** 2)
        g = jax.jit(jax.value_and_grad(loss))
        _ = float(g(x)[0])
        t0 = time.perf_counter()
        for _ in range(4):
            _ = float(g(x)[0])
        print(f'render fwd+bwd 1080p pair_grad={pg} binning={binning}: '
              f'{(time.perf_counter()-t0)/4*1000:.1f} ms')
EOF

# 5. the driver metric with the winning flags
python bench.py 2>&1 | grep -v WARNING | tail -3

# 6. material recovery at realistic scale (capstone, ~30-60 min)
python benchmarks/material_recovery.py --particles 10000 --grid 32 \
  --frames 100 --substeps 1 --img 800 --epochs 60 2>&1 | tail -2
