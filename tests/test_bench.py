"""Driver-bench code paths (bench.py) at miniature scale: both
scenarios' scene assembly + one loss/grad step compile and produce
finite numbers — including the realworld scenario's mask-view
(silhouette) rendering and multi-view stacking, which otherwise only
run on TPU.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _mini(params, **kw):
    p = dict(params)
    p.update(kw)
    return p


def test_both_bench_scenarios_step(monkeypatch):
    import bench

    minis = {
        "headline": _mini(
            bench.SCENARIOS["headline"],
            n_particles=200, grid=16, frames=2, width=64, height=64,
            max_pairs=4096, max_per_tile=256,
        ),
        # Keep the realworld scenario's distinguishing features (mask
        # views, multi-view, substeps, non-square image) at toy size.
        "realworld": _mini(
            bench.SCENARIOS["realworld"],
            n_particles=200, grid=16, frames=2, substeps=3,
            width=96, height=64, max_pairs=4096, max_per_tile=256,
        ),
    }
    from neuma_tpu.train.grounding import make_rollout_loss

    for name, p in minis.items():
        scene = bench.build_scene(p)
        assert scene.force_mask_data == p["force_mask"]
        assert len(scene.cameras) == p["n_views"]
        loss_fn = make_rollout_loss(scene)
        w = jnp.ones(p["frames"], jnp.float32)
        iv = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
        (loss, aux), grads = jax.jit(
            jax.value_and_grad(
                lambda a, b: loss_fn(a, b, iv, w),
                argnums=(0, 1),
                has_aux=True,
            )
        )(scene.elasticity_params, scene.plasticity_params)
        assert np.isfinite(float(loss)), name
        assert not bool(aux["overflow"]), name
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf))), name
