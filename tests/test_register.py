"""Registration: recover a known Sim(3) from rendered first-frame views."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from neuma_tpu.ops.rotation import euler_to_rotmat
from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import create_from_points
from neuma_tpu.render.rasterize import RasterConfig, rasterize
from neuma_tpu.train.register import (
    RegisterConfig,
    apply_sim3,
    apply_sim3_points,
    init_sim3_params,
    register_gaussians,
)


def test_register_recovers_transform(rng):
    n = 150
    pts = (0.2 * rng.standard_normal((n, 3))).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    pack = create_from_points(pts, colors, sh_degree=1)

    # Ground-truth transform: small rotation + translation + scale.
    true_cfg = RegisterConfig(
        init_r_deg=(8.0, -5.0, 4.0), init_t=(0.06, -0.04, 0.05),
        init_s=1.15,
    )
    true_params = init_sim3_params(true_cfg)
    moved = apply_sim3(true_params, pack)

    cams = [
        Camera.look_at(
            eye=np.array(e), target=np.zeros(3), fov=0.9,
            width=48, height=48,
        )
        for e in ([0, 0.1, -1.5], [-1.5, 0.1, 0.0], [0.9, 1.2, 0.9])
    ]
    rcfg = RasterConfig(max_pairs=8192, max_per_tile=256, segment=16)
    bg = jnp.ones(3)
    gt = jnp.stack(
        [
            rasterize(
                moved.xyz,
                moved.get_covariance(),
                moved.get_opacity,
                c,
                bg,
                shs=moved.get_features,
                sh_degree=1,
                cfg=rcfg,
            )
            for c in cams
        ]
    )

    fit_cfg = RegisterConfig(
        iterations=150, lr_r=0.02, lr_t=0.02, lr_s=0.02,
        learning_rate_alpha=0.05,
    )
    result = register_gaussians(
        pack, cams, gt, fit_cfg, bg, raster_cfg=rcfg, log_every=10
    )
    assert result.losses[-1] < 0.5 * result.losses[0]

    # The fitted transform must map points close to the true transform.
    probe = jnp.asarray(pts[:20])
    origin = jnp.mean(pack.xyz, axis=0, keepdims=True)
    got = np.asarray(
        apply_sim3_points(
            {k: jnp.asarray(v) for k, v in result.params.items()},
            probe, origin,
        )
    )
    want = np.asarray(apply_sim3_points(true_params, probe, origin))
    err = np.linalg.norm(got - want, axis=1).mean()
    base = np.linalg.norm(
        np.asarray(probe) - want, axis=1
    ).mean()
    assert err < 0.5 * base, f"sim3 error {err} vs initial {base}"
