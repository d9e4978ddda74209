"""End-to-end grounding slice (SURVEY.md section 7.2): synthetic blob,
render GT with a known initial velocity, recover it by gradient descent
through [materials -> MPM rollout -> binding -> rasterizer]; then run the
LoRA constitutive stage for a few epochs."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.core.types import MPMConstants, Statics
from neuma_tpu.materials import (
    CorotatedElasticity,
    IdentityPlasticity,
    MetaMaterialConfig,
    InvariantFullMetaElasticity,
    InvariantFullMetaPlasticity,
)
from neuma_tpu.render.binding import compute_binding_table
from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import create_from_points
from neuma_tpu.render.rasterize import RasterConfig
from neuma_tpu.train.grounding import (
    GroundingScene,
    finetune_constitutive,
    make_rollout_loss,
    optimize_init_velocity,
)
from neuma_tpu.train.schedulers import cosine_decay_schedule


def build_scene(rng, n=200, g=16, frames=4, substeps=2, material="analytic"):
    pts = (0.45 + 0.15 * rng.random((n, 3))).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)

    constants = MPMConstants(
        num_grids=g,
        bound=2,
        bc="freeslip",
        dt=jnp.float32(5e-4),
        gravity=jnp.asarray([0.0, -9.8, 0.0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), 2e-6, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )

    if material == "analytic":
        elasticity = CorotatedElasticity({"E": 1e4, "nu": 0.3})
        plasticity = IdentityPlasticity()
        pe = elasticity.init()
        pp = plasticity.init()
    else:
        cfg = MetaMaterialConfig(layer_widths=(16, 16))
        elasticity = InvariantFullMetaElasticity(cfg)
        plasticity = InvariantFullMetaPlasticity(cfg)
        # Scale down the random init so the untrained net is stable.
        pe = jax.tree_util.tree_map(
            lambda x: 0.05 * x, elasticity.init(jax.random.PRNGKey(0))
        )
        pp = jax.tree_util.tree_map(
            lambda x: 0.05 * x, plasticity.init(jax.random.PRNGKey(1))
        )

    gaussians = create_from_points(pts, colors, sh_degree=0)
    table = compute_binding_table(
        gaussians, jnp.asarray(pts), max_particles=8
    )
    cams = [
        Camera.look_at(
            eye=np.array([0.5, 0.55, -1.2]),
            target=np.array([0.5, 0.5, 0.5]),
            fov=0.9,
            width=64,
            height=64,
        ),
        # Side view makes depth (z) motion observable.
        Camera.look_at(
            eye=np.array([-1.2, 0.55, 0.5]),
            target=np.array([0.5, 0.5, 0.5]),
            fov=0.9,
            width=64,
            height=64,
        ),
    ]
    raster_cfg = RasterConfig(max_pairs=16384, max_per_tile=512, segment=16)

    scene = GroundingScene(
        constants=constants,
        statics=statics,
        elasticity=elasticity,
        plasticity=plasticity,
        elasticity_params=pe,
        plasticity_params=pp,
        gaussians=gaussians,
        binding=table,
        cameras=cams,
        gt_images=jnp.zeros((frames, 2, 3, 64, 64)),  # placeholder
        init_x=jnp.asarray(pts),
        size=np.ones(3),
        center=np.zeros(3),
        background=jnp.ones(3),
        substeps=substeps,
        pixel_loss="l2",
        raster_cfg=raster_cfg,
    )
    return scene


def render_gt(scene, init_v):
    """Generate ground-truth frames by running the forward model."""
    loss_fn = make_rollout_loss(scene)
    # Reuse the rollout by capturing rendered frames via a modified scene:
    # simplest: run the loss with gt=rendered frames is circular, so
    # instead roll manually using the same building blocks.
    from neuma_tpu.core.types import ParticleState
    from neuma_tpu.render.binding import (
        apply_binding_F,
        apply_binding_xyz,
        deform_cov_by_F,
    )
    from neuma_tpu.render.rasterize import rasterize
    from neuma_tpu.sim.mpm import mpm_step

    n = scene.init_x.shape[0]
    v0 = jnp.broadcast_to(jnp.reshape(init_v, (-1, 3)), (n, 3))
    state = ParticleState.initial(scene.init_x, v0)
    cov0 = scene.gaussians.get_covariance()
    frames = []
    de_x_prev = scene.init_x
    g_prev = scene.gaussians.xyz
    for _ in range(scene.num_frames):
        for _ in range(scene.substeps):
            stress = scene.elasticity.apply(
                scene.elasticity_params, state.F
            )
            state = mpm_step(scene.constants, scene.statics, state, stress)
            F = scene.plasticity.apply(scene.plasticity_params, state.F)
            state = dataclasses.replace(state, F=F)
        means3d = apply_binding_xyz(
            scene.binding, state.x, de_x_prev, g_prev
        )
        F_k = apply_binding_F(scene.binding, state.F)
        cov_def = deform_cov_by_F(cov0, F_k)
        imgs = [
            rasterize(
                means3d,
                cov_def,
                scene.gaussians.get_opacity,
                cam,
                scene.background,
                shs=scene.gaussians.get_features,
                sh_degree=scene.gaussians.sh_degree,
                cfg=scene.raster_cfg,
            )
            for cam in scene.cameras
        ]
        frames.append(jnp.stack(imgs))
        de_x_prev = state.x
        g_prev = means3d
    return jnp.stack(frames)  # (frames, n_views, 3, H, W)


def test_velocity_recovery(rng):
    scene = build_scene(rng)
    true_v = np.array([0.4, 0.1, 0.0], np.float32)
    gt = render_gt(scene, jnp.asarray(true_v))
    scene = dataclasses.replace(scene, gt_images=gt)

    schedule = cosine_decay_schedule(0.5, max_steps=30,
                                     learning_rate_alpha=0.01)
    result = optimize_init_velocity(
        scene,
        num_epochs=30,
        lr=0.5,
        schedule=schedule,
        lambda_reg=None,
    )
    assert result.losses[-1] < 0.3 * result.losses[0], (
        f"loss did not decrease: {result.losses[0]} -> {result.losses[-1]}"
    )
    # Velocity should move toward the truth.
    err0 = np.linalg.norm(true_v)
    err = np.linalg.norm(result.init_v - true_v)
    assert err < 0.6 * err0, f"init_v {result.init_v} vs true {true_v}"


def test_lora_stage_runs_and_decreases(rng):
    scene = build_scene(rng, material="meta", frames=3, substeps=2)
    true_v = np.array([0.2, 0.0, 0.0], np.float32)
    # GT from a perturbed material: nudge base params so LoRA has
    # something to learn.
    perturbed = jax.tree_util.tree_map(
        lambda x: x * 1.3 + 0.01, scene.elasticity_params
    )
    gt_scene = dataclasses.replace(scene, elasticity_params=perturbed)
    gt = render_gt(gt_scene, jnp.asarray(true_v))
    scene = dataclasses.replace(scene, gt_images=gt)

    pe = scene.elasticity.init_lora(
        scene.elasticity_params, jax.random.PRNGKey(3), r=4, alpha=4
    )
    pp = scene.plasticity.init_lora(
        scene.plasticity_params, jax.random.PRNGKey(4), r=4, alpha=4
    )
    cfg = {
        "num_epochs": 8,
        "elasticity_lr": 0.01,
        "plasticity_lr": 0.001,
        "elasticity_wd": 0.0,
        "plasticity_wd": 0.0,
        "elasticity_grad_max_norm": 1.0,
        "plasticity_grad_max_norm": 1.0,
        "elasticity_scheduler": {"type": "cos", "max_steps": 8,
                                 "learning_rate_alpha": 0.025},
        "plasticity_scheduler": {"type": "cos", "max_steps": 8,
                                 "learning_rate_alpha": 0.025},
        "decay_init": 0.5,
        "decay_final": 1.0,
        "decay_steps": 80,
        "lambda_max_decay": 0.33,
    }
    ckpts = []
    result = finetune_constitutive(
        scene,
        true_v,
        cfg,
        pe,
        pp,
        checkpoint_fn=lambda e, a, b, l: ckpts.append(e),
    )
    assert all(np.isfinite(result.losses))
    assert result.losses[-1] <= result.losses[0] * 1.05
    # Base (non-LoRA) weights must be untouched by the masked optimizer.
    np.testing.assert_array_equal(
        np.asarray(result.params_e["final"]["kernel"]),
        np.asarray(pe["final"]["kernel"]),
    )
    assert 1 in ckpts


def test_full_pipeline_gradient_finite_difference(rng):
    """End-to-end gradient check: d(loss)/d(init_v) through materials ->
    MPM rollout -> binding -> rasterizer matches central differences
    (the strongest available proxy for BASELINE's 'grad allclose')."""
    scene = build_scene(rng, n=120, g=12, frames=2, substeps=2,
                        material="meta")
    gt = render_gt(scene, jnp.asarray([0.25, 0.05, 0.0], jnp.float32))
    scene = dataclasses.replace(scene, gt_images=gt)
    loss_fn = make_rollout_loss(scene)
    weights = jnp.ones(scene.num_frames, jnp.float32)
    pe, pp = scene.elasticity_params, scene.plasticity_params

    @jax.jit
    def f(iv):
        return loss_fn(pe, pp, iv, weights)[0]

    iv0 = jnp.asarray([0.1, -0.05, 0.02], jnp.float32)
    g = np.asarray(jax.grad(f)(iv0))
    assert np.all(np.isfinite(g))
    eps = 2e-3
    for k in range(3):
        up = np.array(iv0)
        up[k] += eps
        dn = np.array(iv0)
        dn[k] -= eps
        fd = (float(f(jnp.asarray(up))) - float(f(jnp.asarray(dn)))) / (
            2 * eps
        )
        np.testing.assert_allclose(
            g[k], fd, rtol=0.08, atol=2e-4,
            err_msg=f"init_v[{k}] gradient mismatch",
        )

    # And a LoRA leaf: gradient of the loss wrt one lora_b entry.
    pe_l = scene.elasticity.init_lora(
        pe, jax.random.PRNGKey(5), r=2, alpha=2
    )
    pp_l = scene.plasticity.init_lora(
        pp, jax.random.PRNGKey(6), r=2, alpha=2
    )

    @jax.jit
    def f2(val):
        p = jax.tree_util.tree_map(lambda x: x, pe_l)
        b = p["final"]["lora_b"].at[0, 0].set(val)
        p = {**p, "final": {**p["final"], "lora_b": b}}
        return loss_fn(p, pp_l, iv0, weights)[0]

    g_l = float(jax.grad(f2)(jnp.float32(0.01)))
    fd_l = (float(f2(jnp.float32(0.01 + eps)))
            - float(f2(jnp.float32(0.01 - eps)))) / (2 * eps)
    if abs(fd_l) > 1e-6:
        np.testing.assert_allclose(g_l, fd_l, rtol=0.1, atol=1e-5)


def test_remat_policy_modes_agree(rng):
    """remat='none' (store-everything, no replay) produces the same loss
    and parameter gradients as remat='frame' (per-frame checkpoint), and
    the 'auto' policy resolves as documented."""
    import dataclasses as _dc

    from neuma_tpu.train.grounding import _remat_policy

    scene = build_scene(rng, n=150, g=16, frames=3, substeps=2,
                        material="meta")
    gt = jnp.asarray(
        0.5 + 0.1 * rng.random((3, 2, 3, 64, 64)).astype(np.float32)
    )
    scene = _dc.replace(scene, gt_images=gt)
    weights = jnp.ones(3, jnp.float32)
    init_v = jnp.asarray([0.2, 0.0, 0.0], jnp.float32)

    outs = {}
    for mode in ("frame", "none"):
        s = _dc.replace(scene, remat=mode)
        loss_fn = make_rollout_loss(s)
        (loss, _), grads = jax.jit(
            jax.value_and_grad(
                lambda a, b: loss_fn(
                    a, b, init_v, weights, gt_images=gt
                ),
                argnums=(0, 1),
                has_aux=True,
            )
        )(s.elasticity_params, s.plasticity_params)
        outs[mode] = (float(loss), grads)

    assert np.isclose(outs["frame"][0], outs["none"][0], rtol=1e-6)
    fa = jax.tree_util.tree_leaves(outs["frame"][1])
    nb = jax.tree_util.tree_leaves(outs["none"][1])
    for a, b in zip(fa, nb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )

    # auto: tiny scene resolves to 'none'; a huge rollout to 'frame'.
    assert _remat_policy(_dc.replace(scene, remat="auto")) == "none"
    big = _dc.replace(
        scene,
        remat="auto",
        gt_images=jnp.zeros((200, 2, 3, 64, 64)),
        substeps=1000,
    )
    assert _remat_policy(big) == "frame"
