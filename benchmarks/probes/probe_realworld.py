"""Phase attribution for the realworld bench scenario (30k/70^3,
substeps 20, 3x1080p mask views, 1<<18 pairs): where do the
~1000 ms/frame go?  Times, via in-graph scan repetition:

  * full grad step (what bench.py measures) / frames
  * forward-only loss / frames
  * sim-only: 20-substep frame fwd and fwd+bwd (no checkpoint)
  * sim-only with per-frame jax.checkpoint (the trainer's policy)
  * render-only: 3-view 1080p fwd and fwd+bwd at the 1<<18 budget
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from neuma_tpu.train.grounding import make_rollout_loss

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
pe, pp = scene.elasticity_params, scene.plasticity_params
frames = p["frames"]
weights = jnp.ones(frames, jnp.float32)
init_v = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
gt = scene.gt_images
loss_fn = make_rollout_loss(scene)


def timed(label, make_fn, reps=3):
    f = jax.jit(make_fn())
    _ = jax.tree_util.tree_leaves(f())[0]
    _ = float(jnp.sum(jax.tree_util.tree_leaves(f())[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(jnp.sum(jax.tree_util.tree_leaves(f())[0]))
    per = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{label:36s}: {per:9.1f} ms")
    return per


# 1. the bench measurement
import os
SKIP_E2E = os.environ.get("SKIP_E2E") == "1"
def full_grad():
    g = jax.value_and_grad(
        lambda a, b: loss_fn(a, b, init_v, weights, gt_images=gt)[0],
        argnums=(0, 1),
    )

    def run():
        # return the grads too -- returning only the loss lets XLA
        # DCE the entire backward out of the timed graph
        return g(pe, pp)

    return run


t_grad = 0.0 if SKIP_E2E else timed("full grad step (2 frames)", full_grad)


def fwd_only():
    def run():
        return loss_fn(pe, pp, init_v, weights, gt_images=gt)[0]

    return run


t_fwd = 0.0 if SKIP_E2E else timed("forward-only loss (2 frames)", fwd_only)

# --- sim-only ---------------------------------------------------------------
from neuma_tpu.core.types import ParticleState  # noqa: E402
from neuma_tpu.sim import mpm  # noqa: E402
from neuma_tpu.sim.p2g_kernel import (  # noqa: E402
    build_step_layouts,
    refresh_step_layouts,
)

constants, statics = scene.constants, scene.statics
x0 = scene.init_x
state0 = ParticleState.initial(x0, jnp.zeros_like(x0))


def sim_frame(state, layouts, params_e, params_p):
    def sub(carry, _):
        s, lay = carry
        lay, _ = refresh_step_layouts(constants, s.x, lay)
        stress = scene.elasticity.apply(params_e, s.F)
        s2 = mpm.mpm_step_diff(constants, statics, s, stress, lay)
        F = scene.plasticity.apply(params_p, s2.F)
        s2 = dataclasses.replace(s2, F=F)
        return (s2, lay), None

    (state, layouts), _ = jax.lax.scan(
        sub, (state, layouts), None, length=scene.substeps
    )
    return state, layouts


def sim_fwd():
    def run():
        lay = build_step_layouts(constants, x0)
        st, _ = sim_frame(state0, lay, pe, pp)
        return st.x

    return run


t_sim_f = 0.0 if SKIP_E2E else timed("sim frame fwd (20 substeps)", sim_fwd)


def sim_fwdbwd(ckpt):
    def run():
        def loss(params_e):
            lay = build_step_layouts(constants, x0)
            body = sim_frame
            if ckpt:
                body = jax.checkpoint(sim_frame, static_argnums=())
            st, _ = body(state0, lay, params_e, pp)
            return jnp.sum(st.x**2) + jnp.sum(st.v**2)

        return jax.value_and_grad(loss)(pe)

    return run


t_sim_fb = timed("sim frame fwd+bwd (no ckpt)", lambda: sim_fwdbwd(False))
t_sim_fb_c = timed("sim frame fwd+bwd (ckpt)", lambda: sim_fwdbwd(True))

# --- render-only ------------------------------------------------------------
from neuma_tpu.render.rasterize import rasterize_with_aux  # noqa: E402

cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)
opacity = scene.gaussians.get_opacity
k_xyz = scene.gaussians.xyz
cams = list(scene.cameras)


def render_views(means3d):
    outs = []
    for cam in cams:
        img, ovf = rasterize_with_aux(
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


def render_fwd():
    def run():
        return render_views(k_xyz)

    return run


t_ren_f = timed("render 3x1080p fwd", render_fwd)


def render_fwdbwd():
    def run():
        def loss(m):
            return jnp.sum(render_views(m) ** 2)

        return jax.value_and_grad(loss)(k_xyz)

    return run


t_ren_fb = timed("render 3x1080p fwd+bwd", render_fwdbwd)

print("-" * 58)
print(
    f"accounting per frame: grad {t_grad/frames:.0f} | "
    f"sim fwd+bwd(ckpt) {t_sim_fb_c:.0f} | render fwd+bwd {t_ren_fb:.0f} | "
    f"residual {t_grad/frames - t_sim_fb_c - t_ren_fb:.0f}"
)
