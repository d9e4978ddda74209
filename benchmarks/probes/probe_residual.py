"""Dissect the realworld grounding step's per-frame residual: everything
in the frame body besides the sim substeps — binding, cov deformation,
the vmapped 3-view render exactly as the loss composes it, and the
pixel loss. Timed fwd+bwd wrt the sim-state inputs (what the rollout
backward actually pays)."""
import dataclasses
import sys as _sys
import time
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

import bench
from neuma_tpu.render.binding import (
    apply_binding_F,
    apply_binding_xyz,
    deform_cov_by_F,
)
from neuma_tpu.render.rasterize import rasterize_with_aux
from neuma_tpu.sim.rollout import denormalize_points

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
table = scene.binding
cov0 = scene.gaussians.get_covariance(scene.scaling_modifier)
opacity = scene.gaussians.get_opacity
k_xyz0 = scene.gaussians.xyz
n = scene.init_x.shape[0]

state_x = scene.init_x
state_F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3)) \
    + 1e-3 * jax.random.normal(jax.random.PRNGKey(0), (n, 3, 3))
gt_frame = scene.gt_images[0]

cams = list(scene.cameras)
cam_wv = jnp.stack([c.world_view for c in cams])
cam_fp = jnp.stack([c.full_proj for c in cams])
cam_cc = jnp.stack([c.camera_center for c in cams])


def render_views(means3d, cov_def):
    def one(wv, fp, cc):
        cam = dataclasses.replace(
            cams[0], world_view=wv, full_proj=fp, camera_center=cc
        )
        img, aux = rasterize_with_aux(
            means3d, cov_def, opacity, cam, scene.background,
            colors_precomp=jnp.ones((means3d.shape[0], 3), jnp.float32),
            cfg=scene.raster_cfg,
        )
        return img, aux["overflow"]

    imgs, ovf = jax.vmap(one)(cam_wv, cam_fp, cam_cc)
    return imgs, jnp.any(ovf)


def timed(label, make_fn, reps=3):
    f = jax.jit(make_fn())
    _ = float(jnp.sum(jax.tree_util.tree_leaves(f())[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(jnp.sum(jax.tree_util.tree_leaves(f())[0]))
    per = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{label:40s}: {per:9.1f} ms")
    return per


def frame_tail(x, F):
    de_x = denormalize_points(x, scene.size, scene.center)
    de_x_prev = denormalize_points(scene.init_x, scene.size, scene.center)
    means3d = apply_binding_xyz(table, de_x, de_x_prev, k_xyz0)
    F_k = apply_binding_F(table, F)
    cov_def = deform_cov_by_F(cov0, F_k)
    imgs, _ = render_views(means3d, cov_def)
    return jnp.mean((imgs - gt_frame) ** 2) * 3.0


def tail_fwd():
    def run():
        return frame_tail(state_x, state_F)

    return run


def tail_fwdbwd():
    def run():
        return jax.value_and_grad(frame_tail, argnums=(0, 1))(
            state_x, state_F
        )

    return run


# binding-only (no render)
def bind_only(x, F):
    de_x = denormalize_points(x, scene.size, scene.center)
    de_x_prev = denormalize_points(scene.init_x, scene.size, scene.center)
    means3d = apply_binding_xyz(table, de_x, de_x_prev, k_xyz0)
    F_k = apply_binding_F(table, F)
    cov_def = deform_cov_by_F(cov0, F_k)
    return jnp.sum(means3d ** 2) + jnp.sum(cov_def ** 2)


def bind_fwdbwd():
    def run():
        return jax.value_and_grad(bind_only, argnums=(0, 1))(
            state_x, state_F
        )

    return run


# render via vmap, fixed means/cov (compare to probe_realworld's loop)
def render_vmap_fwdbwd():
    cov_c = cov0

    def run():
        def loss(m):
            imgs, _ = render_views(m, cov_c)
            return jnp.sum(imgs ** 2)

        return jax.value_and_grad(loss)(k_xyz0)

    return run


# pixel loss alone
imgs0 = jnp.zeros_like(gt_frame) + 0.5


def loss_fwdbwd():
    def run():
        def loss(im):
            return jnp.mean((im - gt_frame) ** 2) * 3.0

        return jax.value_and_grad(loss)(imgs0)

    return run


t_tail_f = timed("frame tail fwd (bind+render+loss)", tail_fwd)
t_tail_fb = timed("frame tail fwd+bwd", tail_fwdbwd)
t_bind = timed("binding only fwd+bwd", bind_fwdbwd)
t_rvm = timed("render vmap fwd+bwd (fixed cov)", render_vmap_fwdbwd)
t_loss = timed("pixel loss fwd+bwd", loss_fwdbwd)
print("-" * 58)
print(
    f"tail {t_tail_fb:.0f} = bind {t_bind:.0f} + render {t_rvm:.0f} + "
    f"loss {t_loss:.0f} + glue {t_tail_fb - t_bind - t_rvm - t_loss:.0f}"
)
