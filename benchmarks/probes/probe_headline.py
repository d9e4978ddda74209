"""Headline-shape (10k/32^3/800^2/4 frames) per-piece attribution."""
import dataclasses, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import bench
from neuma_tpu.train.grounding import make_rollout_loss, _remat_policy
from neuma_tpu.core.types import ParticleState
from neuma_tpu.sim import mpm
from neuma_tpu.sim.p2g_kernel import build_step_layouts
from neuma_tpu.render.rasterize import rasterize_with_aux
from neuma_tpu.render.binding import apply_binding_xyz, apply_binding_F, deform_cov_by_F
from neuma_tpu.sim.rollout import denormalize_points

p = bench.SCENARIOS['headline']
scene = bench.build_scene(p)
print('remat policy:', _remat_policy(scene))
pe, pp = scene.elasticity_params, scene.plasticity_params
frames = p['frames']
weights = jnp.ones(frames, jnp.float32)
init_v = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
gt = scene.gt_images
loss_fn = make_rollout_loss(scene)

def slope(make, k1=4, k2=16, reps=3):
    r1, r2 = make(k1), make(k2)
    def best(r):
        r()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); r(); ts.append(time.perf_counter()-t0)
        return min(ts)
    return (best(r2)-best(r1))/(k2-k1)

def timed(label, body):
    def make(K):
        @jax.jit
        def run(c0):
            def sbody(c, _):
                out = body(c)
                leaves = jax.tree_util.tree_leaves(out)
                pr = sum(jnp.sum(l)*1e-12 for l in leaves if l.dtype != jnp.bool_)
                return c + pr.astype(jnp.float32), None
            c, _ = jax.lax.scan(sbody, c0, None, length=K)
            return c
        def go():
            _ = float(run(jnp.float32(0.0)))
        return go
    t = slope(make)
    print(f"{label:34s} {t*1e3:8.3f} ms")
    return t

constants, statics = scene.constants, scene.statics
x0 = scene.init_x
state0 = ParticleState.initial(x0, jnp.zeros_like(x0))
lay0 = jax.jit(lambda xx: build_step_layouts(constants, xx))(x0)
cov0 = scene.gaussians.get_covariance()
opac = scene.gaussians.get_opacity
shs = scene.gaussians.get_features
kx = scene.gaussians.xyz
cam = scene.cameras[0]
table = scene.binding

def grad_frame(c):
    g = jax.value_and_grad(
        lambda a, b: loss_fn(a, b, init_v, weights, gt_images=gt)[0],
        argnums=(0, 1))
    return g(pe, pp)

def step_fb(c):
    def loss(st):
        s2 = mpm.mpm_step_diff(constants, statics,
            ParticleState(x=st.x + c*1e-12, v=st.v, C=st.C, F=st.F),
            scene.elasticity.apply(pe, st.F), lay0)
        return jnp.sum(s2.x**2) + jnp.sum(s2.v**2)
    return jax.grad(loss)(state0)

def render_fb(c):
    def loss(m):
        img, _ = rasterize_with_aux(m, cov0, opac, cam, scene.background,
            shs=shs, sh_degree=scene.gaussians.sh_degree, cfg=scene.raster_cfg)
        return jnp.sum(img**2)
    return jax.grad(loss)(kx + c*1e-12)

def tail_fb(c):
    def loss(x, F):
        de_x = denormalize_points(x, scene.size, scene.center)
        m = apply_binding_xyz(table, de_x, de_x, kx)
        cd = deform_cov_by_F(cov0, apply_binding_F(table, F))
        img, _ = rasterize_with_aux(m, cd, opac, cam, scene.background,
            shs=shs, sh_degree=scene.gaussians.sh_degree, cfg=scene.raster_cfg)
        return jnp.mean((img - gt[0,0])**2)
    F0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (x0.shape[0],3,3))
    return jax.grad(loss, argnums=(0,1))(x0 + c*1e-12, F0)

t_g = timed('full grad / frame (x%d)' % frames, grad_frame) / frames * 1000
timed('sim step fwd+bwd (incl MLP)', step_fb)
timed('render 800^2 fwd+bwd (SH)', render_fb)
timed('frame tail fwd+bwd (bind+rend+loss)', tail_fb)
