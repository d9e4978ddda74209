"""Round-5 material-layer dissection at the realworld shape (30k
particles): where do the ~7-8 ms/substep of material cost in the packed
substep go?  Each op is repeated REPS times inside one jitted lax.scan
(with a data dependency so XLA cannot DCE or hoist it) and the cost is
the slope vs an empty scan — dispatch cancels.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from neuma_tpu.ops.svd3 import svd3c
from neuma_tpu.sim.p2g_kernel import (
    build_step_layouts,
    refresh_step_layouts,
)

p = bench.SCENARIOS["realworld"]
scene = bench.build_scene(p)
pe, pp = scene.elasticity_params, scene.plasticity_params
constants = scene.constants
N = p["n_particles"]
REPS = 20

key = jax.random.PRNGKey(0)
F0 = jnp.eye(3)[None] + 0.05 * jax.random.normal(key, (N, 3, 3))
F0 = F0.astype(jnp.float32)
x13 = jax.random.normal(key, (N, 13), jnp.float32)
x0 = scene.init_x


def slope(label, step_fn, carry0, reps=REPS, outer=3):
    """step_fn: carry -> carry. Times scan of `reps` steps minus scan of
    1 step, divided by reps-1."""

    def make(n):
        def run(c):
            def body(c, _):
                return step_fn(c), None

            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        return jax.jit(run)

    fs = [make(1), make(reps)]
    ts = []
    for f in fs:
        out = f(carry0)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(outer):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / (reps - 1) * 1000.0
    print(f"{label:36s}: {per:8.3f} ms", flush=True)
    return per


# --- svd3c fwd: carry the 9 components ---------------------------------


def svd_step2(F):
    f9 = tuple(F.reshape(N, 9)[:, k] for k in range(9))
    u9, s3, vh9 = svd3c(f9)
    mix = sum(u9) + sum(s3) + sum(vh9)
    return F + 1e-20 * mix[:, None, None]


slope("svd3c fwd", svd_step2, F0)


def svd_grad_step(F):
    def loss(Fm):
        f9 = tuple(Fm.reshape(N, 9)[:, k] for k in range(9))
        u9, s3, vh9 = svd3c(f9)
        return jnp.sum(sum(u9) + sum(s3) + sum(vh9))

    g = jax.grad(loss)(F)
    return F + 1e-20 * g


slope("svd3c fwd+bwd", svd_grad_step, F0)


def el_step(F):
    s = scene.elasticity.apply(pe, F)
    return F + 1e-20 * s


slope("elasticity fwd", el_step, F0)


def el_grad_step(F):
    g = jax.grad(
        lambda Fm: jnp.sum(scene.elasticity.apply(pe, Fm) ** 2)
    )(F)
    return F + 1e-20 * g


slope("elasticity fwd+bwd", el_grad_step, F0)


def pl_step(F):
    s = scene.plasticity.apply(pp, F)
    return F + 1e-20 * (s - F)


slope("plasticity fwd", pl_step, F0)


def pl_grad_step(F):
    g = jax.grad(
        lambda Fm: jnp.sum(scene.plasticity.apply(pp, Fm) ** 2)
    )(F)
    return F + 1e-20 * g


slope("plasticity fwd+bwd", pl_grad_step, F0)

from neuma_tpu.nn.mlp import apply_mlp  # noqa: E402

mlp_cfg = scene.elasticity.mlp_cfg


def mlp_step(x):
    y = apply_mlp(pe, mlp_cfg, x)
    return x + 1e-20 * jnp.pad(y, ((0, 0), (0, 13 - 9)))


slope("mlp fwd", mlp_step, x13)


def mlp_grad_step(x):
    g = jax.grad(lambda xx: jnp.sum(apply_mlp(pe, mlp_cfg, xx) ** 2))(x)
    return x + 1e-20 * g


slope("mlp fwd+bwd", mlp_grad_step, x13)


lay0 = jax.jit(lambda x: build_step_layouts(constants, x))(x0)
jax.block_until_ready(lay0)


def build_step(x):
    lay = build_step_layouts(constants, x)
    return x + 1e-20 * lay.sort.fx


slope("build_step_layouts", build_step, x0)


def refresh_step(carry):
    x, lay = carry
    lay2, _ = refresh_step_layouts(constants, x, lay)
    return (x + 1e-20 * lay2.sort.fx, lay2)


slope("refresh_step_layouts", refresh_step, (x0, lay0))
