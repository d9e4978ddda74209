"""Component-level TPU profiling with in-graph repetition.

The axon-tunneled TPU has ~27ms per-dispatch latency and a
non-blocking block_until_ready, so every op is timed by running it K
times inside ONE jitted lax.scan and fetching a scalar:
t_op = (t_total - t_roundtrip) / K.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit_scan(fn, args, reps=20, label=""):
    """Time fn(*args) via in-graph repetition. fn must return a pytree;
    a scalar probe is derived and fetched to force sync."""

    @jax.jit
    def repeated(args):
        def body(carry, _):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            probe = sum(jnp.sum(l) for l in leaves if l.dtype != bool)
            return carry + probe.astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return total

    _ = float(repeated(args))  # compile+warmup
    t0 = time.perf_counter()
    _ = float(repeated(args))
    t1 = time.perf_counter()
    _ = float(repeated(args))
    t2 = time.perf_counter()
    per = min(t1 - t0, t2 - t1) / reps * 1000.0
    print(f"{label:28s}: {per:9.3f} ms")
    return per


def roundtrip():
    x = jnp.float32(1.0)
    f = jax.jit(lambda a: a + 1)
    _ = float(f(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(f(x))
    print(f"{'dispatch roundtrip':28s}: {(time.perf_counter()-t0)/5*1000:9.3f} ms")


def main():
    import importlib

    from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
    from neuma_tpu.materials import (
        InvariantFullMetaElasticity,
        MetaMaterialConfig,
    )
    from neuma_tpu.render.binding import (
        apply_binding_xyz,
        compute_binding_table,
    )
    from neuma_tpu.render.camera import Camera
    from neuma_tpu.render.gaussians import create_from_points
    from neuma_tpu.sim.mpm import g2p, grid_op, mpm_step, p2g
    from neuma_tpu.ops.svd3 import svd3

    RZ = importlib.import_module("neuma_tpu.render.rasterize")

    roundtrip()

    rng = np.random.default_rng(0)
    n = 10000
    g = 32
    img = 800

    pts = (0.4 + 0.2 * rng.random((n, 3))).astype(np.float32)
    x = jnp.asarray(pts)
    state = ParticleState.initial(x, jnp.zeros((n, 3), jnp.float32))
    constants = MPMConstants(
        num_grids=g, bound=1, bc="noslip",
        dt=jnp.float32(1e-3),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), 2e-8, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )
    stress = jnp.asarray(1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32)
    F = jnp.asarray(
        np.eye(3)[None] + 0.05 * rng.standard_normal((n, 3, 3)), jnp.float32
    )

    timeit_scan(
        lambda st, sr: p2g(constants, statics, st, sr),
        (state, stress), label="p2g fwd",
    )
    timeit_scan(
        lambda st, sr: mpm_step(constants, statics, st, sr),
        (state, stress), label="mpm_step fwd",
    )

    def step_loss(st, sr):
        out = mpm_step(constants, statics, st, sr)
        return jnp.sum(out.x) + jnp.sum(out.v) + jnp.sum(out.F)

    timeit_scan(
        jax.grad(step_loss, argnums=(0, 1)), (state, stress),
        label="mpm_step grad",
    )
    timeit_scan(svd3, (F,), label="svd3 10k")

    cfg_m = MetaMaterialConfig(layer_widths=(64, 64))
    elast = InvariantFullMetaElasticity(cfg_m)
    pe = elast.init(jax.random.PRNGKey(0))
    pe = elast.init_lora(pe, jax.random.PRNGKey(1), r=16, alpha=16)
    timeit_scan(lambda f: elast.apply(pe, f), (F,), label="elasticity fwd")

    colors = rng.random((n, 3)).astype(np.float32)
    gaussians = create_from_points(pts, colors, sh_degree=3)
    table = compute_binding_table(gaussians, x, max_particles=10)
    cam = Camera.look_at(
        eye=np.array([0.5, 0.55, -1.6]), target=np.array([0.5, 0.5, 0.5]),
        fov=0.8, width=img, height=img,
    )
    cfg = RZ.RasterConfig(max_pairs=1 << 16, max_per_tile=512, segment=32)
    cov0 = gaussians.get_covariance()
    opac = gaussians.get_opacity.reshape(-1)
    shs = gaussians.get_features
    cols = jnp.asarray(colors)

    timeit_scan(
        lambda m, c: RZ._project(m, c, cam), (x, cov0),
        reps=10, label="project",
    )
    depth, visible, mean2d, conic, radius = jax.jit(
        lambda m, c: RZ._project(m, c, cam)
    )(x, cov0)
    timeit_scan(
        lambda d, v, m, r: RZ._build_tile_lists(
            d, v, m, r, cam.width, cam.height, cfg
        )[0],
        (depth, visible, mean2d, radius),
        reps=10, label="build_tile_lists 64k",
    )
    tile_mat, tx, ty = RZ._build_tile_lists(
        depth, visible, mean2d, radius, cam.width, cam.height, cfg
    )
    tx, ty = int(tx), int(ty)
    timeit_scan(
        lambda tm, m2, con, op, c: RZ._composite(
            tm, m2, con, op, c, tx, ty, cam.width, cam.height, cfg
        )[:2],
        (tile_mat, mean2d, conic, opac, cols),
        reps=10, label="composite 512sl",
    )

    def rast(m, c):
        return RZ.rasterize(
            m, c, opac, cam, jnp.ones(3), shs=shs, sh_degree=3, cfg=cfg
        )

    timeit_scan(rast, (x, cov0), reps=10, label="rasterize fwd")
    timeit_scan(
        jax.grad(lambda m, c: jnp.mean(rast(m, c) ** 2), argnums=(0, 1)),
        (x, cov0), reps=10, label="rasterize grad",
    )


if __name__ == "__main__":
    main()
