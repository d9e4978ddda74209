"""MPM step unit tests: conservation, BCs, advection, gradients.

Mirrors the test plan in SURVEY.md section 4 (the reference has no tests;
these encode its runtime-assert/guard behavior as a real suite).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.sim.mpm import p2g, grid_op, g2p, mpm_step, mpm_step_diff


def make_scene(rng, n=256, g=16, dt=1e-3, bc="freeslip", gravity=(0, -9.8, 0),
               eps=6e-7):
    constants = MPMConstants(
        num_grids=g,
        bound=2,
        bc=bc,
        dt=jnp.float32(dt),
        gravity=jnp.asarray(gravity, jnp.float32),
        eps=jnp.float32(eps),
    )
    x = 0.3 + 0.4 * rng.random((n, 3))
    v = 0.1 * rng.standard_normal((n, 3))
    state = ParticleState.initial(
        jnp.asarray(x, jnp.float32), jnp.asarray(v, jnp.float32)
    )
    statics = Statics(
        vol=jnp.full((n,), 1e-5, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )
    stress = jnp.zeros((n, 3, 3), jnp.float32)
    return constants, statics, state, stress


def test_p2g_mass_conservation(rng):
    constants, statics, state, stress = make_scene(rng)
    grid_m, grid_mv = p2g(constants, statics, state, stress)
    total_mass = float(jnp.sum(grid_m))
    expected = float(jnp.sum(statics.vol * statics.rho))
    np.testing.assert_allclose(total_mass, expected, rtol=1e-5)


def test_p2g_momentum_conservation(rng):
    constants, statics, state, stress = make_scene(rng)
    # With zero stress and zero C, the scattered momentum must equal the
    # particle momentum sum exactly (B-spline partition of unity).
    grid_m, grid_mv = p2g(constants, statics, state, stress)
    mass = statics.vol * statics.rho
    expected = np.asarray(jnp.sum(mass[:, None] * state.v, axis=0))
    np.testing.assert_allclose(
        np.asarray(jnp.sum(grid_mv, axis=0)), expected, rtol=1e-4, atol=1e-9
    )


def test_disabled_particles_excluded(rng):
    constants, statics, state, stress = make_scene(rng)
    statics2 = Statics(
        vol=statics.vol,
        rho=statics.rho,
        clip_bound=statics.clip_bound,
        enabled=statics.enabled.at[::2].set(0),
    )
    grid_m, _ = p2g(constants, statics2, state, stress)
    mass = np.asarray(statics.vol * statics.rho)
    expected = mass[1::2].sum()
    np.testing.assert_allclose(float(jnp.sum(grid_m)), expected, rtol=1e-5)


def test_grid_op_gravity_everywhere(rng):
    constants, statics, state, stress = make_scene(rng, gravity=(0, -5.0, 0))
    g3 = constants.num_grids ** 3
    grid_m = jnp.zeros((g3,))
    grid_mv = jnp.zeros((g3, 3))
    v = grid_op(constants, grid_m, grid_mv)
    # Empty interior cells get pure gravity*dt (reference mpm.py:383-385).
    interior = np.asarray(v.reshape(16, 16, 16, 3))[8, 8, 8]
    np.testing.assert_allclose(
        interior, [0.0, -5.0 * 1e-3, 0.0], atol=1e-8
    )


def test_grid_op_freeslip_vs_noslip():
    g = 8
    for bc, expect in (("freeslip", [0.0, -1.0, 0.5]), ("noslip", [0.0, 0.0, 0.0])):
        constants = MPMConstants(
            num_grids=g, bound=2, bc=bc,
            dt=jnp.float32(0.0), gravity=jnp.zeros(3), eps=jnp.float32(0.0),
        )
        g3 = g ** 3
        grid_m = jnp.ones((g3,))
        # Velocity pointing out through the low-x boundary at cell x=0.
        grid_mv = jnp.broadcast_to(
            jnp.asarray([-1.0, -1.0, 0.5]), (g3, 3)
        )
        v = grid_op(constants, grid_m, grid_mv).reshape(g, g, g, 3)
        # interior cell: velocity preserved (m + eps division with eps=0)
        np.testing.assert_allclose(
            np.asarray(v[4, 4, 4]), [-1.0, -1.0, 0.5], atol=1e-6
        )
        # low-x boundary cell with inward-violating vx<0
        np.testing.assert_allclose(np.asarray(v[0, 4, 4]), expect, atol=1e-6)


def test_g2p_rigid_translation(rng):
    # A uniform velocity field on the grid must advect particles uniformly
    # and produce zero C (affine velocity gradient).
    constants, statics, state, stress = make_scene(rng, gravity=(0, 0, 0))
    g3 = constants.num_grids ** 3
    grid_v = jnp.broadcast_to(jnp.asarray([0.2, -0.1, 0.05]), (g3, 3))
    new_state = g2p(constants, statics, state, grid_v)
    np.testing.assert_allclose(
        np.asarray(new_state.v),
        np.broadcast_to([0.2, -0.1, 0.05], new_state.v.shape),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(new_state.C), 0.0, atol=2e-4)
    dt = float(constants.dt)
    np.testing.assert_allclose(
        np.asarray(new_state.x),
        np.asarray(state.x) + dt * np.array([0.2, -0.1, 0.05]),
        atol=1e-6,
    )
    # F update: (I + dt*C) F ~ F for C ~ 0.
    np.testing.assert_allclose(
        np.asarray(new_state.F), np.asarray(state.F), atol=1e-5
    )


def test_g2p_clip_bound(rng):
    constants, statics, state, stress = make_scene(rng)
    g3 = constants.num_grids ** 3
    # Huge downward velocity: particles must clamp at clip_bound * dx.
    grid_v = jnp.broadcast_to(jnp.asarray([0.0, -1000.0, 0.0]), (g3, 3))
    new_state = g2p(constants, statics, state, grid_v)
    clip = float(statics.clip_bound[0]) * constants.dx
    assert np.all(np.asarray(new_state.x[:, 1]) >= clip - 1e-7)


def test_full_step_free_fall(rng):
    # Zero stress, no boundary contact: CoM velocity integrates gravity.
    constants, statics, state, stress = make_scene(
        rng, gravity=(0.0, -9.8, 0.0)
    )
    new_state = mpm_step(constants, statics, state, stress)
    dv = np.asarray(new_state.v - state.v).mean(0)
    np.testing.assert_allclose(dv, [0, -9.8e-3, 0], atol=2e-4)


def test_step_jit_and_diff_agree(rng):
    constants, statics, state, stress = make_scene(rng, n=64)
    out1 = jax.jit(mpm_step, static_argnums=())(
        constants, statics, state, stress
    )
    out2 = mpm_step_diff(constants, statics, state, stress)
    for a, b in zip(jax.tree_util.tree_leaves(out1),
                    jax.tree_util.tree_leaves(out2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        )


def test_step_gradients_finite_and_match_fd(rng):
    constants, statics, state, stress = make_scene(rng, n=32, g=12)

    def loss(v0, stress):
        s = ParticleState(x=state.x, v=v0, C=state.C, F=state.F)
        out = mpm_step_diff(constants, statics, s, stress)
        return jnp.sum(out.x ** 2) + jnp.sum(out.v * out.C.sum((-1, -2))[:, None])

    g_v, g_s = jax.grad(loss, argnums=(0, 1))(state.v, stress)
    assert np.all(np.isfinite(np.asarray(g_v)))
    assert np.all(np.isfinite(np.asarray(g_s)))

    # Spot-check d loss / d v0 against central differences.
    eps = 1e-3
    v_np = np.asarray(state.v, np.float64)
    for idx in [(0, 0), (5, 1), (17, 2)]:
        vp = v_np.copy()
        vp[idx] += eps
        vm = v_np.copy()
        vm[idx] -= eps
        fd = (
            float(loss(jnp.asarray(vp, jnp.float32), stress))
            - float(loss(jnp.asarray(vm, jnp.float32), stress))
        ) / (2 * eps)
        np.testing.assert_allclose(
            float(g_v[idx]), fd, rtol=2e-2, atol=1e-4
        )


def test_nan_scrub_in_backward(rng):
    # Inject NaN into the cotangent path: gradient through the guarded step
    # must come out finite (reference interface.py:65-74 behavior).
    constants, statics, state, stress = make_scene(rng, n=16, g=8)

    def loss(v0):
        s = ParticleState(x=state.x, v=v0, C=state.C, F=state.F)
        out = mpm_step_diff(constants, statics, s, stress)
        bad = jnp.where(out.x[:, 0] > -1.0, jnp.nan, 1.0)  # all NaN
        return jnp.sum(out.v) + jnp.sum(bad * 0.0 + bad)

    g = jax.grad(loss)(state.v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_p2g_matmul_matches_scatter(rng):
    from neuma_tpu.sim.mpm import p2g_matmul, p2g_scatter

    constants, statics, state, _ = make_scene(rng, n=200, g=16)
    stress = jnp.asarray(
        1e-3 * rng.standard_normal((200, 3, 3)), jnp.float32
    )
    # nonzero C to exercise the affine decomposition
    state = ParticleState(
        x=state.x,
        v=state.v,
        C=jnp.asarray(0.1 * rng.standard_normal((200, 3, 3)), jnp.float32),
        F=state.F,
    )
    m1, mv1 = p2g_scatter(constants, statics, state, stress)
    m2, mv2 = p2g_matmul(constants, statics, state, stress)
    np.testing.assert_allclose(
        np.asarray(m2), np.asarray(m1), atol=1e-7, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mv2), np.asarray(mv1), atol=2e-6, rtol=1e-3
    )
    # disabled particles excluded in both
    statics2 = Statics(
        vol=statics.vol, rho=statics.rho,
        clip_bound=statics.clip_bound,
        enabled=statics.enabled.at[::3].set(0),
    )
    m1d, _ = p2g_scatter(constants, statics2, state, stress)
    m2d, _ = p2g_matmul(constants, statics2, state, stress)
    np.testing.assert_allclose(
        np.asarray(m2d), np.asarray(m1d), atol=1e-7, rtol=1e-4
    )
    # chunked path
    m3, mv3 = p2g_matmul(constants, statics, state, stress, chunk=64)
    np.testing.assert_allclose(
        np.asarray(m3), np.asarray(m2), atol=1e-6, rtol=1e-4
    )


def test_p2g_matmul_gradients(rng):
    from neuma_tpu.sim.mpm import p2g_matmul

    constants, statics, state, _ = make_scene(rng, n=64, g=12)
    stress = jnp.asarray(
        1e-3 * rng.standard_normal((64, 3, 3)), jnp.float32
    )

    def loss(v, s):
        st = ParticleState(x=state.x, v=v, C=state.C, F=state.F)
        m, mv = p2g_matmul(constants, statics, st, s)
        return jnp.sum(mv ** 2) + jnp.sum(m ** 2)

    g_v, g_s = jax.grad(loss, argnums=(0, 1))(state.v, stress)
    assert np.all(np.isfinite(np.asarray(g_v)))
    assert np.all(np.isfinite(np.asarray(g_s)))
    assert float(jnp.max(jnp.abs(g_v))) > 0


def test_g2p_custom_vjp_matches_ad(rng):
    """The hand-derived grid cotangent (separable matmul) must match pure
    AD through _g2p_impl."""
    from neuma_tpu.sim.mpm import _g2p_impl, g2p as g2p_custom

    constants, statics, state, _ = make_scene(rng, n=128, g=12)
    state = ParticleState(
        x=state.x, v=state.v,
        C=jnp.asarray(0.2 * rng.standard_normal((128, 3, 3)), jnp.float32),
        F=jnp.asarray(
            np.eye(3)[None] + 0.1 * rng.standard_normal((128, 3, 3)),
            jnp.float32,
        ),
    )
    statics = Statics(
        vol=statics.vol, rho=statics.rho, clip_bound=statics.clip_bound,
        enabled=statics.enabled.at[::5].set(0),
    )
    g3 = constants.num_grids ** 3
    grid_v = jnp.asarray(
        0.3 * rng.standard_normal((g3, 3)), jnp.float32
    )
    key = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    def loss(fn, gv, st):
        out = fn(constants, statics, st, gv)
        return (
            jnp.sum(out.x ** 2)
            + jnp.sum(out.v * key[:, None])
            + jnp.sum(out.C ** 2)
            + jnp.sum(jnp.sin(out.F))
        )

    g_ad = jax.grad(
        lambda gv, st: loss(_g2p_impl, gv, st), argnums=(0, 1)
    )(grid_v, state)
    g_cu = jax.grad(
        lambda gv, st: loss(g2p_custom, gv, st), argnums=(0, 1)
    )(grid_v, state)
    for a, b, name in [
        (g_ad[0], g_cu[0], "grid_v"),
        (g_ad[1].x, g_cu[1].x, "x"),
        (g_ad[1].v, g_cu[1].v, "v"),
        (g_ad[1].C, g_cu[1].C, "C"),
        (g_ad[1].F, g_cu[1].F, "F"),
    ]:
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5, rtol=1e-3,
            err_msg=f"cotangent mismatch: {name}",
        )


def test_p2g_matmul_matches_scatter_near_walls(rng):
    """Particles within half a cell of the box walls (allowed when
    clip_bound < 0.5): out-of-range stencil taps must fold onto the edge
    grid line on BOTH paths (the scatter path clamps indices; the matmul
    path folds the tap into the edge weight row)."""
    from neuma_tpu.sim.mpm import p2g_matmul, p2g_scatter

    n, g = 64, 16
    constants, statics, state, _ = make_scene(rng, n=n, g=g)
    dx = 1.0 / g
    # Place particles hugging every wall at 0.1*dx (and a few corners).
    pos = rng.random((n, 3)).astype(np.float32)
    wall = 0.1 * dx
    pos[:20, 0] = wall
    pos[20:40, 1] = 1.0 - wall
    pos[40:50] = wall
    pos[50:] = 1.0 - wall
    state = ParticleState(
        x=jnp.asarray(pos),
        v=state.v,
        C=jnp.asarray(0.1 * rng.standard_normal((n, 3, 3)), jnp.float32),
        F=state.F,
    )
    stress = jnp.asarray(
        1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32
    )
    m1, mv1 = p2g_scatter(constants, statics, state, stress)
    m2, mv2 = p2g_matmul(constants, statics, state, stress)
    np.testing.assert_allclose(
        np.asarray(m2), np.asarray(m1), atol=1e-7, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mv2), np.asarray(mv1), atol=2e-6, rtol=1e-3
    )
    # Total mass is conserved (nothing dropped off the grid).
    total = float(jnp.sum(statics.vol * statics.rho))
    np.testing.assert_allclose(float(jnp.sum(m2)), total, rtol=1e-5)
