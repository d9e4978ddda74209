"""Grid-blocked APIC scatter (sim/blocked.py): forward parity vs the
scatter baseline, closed-form VJP parity vs AD of the dense path, and
end-to-end step equivalence across p2g methods."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.sim import mpm
from neuma_tpu.sim.blocked import (
    _blocked_forward,
    _dense_forward,
    apic_scatter,
    apic_scatter_f,
)


def _scene(n=600, g=33, seed=0, near_wall=True):
    rng = np.random.default_rng(seed)
    x = 0.1 + 0.8 * rng.random((n, 3)).astype(np.float32)
    if near_wall:
        # Particles within half a cell of the walls exercise the tap clamp.
        k = n // 8
        x[:k] = 0.2 / g * rng.random((k, 3)).astype(np.float32)
        x[k : 2 * k] = 1.0 - 0.2 / g * rng.random((k, 3)).astype(np.float32)
    v = rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    C = rng.standard_normal((n, 3, 3)).astype(np.float32) * 0.1
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    F += 0.05 * rng.standard_normal((n, 3, 3)).astype(np.float32)
    stress = rng.standard_normal((n, 3, 3)).astype(np.float32) * 10.0
    stress = 0.5 * (stress + np.transpose(stress, (0, 2, 1)))
    enabled = (rng.random(n) > 0.1).astype(np.int32)

    constants = MPMConstants(num_grids=g, bound=2, bc="freeslip")
    statics = Statics(
        vol=jnp.full((n,), 2.5e-8, jnp.float32),
        rho=jnp.full((n,), 1e3, jnp.float32),
        clip_bound=jnp.full((n,), 0.4, jnp.float32),
        enabled=jnp.asarray(enabled),
    )
    state = ParticleState(
        x=jnp.asarray(x), v=jnp.asarray(v), C=jnp.asarray(C), F=jnp.asarray(F)
    )
    return constants, statics, state, jnp.asarray(stress)


def _raw_inputs(constants, statics, state, stress):
    en = statics.enabled.astype(jnp.float32)
    mass = statics.vol * statics.rho * en
    stress_term = (
        -constants.dt * statics.vol * 4.0 * constants.inv_dx ** 2
    )[:, None, None] * stress
    A = stress_term * en[:, None, None] + mass[:, None, None] * state.C
    b = mass[:, None] * state.v
    return state.x, mass, b, A


@pytest.mark.parametrize("g", [17, 33, 70])
def test_blocked_forward_matches_scatter(g):
    constants, statics, state, stress = _scene(g=g)
    m_ref, mv_ref = mpm.p2g_scatter(constants, statics, state, stress)
    x, gm, b, A = _raw_inputs(constants, statics, state, stress)
    m_blk, f_blk = _blocked_forward(constants, x, gm, b, A)
    scale = float(jnp.max(jnp.abs(mv_ref))) + 1e-12
    np.testing.assert_allclose(m_blk, m_ref, rtol=0, atol=1e-5 * float(jnp.max(m_ref)))
    np.testing.assert_allclose(f_blk, mv_ref, rtol=0, atol=2e-5 * scale)


def test_pallas_kernel_matches_blocked_interpret():
    """The Pallas forward kernel (interpret mode on CPU) must match the
    jnp blocked path bit-for-bit in structure (same math, same order up
    to matmul association)."""
    from neuma_tpu.sim.p2g_kernel import p2g_blocked_pallas

    constants, statics, state, stress = _scene(n=800, g=33)
    x, gm, b, A = _raw_inputs(constants, statics, state, stress)
    m_ref, f_ref = _blocked_forward(constants, x, gm, b, A)
    m_k, f_k = p2g_blocked_pallas(constants, x, gm, b, A, interpret=True)
    sm = float(jnp.max(jnp.abs(m_ref))) + 1e-12
    sf = float(jnp.max(jnp.abs(f_ref))) + 1e-12
    np.testing.assert_allclose(m_k, m_ref, rtol=0, atol=1e-5 * sm)
    np.testing.assert_allclose(f_k, f_ref, rtol=0, atol=1e-5 * sf)


def test_dense_forward_matches_scatter():
    constants, statics, state, stress = _scene(g=12)
    m_ref, mv_ref = mpm.p2g_scatter(constants, statics, state, stress)
    x, gm, b, A = _raw_inputs(constants, statics, state, stress)
    m_d, f_d = _dense_forward(constants, x, gm, b, A)
    np.testing.assert_allclose(m_d, m_ref, rtol=1e-5, atol=1e-8)
    scale = float(jnp.max(jnp.abs(mv_ref)))
    np.testing.assert_allclose(f_d, mv_ref, rtol=0, atol=1e-5 * scale)


def test_p2g_method_blocked_matches_matmul():
    constants, statics, state, stress = _scene(g=33)
    m_a, mv_a = mpm.p2g(constants, statics, state, stress, method="blocked")
    m_b, mv_b = mpm.p2g(constants, statics, state, stress, method="matmul")
    scale = float(jnp.max(jnp.abs(mv_b))) + 1e-12
    np.testing.assert_allclose(m_a, m_b, rtol=0, atol=1e-5 * float(jnp.max(m_b)))
    np.testing.assert_allclose(mv_a, mv_b, rtol=0, atol=2e-5 * scale)


def test_custom_vjp_matches_ad_of_dense():
    """The closed-form tap-space backward must match JAX AD of the
    scatter formulation on every input (x through the spline weights
    and dpos, gm, b, A)."""
    constants, statics, state, stress = _scene(n=200, g=19)
    x, gm, b, A = _raw_inputs(constants, statics, state, stress)

    key = jax.random.PRNGKey(3)
    g3 = constants.num_grids ** 3
    cm = jax.random.normal(key, (g3,), jnp.float32)
    cf = jax.random.normal(key, (g3, 3), jnp.float32)

    def loss_custom(x, gm, b, A):
        m, f = apic_scatter(constants, x, gm, b, A)
        return jnp.vdot(m, cm) + jnp.vdot(f, cf)

    def loss_ad(x, gm, b, A):
        m, f = _dense_forward(constants, x, gm, b, A)
        return jnp.vdot(m, cm) + jnp.vdot(f, cf)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(x, gm, b, A)
    g_a = jax.grad(loss_ad, argnums=(0, 1, 2, 3))(x, gm, b, A)
    for gc, ga, name in zip(g_c, g_a, "x gm b A".split()):
        scale = float(jnp.max(jnp.abs(ga))) + 1e-12
        np.testing.assert_allclose(
            gc, ga, rtol=0, atol=3e-5 * scale, err_msg=f"grad wrt {name}"
        )


def test_apic_scatter_f_grad_matches():
    constants, statics, state, stress = _scene(n=150, g=19)
    x, _, b, A = _raw_inputs(constants, statics, state, stress)
    g3 = constants.num_grids ** 3
    cf = jax.random.normal(jax.random.PRNGKey(5), (g3, 3), jnp.float32)

    def loss_custom(x, b, A):
        return jnp.vdot(apic_scatter_f(constants, x, b, A), cf)

    def loss_ad(x, b, A):
        return jnp.vdot(_dense_forward(constants, x, None, b, A)[1], cf)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(x, b, A)
    g_a = jax.grad(loss_ad, argnums=(0, 1, 2))(x, b, A)
    for gc, ga, name in zip(g_c, g_a, "x b A".split()):
        scale = float(jnp.max(jnp.abs(ga))) + 1e-12
        np.testing.assert_allclose(
            gc, ga, rtol=0, atol=3e-5 * scale, err_msg=f"grad wrt {name}"
        )


def test_full_step_blocked_matches_matmul_grads():
    """End-to-end: grad of a rollout-style loss through mpm_step with
    the blocked p2g matches the dense-matmul p2g path."""
    constants, statics, state, stress = _scene(n=300, g=33)

    def step_loss(method, state, stress):
        grid_m, grid_mv = mpm.p2g(constants, statics, state, stress, method)
        grid_v = mpm.grid_op(constants, grid_m, grid_mv)
        out = mpm.g2p(constants, statics, state, grid_v)
        return (
            jnp.sum(out.x ** 2)
            + jnp.sum(out.v ** 2)
            + 0.1 * jnp.sum(out.C ** 2)
            + 0.1 * jnp.sum(out.F ** 2)
        )

    for outs in ["x", "v"]:
        pass  # single combined loss covers all outputs

    g_blk = jax.grad(
        lambda s, sr: step_loss("blocked", s, sr), argnums=(0, 1)
    )(state, stress)
    g_mm = jax.grad(
        lambda s, sr: step_loss("matmul", s, sr), argnums=(0, 1)
    )(state, stress)

    flat_b = jax.tree_util.tree_leaves(g_blk)
    flat_m = jax.tree_util.tree_leaves(g_mm)
    for tb, tm in zip(flat_b, flat_m):
        scale = float(jnp.max(jnp.abs(tm))) + 1e-10
        np.testing.assert_allclose(tb, tm, rtol=0, atol=5e-4 * scale)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_blocked_fuzz_random_sizes(seed):
    """Random particle counts / grid sizes (incl. awkward mod-BLOCK
    remainders): blocked forward == scatter reference, and the step
    gradient stays finite through mpm_step_diff."""
    r = np.random.default_rng(50 + seed)
    g = int(r.integers(25, 90))
    n = int(r.integers(100, 1500))
    constants, statics, state, stress = _scene(g=g, n=n)
    m_ref, mv_ref = mpm.p2g_scatter(constants, statics, state, stress)
    x, gm, b, A = _raw_inputs(constants, statics, state, stress)
    m_blk, f_blk = _blocked_forward(constants, x, gm, b, A)
    scale = float(jnp.max(jnp.abs(mv_ref))) + 1e-12
    np.testing.assert_allclose(
        m_blk, m_ref, rtol=0, atol=1e-5 * float(jnp.max(m_ref))
    )
    np.testing.assert_allclose(f_blk, mv_ref, rtol=0, atol=2e-5 * scale)

    def loss(st, sr):
        out = mpm.mpm_step_diff(constants, statics, st, sr)
        return jnp.sum(out.x ** 2) + jnp.sum(out.v ** 2)

    gs, gsr = jax.grad(loss, argnums=(0, 1))(state, stress)
    for leaf in jax.tree_util.tree_leaves((gs, gsr)):
        assert bool(jnp.isfinite(leaf).all()), (g, n)
