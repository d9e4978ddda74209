"""Halo-exchange sharded MPM step vs the single-device step.

Validates the shard_map + ppermute slab decomposition
(``parallel/halo.py``) on the 8-way virtual CPU mesh: the grid exists
only as per-shard (w+4, G, G) slabs (never fully replicated), yet one
step matches ``mpm_step`` to float tolerance — including near-wall
particles where the physical edge clamp interacts with the halo — and
GRADIENTS through a multi-step rollout match the single-device custom
VJPs, on both the dense (G=16) and the blocked (G=32, the production
kernel family) paths.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.parallel.halo import (
    make_halo_mpm_step,
    make_halo_sim_step,
    partition_particles,
    slab_width,
    unpartition,
)
from neuma_tpu.sim.mpm import mpm_step, mpm_step_diff


def make_scene(rng, n=512, g=16):
    x = jnp.asarray((0.02 + 0.96 * rng.random((n, 3))).astype(np.float32))
    state = ParticleState(
        x=x,
        v=jnp.asarray(0.5 * rng.standard_normal((n, 3)), jnp.float32),
        C=jnp.asarray(0.1 * rng.standard_normal((n, 3, 3)), jnp.float32),
        F=jnp.eye(3, dtype=jnp.float32)[None]
        + jnp.asarray(0.02 * rng.standard_normal((n, 3, 3)), jnp.float32),
    )
    constants = MPMConstants(
        num_grids=g, bound=1, bc="noslip",
        dt=jnp.float32(1e-3),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), 2e-6, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )
    stress = jnp.asarray(
        1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32
    )
    return constants, statics, state, stress


@pytest.fixture
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return Mesh(np.array(devs[:8]), ("dp",))


@pytest.mark.parametrize("bc", ["noslip", "freeslip"])
@pytest.mark.parametrize("g", [16, 32])
def test_halo_step_matches_single_device(rng, mesh8, bc, g):
    """g=16 runs the dense per-shard path, g=32 the blocked kernels
    (the production family for real-capture grids)."""
    constants, statics, state, stress = make_scene(rng, g=g)
    constants = dataclasses.replace(constants, bc=bc)

    ref = mpm_step(constants, statics, state, stress)

    part = partition_particles(constants, state, statics, 8, capacity=256)
    assert not bool(part.overflow)
    part_stress = stress[part.perm]

    step = jax.jit(make_halo_sim_step(constants, mesh8))
    new_part_state, margin_bad = step(part.statics, part.state, part_stress)
    assert not bool(jnp.any(margin_bad))

    out = unpartition(
        dataclasses.replace(part, state=new_part_state),
        state.x.shape[0],
        state,
    )
    for name in ("x", "v", "C", "F"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            atol=2e-5,
            rtol=1e-4,
            err_msg=f"halo mismatch in {name} ({bc}, g={g})",
        )


def test_halo_grid_is_sliced_not_replicated(mesh8, rng):
    """Structural check: the per-shard p2g region is (w+4, G, G) — the
    full G^3 grid is never materialized per device."""
    constants, statics, state, stress = make_scene(rng, g=16)
    w = slab_width(16, 8)
    assert w == 2
    # region rows per shard = w + 4 = 6 << 16
    from neuma_tpu.parallel.halo import HALO

    assert w + 2 * HALO < constants.num_grids


def test_partition_roundtrip_and_overflow(rng):
    constants, statics, state, stress = make_scene(rng, n=300)
    part = partition_particles(constants, state, statics, 8, capacity=128)
    assert not bool(part.overflow)
    back = unpartition(part, 300, state)
    for name in ("x", "v", "C", "F"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, name)),
            np.asarray(getattr(state, name)),
        )
    tiny = partition_particles(constants, state, statics, 8, capacity=8)
    assert bool(tiny.overflow)


def test_halo_mpm_step_multi_steps(rng, mesh8):
    """The trainer-facing wrapper (repartition each step) tracks the
    reference rollout on the blocked path."""
    constants, statics, state, stress = make_scene(rng, n=256, g=32)
    step = jax.jit(make_halo_mpm_step(constants, statics, mesh8))

    ref = state
    cur = state
    for _ in range(3):
        ref = mpm_step(constants, statics, ref, stress)
        cur, ovf = step(cur, stress)
        assert not bool(ovf)
    np.testing.assert_allclose(
        np.asarray(cur.x), np.asarray(ref.x), atol=5e-5, rtol=1e-4
    )


@pytest.mark.parametrize("g", [16, 32])
def test_halo_rollout_gradients_match_single_device(rng, mesh8, g):
    """THE multi-chip training correctness artifact: gradients of a
    3-step halo rollout (w.r.t. initial velocity AND the per-step
    stress input) match the single-device ``mpm_step_diff`` rollout.
    g=32 exercises the blocked scatter/gather custom VJPs per shard."""
    constants, statics, state, stress = make_scene(rng, n=256, g=g)
    steps = 3

    def loss_single(v0, stress):
        st = dataclasses.replace(state, v=v0)
        for _ in range(steps):
            st = mpm_step_diff(constants, statics, st, stress)
        return jnp.sum(st.x**2) + jnp.sum(st.v * st.C[:, 0, 0:1])

    halo_step = make_halo_mpm_step(constants, statics, mesh8)

    def loss_halo(v0, stress):
        st = dataclasses.replace(state, v=v0)
        ovf = jnp.bool_(False)
        for _ in range(steps):
            st, o = halo_step(st, stress)
            ovf = ovf | o
        return (
            jnp.sum(st.x**2) + jnp.sum(st.v * st.C[:, 0, 0:1]),
            ovf,
        )

    l_ref, (gv_ref, gs_ref) = jax.jit(
        jax.value_and_grad(loss_single, argnums=(0, 1))
    )(state.v, stress)
    # jit, like the trainer's epoch_step: shard_map under jit lets
    # GSPMD reshard the replicated operands to the in_specs.
    (l_halo, ovf), (gv_halo, gs_halo) = jax.jit(
        jax.value_and_grad(loss_halo, argnums=(0, 1), has_aux=True)
    )(state.v, stress)

    assert not bool(ovf)
    np.testing.assert_allclose(
        float(l_halo), float(l_ref), rtol=1e-5, err_msg=f"loss (g={g})"
    )
    scale_v = np.maximum(np.abs(np.asarray(gv_ref)).max(), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gv_halo) / scale_v,
        np.asarray(gv_ref) / scale_v,
        atol=2e-4,
        err_msg=f"d loss / d init_v (g={g})",
    )
    scale_s = np.maximum(np.abs(np.asarray(gs_ref)).max(), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gs_halo) / scale_s,
        np.asarray(gs_ref) / scale_s,
        atol=2e-4,
        err_msg=f"d loss / d stress (g={g})",
    )


def test_halo_margin_flag_fires_on_foreign_particles(rng, mesh8):
    """Feeding a shard particles it does not own trips margin_bad (the
    correctness guard for future lazy-repartition schedules)."""
    constants, statics, state, stress = make_scene(rng, n=256, g=16)
    part = partition_particles(constants, state, statics, 8, capacity=64)
    # Roll the bins by one shard: every shard now holds its neighbor's
    # particles.
    rolled = jax.tree_util.tree_map(
        lambda a: jnp.roll(a, 1, axis=0), part.state
    )
    rolled_statics = jax.tree_util.tree_map(
        lambda a: jnp.roll(a, 1, axis=0), part.statics
    )
    stress_b = jnp.roll(stress[part.perm], 1, axis=0)
    step = jax.jit(make_halo_sim_step(constants, mesh8))
    _, margin_bad = step(rolled_statics, rolled, stress_b)
    assert bool(jnp.any(margin_bad))


def test_bins_carried_steps_match_per_step_repartition(rng, mesh8):
    """Amortized repartitioning: a bins-carried multi-substep scan
    (make_halo_bins_step, tol=2, particles binned ONCE) matches the
    exact-ownership per-step-repartition wrapper — and the
    single-device rollout — while particles drift within tolerance."""
    from neuma_tpu.parallel.halo import make_halo_bins_step

    constants, statics, state, stress = make_scene(rng, n=256, g=32)
    # Uniform velocity so every particle drifts ~0.25 cells/step —
    # 4 steps of real drift, comfortably within tol=2.
    drift_v = 0.25 / (constants.dt * constants.inv_dx)
    state = dataclasses.replace(
        state,
        v=jnp.broadcast_to(
            jnp.asarray([drift_v, 0.0, 0.0], jnp.float32), state.v.shape
        ),
    )
    steps = 4

    ref = state
    for _ in range(steps):
        ref = mpm_step(constants, statics, ref, stress)

    part = partition_particles(constants, state, statics, 8, capacity=256)
    stress_b = jnp.where(
        part.valid[..., None, None], stress[part.perm], 0.0
    )
    bins_step = jax.jit(make_halo_bins_step(constants, mesh8, tol=2))

    bins = part.state
    for _ in range(steps):
        bins, margin = bins_step(part.statics, bins, stress_b)
        assert not bool(jnp.any(margin))
    out = unpartition(
        dataclasses.replace(part, state=bins), state.x.shape[0], state
    )
    for name in ("x", "v", "C", "F"):
        a = np.asarray(getattr(out, name))
        b = np.asarray(getattr(ref, name))
        # scale-relative: the fast drift makes C/v O(10) while x/F are
        # O(1), so normalize by each field's own magnitude.
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a / scale,
            b / scale,
            atol=3e-5,
            err_msg=f"bins-carried mismatch in {name}",
        )


def test_bins_margin_fires_past_tolerance(rng, mesh8):
    """Particles pushed > tol cells outside their stale bins trip the
    margin flag instead of silently dropping mass."""
    from neuma_tpu.parallel.halo import make_halo_bins_step

    constants, statics, state, stress = make_scene(rng, n=256, g=32)
    part = partition_particles(constants, state, statics, 8, capacity=256)
    stress_b = jnp.where(
        part.valid[..., None, None], stress[part.perm], 0.0
    )
    # Teleport the binned particles 3 cells up in x (> tol=2).
    moved = dataclasses.replace(
        part.state,
        x=part.state.x.at[..., 0].add(3.0 / constants.inv_dx),
    )
    bins_step = jax.jit(make_halo_bins_step(constants, mesh8, tol=2))
    _, margin = bins_step(part.statics, moved, stress_b)
    assert bool(jnp.any(margin))


def test_halo_slab_width9_partial_last_slab(rng, mesh8):
    """The real-capture grid (70^3) over 8 shards gives slab width
    ceil(70/8) = 9 with a PARTIAL last slab (shard 7 owns only rows
    63..69): the per-shard views extend past the physical grid, whose
    rows must stay untapped zeros. One halo step at g=70 (blocked
    production kernels) must match the single-device step exactly as at
    the round sizes."""
    constants, statics, state, stress = make_scene(rng, n=1024, g=70)
    assert slab_width(70, 8) == 9

    ref = mpm_step(constants, statics, state, stress)

    part = partition_particles(constants, state, statics, 8, capacity=512)
    assert not bool(part.overflow)
    part_stress = jnp.where(
        part.valid[..., None, None], stress[part.perm], 0.0
    )
    step = jax.jit(make_halo_sim_step(constants, mesh8))
    new_part_state, margin_bad = step(part.statics, part.state, part_stress)
    assert not bool(jnp.any(margin_bad))

    out = unpartition(
        dataclasses.replace(part, state=new_part_state),
        state.x.shape[0],
        state,
    )
    for name in ("x", "v", "C", "F"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            atol=2e-5,
            rtol=1e-4,
            err_msg=f"halo mismatch in {name} (g=70, w=9)",
        )
