"""Halo-exchange sharded MPM step vs the single-device step.

Validates the shard_map + ppermute slab decomposition
(``parallel/halo.py``) on the 8-way virtual CPU mesh: the grid exists
only as per-shard (w+4, G, G) slabs (never fully replicated), yet one
step matches ``mpm_step`` to float tolerance — including near-wall
particles where the physical edge clamp interacts with the halo.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.parallel.halo import (
    make_halo_sim_step,
    partition_particles,
    slab_width,
    unpartition,
)
from neuma_tpu.sim.mpm import mpm_step


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
def test_halo_step_matches_single_device(rng, mesh8, bc):
    constants, statics, state, stress = make_scene(rng)
    import dataclasses

    constants = dataclasses.replace(constants, bc=bc)

    ref = mpm_step(constants, statics, state, stress)

    part = partition_particles(constants, state, statics, 8, capacity=256)
    assert not bool(part.overflow)
    part_stress = stress[part.perm]

    step = jax.jit(make_halo_sim_step(constants, mesh8))
    new_part_state = step(part.statics, part.state, part_stress)

    import neuma_tpu.parallel.halo as halo_mod

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
            err_msg=f"halo mismatch in {name} ({bc})",
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


def test_halo_step_multi_steps_with_repartition(rng, mesh8):
    """A few steps with per-step repartition track the reference rollout."""
    import dataclasses

    constants, statics, state, stress = make_scene(rng, n=256)
    step = jax.jit(make_halo_sim_step(constants, mesh8))

    ref = state
    cur = state
    for _ in range(3):
        ref = mpm_step(constants, statics, ref, stress)
        part = partition_particles(constants, cur, statics, 8, capacity=128)
        new_part = step(part.statics, part.state, stress[part.perm])
        cur = unpartition(
            dataclasses.replace(part, state=new_part),
            cur.x.shape[0],
            cur,
        )
    np.testing.assert_allclose(
        np.asarray(cur.x), np.asarray(ref.x), atol=5e-5, rtol=1e-4
    )
