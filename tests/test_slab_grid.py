"""Slab-space grid chain (round 5): parity of the slab step against the
dense fold/unfold path.

The slab path (``mpm._step_fwd_slab`` / ``_step_bwd_slab``) keeps the
grid as halo-complete per-block slabs end to end; the dense path folds
to a (cells, ch) grid and unfolds again. Both run the same kernels with
the same addition order, so outputs and gradients must match to
round-off (the halo-add itself is bit-exact vs fold+unfold — see
``test_halo_add_matches_fold_unfold``).

Runs on CPU with NEUMA_SLAB_GRID=interpret (the Pallas kernels in
interpreter mode); the same chain runs compiled on TPU.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.sim import mpm
from neuma_tpu.sim import p2g_kernel as pk


def _scene(n=1500, g=32, bc="noslip", seed=0):
    rng = np.random.default_rng(seed)
    constants = MPMConstants(
        num_grids=g, bound=2, bc=bc, dt=jnp.float32(8e-4),
        gravity=jnp.asarray([0.0, -9.8, 0.0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), 2e-8, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.1, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )
    x = jnp.asarray((0.25 + 0.5 * rng.random((n, 3))).astype(np.float32))
    v = jnp.asarray(0.3 * rng.standard_normal((n, 3)).astype(np.float32))
    C = jnp.asarray(0.5 * rng.standard_normal((n, 3, 3)).astype(np.float32))
    F = jnp.eye(3, dtype=jnp.float32)[None] + 0.02 * jnp.asarray(
        rng.standard_normal((n, 3, 3)).astype(np.float32)
    )
    state = ParticleState(x=x, v=v, C=C, F=F)
    stress = jnp.asarray(
        1e-3 * rng.standard_normal((n, 3, 3)).astype(np.float32)
    )
    return constants, statics, state, stress


def test_halo_add_matches_fold_unfold():
    """halo_add_slabs == unfold(fold(partials)) on all in-range lines."""
    from neuma_tpu.sim.blocked import _fold_blocks

    rng = np.random.default_rng(1)
    for dims in [(70, 70, 70), (32, 32, 32)]:
        nbs = tuple(-(-d // pk.BLOCK) for d in dims)
        NB = nbs[0] * nbs[1] * nbs[2]
        S = pk.S
        pb = jnp.asarray(
            rng.standard_normal((NB, 4, S, S * S)).astype(np.float32)
        )
        pb5 = pb.reshape(NB, 4, S, S, S).transpose(0, 2, 3, 4, 1)
        dense = _fold_blocks(pb5, dims, nbs, pk.BLOCK).reshape(-1, 4)
        ref = np.asarray(pk.unfold_blocks(dense, dims, nbs))
        out = np.asarray(pk.halo_add_slabs(pb, nbs)).reshape(
            NB, 4, S, S, S
        )
        nbx, nby, nbz = nbs
        for b in range(NB):
            bz = b % nbz
            by = (b // nbz) % nby
            bx = b // (nby * nbz)
            vx = max(0, min(S, dims[0] - bx * pk.BLOCK))
            vy = max(0, min(S, dims[1] - by * pk.BLOCK))
            vz = max(0, min(S, dims[2] - bz * pk.BLOCK))
            a = out[b, :, :vx, :vy, :vz]
            r = ref[b, :, :vx, :vy, :vz]
            np.testing.assert_array_equal(a, r)


@pytest.mark.parametrize("bc", ["noslip", "freeslip"])
def test_slab_step_matches_dense(monkeypatch, bc):
    constants, statics, state, stress = _scene(bc=bc)

    monkeypatch.setenv("NEUMA_SLAB_GRID", "off")
    ref = mpm.mpm_step(constants, statics, state, stress)

    monkeypatch.setenv("NEUMA_SLAB_GRID", "interpret")
    out = mpm.mpm_step(constants, statics, state, stress)

    # On CPU the dense reference runs the jnp-HIGHEST fallback while the
    # slab path runs the interpreted Pallas kernels (high3 bf16 splits),
    # so parity here is the kernel-vs-jnp floor (~1e-5 relative; the
    # same-kernel TPU comparison is exact — probe_slab5.py).
    for name in ("x", "v", "C", "F"):
        a, r = np.asarray(getattr(out, name)), np.asarray(
            getattr(ref, name)
        )
        scale = max(np.abs(r).max(), 1e-8)
        np.testing.assert_allclose(
            a / scale, r / scale, rtol=0, atol=3e-5, err_msg=name
        )


def test_slab_step_grads_match_dense(monkeypatch):
    constants, statics, state, stress = _scene(n=900)

    def loss(state, stress):
        out = mpm.mpm_step_diff(constants, statics, state, stress)
        return (
            jnp.sum(out.x ** 2)
            + jnp.sum(out.v ** 2)
            + jnp.sum(out.C ** 2)
            + jnp.sum(out.F ** 2)
        )

    monkeypatch.setenv("NEUMA_SLAB_GRID", "off")
    g_ref = jax.grad(loss, argnums=(0, 1))(state, stress)

    monkeypatch.setenv("NEUMA_SLAB_GRID", "interpret")
    g_out = jax.grad(loss, argnums=(0, 1))(state, stress)

    leaves_r = jax.tree_util.tree_leaves(g_ref)
    leaves_o = jax.tree_util.tree_leaves(g_out)
    assert len(leaves_r) == len(leaves_o)
    for a, r in zip(leaves_o, leaves_r):
        scale = np.maximum(np.abs(np.asarray(r)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(r) / scale,
            rtol=0, atol=2e-5,
        )


def test_packed_substep_slab_residuals_roundtrip(monkeypatch):
    """_pack_step_res/_unpack_step_res round-trip the slab residual
    form (one merged slab array) exactly."""
    monkeypatch.setenv("NEUMA_SLAB_GRID", "interpret")
    constants, statics, state, stress = _scene(n=700)
    out, res = mpm._mpm_step_fwd(constants, statics, state, stress)
    assert len(res[6]) == 1 and res[6][0].ndim == 4
    packed = mpm._pack_step_res(res)
    res2 = mpm._unpack_step_res(packed)
    for a, b in zip(
        jax.tree_util.tree_leaves(res), jax.tree_util.tree_leaves(res2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
