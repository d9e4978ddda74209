"""Long-horizon physics sanity with the real pretrained NCLaw materials:
a dropped blob under gravity must stay finite, stay in the box, bounce
off the floor, and eventually settle (energy dissipates through the
boundary), using the reference's jelly_0300.pt weights."""
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.data.torch_ckpt import load_base_model
from neuma_tpu.materials import (
    InvariantFullMetaElasticity,
    InvariantFullMetaPlasticity,
    MetaMaterialConfig,
)
from neuma_tpu.sim.mpm import mpm_step

BASE = Path("/root/reference/experiments/base_models/jelly_0300.pt")

pytestmark = pytest.mark.skipif(
    not BASE.is_file(), reason="reference base models unavailable"
)


def test_jelly_drop_rollout(rng):
    n = 800
    # Ball of particles up in the box.
    pts = 0.5 + 0.12 * (rng.random((n, 3)) - 0.5)
    pts[:, 1] += 0.25
    r = np.linalg.norm(pts - pts.mean(0), axis=1)
    keep = r < 0.09
    pts = pts[keep]
    n = len(pts)

    constants = MPMConstants(
        num_grids=32, bound=2, bc="noslip",
        dt=jnp.float32(1e-3),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    statics = Statics(
        vol=jnp.full((n,), (0.18 ** 3) / 800, jnp.float32),
        rho=jnp.full((n,), 1000.0, jnp.float32),
        clip_bound=jnp.full((n,), 0.5, jnp.float32),
        enabled=jnp.ones((n,), jnp.int32),
    )

    cfg = MetaMaterialConfig(layer_widths=(64, 64))
    elast = InvariantFullMetaElasticity(cfg)
    plast = InvariantFullMetaPlasticity(cfg)
    pe, pp = load_base_model(BASE, num_layers=2)

    state = ParticleState.initial(
        jnp.asarray(pts, jnp.float32), jnp.zeros((n, 3), jnp.float32)
    )

    @jax.jit
    def run(state):
        def body(s, _):
            stress = elast.apply(pe, s.F)
            s = mpm_step(constants, statics, s, stress)
            F = plast.apply(pp, s.F)
            import dataclasses

            return dataclasses.replace(s, F=F), (
                jnp.mean(s.x[:, 1]),
                jnp.mean(jnp.sum(s.v ** 2, axis=1)),
            )

        s, (heights, ke) = jax.lax.scan(body, state, None, length=400)
        return s, heights, ke

    state, heights, ke = run(state)
    heights = np.asarray(heights)
    ke = np.asarray(ke)

    # Finite and inside the unit box the whole way.
    assert np.all(np.isfinite(np.asarray(state.x)))
    assert np.all(np.isfinite(np.asarray(state.F)))
    assert float(jnp.min(state.x)) >= 0.0
    assert float(jnp.max(state.x)) <= 1.0

    # Fell under gravity...
    assert heights[150] < heights[0] - 0.05
    # ...and didn't tunnel through the floor (bound=2 cells + clip).
    assert heights.min() > 2.5 / 32 * 0.5
    # F stays near a reasonable deformation range (jelly, not exploding).
    J = np.asarray(jnp.linalg.det(state.F))
    assert np.all(J > 0.05) and np.all(J < 5.0)
