"""Capture a jax.profiler trace of the 30k/70^3 fwd+bwd step on TPU."""
import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.core.types import MPMConstants, ParticleState, Statics
from neuma_tpu.sim import mpm

rng = np.random.default_rng(0)
n, g = 30_000, 70
constants = MPMConstants(
    num_grids=g, bound=1, bc="noslip", dt=jnp.float32(1e-3),
    gravity=jnp.asarray([0, -9.8, 0], jnp.float32), eps=jnp.float32(6e-7),
)
statics = Statics(
    vol=jnp.full((n,), 2e-8, jnp.float32),
    rho=jnp.full((n,), 1000.0, jnp.float32),
    clip_bound=jnp.full((n,), 0.1, jnp.float32),
    enabled=jnp.ones((n,), jnp.int32),
)
x = jnp.asarray((0.3 + 0.4 * rng.random((n, 3))).astype(np.float32))
state = ParticleState.initial(x, jnp.zeros((n, 3), jnp.float32))
stress = jnp.asarray(1e-3 * rng.standard_normal((n, 3, 3)), jnp.float32)


@jax.jit
def grad_step(st, sr):
    def loss(stt, srr):
        def body(c, _):
            return mpm.mpm_step_diff(constants, statics, c, srr), None

        out, _ = jax.lax.scan(body, stt, None, length=10)
        return jnp.sum(out.x ** 2)

    return jax.grad(loss, argnums=(0, 1))(st, sr)


out = grad_step(state, stress)
_ = float(out[0].x.ravel()[0])

with jax.profiler.trace("/tmp/trace70"):
    out = grad_step(state, stress)
    _ = float(out[0].x.ravel()[0])
print("trace done")
