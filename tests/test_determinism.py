"""Bitwise run-to-run reproducibility (SURVEY.md section 5.2).

The reference's p2g scatter uses float atomics
(/root/reference/modules/nclaw/sim/mpm.py:370-371), so two identical
runs sum grid momentum in a nondeterministic order and forward sims are
NOT bitwise-reproducible on GPU. The TPU design scatters via sorted
blocked segment-sums with no atomics anywhere, so exact reproducibility
becomes achievable — this test pins it: the same grounding loss+grad
executed twice (and re-jitted a third time) must agree EXACTLY, down to
the bit, on the rollout loss, the LoRA gradients, and the init-velocity
gradient.

On-hardware coverage: the round runbooks re-assert this on the real
v5e (benchmarks/probes/on_recovery_r5.sh); this test pins the property
on the CPU backend in CI.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.train.grounding import make_rollout_loss

from test_grounding import build_scene, render_gt


def _grad_fn(scene):
    loss_fn = make_rollout_loss(scene)
    weights = jnp.ones(scene.num_frames, jnp.float32)

    def f(pe, pp, iv):
        (loss, aux) = loss_fn(pe, pp, iv, weights)
        return loss

    return jax.value_and_grad(f, argnums=(0, 1, 2))


def _assert_trees_bitwise_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        xa = np.ascontiguousarray(np.atleast_1d(np.asarray(x)))
        ya = np.ascontiguousarray(np.atleast_1d(np.asarray(y)))
        # Bitwise: compare the raw bytes, not values (rules out -0.0/0.0
        # or NaN-payload drift that == would hide or overflag).
        np.testing.assert_array_equal(
            xa.view(np.uint8), ya.view(np.uint8)
        )


def test_grounding_loss_and_grads_bitwise_reproducible(rng):
    scene = build_scene(rng, n=160, g=16, frames=3, substeps=2,
                        material="meta")
    gt = render_gt(scene, jnp.asarray([0.25, 0.0, 0.1], jnp.float32))
    scene = dataclasses.replace(scene, gt_images=gt)

    pe = scene.elasticity.init_lora(
        scene.elasticity_params, jax.random.PRNGKey(3), r=4, alpha=4
    )
    pp = scene.plasticity.init_lora(
        scene.plasticity_params, jax.random.PRNGKey(4), r=4, alpha=4
    )
    iv = jnp.asarray([0.15, -0.05, 0.02], jnp.float32)

    g1 = jax.jit(_grad_fn(scene))
    out_a = jax.device_get(g1(pe, pp, iv))
    out_b = jax.device_get(g1(pe, pp, iv))  # same executable, 2nd run
    _assert_trees_bitwise_equal(out_a, out_b)

    # A freshly traced/jitted instance of the same computation must also
    # reproduce the bits (no trace-order or compile-cache sensitivity).
    g2 = jax.jit(_grad_fn(scene))
    out_c = jax.device_get(g2(pe, pp, iv))
    _assert_trees_bitwise_equal(out_a, out_c)

    loss = out_a[0]
    assert np.isfinite(loss) and float(loss) > 0.0


def test_forward_rollout_bitwise_reproducible(rng):
    """Two forward sims of the same scene agree exactly — the property
    the reference's atomic scatter cannot provide."""
    from neuma_tpu.core.types import ParticleState
    from neuma_tpu.sim.rollout import make_step_fn, rollout

    scene = build_scene(rng, n=160, g=16, material="analytic")
    n = scene.init_x.shape[0]
    v0 = jnp.broadcast_to(
        jnp.asarray([0.3, 0.0, 0.0], jnp.float32), (n, 3)
    )
    state0 = ParticleState.initial(scene.init_x, v0)
    step = make_step_fn(
        scene.constants,
        scene.statics,
        scene.elasticity.apply,
        scene.plasticity.apply,
        diff=False,
    )

    @jax.jit
    def run():
        final, traj = rollout(
            step,
            scene.elasticity_params,
            scene.plasticity_params,
            state0,
            num_steps=12,
            substeps=2,
            constants=scene.constants,
        )
        return final.x, final.v, final.F, traj.x

    a = jax.device_get(run())
    b = jax.device_get(run())
    _assert_trees_bitwise_equal(a, b)
