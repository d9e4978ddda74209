"""Full training-state checkpoint/resume (VERDICT r4 item: wire
``train/checkpoint.py::save_train_state`` into stage 2).

The reference only persists LoRA weights and restarts the optimizer
cold on resume (finetune.py:299-309); ``finetune_constitutive`` can now
checkpoint params + optimizer moments + schedule step and resume
exactly. The test runs 4 epochs, resumes from the saved state for 4
more, and requires the resumed losses to match an uninterrupted 8-epoch
run — exact continuation, not just "within noise" (the decay ramp is
pinned constant so the 4- and 8-epoch runs share per-epoch decay).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from neuma_tpu.train.grounding import finetune_constitutive

from test_grounding import build_scene, render_gt


def _cfg(num_epochs):
    return {
        "num_epochs": num_epochs,
        "elasticity_lr": 0.01,
        "plasticity_lr": 0.001,
        "elasticity_wd": 0.0,
        "plasticity_wd": 0.0,
        "elasticity_grad_max_norm": 1.0,
        "plasticity_grad_max_norm": 1.0,
        "elasticity_scheduler": {"type": "cos", "max_steps": 8,
                                 "learning_rate_alpha": 0.025},
        "plasticity_scheduler": {"type": "cos", "max_steps": 8,
                                 "learning_rate_alpha": 0.025},
        # Constant rollout decay so runs with different num_epochs see
        # identical per-epoch weights (decay_rate_for_epoch divides by
        # num_epochs otherwise).
        "decay_init": 1.0,
        "decay_final": 1.0,
        "decay_steps": 80,
        "lambda_max_decay": 0.0,
    }


def test_full_train_state_resume_continues_exactly(rng, tmp_path):
    scene = build_scene(rng, n=120, g=12, frames=2, substeps=2,
                        material="meta")
    true_v = np.array([0.2, 0.0, 0.0], np.float32)
    perturbed = jax.tree_util.tree_map(
        lambda x: x * 1.3 + 0.01, scene.elasticity_params
    )
    gt = render_gt(
        dataclasses.replace(scene, elasticity_params=perturbed),
        jnp.asarray(true_v),
    )
    scene = dataclasses.replace(scene, gt_images=gt)

    def lora_params():
        pe = scene.elasticity.init_lora(
            scene.elasticity_params, jax.random.PRNGKey(3), r=4, alpha=4
        )
        pp = scene.plasticity.init_lora(
            scene.plasticity_params, jax.random.PRNGKey(4), r=4, alpha=4
        )
        return pe, pp

    ts = tmp_path / "train_state.npz"

    # Interrupted run: 4 epochs, state saved at the final epoch.
    pe, pp = lora_params()
    part = finetune_constitutive(
        scene, true_v, _cfg(4), pe, pp, train_state_path=ts
    )
    assert ts.is_file()

    # Resume for 4 more epochs from the saved state (fresh params passed
    # in must be overridden by the restored ones).
    pe2, pp2 = lora_params()
    resumed = finetune_constitutive(
        scene, true_v, _cfg(8), pe2, pp2,
        train_state_path=ts, resume_state=True,
    )
    assert len(resumed.losses) == 4  # epochs 5..8 only

    # Uninterrupted 8-epoch run for comparison.
    pe3, pp3 = lora_params()
    full = finetune_constitutive(scene, true_v, _cfg(8), pe3, pp3)

    np.testing.assert_allclose(
        part.losses, full.losses[:4], rtol=1e-6,
        err_msg="pre-interruption epochs diverged",
    )
    np.testing.assert_allclose(
        resumed.losses, full.losses[4:], rtol=1e-6,
        err_msg="resumed epochs do not continue the loss curve",
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed.params_e),
        jax.tree_util.tree_leaves(full.params_e),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
