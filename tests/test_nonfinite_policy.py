"""Non-finite-gradient policy (SURVEY 5.3 failure detection).

``cfg['on_nonfinite']``:

* 'raise' (default) — a non-finite total gradient is a hard failure
  (`NonFiniteGradientError`), the framework's strict semantics.
* 'skip' — reference degrade-and-continue parity: the reference's
  per-step nan_to_num scrub (reference sim/interface.py:65-74) plus
  ``clip_grad_norm_`` with ``error_if_nonfinite`` unset
  (reference finetune.py:417-423) turns an inf gradient norm into an
  effectively zeroed update and training continues. Here the clipped
  gradients of BOTH nets are zeroed on the bad epoch and a consecutive
  -failure cap (``max_nonfinite_skips``) still bounds the damage.

Measured motivation: full-horizon 400-frame BPTT scans diverge at the
rollout-decay ramp peak (BENCHMARKS.md round 5 — NonFiniteGradientError
at epoch 93 / lr 0.02 and epoch 78 / lr 0.01 on the real chip).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuma_tpu.train.grounding import (
    NonFiniteGradientError,
    finetune_constitutive,
)

from test_grounding import build_scene


def _cfg(epochs, **over):
    cfg = {
        "num_epochs": epochs,
        "elasticity_lr": 0.01,
        "plasticity_lr": 0.001,
        "elasticity_wd": 0.0,
        "plasticity_wd": 0.0,
        "elasticity_grad_max_norm": 1.0,
        "plasticity_grad_max_norm": 1.0,
        "elasticity_scheduler": {"type": "cos", "max_steps": epochs,
                                 "learning_rate_alpha": 0.025},
        "plasticity_scheduler": {"type": "cos", "max_steps": epochs,
                                 "learning_rate_alpha": 0.025},
        "decay_init": 0.5,
        "decay_final": 1.0,
        "decay_steps": 80,
        "lambda_max_decay": 0.33,
    }
    cfg.update(over)
    return cfg


@pytest.fixture(scope="module")
def nan_scene():
    scene = build_scene(np.random.default_rng(0), n=128, g=16,
                        frames=2, substeps=1, material="meta")
    # NaN ground truth makes the pixel loss — and therefore every
    # parameter gradient — non-finite on every epoch, while the forward
    # sim (and its overflow flags) stays untouched.
    cams = scene.cameras
    nan_gt = jnp.full(
        (scene.num_frames, len(cams), 3, cams[0].height, cams[0].width),
        jnp.nan, jnp.float32,
    )
    scene = dataclasses.replace(scene, gt_images=nan_gt)
    pe = scene.elasticity.init_lora(
        scene.elasticity_params, jax.random.PRNGKey(3), r=2, alpha=2
    )
    pp = scene.plasticity.init_lora(
        scene.plasticity_params, jax.random.PRNGKey(4), r=2, alpha=2
    )
    return scene, pe, pp


def test_default_raises_on_first_bad_epoch(nan_scene):
    scene, pe, pp = nan_scene
    with pytest.raises(NonFiniteGradientError, match="epoch 1"):
        finetune_constitutive(
            scene, np.zeros(3, np.float32), _cfg(3), pe, pp
        )


def test_skip_zeroes_update_and_continues(nan_scene):
    scene, pe, pp = nan_scene
    result = finetune_constitutive(
        scene, np.zeros(3, np.float32),
        _cfg(3, on_nonfinite="skip", max_nonfinite_skips=10), pe, pp,
    )
    # Every epoch was skipped: params must be bit-identical to the
    # starting LoRA params (zeroed update through the masked RAdam).
    for got, want in zip(
        jax.tree_util.tree_leaves(result.params_e),
        jax.tree_util.tree_leaves(pe),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert len(result.losses) == 3


def test_skip_consecutive_cap_raises(nan_scene):
    scene, pe, pp = nan_scene
    with pytest.raises(NonFiniteGradientError, match="consecutive"):
        finetune_constitutive(
            scene, np.zeros(3, np.float32),
            _cfg(5, on_nonfinite="skip", max_nonfinite_skips=2), pe, pp,
        )


def test_unknown_policy_rejected(nan_scene):
    scene, pe, pp = nan_scene
    with pytest.raises(ValueError, match="on_nonfinite"):
        finetune_constitutive(
            scene, np.zeros(3, np.float32),
            _cfg(1, on_nonfinite="ignore"), pe, pp,
        )
