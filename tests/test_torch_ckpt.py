"""Golden parity: load the reference's pretrained NCLaw base models
(torch checkpoints) and verify our converted params reproduce the
InvariantFullMeta forward computed independently with numpy/torch in the
reference's (out, in) weight convention."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuma_tpu.data.torch_ckpt import (
    load_base_model,
    load_params_npz,
    load_torch_file,
    save_params_npz,
)
from neuma_tpu.materials import (
    InvariantFullMetaElasticity,
    InvariantFullMetaPlasticity,
    MetaMaterialConfig,
)

BASE = Path("/root/reference/experiments/base_models/jelly_0300.pt")

pytestmark = pytest.mark.skipif(
    not BASE.is_file(), reason="reference base models unavailable"
)


def torch_reference_forward(sd, F_np, mode):
    """Independent numpy implementation of the InvariantFullMeta forward
    using the torch state_dict directly (W is (out, in); y = W @ x):
    features [sigma-1, flat(F^T F - I), det-1] -> gelu MLP (no bias) ->
    sym -> R @ sym (-> @ F^T for elasticity / alpha-scaled add for
    plasticity)."""
    from scipy.special import erf

    def gelu(x):
        return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))

    U, s, Vt = np.linalg.svd(F_np)
    # sign fix: det(U) > 0, det(V) > 0
    su = np.sign(np.linalg.det(U))
    U[:, :, 2] *= su[:, None]
    s[:, 2] *= su
    sv = np.sign(np.linalg.det(np.swapaxes(Vt, 1, 2)))
    Vt[:, 2, :] *= sv[:, None]
    s[:, 2] *= sv
    R = U @ Vt

    Ft = np.swapaxes(F_np, 1, 2)
    FtF = Ft @ F_np
    I = np.eye(3)
    feat = np.concatenate(
        [
            s - 1.0,
            (FtF - I).reshape(-1, 9),
            np.linalg.det(F_np)[:, None] - 1.0,
        ],
        axis=1,
    )

    x = feat
    w0 = sd["layers.0.fc.weight"].numpy()
    w1 = sd["layers.1.fc.weight"].numpy()
    wf = sd["final_layer.fc.weight"].numpy()
    x = gelu(x @ w0.T)
    x = gelu(x @ w1.T)
    x = x @ wf.T
    sym = 0.5 * (
        x.reshape(-1, 3, 3) + np.swapaxes(x.reshape(-1, 3, 3), 1, 2)
    )
    P = R @ sym
    if mode == "elasticity":
        return P @ Ft
    return F_np + 1e-3 * P


def test_base_model_parity(rng):
    pe, pp = load_base_model(BASE, num_layers=2)
    ckpt = load_torch_file(BASE)

    cfg = MetaMaterialConfig(
        layer_widths=(64, 64), norm=None, nonlinearity="gelu",
        no_bias=True, normalize_input=True, alpha=1e-3,
    )
    elast = InvariantFullMetaElasticity(cfg)
    plast = InvariantFullMetaPlasticity(cfg)

    F_np = (
        np.eye(3)[None] + 0.1 * rng.standard_normal((64, 3, 3))
    ).astype(np.float32)
    F = jnp.asarray(F_np)

    ours_e = np.asarray(elast.apply(pe, F))
    ref_e = torch_reference_forward(
        ckpt["elasticity"], F_np.astype(np.float64), "elasticity"
    )
    np.testing.assert_allclose(ours_e, ref_e, atol=2e-3, rtol=1e-3)

    ours_p = np.asarray(plast.apply(pp, F))
    ref_p = torch_reference_forward(
        ckpt["plasticity"], F_np.astype(np.float64), "plasticity"
    )
    np.testing.assert_allclose(ours_p, ref_p, atol=1e-4, rtol=1e-3)


def test_params_npz_roundtrip(tmp_path, rng):
    pe, _ = load_base_model(BASE, num_layers=2)
    path = tmp_path / "params.npz"
    save_params_npz(path, pe)
    loaded = load_params_npz(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(pe), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip(tmp_path, rng):
    import optax

    from neuma_tpu.train.checkpoint import (
        MetricsLogger,
        load_train_state,
        save_train_state,
    )

    params = {
        "w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((4,)), jnp.float32),
    }
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    payload_path = tmp_path / "state.npz"
    save_train_state(payload_path, 7, params, opt_state)

    template = {
        "step": np.int64(0),
        "params": jax.tree_util.tree_map(jnp.zeros_like, params),
        "opt_state": opt.init(
            jax.tree_util.tree_map(jnp.zeros_like, params)
        ),
    }
    restored = load_train_state(payload_path, template)
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(params["w"])
    )

    log_path = tmp_path / "metrics.jsonl"
    logger = MetricsLogger(log_path)
    logger.log(1, loss=0.5, lr=1e-3)
    logger.log(2, loss=0.25)
    logger.close()
    import json

    rows = [json.loads(l) for l in open(log_path)]
    assert rows[0]["loss"] == 0.5 and rows[1]["step"] == 2


def test_phase_timer(rng):
    from neuma_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    with timer.phase("matmul", out=None):
        y = x @ x
    with timer.phase("matmul", out=y):
        y = y @ x
    rep = timer.report()
    assert "matmul" in rep and "x2" in rep
    timer.reset()
    assert not timer.totals
