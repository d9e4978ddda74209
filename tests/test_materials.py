"""Material laws: analytic limits, symmetries, LoRA mechanics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.materials import (
    CorotatedElasticity,
    StVKElasticity,
    VolumeElasticity,
    SigmaElasticity,
    IdentityPlasticity,
    SigmaPlasticity,
    VonMisesPlasticity,
    DruckerPragerPlasticity,
    ComposeMaterial,
    MetaMaterialConfig,
    InvariantFullMetaElasticity,
    InvariantFullMetaPlasticity,
)
from neuma_tpu.nn.mlp import lora_mask, lora_params


def rand_F(rng, n=32, amp=0.2):
    return jnp.asarray(
        np.eye(3)[None] + amp * rng.standard_normal((n, 3, 3)), jnp.float32
    )


ELASTIC_CFG = {"E": 1e5, "nu": 0.3, "random": False}


def test_elasticities_zero_at_identity(rng):
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (8, 3, 3))
    for cls in (CorotatedElasticity, StVKElasticity, SigmaElasticity):
        mat = cls(ELASTIC_CFG)
        params = mat.init()
        stress = mat.apply(params, F)
        np.testing.assert_allclose(
            np.asarray(stress), 0.0, atol=1e-2,
            err_msg=f"{cls.__name__} not stress-free at F=I",
        )
    mat = VolumeElasticity({**ELASTIC_CFG, "mode": "taichi"})
    stress = mat.apply(mat.init(), F)
    np.testing.assert_allclose(np.asarray(stress), 0.0, atol=1e-2)


def test_corotated_rotation_invariance(rng):
    # Pure rotation => zero stress for corotated.
    theta = 0.4
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    F = jnp.asarray(R[None], jnp.float32)
    mat = CorotatedElasticity(ELASTIC_CFG)
    stress = mat.apply(mat.init(), F)
    np.testing.assert_allclose(np.asarray(stress), 0.0, atol=1.0)


def test_plasticity_identity_passthrough(rng):
    F = rand_F(rng)
    mat = IdentityPlasticity()
    np.testing.assert_array_equal(
        np.asarray(mat.apply({}, F)), np.asarray(F)
    )


def test_sigma_plasticity_preserves_volume(rng):
    F = rand_F(rng, amp=0.1)
    mat = SigmaPlasticity()
    Fp = mat.apply({}, F)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.det(Fp)),
        np.asarray(jnp.linalg.det(F)),
        rtol=1e-4,
    )
    # Result is diagonal isotropic.
    off = np.asarray(Fp) * (1 - np.eye(3))
    np.testing.assert_allclose(off, 0.0, atol=1e-6)


def test_von_mises_inside_yield_is_identity(rng):
    # Tiny deviatoric strain, huge yield stress: no projection.
    mat = VonMisesPlasticity({"E": 1e5, "nu": 0.3, "sigma_y": 1e9})
    params = mat.init()
    F = rand_F(rng, amp=0.01)
    Fp = mat.apply(params, F)
    np.testing.assert_allclose(np.asarray(Fp), np.asarray(F), atol=1e-5)


def test_von_mises_projects_onto_yield(rng):
    mat = VonMisesPlasticity({"E": 1e6, "nu": 0.3, "sigma_y": 100.0})
    params = mat.init()
    F = rand_F(rng, amp=0.3)
    Fp = np.asarray(mat.apply(params, F))
    assert np.all(np.isfinite(Fp))
    # Projected deviatoric Hencky norm must not exceed the original's.
    def dev_norm(Fm):
        s = np.linalg.svd(Fm, compute_uv=False)
        eps = np.log(np.maximum(s, 0.05))
        dev = eps - eps.mean(-1, keepdims=True)
        return np.linalg.norm(dev, axis=-1)

    assert np.all(dev_norm(Fp) <= dev_norm(np.asarray(F)) + 1e-4)


def test_drucker_prager_finite(rng):
    mat = DruckerPragerPlasticity(
        {"E": 1e6, "nu": 0.3, "friction_angle": 30.0, "cohesion": 0.0}
    )
    params = mat.init()
    F = rand_F(rng, amp=0.3)
    Fp = np.asarray(mat.apply(params, F))
    assert np.all(np.isfinite(Fp))


def test_invariant_full_meta_shapes_and_grad(rng):
    cfg = MetaMaterialConfig()
    elast = InvariantFullMetaElasticity(cfg)
    plast = InvariantFullMetaPlasticity(cfg)
    key = jax.random.PRNGKey(0)
    pe = elast.init(key)
    pp = plast.init(jax.random.PRNGKey(1))
    F = rand_F(rng)
    stress = elast.apply(pe, F)
    assert stress.shape == F.shape
    # Cauchy stress from a symmetric P construction times F^T need not be
    # symmetric, but must be finite and differentiable.
    g = jax.grad(lambda p: jnp.sum(elast.apply(p, F) ** 2))(pe)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    Fp = plast.apply(pp, F)
    assert Fp.shape == F.shape
    # alpha=1e-3 keeps the correction small.
    assert float(jnp.max(jnp.abs(Fp - F))) < 0.5


def test_meta_plasticity_near_identity_when_normalized(rng):
    # At F = I the normalized features are all zero; with no bias the MLP
    # output is zero => Fp == F exactly.
    cfg = MetaMaterialConfig(no_bias=True, normalize_input=True)
    plast = InvariantFullMetaPlasticity(cfg)
    pp = plast.init(jax.random.PRNGKey(0))
    F = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    Fp = plast.apply(pp, F)
    np.testing.assert_allclose(np.asarray(Fp), np.asarray(F), atol=1e-6)


def test_lora_zero_init_is_noop_then_trains(rng):
    cfg = MetaMaterialConfig()
    elast = InvariantFullMetaElasticity(cfg)
    params = elast.init(jax.random.PRNGKey(0))
    F = rand_F(rng)
    base_out = elast.apply(params, F)
    lparams = elast.init_lora(params, jax.random.PRNGKey(2), r=16, alpha=16)
    lora_out = elast.apply(lparams, F)
    # B=0 => LoRA starts as exact no-op (loralib semantics).
    np.testing.assert_allclose(
        np.asarray(lora_out), np.asarray(base_out), atol=1e-7
    )
    # Mask selects exactly the lora_a/lora_b leaves.
    mask = elast.lora_mask(lparams)
    flat_mask = jax.tree_util.tree_leaves(mask)
    assert sum(flat_mask) == 2 * 3  # 3 linears x (A, B)
    # Gradient flows into LoRA leaves.
    g = jax.grad(lambda p: jnp.sum(elast.apply(p, F) ** 2))(lparams)
    gb = g["final"]["lora_b"]
    assert float(jnp.max(jnp.abs(gb))) > 0.0
    lp = elast.lora_params(lparams)
    leaves = jax.tree_util.tree_leaves(lp)
    assert len(leaves) == 6


def test_compose_material_sections(rng):
    m1 = CorotatedElasticity(ELASTIC_CFG)
    m2 = SigmaElasticity(ELASTIC_CFG)
    comp = ComposeMaterial([m1, m2], sections=[10, 22])
    params = [m1.init(), m2.init()]
    F = rand_F(rng, n=32, amp=0.05)
    out = comp.apply(params, F)
    out1 = m1.apply(params[0], F[:10])
    out2 = m2.apply(params[1], F[10:])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.concatenate([out1, out2])), atol=1e-6
    )
