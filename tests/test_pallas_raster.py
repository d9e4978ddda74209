"""Pallas rasterizer (interpret mode on CPU): forward parity with the jnp
composite and gradient parity on the smooth (non-capped) regime."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import build_covariance
from neuma_tpu.render.rasterize import RasterConfig, rasterize


def make_scene(rng, n=40, size=64):
    pts = 0.4 * rng.standard_normal((n, 3)).astype(np.float32)
    scales = np.log(0.05 + 0.05 * rng.random((n, 3))).astype(np.float32)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    opac = rng.uniform(-1.0, 2.0, (n, 1)).astype(np.float32)
    colors = rng.random((n, 3)).astype(np.float32)
    cam = Camera.look_at(
        eye=np.array([0.0, 0.0, -3.0]),
        target=np.zeros(3),
        fov=0.9,
        width=size,
        height=size,
    )
    cov = build_covariance(jnp.exp(jnp.asarray(scales)), jnp.asarray(quats))
    opacity = jax.nn.sigmoid(jnp.asarray(opac))
    return jnp.asarray(pts), cov, opacity, jnp.asarray(colors), cam


def test_pallas_forward_matches_jnp(rng):
    means3d, cov, opacity, colors, cam = make_scene(rng, n=35, size=48)
    bg = jnp.asarray([1.0, 0.5, 0.2])
    cfg_jnp = RasterConfig(
        max_pairs=8192, max_per_tile=64, segment=16, backend="jnp"
    )
    cfg_pl = dataclasses.replace(cfg_jnp, backend="pallas_interpret")
    img_jnp = rasterize(
        means3d, cov, opacity, cam, bg, colors_precomp=colors, cfg=cfg_jnp
    )
    img_pl = rasterize(
        means3d, cov, opacity, cam, bg, colors_precomp=colors, cfg=cfg_pl
    )
    np.testing.assert_allclose(
        np.asarray(img_pl), np.asarray(img_jnp), atol=2e-5
    )


def test_pallas_gradients_match_jnp(rng):
    means3d, cov, opacity, colors, cam = make_scene(rng, n=20, size=32)
    bg = jnp.zeros(3)
    target = jnp.full((3, 32, 32), 0.3)
    cfg_jnp = RasterConfig(
        max_pairs=4096, max_per_tile=32, segment=8, backend="jnp"
    )
    cfg_pl = dataclasses.replace(cfg_jnp, backend="pallas_interpret")

    def loss(cfg):
        def f(m, o, col, cv):
            img = rasterize(
                m, cv, o, cam, bg, colors_precomp=col, cfg=cfg
            )
            return jnp.mean((img - target) ** 2)

        return f

    g_jnp = jax.grad(loss(cfg_jnp), argnums=(0, 1, 2, 3))(
        means3d, opacity, colors, cov
    )
    g_pl = jax.grad(loss(cfg_pl), argnums=(0, 1, 2, 3))(
        means3d, opacity, colors, cov
    )
    for a, b, name in zip(
        g_jnp, g_pl, ("means3d", "opacity", "colors", "cov")
    ):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b, a, atol=5e-3 * denom, rtol=2e-2,
            err_msg=f"gradient mismatch: {name}",
        )


def test_pallas_empty_scene(rng):
    cam = Camera.look_at(
        eye=np.array([0.0, 0.0, -3.0]), target=np.zeros(3), width=32,
        height=32,
    )
    means3d = jnp.zeros((4, 3)) + 100.0
    cov = jnp.tile(
        jnp.asarray([[1e-4, 0, 0, 1e-4, 0, 1e-4]], jnp.float32), (4, 1)
    )
    opacity = jnp.ones((4, 1))
    colors = jnp.ones((4, 3))
    bg = jnp.asarray([0.3, 0.6, 0.9])
    cfg = RasterConfig(
        max_pairs=256, max_per_tile=8, backend="pallas_interpret"
    )
    img = rasterize(
        means3d, cov, opacity, cam, bg, colors_precomp=colors, cfg=cfg
    )
    expected = np.broadcast_to(np.asarray(bg)[:, None, None], (3, 32, 32))
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-6)


def test_gradients_match_in_capped_alpha_regime(rng):
    """Both backends must implement the CUDA cap-backward quirk (cap
    ignored in the chain), so their gradients agree even when
    op * exp(power) > 0.99 (saturated opacity)."""
    means3d, cov, opacity, colors, cam = make_scene(rng, n=12, size=32)
    opacity = jnp.full_like(opacity, 0.9995)  # deep in the capped regime
    bg = jnp.zeros(3)
    target = jnp.full((3, 32, 32), 0.3)
    cfg_jnp = RasterConfig(
        max_pairs=4096, max_per_tile=32, segment=8, backend="jnp"
    )
    cfg_pl = dataclasses.replace(cfg_jnp, backend="pallas_interpret")

    def loss(cfg):
        def f(m, o, col):
            img = rasterize(
                m, cov, o, cam, bg, colors_precomp=col, cfg=cfg
            )
            return jnp.mean((img - target) ** 2)

        return f

    g_jnp = jax.grad(loss(cfg_jnp), argnums=(0, 1, 2))(
        means3d, opacity, colors
    )
    g_pl = jax.grad(loss(cfg_pl), argnums=(0, 1, 2))(
        means3d, opacity, colors
    )
    # The opacity gradient is nonzero through the capped alphas (the
    # quirk); jnp.minimum semantics would zero it.
    assert np.abs(np.asarray(g_jnp[1])).max() > 0
    for a, b, name in zip(g_jnp, g_pl, ("means3d", "opacity", "colors")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b, a, atol=5e-3 * denom, rtol=2e-2,
            err_msg=f"capped-alpha gradient mismatch: {name}",
        )
