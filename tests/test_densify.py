"""Densification ops + camera interpolation."""
import numpy as np
import jax.numpy as jnp
import pytest

from neuma_tpu.render.camera import Camera
from neuma_tpu.render.densify import (
    DensifyState,
    densify_and_clone,
    densify_and_prune,
    densify_and_split,
    prune,
    reset_opacity,
)
from neuma_tpu.render.gaussians import create_from_points


def make_pack(rng, n=30):
    pts = rng.random((n, 3)).astype(np.float32)
    return create_from_points(
        pts, rng.random((n, 3)).astype(np.float32), sh_degree=1
    )


def test_clone_grows_small_high_grad(rng):
    pack = make_pack(rng)
    grads = np.zeros(pack.num_gaussians)
    grads[:5] = 1.0
    out = densify_and_clone(pack, grads, 0.5, scene_extent=100.0)
    assert out.num_gaussians == pack.num_gaussians + 5
    np.testing.assert_array_equal(
        np.asarray(out.xyz[-5:]), np.asarray(pack.xyz[:5])
    )


def test_split_replaces_big_high_grad(rng):
    pack = make_pack(rng)
    grads = np.zeros(pack.num_gaussians)
    grads[:4] = 1.0
    out = densify_and_split(
        pack, grads, 0.5, scene_extent=1e-6, rng=rng
    )  # tiny extent => all selected count as "big"
    assert out.num_gaussians == pack.num_gaussians - 4 + 8
    # children scales shrunk by 0.8*N
    parent_scale = np.exp(np.asarray(pack.scaling[:4]))
    child_scale = np.exp(np.asarray(out.scaling[-8:]))
    np.testing.assert_allclose(
        child_scale, np.tile(parent_scale, (2, 1)) / 1.6, rtol=1e-5
    )


def test_prune_and_reset_opacity(rng):
    pack = make_pack(rng)
    mask = np.zeros(pack.num_gaussians, bool)
    mask[10:] = True
    out = prune(pack, mask)
    assert out.num_gaussians == 10
    out2 = reset_opacity(out, ceiling=0.01)
    assert float(jnp.max(out2.get_opacity)) <= 0.0101


def test_full_densify_round(rng):
    pack = make_pack(rng)
    state = DensifyState.zeros(pack.num_gaussians)
    vs_grad = np.zeros((pack.num_gaussians, 3))
    vs_grad[:3] = 5.0
    state.add_stats(vs_grad, np.ones(pack.num_gaussians, bool))
    out, new_state = densify_and_prune(
        pack, state, max_grad=1.0, min_opacity=0.005, extent=1.0,
        rng=rng,
    )
    assert new_state.denom.shape[0] == out.num_gaussians
    assert out.num_gaussians >= pack.num_gaussians  # cloned or split


def test_camera_interpolation(rng):
    c1 = Camera.look_at(
        eye=np.array([0, 0, -2.0]), target=np.zeros(3), width=64,
        height=64,
    )
    c2 = Camera.look_at(
        eye=np.array([2.0, 0, 0.0]), target=np.zeros(3), width=64,
        height=64,
    )
    path = Camera.interpolate(c1, c2, 5)
    assert len(path) == 5
    np.testing.assert_allclose(
        np.asarray(path[0].world_view), np.asarray(c1.world_view),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(path[-1].world_view), np.asarray(c2.world_view),
        atol=1e-5,
    )
    # midpoints are valid cameras looking roughly at the origin
    mid = path[2]
    center = np.asarray(mid.camera_center)
    assert 1.5 < np.linalg.norm(center) < 2.5
