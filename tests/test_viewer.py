"""Viewer: instance rollout caching + HTTP endpoints."""
import json
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from neuma_tpu.core.types import MPMConstants
from neuma_tpu.materials import CorotatedElasticity, IdentityPlasticity
from neuma_tpu.render.binding import compute_binding_table
from neuma_tpu.render.camera import Camera
from neuma_tpu.render.gaussians import create_from_points
from neuma_tpu.render.rasterize import RasterConfig
from neuma_tpu.sim.initializers import MPMInitData
from neuma_tpu.vis.instance import NeuMAInstance, SceneObject
from neuma_tpu.vis.viewer import DynamicViewer


def make_instance(rng, frames=3):
    n = 100
    pts = (0.45 + 0.1 * rng.random((n, 3))).astype(np.float32)
    pack = create_from_points(
        pts, rng.random((n, 3)).astype(np.float32), sh_degree=0
    )
    table = compute_binding_table(pack, jnp.asarray(pts), max_particles=6)
    elasticity = CorotatedElasticity({"E": 1e4, "nu": 0.3})
    plasticity = IdentityPlasticity()
    init_data = MPMInitData.from_points(
        pts, total_volume=0.001, rho=1000.0, clip_bound=0.1,
        span=(0, 10**9),
    )
    constants = MPMConstants(
        num_grids=16, bound=2, bc="freeslip",
        dt=jnp.float32(5e-4),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    obj = SceneObject(
        name="blob",
        gaussians=pack,
        binding=table,
        elasticity=elasticity,
        plasticity=plasticity,
        params_e=elasticity.init(),
        params_p=plasticity.init(),
        init_data=init_data,
    )
    return NeuMAInstance(
        constants,
        [obj],
        num_frames=frames,
        raster_cfg=RasterConfig(
            max_pairs=4096, max_per_tile=32, segment=8
        ),
    )


def test_instance_simulate_and_render(rng):
    inst = make_instance(rng)
    inst.simulate()
    assert len(inst.frames) == 3
    cam = Camera.look_at(
        eye=np.array([0.5, 0.6, -1.0]),
        target=np.array([0.5, 0.5, 0.5]),
        width=64, height=64,
    )
    img = inst.render_frame(0, cam)
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.uint8


def test_viewer_http_endpoints(rng):
    inst = make_instance(rng, frames=2)
    viewer = DynamicViewer(inst, width=64, height=64)
    server = viewer.serve(port=0, blocking=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "NeuMA-TPU Viewer" in page
        info = json.loads(
            urllib.request.urlopen(base + "/info").read()
        )
        assert info["num_frames"] == 2
        assert info["objects"][0]["name"] == "blob"
        img = urllib.request.urlopen(
            base + "/render?frame=1&ex=0.5&ey=0.6&ez=-1.0"
            "&tx=0.5&ty=0.5&tz=0.5"
        ).read()
        assert img[:2] == b"\xff\xd8"  # JPEG magic
        # resimulate with object disabled -> zero frames? (no objects)
        req = urllib.request.Request(
            base + "/resimulate",
            data=json.dumps({"objects": {"blob": True}}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req)
    finally:
        server.shutdown()


def test_viewer_camera_path(rng):
    inst = make_instance(rng, frames=2)
    viewer = DynamicViewer(inst, width=48, height=48)
    server = viewer.serve(port=0, blocking=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            base + "/render_path",
            data=json.dumps(
                {
                    "keyframes": [
                        {"eye": [0.5, 0.6, -1.0], "target": [0.5, 0.5, 0.5]},
                        {"eye": [-1.0, 0.6, 0.5], "target": [0.5, 0.5, 0.5]},
                    ],
                    "steps_per_segment": 3,
                }
            ).encode(),
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        from pathlib import Path

        assert Path(resp["path"]).exists()
    finally:
        server.shutdown()


def make_meta_instance(rng, frames=2):
    """Instance with LoRA-bearing meta materials + an adaptor registry,
    for the simulation-panel tests."""
    import jax

    from neuma_tpu.materials import (
        InvariantFullMetaElasticity,
        InvariantFullMetaPlasticity,
        MetaMaterialConfig,
    )

    n = 80
    pts = (0.45 + 0.1 * rng.random((n, 3))).astype(np.float32)
    pack = create_from_points(
        pts, rng.random((n, 3)).astype(np.float32), sh_degree=0
    )
    table = compute_binding_table(pack, jnp.asarray(pts), max_particles=6)
    cfg = MetaMaterialConfig(layer_widths=(16, 16))
    elasticity = InvariantFullMetaElasticity(cfg)
    plasticity = InvariantFullMetaPlasticity(cfg)
    key = jax.random.PRNGKey(0)
    pe = jax.tree_util.tree_map(lambda x: 0.05 * x, elasticity.init(key))
    pp = jax.tree_util.tree_map(
        lambda x: 0.05 * x, plasticity.init(jax.random.fold_in(key, 1))
    )
    pe = elasticity.init_lora(pe, key, r=4, alpha=4)
    pp = plasticity.init_lora(pp, jax.random.fold_in(key, 2), r=4, alpha=4)
    init_data = MPMInitData.from_points(
        pts, total_volume=0.001, rho=1000.0, clip_bound=0.1,
        span=(0, 10**9),
    )
    constants = MPMConstants(
        num_grids=16, bound=2, bc="freeslip",
        dt=jnp.float32(5e-4),
        gravity=jnp.asarray([0, -9.8, 0], jnp.float32),
        eps=jnp.float32(6e-7),
    )
    obj = SceneObject(
        name="blob",
        gaussians=pack,
        binding=table,
        elasticity=elasticity,
        plasticity=plasticity,
        params_e=pe,
        params_p=pp,
        init_data=init_data,
        adaptor="jelly",
    )
    registry = {
        "jelly": {"params_e": pe, "params_p": pp},
        "sand": {
            "params_e": jax.tree_util.tree_map(lambda x: 0.5 * x, pe),
            "params_p": jax.tree_util.tree_map(lambda x: 0.5 * x, pp),
        },
    }
    return NeuMAInstance(
        constants,
        [obj],
        num_frames=frames,
        raster_cfg=RasterConfig(
            max_pairs=4096, max_per_tile=32, segment=8
        ),
        adaptor_registry=registry,
    )


def test_apply_object_settings(rng):
    """Panel edits: drop_vel negative along up axis, weight rewrites
    lora_scale leaves, adaptor switch swaps params."""
    import jax

    inst = make_meta_instance(rng)
    obj = inst.objects[0]
    inst.apply_object_settings(
        "blob", {"drop_vel": 0.4, "weight": 0.25, "exists": True}
    )
    np.testing.assert_allclose(obj.init_data.lin_vel, [0, -0.4, 0])
    scales = [
        float(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            obj.params_e
        )[0]
        if "lora_scale" in str(path)
    ]
    assert scales and all(abs(s - 0.25) < 1e-6 for s in scales)

    before = obj.params_e
    inst.apply_object_settings("blob", {"adaptor": "sand"})
    assert obj.adaptor == "sand"
    assert obj.params_e is not before

    inst.apply_object_settings("blob", {"exists": False})
    assert not obj.enabled


def test_viewer_resimulate_with_panel_settings(rng):
    """/resimulate accepts the full per-object settings payload and
    /info reports sliders + adaptors (reference simulation panel)."""
    inst = make_meta_instance(rng)
    viewer = DynamicViewer(inst, width=48, height=48)
    server = viewer.serve(port=0, blocking=False)
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        d = json.loads(urllib.request.urlopen(base + "/info").read())
        assert d["adaptors"] == ["jelly", "sand"]
        o = d["objects"][0]
        assert set(o) >= {"name", "enabled", "drop_vel", "weight",
                          "adaptor"}

        req = urllib.request.Request(
            base + "/resimulate",
            data=json.dumps(
                {
                    "objects": {
                        "blob": {
                            "exists": True,
                            "drop_vel": 0.3,
                            "weight": 0.5,
                            "adaptor": "sand",
                        }
                    }
                }
            ).encode(),
            method="POST",
        )
        urllib.request.urlopen(req).read()
        d = json.loads(urllib.request.urlopen(base + "/info").read())
        o = d["objects"][0]
        assert o["adaptor"] == "sand"
        assert abs(o["drop_vel"] - 0.3) < 1e-6
        assert abs(o["weight"] - 0.5) < 1e-6
        assert len(inst.frames) == inst.num_frames
        # page embeds the panel controls
        page = urllib.request.urlopen(base + "/").read().decode()
        for needle in ("dropvel", "weight", "adaptor", "Object Exists"):
            assert needle in page
    finally:
        server.shutdown()


def test_spline_path_math():
    """campath.spline_path: passes exactly through keyframes, honors
    per-keyframe transition/hold durations, and closes loops."""
    import numpy as np

    from neuma_tpu.vis.campath import spline_path

    keys = [
        {"eye": [0.0, 0.0, 0.0], "target": [1.0, 0.0, 0.0],
         "hold_sec": 0.1},
        {"eye": [1.0, 1.0, 0.0], "target": [1.0, 1.0, 1.0],
         "transition_sec": 0.5},
        {"eye": [2.0, 0.0, 1.0], "target": [0.0, 1.0, 1.0],
         "transition_sec": 1.0, "fov": 1.1},
    ]
    fps = 10
    frames = spline_path(keys, fps=fps, default_fov=0.8)
    # counts: seg0 = 0.5s*10 = 5, seg1 = 1.0s*10 = 10, +1 final pose,
    # +1 hold repeat at key0 (0.1s*10 = 1).
    assert len(frames) == 5 + 10 + 1 + 1
    eyes = np.array([f[0] for f in frames])
    # Passes through the keyframes: key0 at index 0 (and its hold
    # repeat at 1), key1 right after seg0 (+1 hold offset), key2 last.
    np.testing.assert_allclose(eyes[0], keys[0]["eye"], atol=1e-9)
    np.testing.assert_allclose(eyes[1], keys[0]["eye"], atol=1e-9)
    np.testing.assert_allclose(eyes[1 + 5], keys[1]["eye"], atol=1e-9)
    np.testing.assert_allclose(eyes[-1], keys[2]["eye"], atol=1e-9)
    # fov blends to the final keyframe's 1.1.
    assert abs(frames[-1][2] - 1.1) < 1e-9
    assert abs(frames[0][2] - 0.8) < 1e-9

    # Loop: k segments, no duplicated final pose, trajectory returns
    # toward key0 (last sample is one step before key0).
    loop_frames = spline_path(
        [dict(k, hold_sec=0) for k in keys], fps=fps, loop=True,
        default_transition_sec=0.5,
    )
    assert len(loop_frames) == 5 + 10 + 5  # key0.transition default 0.5
    np.testing.assert_allclose(
        loop_frames[0][0], keys[0]["eye"], atol=1e-9
    )


def test_spline_path_smoother_than_linear():
    """The spline's interior samples bend toward neighboring keyframes
    (not the straight chord): curvature is the editor's whole point."""
    import numpy as np

    from neuma_tpu.vis.campath import spline_path

    keys = [
        {"eye": [0.0, 0.0, 0.0], "target": [0, 0, 1]},
        {"eye": [1.0, 1.0, 0.0], "target": [0, 0, 1]},
        {"eye": [2.0, 0.0, 0.0], "target": [0, 0, 1]},
    ]
    frames = spline_path(keys, fps=10, default_transition_sec=1.0)
    eyes = np.array([f[0] for f in frames])
    mid01 = eyes[5]  # halfway through segment 0
    chord = 0.5 * (np.array(keys[0]["eye"]) + np.array(keys[1]["eye"]))
    assert np.linalg.norm(mid01 - chord) > 1e-3
