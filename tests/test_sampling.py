"""Mesh IO, point-in-mesh, sampling modes, native sampler, data prep."""
import os
from pathlib import Path

import numpy as np
import pytest

from neuma_tpu.data.mesh import TriMesh, load_mesh, make_icosphere
from neuma_tpu.data.prepare import load_prepared, prepare_simulation_data
from neuma_tpu.data.sampling import (
    NATIVE_SAMPLER,
    sample_particles,
    surface_sampling,
    uniform_sampling,
    volumetric_sampling,
)


def test_icosphere_geometry():
    mesh = make_icosphere(radius=1.0, subdivisions=3)
    # Volume approaches 4/3 pi for a fine sphere.
    assert abs(mesh.volume - 4.18879) < 0.15
    # Containment: center in, far point out.
    inside = mesh.contains(
        np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 0.9, 0.0]])
    )
    assert inside.tolist() == [True, False, True]


def test_uniform_sampling_inside():
    mesh = make_icosphere(radius=0.5, subdivisions=2)
    pts = uniform_sampling(mesh, resolution=12)
    assert len(pts) > 50
    r = np.linalg.norm(pts, axis=1)
    assert np.all(r <= 0.52)
    # density ~ volume ratio of sphere to box
    frac = len(pts) / 12 ** 3
    assert 0.3 < frac < 0.7


def test_surface_sampling_on_surface(rng):
    mesh = make_icosphere(radius=0.5, subdivisions=3)
    pts = surface_sampling(mesh, 500, rng)
    r = np.linalg.norm(pts, axis=1)
    assert np.all(np.abs(r - 0.5) < 0.03)


def test_volumetric_sampling_native_and_fallback(tmp_path):
    mesh = make_icosphere(radius=0.4, subdivisions=2)
    pts = volumetric_sampling(mesh, resolution=16)
    assert len(pts) > 100
    r = np.linalg.norm(pts, axis=1)
    assert np.all(r <= 0.42)
    if NATIVE_SAMPLER.is_file():
        # Native path exercised above when built; check lattice spacing
        # roughly matches the radius contract.
        d_min = np.min(
            np.linalg.norm(pts[:1] - pts[1:], axis=1)
        )
        assert d_min > 0.4 / 16 * 0.5


def test_obj_roundtrip(tmp_path):
    mesh = make_icosphere(radius=0.5, subdivisions=1)
    path = tmp_path / "mesh.obj"
    mesh.export_obj(path)
    loaded = load_mesh(path)
    assert loaded.vertices.shape == mesh.vertices.shape
    assert loaded.faces.shape == mesh.faces.shape
    np.testing.assert_allclose(loaded.volume, mesh.volume, rtol=1e-5)


def test_prepare_simulation_data(tmp_path, rng):
    from neuma_tpu.render.gaussians import create_from_points

    # Fabricate a kernels PLY.
    pts = (0.1 * rng.standard_normal((60, 3))).astype(np.float32)
    pack = create_from_points(pts, rng.random((60, 3)).astype(np.float32),
                              sh_degree=2)
    kernels_path = tmp_path / "raw_kernels.ply"
    pack.to_ply(kernels_path)

    mesh = make_icosphere(radius=0.25, subdivisions=2)
    mesh_path = tmp_path / "mesh.obj"
    mesh.export_obj(mesh_path)

    save_dir = tmp_path / "prep"
    prepare_simulation_data(
        save_dir,
        kernels_path,
        mesh_path=mesh_path,
        mesh_sample_mode="uniform",
        mesh_sample_resolution=14,
        sh_degree=2,
        particles_downsample_factor=1,
        max_particles=8,
    )
    gaussians, particles, table = load_prepared(save_dir, sh_degree=2)
    assert gaussians.num_gaussians <= 60  # pruned
    counts = np.asarray(table.counts())
    assert np.all(counts > 0)  # every kernel bound after injection
    # idempotent
    prepare_simulation_data(
        save_dir, kernels_path, mesh_path=mesh_path, sh_degree=2
    )
