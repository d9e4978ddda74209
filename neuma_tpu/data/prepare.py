"""Simulation data preparation: prune Gaussians, sample particles,
compute the two-pass binding, persist artifacts.

Behavioral spec: reference ``prepare_simulation_data``
(``modules/tune/utils.py:212-320``): idempotent (skips when kernels.ply /
particles.ply / bindings.npz exist); prunes opacity < threshold; samples
particles from a pcd or mesh; first binding pass finds Gaussians with no
bound particles and injects their centers as extra particles; second
pass computes the final weighted binding.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..render.binding import BindingTable, compute_binding_table
from ..render.gaussians import GaussianPack
from .ply import load_ply_points, save_ply_points
from .sampling import sample_particles


def prepare_simulation_data(
    save_dir: Path,
    kernels_path: Path,
    particles_path: Optional[Path] = None,
    mesh_path: Optional[Path] = None,
    mesh_sample_mode: str = "volumetric",
    mesh_sample_resolution: int = 30,
    sh_degree: int = 3,
    opacity_thres: float = 0.02,
    particles_downsample_factor: int = 3,
    confidence: float = 0.95,
    max_particles: int = 10,
    seed: int = 0,
) -> None:
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    if (
        (save_dir / "kernels.ply").is_file()
        and (save_dir / "particles.ply").is_file()
        and (save_dir / "bindings.npz").is_file()
    ):
        print("Data already prepared. Skipping data preparation.")
        return

    print("Start preparing data for simulation.")
    gaussians = GaussianPack.from_ply(kernels_path, sh_degree)
    opacity = np.asarray(gaussians.get_opacity).squeeze(-1)
    retain = opacity > opacity_thres
    print(f"Gaussians after pruning low opacity kernels: {retain.sum()}")
    gaussians = gaussians.masked(retain)
    gaussians.to_ply(save_dir / "kernels.ply")

    rng = np.random.default_rng(seed)
    if particles_path is not None:
        particles = load_ply_points(particles_path).astype(np.float32)
    elif mesh_path is not None:
        particles = sample_particles(
            mesh_path, mesh_sample_mode, mesh_sample_resolution, rng
        ).astype(np.float32)
    else:
        raise ValueError(
            "Either 'particles_path' or 'mesh_path' must be provided."
        )

    # random downsample (reference tune/utils.py:270-273)
    perm = rng.permutation(particles.shape[0])
    particles = particles[perm][::particles_downsample_factor]

    # pass 1: find kernels with zero bound particles, inject centers
    table_pre = compute_binding_table(
        gaussians,
        jnp.asarray(particles),
        confidence=confidence,
        max_particles=max_particles,
    )
    unbound = np.asarray(table_pre.counts()) == 0
    to_clone = np.asarray(gaussians.xyz)[unbound]
    print(f"Particles to be added: {to_clone.shape}")
    particles = np.concatenate([particles, to_clone], axis=0)

    # pass 2: final weighted binding
    table = compute_binding_table(
        gaussians,
        jnp.asarray(particles),
        confidence=confidence,
        max_particles=max_particles,
    )
    counts = np.asarray(table.counts())
    assert np.all(counts > 0), (
        f"{(counts == 0).sum()} kernels still unbound after injection"
    )

    save_ply_points(save_dir / "particles.ply", particles)
    table.save(save_dir / "bindings.npz")
    np.save(save_dir / "n_particles.npy", counts)
    print(
        f"Data preparation done: {particles.shape[0]} particles, "
        f"avg binding {counts.mean():.1f}, max {counts.max()}"
    )


def load_prepared(save_dir: Path, sh_degree: int = 3):
    save_dir = Path(save_dir)
    gaussians = GaussianPack.from_ply(save_dir / "kernels.ply", sh_degree)
    particles = load_ply_points(save_dir / "particles.ply")
    table = BindingTable.load(save_dir / "bindings.npz")
    return gaussians, particles, table
