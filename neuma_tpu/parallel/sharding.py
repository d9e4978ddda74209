"""SPMD sharding of the simulation + training step over a TPU mesh.

New capability vs. the reference (single-GPU only, SURVEY.md sections 2.3 /
5.8): scale-out follows the standard JAX recipe — pick a mesh, annotate
shardings, let XLA insert collectives:

* **Particles** are sharded along the batch ('dp') axis: p2g runs
  per-shard into per-device partial grids that XLA all-reduces (psum) —
  the TPU analogue of atomic scatter-adds racing on one GPU.
* **Grid ops** are elementwise on the (small) replicated grid.
* **G2P** gathers from the replicated grid into the local particle shard:
  no communication.
* **Material parameters** are replicated; their gradients are all-reduced
  automatically by GSPMD when the loss is a scalar.

For the rasterizer, views (cameras) provide a second natural parallel
axis; per-tile sharding of the compositing scan rides the same mesh.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import MPMConstants, ParticleState, Statics
from ..sim.mpm import g2p, grid_op, p2g


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(arr: jnp.ndarray, multiple: int, axis: int = 0):
    """Pad the particle axis so it divides the mesh; returns (padded, n)."""
    n = arr.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arr, n
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, target - n)
    return jnp.pad(arr, pad_widths), n


def pad_scene_particles(state: ParticleState, statics: Statics, multiple: int):
    """Pad state+statics to a multiple of the mesh size; padded particles
    are DISABLED (enabled=0) so they contribute nothing to p2g and stay
    frozen in g2p."""
    x, n = pad_to_multiple(state.x, multiple)
    v, _ = pad_to_multiple(state.v, multiple)
    C, _ = pad_to_multiple(state.C, multiple)
    F0, _ = pad_to_multiple(state.F, multiple)
    # Padded F must stay identity (not zero) to keep materials well-posed.
    if F0.shape[0] != n:
        mask = (jnp.arange(F0.shape[0]) < n)[:, None, None]
        F0 = jnp.where(mask, F0, jnp.eye(3, dtype=F0.dtype))
    vol, _ = pad_to_multiple(statics.vol, multiple)
    rho, _ = pad_to_multiple(statics.rho, multiple)
    clip, _ = pad_to_multiple(statics.clip_bound, multiple)
    enabled, _ = pad_to_multiple(statics.enabled, multiple)
    return (
        ParticleState(x=x, v=v, C=C, F=F0),
        Statics(vol=vol, rho=rho, clip_bound=clip, enabled=enabled),
        n,
    )


def shard_particles(tree, mesh: Mesh, axis: str = "dp"):
    """Place per-particle arrays sharded along their leading dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def tile_sharding(mesh: Mesh, axis: str = "dp"):
    """NamedSharding that splits the rasterizer's image-tile dimension
    over ``axis`` — tiles composite independently, so passing this as
    ``RasterConfig.tile_sharding`` makes GSPMD split the jnp composite's
    whole segment scan across devices (the per-gaussian attribute
    tables stay replicated; the assembled image is gathered at the
    loss). The third rasterizer parallel axis next to particles (dp)
    and views (vp)."""
    return NamedSharding(mesh, P(axis))


def make_sharded_sim_step(
    constants: MPMConstants, mesh: Mesh, axis: str = "dp"
):
    """One MPM step with explicit sharding constraints: particle tensors
    stay sharded on ``axis``; the grid is replicated (XLA turns the
    per-shard scatter-adds into partial grids + all-reduce)."""
    pspec = NamedSharding(mesh, P(axis))
    rspec = NamedSharding(mesh, P())

    def constrain_particles(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, pspec), tree
        )

    def step(statics: Statics, state: ParticleState, stress: jnp.ndarray):
        state = constrain_particles(state)
        stress = jax.lax.with_sharding_constraint(stress, pspec)
        grid_m, grid_mv = p2g(constants, statics, state, stress)
        grid_m = jax.lax.with_sharding_constraint(grid_m, rspec)
        grid_mv = jax.lax.with_sharding_constraint(grid_mv, rspec)
        grid_v = grid_op(constants, grid_m, grid_mv)
        new_state = g2p(constants, statics, state, grid_v)
        return constrain_particles(new_state)

    return step
