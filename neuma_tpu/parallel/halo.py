"""Halo-exchange grid sharding for the MPM step (shard_map + ppermute).

Replaces the replicated-grid + per-step all-reduce strategy
(``sharding.py::make_sharded_sim_step``) for large grids: the grid's x
axis is sliced into per-device slabs, particles are owned by the slab
their stencil base cell falls in, p2g accumulates into a local
slab+halo buffer, and only the 2-cell halo faces ride the ICI
(``ppermute``) — O(G^2) bytes per step instead of O(G^3).

Per step (slab width ``w``, shard s owning global x-lines
[s*w, s*w + w)):

1. local p2g into a (w+4, G, G) region at origin ``s*w - 2`` (particles
   owned by s have base_x in [s*w, s*w+w), taps reach [s*w, s*w+w+1];
   the physical edge clamp can pull taps down to line 0/G-1 which stays
   inside the halo for edge shards);
2. ``ppermute`` the two halo faces each way; neighbors add them into
   their owned rows. Cyclic wrap is harmless: the rows that would wrap
   are identically zero (nothing deposits outside [0, G-1]);
3. grid_op on the owned slab with global coordinates for the box BC;
4. ``ppermute`` the 2 leading owned rows left so each shard holds
   [s*w, s*w + w + 2) of grid velocity — all that g2p's 27-tap gather
   needs;
5. local g2p + advection.

Ownership is recomputed (particles re-sorted into fixed-capacity
shard bins) every ``repartition_every`` steps; within that window the
halo margin covers CFL-bounded drift. New capability vs the reference
(single GPU, SURVEY.md section 5.8); the north-star item from
BASELINE.json.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import MPMConstants, ParticleState, Statics
from ..sim.mpm import _stencil, p2g_matmul

HALO = 2  # cells of halo on each side of a slab


def slab_width(num_grids: int, n_shards: int) -> int:
    """Smallest slab width covering the grid across n shards."""
    return -(-num_grids // n_shards)


def owner_of(constants: MPMConstants, x: jnp.ndarray, w: int, n: int):
    """Owning shard per particle: by (clamped) stencil base x-line."""
    g = constants.num_grids
    base_x = jnp.floor(x[:, 0] * constants.inv_dx - 0.5).astype(jnp.int32)
    return jnp.clip(base_x, 0, g - 1) // w


@dataclasses.dataclass
class Partition:
    """Fixed-capacity per-shard particle bins (leading axis = shard)."""

    state: ParticleState  # (n_shards, cap, ...)
    statics: Statics  # (n_shards, cap, ...)
    perm: jnp.ndarray  # (n_shards, cap) source index (clipped)
    valid: jnp.ndarray  # (n_shards, cap) bool
    overflow: jnp.ndarray  # () bool — a bin exceeded capacity


def partition_particles(
    constants: MPMConstants,
    state: ParticleState,
    statics: Statics,
    n_shards: int,
    capacity: int,
) -> Partition:
    """Sort particles into per-shard slab bins (static shapes).

    Overflowing particles are dropped from the step and flagged —
    callers must treat ``overflow`` like the raster pair budget: enlarge
    ``capacity`` and rerun. Padding slots are disabled clones of
    particle 0 (enabled=0 contributes nothing and stays frozen)."""
    n = state.x.shape[0]
    w = slab_width(constants.num_grids, n_shards)
    owner = owner_of(constants, state.x, w, n_shards)

    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    # rank within shard = position - first position of this shard
    shard_start = jnp.searchsorted(
        sorted_owner, jnp.arange(n_shards + 1, dtype=jnp.int32),
        side="left",
    )
    counts = shard_start[1:] - shard_start[:-1]
    overflow = jnp.any(counts > capacity)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    pos = shard_start[:-1, None] + slots[None, :]  # (n_shards, cap)
    valid = slots[None, :] < counts[:, None]
    src = order[jnp.clip(pos, 0, n - 1)]  # (n_shards, cap)

    def take(arr):
        return arr[src]

    part_state = ParticleState(
        x=take(state.x),
        v=take(state.v),
        C=take(state.C),
        F=jnp.where(
            valid[..., None, None],
            take(state.F),
            jnp.eye(3, dtype=state.F.dtype),
        ),
    )
    part_statics = Statics(
        vol=take(statics.vol),
        rho=take(statics.rho),
        clip_bound=take(statics.clip_bound),
        enabled=jnp.where(valid, take(statics.enabled), 0),
    )
    return Partition(
        state=part_state,
        statics=part_statics,
        perm=src,
        valid=valid,
        overflow=overflow,
    )


def unpartition(part: Partition, n: int, template: ParticleState) -> ParticleState:
    """Scatter bins back to the original particle order.

    Particles absent from the bins (dropped on capacity overflow) keep
    their ``template`` state — they freeze in place for the step rather
    than being silently zeroed, so a missed overflow flag degrades
    gracefully."""

    def put(binned, orig):
        flat_src = part.perm.reshape(-1)
        flat_val = binned.reshape((-1,) + binned.shape[2:])
        mask = part.valid.reshape(-1)
        flat_src = jnp.where(mask, flat_src, n)  # dump padding
        pad = jnp.zeros((1,) + orig.shape[1:], orig.dtype)
        out = jnp.concatenate([orig, pad], axis=0)
        out = out.at[flat_src].set(flat_val)
        return out[:n]

    return ParticleState(
        x=put(part.state.x, template.x),
        v=put(part.state.v, template.v),
        C=put(part.state.C, template.C),
        F=put(part.state.F, template.F),
    )


def make_halo_sim_step(
    constants: MPMConstants,
    mesh: Mesh,
    axis: str = "dp",
):
    """Returns ``step(part_statics, part_state, part_stress) ->
    new_part_state`` operating on partitioned (n_shards, cap, ...)
    arrays; grid slabs never exist globally."""
    n_shards = mesh.shape[axis]
    g = constants.num_grids
    w = slab_width(g, n_shards)
    size_x = w + 2 * HALO  # local p2g region rows
    dtype = jnp.float32

    dt = constants.dt
    inv_dx = constants.inv_dx
    dx = constants.dx

    def local_step(statics, state, stress):
        """Runs per shard under shard_map. Shapes: (1, cap, ...) with
        the leading shard axis carried; we squeeze it."""
        shard = jax.lax.axis_index(axis)
        squeeze = lambda t: jax.tree_util.tree_map(
            lambda a: a[0], t
        )
        statics = squeeze(statics)
        state = squeeze(state)
        stress = stress[0]
        x_lo = shard * w - HALO

        # -- 1. local p2g over the slab+halo region -------------------
        grid_m, grid_mv = p2g_matmul(
            constants, statics, state, stress,
            chunk=1 << 30,  # single pass per shard
            region=((x_lo, size_x), (0, g), (0, g)),
        )
        grid_m = grid_m.reshape(size_x, g * g)
        grid_mv = grid_mv.reshape(size_x, g * g, 3)

        # -- 2. halo exchange of mass/momentum faces ------------------
        # rows [0, HALO) belong to the left neighbor's slab; rows
        # [HALO+w, size_x) to the right's.
        right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        left = [(i, (i - 1) % n_shards) for i in range(n_shards)]

        def send(rows_m, rows_mv, perm):
            m = jax.lax.ppermute(rows_m, axis, perm)
            mv = jax.lax.ppermute(rows_mv, axis, perm)
            return m, mv

        lo_m, lo_mv = send(grid_m[:HALO], grid_mv[:HALO], left)
        hi_m, hi_mv = send(
            grid_m[HALO + w :], grid_mv[HALO + w :], right
        )
        own_m = grid_m[HALO : HALO + w]
        own_mv = grid_mv[HALO : HALO + w]
        # left-neighbor's hi face lands on our leading rows; right's lo
        # face on our trailing rows.
        own_m = own_m.at[:HALO].add(hi_m).at[w - HALO :].add(lo_m)
        own_mv = own_mv.at[:HALO].add(hi_mv).at[w - HALO :].add(lo_mv)

        # -- 3. grid_op on the owned slab (global coords for BC) ------
        gv = constants.gravity.astype(dtype) * dt
        has_mass = own_m > 0.0
        denom = jnp.where(has_mass, own_m + constants.eps, 1.0)[..., None]
        v = jnp.where(has_mass[..., None], own_mv / denom + gv, gv)

        rows = shard * w + jnp.arange(w, dtype=jnp.int32)  # global x
        yz = jnp.arange(g * g, dtype=jnp.int32)
        py = yz // g
        pz = yz % g
        coords = jnp.stack(
            [
                jnp.broadcast_to(rows[:, None], (w, g * g)),
                jnp.broadcast_to(py[None, :], (w, g * g)),
                jnp.broadcast_to(pz[None, :], (w, g * g)),
            ],
            axis=-1,
        )
        bound = constants.bound
        lo_v = coords < bound
        hi_v = coords >= (g - bound)
        neg = v < 0.0
        pos = v > 0.0
        violating = (lo_v & neg) | (hi_v & pos)
        if constants.bc == "freeslip":
            v = jnp.where(violating, 0.0, v)
        elif constants.bc == "noslip":
            v = jnp.where(
                jnp.any(violating, axis=-1, keepdims=True), 0.0, v
            )
        else:
            raise ValueError(f"invalid boundary condition: {constants.bc}")

        # -- 4. gather the 2 leading rows of the RIGHT neighbor -------
        lead = jax.lax.ppermute(v[:HALO], axis, left)
        v_ext = jnp.concatenate([v, lead], axis=0)  # (w+2, G^2)

        # -- 5. local g2p + advection (global math, local rows) -------
        base, weight, dpos, _ = _stencil(constants, state.x)
        cells = base[:, None, :] + jnp.asarray(
            np.stack(
                np.meshgrid(
                    np.arange(3), np.arange(3), np.arange(3),
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(27, 3),
            jnp.int32,
        )
        cells = jnp.clip(cells, 0, g - 1)
        local_x = jnp.clip(cells[..., 0] - shard * w, 0, w + HALO - 1)
        flat = local_x * (g * g) + cells[..., 1] * g + cells[..., 2]
        v_taps = v_ext.reshape(-1, 3)[flat]  # (N, 27, 3)
        new_v = jnp.einsum("no,noi->ni", weight, v_taps)
        new_C = (4.0 * inv_dx * inv_dx) * jnp.einsum(
            "no,noi,noj->nij", weight, v_taps, dpos
        )
        eye = jnp.eye(3, dtype=dtype)
        new_F = (eye + dt * new_C) @ state.F
        clip = (statics.clip_bound * dx)[:, None]
        new_x = jnp.clip(state.x + dt * new_v, clip, 1.0 - clip)

        en = (statics.enabled > 0)[:, None]
        out = ParticleState(
            x=jnp.where(en, new_x, state.x),
            v=jnp.where(en, new_v, state.v),
            C=jnp.where(en[..., None], new_C, state.C),
            F=jnp.where(en[..., None], new_F, state.F),
        )
        return jax.tree_util.tree_map(lambda a: a[None], out)

    pspec = P(axis)
    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: pspec, Statics(
                vol=0, rho=0, clip_bound=0, enabled=0)),
            jax.tree_util.tree_map(lambda _: pspec, ParticleState(
                x=0, v=0, C=0, F=0)),
            pspec,
        ),
        out_specs=jax.tree_util.tree_map(
            lambda _: pspec, ParticleState(x=0, v=0, C=0, F=0)
        ),
    )
    return step
