"""Halo-exchange grid sharding for the MPM step (shard_map + ppermute).

Replaces the replicated-grid + per-step all-reduce strategy
(``sharding.py::make_sharded_sim_step``) for large grids: the grid's x
axis is sliced into per-device slabs, particles are owned by the slab
their stencil base cell falls in, p2g accumulates into a local
slab+halo buffer, and only the 2-cell halo faces ride the ICI
(``ppermute``) — O(G^2) bytes per step instead of O(G^3).

Per step (slab width ``w``, shard s owning global x-lines
[s*w, s*w + w)):

1. local p2g into a (w+4, G, G) view at origin ``s*w - 2`` via the SAME
   differentiable primitives as the single-device step —
   ``blocked.apic_scatter`` (grid-blocked separable matmuls / Pallas
   kernels on TPU) with a per-shard ``GridGeom`` view. Particles owned
   by s have base_x in [s*w, s*w+w), taps reach [s*w, s*w+w+1]; the
   physical edge clamp can pull taps down to line 0/G-1 which stays
   inside the halo for edge shards;
2. ``ppermute`` the two halo faces each way; neighbors add them into
   their owned rows. Cyclic wrap is harmless: the rows that would wrap
   are identically zero (nothing deposits outside [0, G-1]);
3. ``grid_op`` on the owned slab (global coordinates via the view's
   origin for the box BC);
4. ``ppermute`` the 2 leading owned rows left so each shard holds
   [s*w, s*w + w + 2) of grid velocity — all that g2p's 27-tap gather
   needs;
5. local g2p (``g2p_core`` with the same view + shared block sort) +
   advection.

The whole step is DIFFERENTIABLE: every piece is either a custom-VJP
primitive (scatter/gather — the closed-form tap adjoints), plain AD
(grid_op, tail), or ``ppermute`` (whose transpose is the inverse
permute). Per-step input cotangents are NaN/Inf-scrubbed exactly like
``mpm_step_diff`` / the reference's ``nan_to_num`` (interface.py:65-74).

Ownership is exact when particles are repartitioned each step (the
default in ``make_halo_mpm_step``); the step also emits a ``margin_bad``
flag (an enabled particle's stencil escaped its shard's view) that
callers must treat like the raster pair-budget overflow. New capability
vs the reference (single GPU, SURVEY.md section 5.8); the north-star
item from BASELINE.json.
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

from ..core.types import GridGeom, MPMConstants, ParticleState, Statics
from ..sim.blocked import apic_scatter
from ..sim.mpm import (
    _g2p_tail,
    _p2g_terms,
    g2p_core,
    grid_op,
    scrub_cotangents,
)
from ..sim.p2g_kernel import build_step_layouts

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

    # Counting sort over the (few) shard buckets instead of an
    # N log N argsort: a one-hot cumsum gives each particle its stable
    # rank within its bucket directly (identical order to a stable
    # argsort: by owner, ties by original index). The (N, n_shards)
    # cumsum costs N*S ints of transient memory — past ~32M entries the
    # argsort is the better trade.
    if n * n_shards <= (1 << 25):
        onehot = (
            owner[:, None]
            == jnp.arange(n_shards, dtype=owner.dtype)[None, :]
        ).astype(jnp.int32)  # (N, n_shards)
        incl = jnp.cumsum(onehot, axis=0)  # rank+1 in own bucket
        counts = incl[-1]  # (n_shards,)
        rank = (
            jnp.take_along_axis(incl, owner[:, None], axis=1)[:, 0] - 1
        )
    else:
        order = jnp.argsort(owner, stable=True)
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        shard_start = jnp.searchsorted(
            owner[order],
            jnp.arange(n_shards + 1, dtype=jnp.int32),
            side="left",
        )
        counts = (shard_start[1:] - shard_start[:-1]).astype(jnp.int32)
        rank = inv - shard_start[owner]
    overflow = jnp.any(counts > capacity)

    # Scatter each particle's index into its (shard, rank) slot; ranks
    # past capacity drop (the overflow flag reports it).
    dest = owner * capacity + rank
    dest = jnp.where(rank < capacity, dest, n_shards * capacity)
    src = (
        jnp.zeros((n_shards * capacity,), jnp.int32)
        .at[dest]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        .reshape(n_shards, capacity)
    )
    slots = jnp.arange(capacity, dtype=jnp.int32)
    valid = slots[None, :] < counts[:, None]
    src = jnp.where(valid, src, jnp.clip(src, 0, n - 1))

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
    tol: int = 0,
):
    """Returns ``step(part_statics, part_state, part_stress) ->
    (new_part_state, margin_bad)`` operating on partitioned
    (n_shards, cap, ...) arrays; grid slabs never exist globally.

    Differentiable end to end: p2g runs the blocked ``apic_scatter``
    (Pallas kernels on TPU) into a per-shard ``GridGeom`` view, g2p the
    blocked ``g2p_core`` gather from the exchanged slab, with ONE shared
    per-shard block sort. ``margin_bad`` is a (n_shards,) bool — an
    enabled particle's stencil left its shard's view, so the step's
    output (and its gradients) dropped mass; callers must repartition
    more often or raise capacity.

    ``tol`` is the DRIFT TOLERANCE in cells: with tol > 0 the per-shard
    view widens by ``tol`` on each side (halo_lo = 2 + 0, halo_hi =
    2 + tol low/high asymmetry folded below), so particles may wander
    up to ``tol`` cells outside their bin's slab between repartitions —
    the enabler for amortized (per-frame instead of per-substep)
    repartitioning. Costs O(tol * G^2) extra halo traffic per step."""
    n_shards = mesh.shape[axis]
    g = constants.num_grids
    w = slab_width(g, n_shards)
    # View rows [s*w - lo, s*w + w + hi): a particle with stencil base
    # in [s*w - tol, s*w + w - 1 + tol] has all taps (base .. base+2)
    # inside the view when lo = HALO + tol and hi = HALO + tol.
    lo = HALO + tol
    hi = HALO + tol
    assert w >= max(lo, hi), (
        f"slab width {w} must cover the halo ({max(lo, hi)}): fewer "
        f"shards or a bigger grid"
    )
    size_x = w + lo + hi  # local p2g region rows
    dims = (size_x, g, g)
    # Mirror mpm._step_sort: the blocked path (which consumes the shared
    # sort) only engages past the dense-path crossover.
    blocked = max(dims) > 24

    def local_step(statics, state, stress):
        """Runs per shard under shard_map. Shapes: (1, cap, ...) with
        the leading shard axis carried; we squeeze it."""
        shard = jax.lax.axis_index(axis)
        squeeze = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        statics = squeeze(statics)
        state = squeeze(state)
        stress = stress[0]
        # Per-step cotangent scrub at the step boundary (reference
        # interface.py:65-74; mpm_step_diff bakes the same into its
        # direct adjoint).
        state, stress = scrub_cotangents((state, stress))
        x_lo = shard * w - lo
        zero = jnp.zeros((), jnp.int32)
        geom = GridGeom(
            dims=dims,
            origin=jnp.stack([x_lo.astype(jnp.int32), zero, zero]),
        )

        # -- 0. ownership margin flag ---------------------------------
        # Every enabled particle's stencil must stay inside the view;
        # within ``tol`` cells of drift that holds by construction,
        # past it mass silently leaves — hence the flag.
        base_x = jnp.floor(
            state.x[:, 0] * constants.inv_dx - 0.5
        ).astype(jnp.int32)
        base_c = jnp.clip(base_x, 0, g - 1)
        in_window = (base_c >= shard * w - tol) & (
            base_c <= shard * w + w - 1 + tol
        )
        margin_bad = jnp.any((statics.enabled > 0) & ~in_window)

        sort = (
            build_step_layouts(constants, state.x, geom=geom)
            if blocked
            else None
        )

        # -- 1. local p2g over the slab+halo view ----------------------
        mass, b, affine = _p2g_terms(constants, statics, state, stress)
        grid_m, grid_f = apic_scatter(
            constants, state.x, mass, b, affine, sort, geom
        )
        grid_m = grid_m.reshape(size_x, g * g)
        grid_f = grid_f.reshape(size_x, g * g, 3)

        # -- 2. halo exchange of mass/momentum faces ------------------
        # rows [0, lo) belong to the left neighbor's slab; rows
        # [lo+w, size_x) to the right's. Cyclic wrap adds only
        # identically-zero rows (nothing deposits outside [0, G-1]).
        right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        left = [(i, (i - 1) % n_shards) for i in range(n_shards)]

        def send(rows_m, rows_f, perm):
            m = jax.lax.ppermute(rows_m, axis, perm)
            f = jax.lax.ppermute(rows_f, axis, perm)
            return m, f

        lo_m, lo_f = send(grid_m[:lo], grid_f[:lo], left)
        hi_m, hi_f = send(grid_m[lo + w :], grid_f[lo + w :], right)
        own_m = grid_m[lo : lo + w]
        own_f = grid_f[lo : lo + w]
        # left-neighbor's hi face lands on our leading rows; right's lo
        # face on our trailing rows.
        own_m = own_m.at[:hi].add(hi_m).at[w - lo :].add(lo_m)
        own_f = own_f.at[:hi].add(hi_f).at[w - lo :].add(lo_f)

        # -- 3. grid_op on the owned slab (global coords via origin) --
        geom_own = GridGeom(
            dims=(w, g, g),
            origin=jnp.stack([(shard * w).astype(jnp.int32), zero, zero]),
        )
        v = grid_op(
            constants,
            own_m.reshape(-1),
            own_f.reshape(-1, 3),
            geom_own,
        ).reshape(w, g * g, 3)

        # -- 4. exchange owned velocity rows so the whole view is
        # tappable: the right neighbor's leading ``hi`` rows extend the
        # top; with drift (tol > 0) the LOW side is tappable too, so
        # the left neighbor's trailing ``lo`` rows fill view rows
        # [0, lo). Exact ownership (tol == 0) never taps those rows —
        # zeros skip the second ppermute.
        lead = jax.lax.ppermute(v[:hi], axis, left)  # from the right
        if tol > 0:
            trail = jax.lax.ppermute(
                v[w - lo :], axis, right
            )  # from the left
        else:
            trail = jnp.zeros((lo,) + v.shape[1:], v.dtype)
        # Edge wrap safety: shard 0's "left" rows carry shard n-1's
        # velocities, but global clamping keeps every tap at local row
        # >= lo for shard 0 (taps clamp to line >= 0), so wrapped rows
        # are never tapped; symmetrically at the top.
        v_full = jnp.concatenate([trail, v, lead], axis=0)

        # -- 5. local g2p + advection ----------------------------------
        new_v, new_C = g2p_core(
            constants, state.x, v_full.reshape(-1, 3), sort, geom
        )
        out = _g2p_tail(constants, statics, state, new_v, new_C)
        return (
            jax.tree_util.tree_map(lambda a: a[None], out),
            margin_bad[None],
        )

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
        out_specs=(
            jax.tree_util.tree_map(
                lambda _: pspec, ParticleState(x=0, v=0, C=0, F=0)
            ),
            pspec,
        ),
    )
    return step


def make_halo_mpm_step(
    constants: MPMConstants,
    statics: Statics,
    mesh: Mesh,
    axis: str = "dp",
    capacity: Optional[int] = None,
    tol: int = 0,
):
    """The trainer-facing halo step: ``step(state, stress) ->
    (new_state, overflow)`` on GLOBAL (N, ...) particle arrays.

    Each call repartitions particles into per-shard slab bins (exact
    ownership — the margin flag can then only fire on pathological
    inputs), runs the differentiable halo-exchange step, and scatters
    the bins back. ``overflow`` ORs the bin-capacity overflow with the
    ownership-margin flag; training loops must surface it exactly like
    the raster pair-budget flag (gradients are wrong once it fires).

    ``capacity`` is the static per-shard bin size; default N (always
    safe — particles may cluster in one slab). Deployments shard scenes
    whose extent spans the box and can lower it to ~N/n_shards * slack.

    For amortized repartitioning (bins carried across a substep scan,
    repartition once per frame) compose the pieces directly — see
    ``make_halo_bins_step`` and ``train/grounding.py``'s halo branch.
    """
    n_shards = mesh.shape[axis]
    inner = make_halo_sim_step(constants, mesh, axis, tol=tol)

    def step(state: ParticleState, stress: jnp.ndarray):
        n = state.x.shape[0]
        cap = capacity if capacity is not None else n
        part = partition_particles(
            constants, state, statics, n_shards, cap
        )
        stress_b = stress[part.perm]
        stress_b = jnp.where(
            part.valid[..., None, None], stress_b, 0.0
        )
        new_bins, margin_bad = inner(part.statics, part.state, stress_b)
        new_state = unpartition(
            dataclasses.replace(part, state=new_bins), n, state
        )
        overflow = part.overflow | jnp.any(margin_bad)
        return new_state, overflow

    return step


def make_halo_bins_step(
    constants: MPMConstants,
    mesh: Mesh,
    axis: str = "dp",
    tol: int = 2,
):
    """Bins-space halo step for AMORTIZED repartitioning: ``step(
    part_statics, bins_state, bins_stress) -> (new_bins, margin_bad)``
    stays entirely in (n_shards, cap, ...) layout, so a substep scan
    can carry the bins and repartition only once per frame — the
    per-substep global argsort + gather/scatter of the exact-ownership
    wrapper disappears from the inner loop.

    ``tol`` cells of drift are tolerated (the halo widens accordingly);
    under CFL (particles move well under one cell per substep) a whole
    frame of substeps fits comfortably in tol=2. ``margin_bad`` fires
    when any enabled particle drifted past the tolerance — callers must
    surface it like the raster pair-budget overflow."""
    return make_halo_sim_step(constants, mesh, axis, tol=tol)
