"""Differentiable MLS-MPM step in pure JAX (with Pallas-accelerated
variants in ``neuma_tpu.sim.kernels``).

TPU-native redesign of the reference's Warp kernels
(``modules/nclaw/sim/mpm.py:321-499`` in the reference repo):

* **p2g** — quadratic B-spline scatter of mass/momentum (3^3 stencil with
  the stress term folded into the APIC affine matrix, mpm.py:357-371).
  On TPU there are no fast global atomics, so the scatter is expressed as
  ``jnp scatter-add`` over flattened cell ids — XLA's deterministic
  scatter, whose transpose (for AD) is the matching gather. A sorted
  segment-sum / Pallas block-accumulate variant lives behind the same
  interface for the hot path.
* **grid_op** — momentum -> velocity with eps-guarded division, gravity,
  and box boundary conditions ('freeslip' zeroes the violating normal
  component, 'noslip' zeroes the full velocity; mpm.py:373-429). Pure
  elementwise jnp.
* **g2p** — 27-tap gather of velocity + APIC C, F update
  ``F <- (I + dt C_new) F``, advection with per-particle clip bounds
  (mpm.py:432-498).

Differentiation: the whole step is differentiable by construction.
``mpm_step_diff`` wraps it in a custom VJP that (a) rematerializes the
step in the backward pass — the analogue of the reference's grid
rematerialization (mpm.py:299-319) so no grid fields are ever stored —
and (b) scrubs NaN/Inf cotangents exactly like the reference's
``nan_to_num`` on all sim gradients (``sim/interface.py:65-74``).
"""
from __future__ import annotations

import dataclasses
import os as _os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import (
    GridGeom,
    GridState,
    MPMConstants,
    ParticleState,
    Statics,
)

# Static 3x3x3 stencil offsets, shape (27, 3).
_OFFSETS = np.stack(
    np.meshgrid(np.arange(3), np.arange(3), np.arange(3), indexing="ij"),
    axis=-1,
).reshape(27, 3)


def _stencil(constants: MPMConstants, x: jnp.ndarray):
    """Shared p2g/g2p geometry: base cell, quadratic B-spline weights.

    Returns:
        base: (N, 3) int32 lower-corner cell of the 3x3x3 stencil
        weight: (N, 27) product weights
        dpos: (N, 27, 3) cell-center offsets (world units)
        flat_idx: (N, 27) int32 flattened grid indices
    """
    g = constants.num_grids
    inv_dx = constants.inv_dx
    dx = constants.dx

    p_x = x * inv_dx
    base = jnp.floor(p_x - 0.5).astype(jnp.int32)
    fx = p_x - base.astype(x.dtype)  # in [0.5, 1.5]

    # Quadratic kernels (mpm.graphics Eqn. 123 with x = fx, fx-1, fx-2).
    wa = 1.5 - fx
    wb = fx - 1.0
    wc = fx - 0.5
    w = jnp.stack(
        [0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], axis=-1
    )  # (N, 3 axes, 3 taps)

    offsets = jnp.asarray(_OFFSETS, jnp.int32)  # (27, 3)
    weight = (
        w[:, 0, offsets[:, 0]] * w[:, 1, offsets[:, 1]] * w[:, 2, offsets[:, 2]]
    )  # (N, 27)

    dpos = (
        offsets.astype(x.dtype)[None, :, :] - fx[:, None, :]
    ) * dx  # (N, 27, 3)

    cells = base[:, None, :] + offsets[None, :, :]  # (N, 27, 3)
    # Clamp for memory safety (the reference relies on clip_bound keeping
    # particles in-range; OOB there is UB — here we clamp indices).
    cells = jnp.clip(cells, 0, g - 1)
    flat_idx = (cells[..., 0] * g + cells[..., 1]) * g + cells[..., 2]
    return base, weight, dpos, flat_idx


def p2g_scatter(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Particle-to-grid via XLA scatter-add (reference mpm.py:321-371).

    Returns (grid_m (G^3,), grid_mv (G^3, 3)). Deterministic (unlike the
    reference's float atomics) but scatter is slow on TPU — the matmul
    formulation below is the fast path.
    """
    g3 = constants.num_grids ** 3
    mass = statics.vol * statics.rho  # (N,)
    enabled = statics.enabled.astype(state.x.dtype)  # (N,)

    _, weight, dpos, flat_idx = _stencil(constants, state.x)

    stress_term = (
        -constants.dt * statics.vol * 4.0 * constants.inv_dx * constants.inv_dx
    )[:, None, None] * stress
    affine = stress_term + mass[:, None, None] * state.C  # (N, 3, 3)

    # mv contribution: weight * (mass * v + affine @ dpos), per tap.
    mv_tap = mass[:, None, None] * state.v[:, None, :] + jnp.einsum(
        "nij,noj->noi", affine, dpos
    )  # (N, 27, 3)
    weight = weight * enabled[:, None]
    mv_contrib = weight[..., None] * mv_tap  # (N, 27, 3)
    m_contrib = weight * mass[:, None]  # (N, 27)

    flat = flat_idx.reshape(-1)
    grid_mv = jnp.zeros((g3, 3), state.x.dtype).at[flat].add(
        mv_contrib.reshape(-1, 3)
    )
    grid_m = jnp.zeros((g3,), state.x.dtype).at[flat].add(
        m_contrib.reshape(-1)
    )
    return grid_m, grid_mv


def _axis_weights(
    constants: MPMConstants,
    x: jnp.ndarray,
    region: Optional[Tuple[Tuple[int, int], ...]] = None,
):
    """Per-axis dense quadratic B-spline weight matrices.

    Returns (W, Wi): lists of 3 arrays (N, S_a) each — W[a][p, c] is the
    axis-a spline weight of particle p at LOCAL grid line c, and Wi[a]
    the same weighted by the LOCAL tap offset i in {0,1,2} (used to
    reconstruct the affine term's offset dependence).

    ``region``: optional per-axis (lo, size) restricting the dense
    coordinate range to global lines [lo, lo+size) — used by the
    halo-exchange sharded step (parallel/halo.py), where each shard only
    materializes its slab+halo. Taps whose (physically clamped) cell
    falls outside the region are dropped; callers must size the region
    to cover all taps of the particles they pass in.
    """
    g = constants.num_grids
    p_x = x * constants.inv_dx
    base = jnp.floor(p_x - 0.5).astype(jnp.int32)
    fx = p_x - base.astype(x.dtype)
    wa = 1.5 - fx
    wb = fx - 1.0
    wc = fx - 0.5
    w = jnp.stack(
        [0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], axis=-1
    )  # (N, 3 axes, 3 taps)

    if region is None:
        region = (((0, g),) * 3)

    W, Wi = [], []
    for a in range(3):
        lo, size = region[a]
        coords = lo + jnp.arange(size, dtype=jnp.int32)  # (S,)
        # Taps whose cell falls outside [0, G-1] are folded onto the edge
        # grid line — the same index clamp as the scatter path
        # (``_stencil``), so near-wall particles (clip_bound < 0.5)
        # deposit identically on both paths. dpos keeps the UNCLAMPED
        # local tap offset, also matching ``_stencil``.
        Wa = jnp.zeros((x.shape[0], size), x.dtype)
        Wia = jnp.zeros((x.shape[0], size), x.dtype)
        for i in range(3):
            ci = jnp.clip(base[:, a : a + 1] + i, 0, g - 1)  # (N, 1)
            tap = (coords[None, :] == ci).astype(x.dtype)
            Wa = Wa + w[:, a, i : i + 1] * tap
            if i:
                Wia = Wia + float(i) * w[:, a, i : i + 1] * tap
        W.append(Wa)
        Wi.append(Wia)
    return W, Wi, base, fx


def p2g_matmul(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
    chunk: int = 16384,
    region: Optional[Tuple[Tuple[int, int], ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Particle-to-grid as separable MXU matmuls (TPU fast path).

    The 27-tap APIC scatter factorizes: with local tap offsets (i, j, k),
        mv_tap = wx_i wy_j wz_k * (b + i*a0 + j*a1 + k*a2)
    where b = mass*v - (A @ fx) * dx and a_c = A[:, c] * dx. The grid is
    therefore a sum of four tensor-product terms, each computed as a
    (G, N) @ (N, G^2) matmul against the per-particle (Wy x Wz) outer
    products — dense, deterministic, and differentiable with matmul
    transposes (no scatters anywhere, forward or backward).
    """
    g = constants.num_grids
    if region is None:
        region = ((0, g),) * 3
    (_, sx), (_, sy), (_, sz) = region
    dtype = state.x.dtype
    n = state.x.shape[0]
    mass = statics.vol * statics.rho * statics.enabled.astype(dtype)

    stress_term = (
        -constants.dt * statics.vol * 4.0 * constants.inv_dx * constants.inv_dx
    )[:, None, None] * stress
    affine = stress_term + mass[:, None, None] * state.C  # (N, 3, 3)

    W, Wi, base, fx = _axis_weights(constants, state.x, region)
    Wx, Wy, Wz = W
    Wix, Wiy, Wiz = Wi
    # Zero disabled particles through the x-axis weights.
    en = statics.enabled.astype(dtype)[:, None]
    Wx = Wx * en
    Wix = Wix * en

    dx = constants.dx
    b_vec = mass[:, None] * state.v - jnp.einsum(
        "nij,nj->ni", affine, fx
    ) * dx  # (N, 3)
    a_cols = affine * dx  # (N, 3 rows, 3 cols); a_c = affine[:, :, c]*dx

    prec = jax.lax.Precision.HIGHEST

    def accumulate(sl):
        wx, wy, wz = Wx[sl], Wy[sl], Wz[sl]
        wix, wiy, wiz = Wix[sl], Wiy[sl], Wiz[sl]
        yz = (wy[:, :, None] * wz[:, None, :]).reshape(
            wy.shape[0], sy * sz
        )
        yz_i = (wiy[:, :, None] * wz[:, None, :]).reshape(
            wy.shape[0], sy * sz
        )
        yz_k = (wy[:, :, None] * wiz[:, None, :]).reshape(
            wy.shape[0], sy * sz
        )
        b = b_vec[sl]
        a = a_cols[sl]
        m = mass[sl]

        # grid_m: one matmul
        grid_m = jnp.matmul(
            wx.T, yz * m[:, None], precision=prec
        )  # (Sx, Sy*Sz)

        # grid_mv channel r:
        #   Wx^T @ (yz * b_r) + Wix^T @ (yz * a0_r)
        # + Wx^T @ (yz_i * a1_r) + Wx^T @ (yz_k * a2_r)
        mv = []
        for r2 in range(3):
            lhs1 = yz * b[:, r2 : r2 + 1] + yz_i * a[:, r2, 1][:, None] \
                + yz_k * a[:, r2, 2][:, None]
            term = jnp.matmul(wx.T, lhs1, precision=prec)
            term = term + jnp.matmul(
                wix.T, yz * a[:, r2, 0][:, None], precision=prec
            )
            mv.append(term)
        return grid_m, jnp.stack(mv, axis=-1)  # (Sx, Sy*Sz), (.., 3)

    if n <= chunk:
        grid_m, grid_mv = accumulate(slice(None))
    else:
        grid_m = jnp.zeros((sx, sy * sz), dtype)
        grid_mv = jnp.zeros((sx, sy * sz, 3), dtype)
        for start in range(0, n, chunk):
            dm, dmv = accumulate(slice(start, min(start + chunk, n)))
            grid_m = grid_m + dm
            grid_mv = grid_mv + dmv

    return grid_m.reshape(sx * sy * sz), grid_mv.reshape(sx * sy * sz, 3)


def _p2g_terms(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
):
    """Per-particle APIC scatter channels (mass, momentum, affine)."""
    dtype = state.x.dtype
    en = statics.enabled.astype(dtype)
    mass = statics.vol * statics.rho * en
    stress_term = (
        -constants.dt
        * statics.vol
        * 4.0
        * constants.inv_dx
        * constants.inv_dx
    )[:, None, None] * stress
    affine = (
        stress_term * en[:, None, None] + mass[:, None, None] * state.C
    )
    b = mass[:, None] * state.v
    return mass, b, affine


def p2g(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
    method: str = "auto",
    sort=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Particle-to-grid scatter (reference mpm.py:321-371). ``method``:

    * 'auto' / 'blocked' — grid-blocked separable matmuls with a
      closed-form 27-tap-gather VJP (``sim/blocked.py``); the fast
      path at every grid size, and the only one that scales to the
      real-capture 70^3 grids.
    * 'matmul' — dense (full-grid) separable MXU path, differentiated
      by AD through the matmul transposes.
    * 'scatter' — XLA scatter-add baseline.

    ``sort`` optionally shares one ``BlockSort`` of ``state.x`` across
    p2g/g2p within a step (see ``mpm_step``).
    """
    if method in ("auto", "blocked"):
        from .blocked import apic_scatter

        mass, b, affine = _p2g_terms(constants, statics, state, stress)
        grid_m, grid_f = apic_scatter(
            constants, state.x, mass, b, affine, sort
        )
        return grid_m, grid_f
    if method == "matmul":
        # Bound the (chunk, G^2) intermediates to ~32M elements.
        g2 = constants.num_grids ** 2
        chunk = max(2048, (1 << 25) // g2)
        return p2g_matmul(constants, statics, state, stress, chunk=chunk)
    return p2g_scatter(constants, statics, state, stress)


def grid_op(
    constants: MPMConstants,
    grid_m: jnp.ndarray,
    grid_mv: jnp.ndarray,
    geom: Optional[GridGeom] = None,
) -> jnp.ndarray:
    """Momentum -> velocity + gravity + box boundary (reference
    mpm.py:373-429). Returns grid velocity (num_cells, 3). With a
    ``geom`` view, the box boundary test runs in GLOBAL coordinates
    (local index + view origin) so per-shard slabs see the same BC as
    the full cube."""
    g = constants.num_grids
    bound = constants.bound
    dtype = grid_mv.dtype

    gv = constants.gravity.astype(dtype) * constants.dt
    has_mass = grid_m > 0.0
    # Safe denominator: where m == 0 use 1 (value overridden by `where`),
    # so no NaN leaks through forward or backward even when eps == 0.
    denom = jnp.where(has_mass, grid_m + constants.eps, 1.0)[:, None]
    v = jnp.where(has_mass[:, None], grid_mv / denom + gv, gv)

    # Cell coordinates (global).
    if geom is None:
        dims = (g, g, g)
        origin = None
    else:
        dims = geom.dims
        origin = geom.origin
    gx, gy, gz = dims
    idx = jnp.arange(gx * gy * gz, dtype=jnp.int32)
    pz = idx % gz
    py = (idx // gz) % gy
    px = idx // (gy * gz)
    coords = jnp.stack([px, py, pz], axis=-1)  # (num_cells, 3)
    if origin is not None:
        coords = coords + origin[None, :]

    lo = coords < bound  # (G^3, 3) bool per axis
    hi = coords >= (g - bound)
    neg = v < 0.0
    pos = v > 0.0
    violating = (lo & neg) | (hi & pos)  # per-axis BC violation

    if constants.bc == "freeslip":
        v = jnp.where(violating, 0.0, v)
    elif constants.bc == "noslip":
        any_violation = jnp.any(violating, axis=-1, keepdims=True)
        v = jnp.where(any_violation, 0.0, v)
    else:
        raise ValueError(f"invalid boundary condition: {constants.bc}")
    return v


@jax.custom_vjp
def g2p_core(
    constants: MPMConstants,
    x: jnp.ndarray,
    grid_v: jnp.ndarray,
    sort=None,
    geom: Optional[GridGeom] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The two tap-contractions of G2P (reference mpm.py:432-475):

        new_v = sum_o W_o grid_v[cell_o]
        new_C = kappa * sum_o W_o grid_v[cell_o] (x) dpos_o

    On TPU this runs the blocked Pallas gather kernel
    (``p2g_kernel.apic_gather_tpu`` with the grid-velocity slab); the
    custom VJP routes the grid cotangent through the blocked scatter
    (``blocked._forward_dispatch`` with b = v-cot, A = kappa * C-cot —
    the exact transpose) and the position cotangent through the same
    gather kernel's derivative outputs. Everything downstream (F
    update, advection, clamp, enabled freeze) is plain AD.
    """
    return _g2p_core_fwd_impl(constants, x, grid_v, sort, geom)


def _g2p_core_fwd_impl(constants, x, grid_v, sort=None, geom=None):
    from .blocked import _geom_dims, _tap_geometry

    kappa = 4.0 * constants.inv_dx * constants.inv_dx
    if (
        jax.default_backend() == "tpu"
        and max(_geom_dims(constants, geom)) > 24
    ):
        from .p2g_kernel import apic_gather_tpu

        zeros3 = jnp.zeros_like(x)
        zeros33 = jnp.zeros(x.shape + (3,), x.dtype)
        _, _, new_v, dA = apic_gather_tpu(
            constants, x, None, zeros3, zeros33, grid_v, None,
            derivs=False, sort=sort, geom=geom,
        )
        return new_v, kappa * dA
    prec = jax.lax.Precision.HIGHEST
    if geom is None:
        _, weight, dpos, flat_idx = _stencil(constants, x)
    else:
        flat_idx, weight, _, dpos = _tap_geometry(constants, x, geom)
    v_taps = grid_v[flat_idx]  # (N, 27, 3)
    new_v = jnp.einsum("no,noi->ni", weight, v_taps, precision=prec)
    new_C = kappa * jnp.einsum(
        "no,noi,noj->nij", weight, v_taps, dpos, precision=prec
    )
    return new_v, new_C


def _g2p_core_fwd(constants, x, grid_v, sort=None, geom=None):
    out = _g2p_core_fwd_impl(constants, x, grid_v, sort, geom)
    return out, (constants, x, grid_v, sort, geom)


def _g2p_core_bwd(res, cot):
    constants, x, grid_v, sort, geom = res
    dv, dC = cot
    kappa = 4.0 * constants.inv_dx * constants.inv_dx
    from .blocked import _apic_bwd_impl, _forward_dispatch

    A = kappa * dC
    _, d_grid = _forward_dispatch(
        constants, x, None, dv, A, "auto", sort, geom
    )
    # Position cotangent: same tap-contraction structure with the
    # grid-velocity slab (b = dv, A = kappa dC).
    d_x, _, _, _ = _apic_bwd_impl(
        constants, x, None, dv, A, None, grid_v, sort, geom
    )

    def zero_cotangent(v):
        if jnp.issubdtype(v.dtype, jnp.integer):
            return np.zeros(v.shape, jax.dtypes.float0)
        return jnp.zeros_like(v)

    d_constants = jax.tree_util.tree_map(zero_cotangent, constants)
    d_sort = jax.tree_util.tree_map(zero_cotangent, sort)
    d_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return d_constants, d_x, d_grid, d_sort, d_geom


g2p_core.defvjp(_g2p_core_fwd, _g2p_core_bwd)


def _g2p_tail(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    new_v: jnp.ndarray,
    new_C: jnp.ndarray,
) -> ParticleState:
    """Everything after the tap contractions: F update, advection,
    clamp, enabled freeze. Cheap elementwise ops — plain AD; also
    re-run (trivially) by the direct step backward."""
    dx = constants.dx
    dt = constants.dt
    enabled = (statics.enabled > 0)[:, None]

    eye = jnp.eye(3, dtype=state.x.dtype)
    new_F = (eye + dt * new_C) @ state.F

    clip = (statics.clip_bound * dx)[:, None]
    new_x = state.x + dt * new_v
    new_x = jnp.clip(new_x, clip, 1.0 - clip)

    # Disabled particles keep their previous state (reference returns early
    # leaving particle_next untouched for them; the training loops never
    # read disabled lanes, so freezing state is the faithful choice).
    return ParticleState(
        x=jnp.where(enabled, new_x, state.x),
        v=jnp.where(enabled, new_v, state.v),
        C=jnp.where(enabled[..., None], new_C, state.C),
        F=jnp.where(enabled[..., None], new_F, state.F),
    )


def _g2p_impl(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    grid_v: jnp.ndarray,
    sort=None,
) -> ParticleState:
    """Grid-to-particle gather + F update + advection (reference
    mpm.py:432-498). Differentiable end to end: the tap contractions
    live in ``g2p_core`` (custom VJP, blocked kernels); the rest is
    plain AD."""
    new_v, new_C = g2p_core(constants, state.x, grid_v, sort)
    return _g2p_tail(constants, statics, state, new_v, new_C)


def g2p(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    grid_v: jnp.ndarray,
    sort=None,
) -> ParticleState:
    """Grid-to-particle transfer. Plain function over ``g2p_core``; see
    ``_g2p_impl``."""
    return _g2p_impl(constants, statics, state, grid_v, sort)


def _step_sort(constants, x):
    """One shared block sort + both pre-carved chunk layouts per step
    (p2g and g2p read the same pre-update positions). Only the blocked
    path consumes it."""
    if constants.num_grids > 24:
        from .p2g_kernel import build_step_layouts

        return build_step_layouts(constants, x)
    return None


# --- slab-space step (round 5) ---------------------------------------------
#
# On the TPU blocked path the grid never needs to exist densely: the
# scatter kernel's per-block partials become halo-complete slabs
# (p2g_kernel.halo_add_slabs), grid_op applies per slab (elementwise —
# overlapping lines hold consistent duplicates), and the gather kernels
# consume slabs directly. This kills the fold -> dense -> unfold round
# trip whose channel-minor dense grids (f32[cells,3] uses 3 of 128
# lanes) cost ~4 ms/substep of relayout churn at 70^3 (round-4 trace).
# Values match the dense path bitwise (addition order preserved).


def _slab_mode() -> str:
    """'tpu' (production), 'interpret' (CPU tests force the slab path
    through the interpreted kernels), or 'off'."""
    mode = _os.environ.get("NEUMA_SLAB_GRID", "auto")
    if mode not in ("auto", "off", "interpret"):
        raise ValueError(f"unknown NEUMA_SLAB_GRID: {mode!r}")
    return mode


def _use_slab_grid(constants, sort) -> bool:
    mode = _slab_mode()
    if mode == "off":
        return False
    if mode == "interpret":
        return constants.num_grids > 24
    return jax.default_backend() == "tpu" and constants.num_grids > 24


def grid_op_slabs(
    constants: MPMConstants, slabs: jnp.ndarray, nbs
) -> jnp.ndarray:
    """``grid_op`` applied per slab: (NB, 4, S, S*S) merged slabs with
    channels (mv, mass) -> (NB, 4, S, S*S) with channels (velocity, 0).
    Identical arithmetic to :func:`grid_op` (the BC test runs in global
    coordinates derived from the block origin); overlapping slab lines
    hold consistent duplicates because the op is elementwise."""
    from .p2g_kernel import BLOCK, S

    g = constants.num_grids
    bound = constants.bound
    dtype = slabs.dtype
    NB = slabs.shape[0]
    nbx, nby, nbz = nbs

    grid_m = slabs[:, 3]  # (NB, S, S*S)
    gv = constants.gravity.astype(dtype) * constants.dt
    has_mass = grid_m > 0.0
    denom = jnp.where(has_mass, grid_m + constants.eps, 1.0)
    v = [
        jnp.where(has_mass, slabs[:, c] / denom + gv[c], gv[c])
        for c in range(3)
    ]

    # Global cell coordinates per slab position.
    bidx = jnp.arange(NB, dtype=jnp.int32)
    obx = (bidx // (nby * nbz)) * BLOCK  # (NB,)
    oby = ((bidx // nbz) % nby) * BLOCK
    obz = (bidx % nbz) * BLOCK
    sx = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S * S), 2)
    cx = obx[:, None, None] + sx
    cy = oby[:, None, None] + (lane // S)
    cz = obz[:, None, None] + (lane % S)
    coords = (cx, cy, cz)

    viol = []
    for c in range(3):
        lo = coords[c] < bound
        hi = coords[c] >= (g - bound)
        viol.append((lo & (v[c] < 0.0)) | (hi & (v[c] > 0.0)))

    if constants.bc == "freeslip":
        v = [jnp.where(viol[c], 0.0, v[c]) for c in range(3)]
    elif constants.bc == "noslip":
        any_v = viol[0] | viol[1] | viol[2]
        v = [jnp.where(any_v, 0.0, v[c]) for c in range(3)]
    else:
        raise ValueError(f"invalid boundary condition: {constants.bc}")
    return jnp.stack(v + [jnp.zeros_like(v[0])], axis=1)


def _step_fwd_slab(constants, statics, state, stress, sort):
    """Slab-space step forward: returns (out_state, slabs_mmv, new_v,
    new_C). ``slabs_mmv`` (merged, halo-complete) is the only grid
    residual the backward needs."""
    from .p2g_kernel import (
        _cdiv,
        BLOCK,
        gather_from_slabs,
        p2g_slab_scatter,
    )

    interpret = _slab_mode() == "interpret"
    g = constants.num_grids
    nbs = tuple(_cdiv(g, BLOCK) for _ in range(3))
    mass, b, affine = _p2g_terms(constants, statics, state, stress)
    slabs_mmv = p2g_slab_scatter(
        constants, state.x, mass, b, affine, sort, interpret=interpret
    )
    slabs_v = grid_op_slabs(constants, slabs_mmv, nbs)
    kappa = 4.0 * constants.inv_dx * constants.inv_dx
    zeros3 = jnp.zeros_like(state.x)
    zeros33 = jnp.zeros(state.x.shape + (3,), state.x.dtype)
    _, _, new_v, dA = gather_from_slabs(
        constants, state.x, slabs_v, None, zeros3, zeros33,
        derivs=False, sort=sort, interpret=interpret,
    )
    new_C = kappa * dA
    out = _g2p_tail(constants, statics, state, new_v, new_C)
    return out, slabs_mmv, new_v, new_C


def _step_bwd_slab(constants, statics, state, stress, sort, slabs_mmv,
                   new_v, new_C, g):
    """Slab-space direct adjoint (same piece structure as
    ``_mpm_step_bwd``; all grid stages stay in slab space)."""
    from .p2g_kernel import (
        _cdiv,
        BLOCK,
        gather_from_slabs,
        p2g_slab_scatter,
    )

    interpret = _slab_mode() == "interpret"
    gg = constants.num_grids
    nbs = tuple(_cdiv(gg, BLOCK) for _ in range(3))

    _, vjp_tail = jax.vjp(
        lambda st, v_, C_: _g2p_tail(constants, statics, st, v_, C_),
        state, new_v, new_C,
    )
    d_state_t, d_new_v, d_new_C = vjp_tail(g)

    kappa = 4.0 * constants.inv_dx * constants.inv_dx
    A2 = kappa * d_new_C

    # g2p grid cotangent: tap scatter per slab + halo merge (the exact
    # transpose of the slab gather), then the elementwise grid_op vjp.
    d_slabs_v = p2g_slab_scatter(
        constants, state.x, None, d_new_v, A2, sort, interpret=interpret
    )
    slabs_v, vjp_gop = jax.vjp(
        lambda s_: grid_op_slabs(constants, s_, nbs), slabs_mmv
    )
    (d_slabs_mmv,) = vjp_gop(d_slabs_v)

    # Two slab gathers: the p2g scatter adjoint and the g2p position
    # adjoint (see blocked._apic_bwd_dual_impl).
    mass, b, affine = _p2g_terms(constants, statics, state, stress)
    d_x_s, dgm, db, dA = gather_from_slabs(
        constants, state.x, d_slabs_mmv, mass, b, affine,
        derivs=True, sort=sort, interpret=interpret,
    )
    d_x_g2p, _, _, _ = gather_from_slabs(
        constants, state.x, slabs_v, None, d_new_v, A2,
        derivs=True, sort=sort, interpret=interpret,
    )

    _, vjp_prep = jax.vjp(
        lambda st, sr: _p2g_terms(constants, statics, st, sr),
        state, stress,
    )
    d_state_p, d_stress = vjp_prep((dgm, db, dA))

    d_state = ParticleState(
        x=d_state_t.x + d_x_g2p + d_x_s + d_state_p.x,
        v=d_state_t.v + d_state_p.v,
        C=d_state_t.C + d_state_p.C,
        F=d_state_t.F + d_state_p.F,
    )
    scrub = lambda t: jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0)
    d_state = jax.tree_util.tree_map(scrub, d_state)
    d_stress = scrub(d_stress)
    return d_state, d_stress


def mpm_step(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
    sort=None,
) -> ParticleState:
    """One full MPM step: p2g -> grid_op -> g2p (reference
    ``MPMModel.forward``, mpm.py:279-297). Pure function; the grid is a
    transient intermediate that XLA fuses/frees — never part of the state.

    The block-sorted particle order is computed ONCE here and shared by
    the p2g scatter, the g2p gather, and (via custom-VJP residuals)
    every backward kernel — the argsort was the dominant fixed cost
    when rebuilt per primitive."""
    if sort is None:
        sort = _step_sort(constants, state.x)
    if _use_slab_grid(constants, sort):
        out, _, _, _ = _step_fwd_slab(constants, statics, state, stress,
                                      sort)
        return out
    grid_m, grid_mv = p2g(constants, statics, state, stress, "auto", sort)
    grid_v = grid_op(constants, grid_m, grid_mv)
    return g2p(constants, statics, state, grid_v, sort)


# --- gradient-parity wrapper ------------------------------------------------

@jax.custom_vjp
def mpm_step_diff(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
    sort=None,
) -> ParticleState:
    """``mpm_step`` with reference-parity backward semantics:

    * backward composes the closed-form piece adjoints DIRECTLY (tail
      vjp -> g2p tap gather -> grid_op vjp -> scatter gather) from the
      saved grid channels and g2p outputs, instead of replaying the
      whole forward — the gradient VALUES match ``MPMModel.backward``'s
      local-tape replay (reference mpm.py:299-319) while skipping its
      second forward pass. Residual memory is ~4 grid channels
      (G^3 * 16 B) per step, transient under the rollout's per-frame
      ``jax.checkpoint``;
    * all outgoing cotangents are NaN/Inf-scrubbed to zero, matching
      ``MPMSimFunction.backward`` (interface.py:65-74).

    ``sort`` may carry pre-built/refreshed ``StepLayouts`` (see
    ``p2g_kernel.refresh_step_layouts``) so substep scans amortize the
    block argsort; it is treated as non-differentiable.
    """
    return mpm_step(constants, statics, state, stress, sort)


def _mpm_step_fwd(constants, statics, state, stress, sort=None):
    sort_in = sort  # keep the caller's pytree structure for the bwd
    if sort is None:
        sort = _step_sort(constants, state.x)
    if _use_slab_grid(constants, sort):
        out, slabs_mmv, new_v, new_C = _step_fwd_slab(
            constants, statics, state, stress, sort
        )
        return out, (
            constants, statics, state, stress, sort, sort_in,
            (slabs_mmv,), new_v, new_C,
        )
    grid_m, grid_mv = p2g(constants, statics, state, stress, "auto", sort)
    grid_v = grid_op(constants, grid_m, grid_mv)
    new_v, new_C = g2p_core(constants, state.x, grid_v, sort)
    out = _g2p_tail(constants, statics, state, new_v, new_C)
    return out, (
        constants, statics, state, stress, sort, sort_in,
        (grid_m, grid_mv), new_v, new_C,
    )


def _mpm_step_bwd(residuals, g):
    (
        constants, statics, state, stress, sort, sort_in,
        grid_res, new_v, new_C,
    ) = residuals
    from .blocked import _apic_bwd_dual_impl, _forward_dispatch

    def zero_cotangent(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    if len(grid_res) == 1:  # slab-space residuals (see _step_fwd_slab)
        d_state, d_stress = _step_bwd_slab(
            constants, statics, state, stress, sort, grid_res[0],
            new_v, new_C, g,
        )
        d_statics = jax.tree_util.tree_map(zero_cotangent, statics)
        d_constants = jax.tree_util.tree_map(zero_cotangent, constants)
        d_sort = jax.tree_util.tree_map(zero_cotangent, sort_in)
        return d_constants, d_statics, d_state, d_stress, d_sort
    grid_m, grid_mv = grid_res

    # 1. tail (F update / advection / clamp / freeze): cheap elementwise
    #    re-run under jax.vjp.
    _, vjp_tail = jax.vjp(
        lambda st, v_, C_: _g2p_tail(constants, statics, st, v_, C_),
        state, new_v, new_C,
    )
    d_state_t, d_new_v, d_new_C = vjp_tail(g)

    # 2. g2p grid cotangent via the blocked scatter (the exact
    #    transpose of the tap gather).
    kappa = 4.0 * constants.inv_dx * constants.inv_dx
    A = kappa * d_new_C
    grid_v = grid_op(constants, grid_m, grid_mv)
    _, d_grid_v = _forward_dispatch(
        constants, state.x, None, d_new_v, A, "auto", sort
    )

    # 3. grid_op (momentum -> velocity + BC): elementwise vjp from the
    #    saved grid channels.
    _, vjp_gop = jax.vjp(
        lambda m_, mv_: grid_op(constants, m_, mv_), grid_m, grid_mv
    )
    d_m, d_mv = vjp_gop(d_grid_v)

    # 4. ONE fused tap-gather pass: the p2g scatter adjoint (27-tap
    #    gather of (d_mv, d_m)) and the g2p position adjoint (gather of
    #    grid_v weighted by (d_new_v, kappa d_new_C)) are independent
    #    given d_m/d_mv, and share the kernel's one-hot factor build.
    mass, b, affine = _p2g_terms(constants, statics, state, stress)
    d_x_s, dgm, db, dA, d_x_g2p = _apic_bwd_dual_impl(
        constants, state.x, mass, b, affine, d_m, d_mv,
        d_new_v, A, grid_v, sort,
    )
    _, vjp_prep = jax.vjp(
        lambda st, sr: _p2g_terms(constants, statics, st, sr),
        state, stress,
    )
    d_state_p, d_stress = vjp_prep((dgm, db, dA))

    d_state = ParticleState(
        x=d_state_t.x + d_x_g2p + d_x_s + d_state_p.x,
        v=d_state_t.v + d_state_p.v,
        C=d_state_t.C + d_state_p.C,
        F=d_state_t.F + d_state_p.F,
    )
    scrub = lambda t: jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0)
    d_state = jax.tree_util.tree_map(scrub, d_state)
    d_stress = scrub(d_stress)

    def zero_cotangent(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    d_statics = jax.tree_util.tree_map(zero_cotangent, statics)
    d_constants = jax.tree_util.tree_map(zero_cotangent, constants)
    d_sort = jax.tree_util.tree_map(zero_cotangent, sort_in)
    return d_constants, d_statics, d_state, d_stress, d_sort


mpm_step_diff.defvjp(_mpm_step_fwd, _mpm_step_bwd)


# --- packed-residual substep -------------------------------------------------
#
# Under the rollout's replay-free remat policy ('none'), ``lax.scan``
# stacks every substep residual over (frames x substeps). TPU tile
# layouts pad the trailing dims of each stacked leaf to (8, 128), so a
# stacked (N, 3) costs N*128 f32 (42.7x) and a (N, 3, 3) costs N*8*128
# (113.8x) — measured 20.9 GB where the unpadded math said 0.9 GB at the
# realworld bench shape (30k/70^3/substeps 20/2 frames), which forced
# that shape onto per-frame remat and its ~+94 ms/frame forward replay.
# Storing every f32 residual FLAT (1-D) restores the unpadded footprint;
# the reshapes in fwd/bwd are cheap relayouts (~13 MB round-trip per
# substep at 30k particles).


def _flat(a):
    return a.reshape(-1) if a.ndim >= 2 else a


def _pack_layouts(sort):
    """Flatten the multi-dim leaves of a BlockSort/StepLayouts pytree
    (base/fx/loc are (N,3)/(N,3,3); everything else is already 1-D)."""
    if sort is None:
        return None
    return jax.tree_util.tree_map(_flat, sort)


def _unpack_layouts(packed):
    if packed is None:
        return None
    s = packed.sort if hasattr(packed, "sort") else packed
    n = s.perm.size
    sort = s._replace(
        base=s.base.reshape(n, 3),
        fx=s.fx.reshape(n, 3),
        loc=s.loc.reshape(n, 3, 3),
    )
    if hasattr(packed, "sort"):
        return packed._replace(sort=sort)
    return sort


def _pack_step_res(res):
    (constants, statics, state, stress, sort, sort_in,
     grid_res, new_v, new_C) = res
    if len(grid_res) == 1:  # slab residuals: one merged slab array
        grid_packed = (_flat(grid_res[0]),)
    else:
        grid_m, grid_mv = grid_res
        grid_packed = (grid_m, _flat(grid_mv))
    return (
        constants, statics,
        jax.tree_util.tree_map(_flat, state),
        _flat(stress),
        _pack_layouts(sort), _pack_layouts(sort_in),
        grid_packed, _flat(new_v), _flat(new_C),
    )


def _unpack_step_res(packed):
    (constants, statics, fs, stress, sort, sort_in,
     grid_packed, new_v, new_C) = packed
    n = fs.x.size // 3
    if len(grid_packed) == 1:  # slab residuals
        from .p2g_kernel import _cdiv as _cd, BLOCK, S

        nb = _cd(constants.num_grids, BLOCK) ** 3
        grid_res = (grid_packed[0].reshape(nb, 4, S, S * S),)
    else:
        grid_m, grid_mv = grid_packed
        grid_res = (grid_m, grid_mv.reshape(grid_m.size, 3))
    state = ParticleState(
        x=fs.x.reshape(n, 3), v=fs.v.reshape(n, 3),
        C=fs.C.reshape(n, 3, 3), F=fs.F.reshape(n, 3, 3),
    )
    return (
        constants, statics, state, stress.reshape(n, 3, 3),
        _unpack_layouts(sort), _unpack_layouts(sort_in),
        grid_res, new_v.reshape(n, 3), new_C.reshape(n, 3, 3),
    )


def make_packed_substep(constants, statics, elast_apply, plast_apply):
    """One grounding substep (elasticity net -> ``mpm_step_diff`` ->
    plasticity net) as a single ``custom_vjp`` whose residuals are
    stored flat (see the layout note above).

    The material nets save NO residuals of their own: backward rebuilds
    their vjps from the saved (flat) state at the cost of one extra
    material forward each — far cheaper than the per-frame replay this
    enables short rollouts to skip, and it keeps the nets' large
    intermediate activations (SVD factors, hidden features) out of the
    scan's stacked residuals entirely. Gradient VALUES are identical to
    the unfused composition (the same piece adjoints run in the same
    order; parity is test-pinned in tests/test_grounding.py)."""

    @jax.custom_vjp
    def substep(params_e, params_p, s, layouts):
        stress = elast_apply(params_e, s.F)
        out = mpm_step_diff(constants, statics, s, stress, layouts)
        return dataclasses.replace(out, F=plast_apply(params_p, out.F))

    def fwd(params_e, params_p, s, layouts):
        stress = elast_apply(params_e, s.F)
        out, res = _mpm_step_fwd(constants, statics, s, stress, layouts)
        f2 = out.F
        out = dataclasses.replace(out, F=plast_apply(params_p, f2))
        return out, (params_e, params_p, _pack_step_res(res), _flat(f2))

    def bwd(saved, g):
        params_e, params_p, packed, f2 = saved
        res = _unpack_step_res(packed)
        state = res[2]
        n = state.x.shape[0]
        _, vjp_p = jax.vjp(
            lambda pp, F: plast_apply(pp, F), params_p, f2.reshape(n, 3, 3)
        )
        d_pp, d_f2 = vjp_p(g.F)
        _, _, d_s, d_stress, d_sort = _mpm_step_bwd(
            res, dataclasses.replace(g, F=d_f2)
        )
        _, vjp_e = jax.vjp(
            lambda pe, F: elast_apply(pe, F), params_e, state.F
        )
        d_pe, d_f_e = vjp_e(d_stress)
        d_s = dataclasses.replace(d_s, F=d_s.F + d_f_e)
        return d_pe, d_pp, d_s, d_sort

    substep.defvjp(fwd, bwd)
    return substep


@jax.custom_vjp
def scrub_cotangents(tree):
    """Identity whose backward NaN/Inf-scrubs the cotangent — the
    standalone form of the reference's per-step ``nan_to_num`` on all
    sim gradients (``sim/interface.py:65-74``). ``mpm_step_diff`` bakes
    this into its direct adjoint; composed steps (the halo-sharded step,
    ``parallel/halo.py``) wrap their differentiable inputs instead."""
    return tree


def _scrub_fwd(tree):
    return tree, None


def _scrub_bwd(_, ct):
    return (
        jax.tree_util.tree_map(
            lambda t: jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0),
            ct,
        ),
    )


scrub_cotangents.defvjp(_scrub_fwd, _scrub_bwd)


def advect_extra(
    constants: MPMConstants,
    statics: Statics,
    state: ParticleState,
    stress: jnp.ndarray,
    statics_extra: Statics,
    state_extra: ParticleState,
) -> ParticleState:
    """Advect a passive secondary particle set from the grid produced by the
    primary set (reference ``MPMModel.forward_extra``, mpm.py:260-277)."""
    grid_m, grid_mv = p2g(constants, statics, state, stress)
    grid_v = grid_op(constants, grid_m, grid_mv)
    return g2p(constants, statics_extra, state_extra, grid_v)
