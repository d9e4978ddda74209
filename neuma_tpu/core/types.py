"""Core pytree state containers for the MPM simulator.

TPU-native redesign of the reference's Warp structs
(``modules/nclaw/sim/mpm.py:14-168`` in the reference repo): instead of
device-side structs of arrays managed by a kernel runtime, states are plain
JAX pytrees (frozen dataclasses of ``jnp.ndarray``) that flow through pure
functions under ``jit`` / ``scan`` / ``shard_map``.

Conventions
-----------
* All floating point state is float32 (matches the reference's numerics).
* The MPM grid is a cube of ``num_grids`` cells per side in the unit box
  [0, 1]^3; ``dx = 1 / num_grids``.
* ``ParticleState.F`` is the deformation gradient (init = identity),
  ``C`` the APIC affine velocity matrix, ``stress`` the Cauchy stress
  produced by the elasticity model each step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves
    unless marked static via ``metadata={'static': True}``)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def static_field(**kwargs):
    return dataclasses.field(metadata={"static": True}, **kwargs)


@_pytree_dataclass
class MPMConstants:
    """Simulation constants (reference: ``MPMConstant`` struct,
    ``modules/nclaw/sim/mpm.py:158-167`` + builder ``mpm.py:501-551``).

    ``num_grids``, ``bound`` and ``bc`` are static (they determine shapes /
    compiled branches); the rest are traced scalars so the same executable
    can serve different dt/gravity.
    """

    num_grids: int = static_field(default=32)
    bound: int = static_field(default=1)
    bc: str = static_field(default="freeslip")  # 'freeslip' | 'noslip'
    dt: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(1e-3)
    )
    gravity: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros(3, jnp.float32)
    )
    eps: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(6e-7)
    )

    @property
    def dx(self) -> float:
        return 1.0 / self.num_grids

    @property
    def inv_dx(self) -> float:
        return float(self.num_grids)

    @classmethod
    def from_cfg(cls, cfg) -> "MPMConstants":
        """Build from a config mapping with keys
        num_grids, dt, bound, gravity, bc, eps
        (mirrors ``MPMModelBuilder.parse_cfg``, reference ``mpm.py:507-528``)."""
        return cls(
            num_grids=int(cfg["num_grids"]),
            bound=int(cfg["bound"]),
            bc=str(cfg["bc"]),
            dt=jnp.float32(cfg["dt"]),
            gravity=jnp.asarray(np.array(cfg["gravity"], np.float32)),
            eps=jnp.float32(cfg["eps"]),
        )


@_pytree_dataclass
class GridGeom:
    """A view of the simulation grid used by the scatter/gather
    primitives: a (possibly non-cubic) box of ``dims`` cells whose local
    cell (0,0,0) sits at global cell ``origin``.

    The default (``geom=None`` everywhere) is the full cube
    ``[0, num_grids)^3``. The halo-exchange sharded step
    (``parallel/halo.py``) passes per-shard slab views instead: each
    shard scatters into / gathers from only its ``(w + 2*HALO, G, G)``
    slab, with ``origin`` carrying the (traced) shard offset. Particle
    positions stay GLOBAL; the physical edge clamp (to ``[0, G-1]``,
    matching the reference's index clamp) is applied in global
    coordinates before translating into the view. Taps falling outside
    the view contribute nothing (they belong to a neighboring shard's
    view); callers are responsible for covering every tap of the
    particles they pass in, or flagging the violation (see
    ``parallel/halo.py``'s margin flag).
    """

    dims: Tuple[int, int, int] = static_field()
    origin: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros(3, jnp.int32)
    )  # (3,) int32 global cell of local (0,0,0); may be traced per shard

    @property
    def num_cells(self) -> int:
        dx, dy, dz = self.dims
        return dx * dy * dz

    @classmethod
    def cube(cls, num_grids: int) -> "GridGeom":
        return cls(
            dims=(num_grids, num_grids, num_grids),
            origin=jnp.zeros(3, jnp.int32),
        )


@_pytree_dataclass
class Statics:
    """Per-particle static properties (reference: ``MPMStatics``,
    ``mpm.py:14-72``). ``enabled`` gates particles in/out of the sim
    (span-based activation, reference ``mpm.py:67-72``)."""

    vol: jnp.ndarray  # (N,) particle volume
    rho: jnp.ndarray  # (N,) density
    clip_bound: jnp.ndarray  # (N,) advection clamp margin in cells
    enabled: jnp.ndarray  # (N,) int32 0/1

    @property
    def mass(self) -> jnp.ndarray:
        return self.vol * self.rho

    @classmethod
    def from_sections(cls, sections, vols, rhos, clip_bounds, spans, step=0):
        """Section-wise constant fill (reference ``MPMStaticsInitializer``,
        ``mpm.py:738-776``)."""
        vol = np.concatenate(
            [np.full(n, v, np.float32) for n, v in zip(sections, vols)]
        )
        rho = np.concatenate(
            [np.full(n, r, np.float32) for n, r in zip(sections, rhos)]
        )
        clip = np.concatenate(
            [np.full(n, c, np.float32) for n, c in zip(sections, clip_bounds)]
        )
        en = np.concatenate(
            [
                np.full(n, 1 if (s[0] <= step < s[1]) else 0, np.int32)
                for n, s in zip(sections, spans)
            ]
        )
        return cls(
            vol=jnp.asarray(vol),
            rho=jnp.asarray(rho),
            clip_bound=jnp.asarray(clip),
            enabled=jnp.asarray(en),
        )

    def with_enabled_at_step(self, sections, spans, step):
        en = np.concatenate(
            [
                np.full(n, 1 if (s[0] <= step < s[1]) else 0, np.int32)
                for n, s in zip(sections, spans)
            ]
        )
        return dataclasses.replace(self, enabled=jnp.asarray(en))


@_pytree_dataclass
class ParticleState:
    """Dynamic per-particle state (reference: ``MPMParticleData``,
    ``mpm.py:75-128``; stress lives in the state there but is a per-step
    input here since it is recomputed by the elasticity net every step)."""

    x: jnp.ndarray  # (N, 3) position in [0,1]^3
    v: jnp.ndarray  # (N, 3) velocity
    C: jnp.ndarray  # (N, 3, 3) APIC affine matrix
    F: jnp.ndarray  # (N, 3, 3) deformation gradient

    @classmethod
    def zeros(cls, n: int, dtype=jnp.float32) -> "ParticleState":
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
        return cls(
            x=jnp.zeros((n, 3), dtype),
            v=jnp.zeros((n, 3), dtype),
            C=jnp.zeros((n, 3, 3), dtype),
            F=eye,
        )

    @classmethod
    def initial(cls, x: jnp.ndarray, v: jnp.ndarray) -> "ParticleState":
        n = x.shape[0]
        s = cls.zeros(n, x.dtype)
        return dataclasses.replace(s, x=jnp.asarray(x), v=jnp.asarray(v))

    @property
    def num_particles(self) -> int:
        return self.x.shape[0]


@_pytree_dataclass
class GridState:
    """Background grid fields (reference: ``MPMGridData``, ``mpm.py:131-155``).

    Stored flattened (G^3, ...) — scatter/gather ops index the flat layout;
    use ``cube`` views for block-structured ops."""

    m: jnp.ndarray  # (G^3,) mass
    mv: jnp.ndarray  # (G^3, 3) momentum
    v: jnp.ndarray  # (G^3, 3) velocity

    @classmethod
    def zeros(cls, num_grids: int, dtype=jnp.float32) -> "GridState":
        g3 = num_grids ** 3
        return cls(
            m=jnp.zeros((g3,), dtype),
            mv=jnp.zeros((g3, 3), dtype),
            v=jnp.zeros((g3, 3), dtype),
        )

    def cube(self, num_grids: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        g = num_grids
        return (
            self.m.reshape(g, g, g),
            self.mv.reshape(g, g, g, 3),
            self.v.reshape(g, g, g, 3),
        )
