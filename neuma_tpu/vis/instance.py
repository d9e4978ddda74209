"""Pre-simulated NeuMA scene instance for interactive viewing.

Equivalent of the reference's ``NeuMAInstance``
(``modules/vis/neuma_instance.py``): runs the full rollout once, stores
per-frame Gaussian packs (means + deformed covariances) on the host, and
re-renders any stored frame from any camera on demand. ``resimulate``
re-runs the rollout with edited per-object settings (drop velocity, LoRA
scale, adaptor choice, existence toggles — reference
simulation_panel.py:3-37 / viewer.py:117-167).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import MPMConstants, ParticleState, Statics
from ..render.binding import (
    BindingTable,
    apply_binding_F,
    apply_binding_xyz,
    deform_cov_by_F,
)
from ..render.camera import Camera
from ..render.gaussians import GaussianPack
from ..render.rasterize import RasterConfig, rasterize
from ..sim.mpm import mpm_step


def _set_lora_scale(params, weight: float):
    """Rewrite every ``lora_scale`` leaf to ``weight`` (= alpha/r; the
    reference panel sets alpha = weight * r, viewer.py:135)."""

    def rec(p):
        if isinstance(p, dict):
            out = {
                k: (jnp.asarray(weight, jnp.float32)
                    if k == "lora_scale" else rec(v))
                for k, v in p.items()
            }
            return out
        if isinstance(p, list):
            return [rec(v) for v in p]
        return p

    return rec(params)


@dataclasses.dataclass
class SceneObject:
    """One simulated object with its render/binding/material bundle.

    The editable fields mirror the reference's per-object simulation
    panel (simulation_panel.py:3-37): drop velocity along the up axis,
    LoRA weight (= alpha/r, applied to the ``lora_scale`` leaves),
    adaptor choice (by registry name), and existence."""

    name: str
    gaussians: GaussianPack
    binding: BindingTable
    elasticity: object
    plasticity: object
    params_e: object
    params_p: object
    init_data: object  # MPMInitData
    enabled: bool = True
    scaling_modifier: float = 1.0
    drop_vel: float = 0.0
    lora_weight: float = 1.0
    adaptor: Optional[str] = None
    up_axis: int = 1


class NeuMAInstance:
    def __init__(
        self,
        constants: MPMConstants,
        objects: Sequence[SceneObject],
        num_frames: int = 100,
        substeps: int = 1,
        background: Optional[jnp.ndarray] = None,
        raster_cfg: RasterConfig = RasterConfig(),
        adaptor_registry: Optional[Dict[str, dict]] = None,
    ):
        """``adaptor_registry`` maps adaptor names (the reference's
        bouncy/clay/honey/jelly/rubber/sand dropdown, viewer.py:16-32) to
        ``{"params_e": ..., "params_p": ...}`` trees (or zero-arg
        callables returning such a dict) used when the panel switches an
        object's NeuMA."""
        self.constants = constants
        self.objects = list(objects)
        self.num_frames = num_frames
        self.substeps = substeps
        self.background = (
            background if background is not None else jnp.ones(3)
        )
        self.raster_cfg = raster_cfg
        self.adaptor_registry = adaptor_registry or {}
        self.frames: List[Dict[str, np.ndarray]] = []

    # -- simulation panel edits (reference simulation_panel.py:3-37) -----

    def apply_object_settings(self, name: str, settings: Dict) -> None:
        """Apply panel edits to one object: ``exists`` (bool),
        ``drop_vel`` (float, applied NEGATIVE along the up axis —
        reference viewer.py:134 'NOTE: drop_vel is negative'),
        ``weight`` (LoRA alpha/r, scales the lora_scale leaves),
        ``adaptor`` (registry name)."""
        obj = next(o for o in self.objects if o.name == name)
        if "exists" in settings:
            obj.enabled = bool(settings["exists"])
        if "drop_vel" in settings:
            obj.drop_vel = float(settings["drop_vel"])
            vel = np.zeros(3)
            vel[obj.up_axis] = -obj.drop_vel
            obj.init_data.set_lin_vel(vel)
        if "weight" in settings:
            obj.lora_weight = float(settings["weight"])
            obj.params_e = _set_lora_scale(obj.params_e, obj.lora_weight)
            obj.params_p = _set_lora_scale(obj.params_p, obj.lora_weight)
        if "adaptor" in settings and settings["adaptor"]:
            adaptor = str(settings["adaptor"])
            if adaptor != obj.adaptor:
                entry = self.adaptor_registry[adaptor]
                if callable(entry):
                    entry = self.adaptor_registry[adaptor] = entry()
                obj.params_e = entry["params_e"]
                obj.params_p = entry["params_p"]
                obj.adaptor = adaptor
                # re-apply the current weight to the fresh params
                obj.params_e = _set_lora_scale(
                    obj.params_e, obj.lora_weight
                )
                obj.params_p = _set_lora_scale(
                    obj.params_p, obj.lora_weight
                )

    # -- simulation ------------------------------------------------------

    def simulate(self) -> None:
        """Full rollout; stores per-frame packs on host (reference
        neuma_instance.py:254-336)."""
        from ..sim.initializers import build_initial_state, build_statics

        objs = [o for o in self.objects if o.enabled]
        if not objs:
            self.frames = []
            return
        groups = [o.init_data for o in objs]
        state, sections = build_initial_state(groups)
        statics = build_statics(groups)

        pes = [o.params_e for o in objs]
        pps = [o.params_p for o in objs]

        @jax.jit
        def frame_fn(state):
            def sub(s, _):
                stresses = []
                off = 0
                for o, n in zip(objs, sections):
                    stresses.append(
                        o.elasticity.apply(o.params_e, s.F[off:off + n])
                    )
                    off += n
                stress = jnp.concatenate(stresses)
                s = mpm_step(self.constants, statics, s, stress)
                Fs = []
                off = 0
                for o, n in zip(objs, sections):
                    Fs.append(
                        o.plasticity.apply(o.params_p, s.F[off:off + n])
                    )
                    off += n
                return dataclasses.replace(
                    s, F=jnp.concatenate(Fs)
                ), None

            state, _ = jax.lax.scan(
                sub, state, None, length=self.substeps
            )
            return state

        covs = [
            o.gaussians.get_covariance(o.scaling_modifier) for o in objs
        ]
        prev_x = [None] * len(objs)
        prev_k = [o.gaussians.xyz for o in objs]
        off = 0
        splits = []
        for n in sections:
            splits.append((off, off + n))
            off += n
        prev_x = [state.x[a:b] for a, b in splits]

        self.frames = []
        for _ in range(self.num_frames):
            state = frame_fn(state)
            means_list, cov_list = [], []
            for i, o in enumerate(objs):
                a, b = splits[i]
                m = apply_binding_xyz(
                    o.binding, state.x[a:b], prev_x[i], prev_k[i]
                )
                F_k = apply_binding_F(o.binding, state.F[a:b])
                cov_list.append(deform_cov_by_F(covs[i], F_k))
                means_list.append(m)
                prev_x[i] = state.x[a:b]
                prev_k[i] = m
            self.frames.append(
                {
                    "means": np.asarray(jnp.concatenate(means_list)),
                    "cov": np.asarray(jnp.concatenate(cov_list)),
                }
            )

    # -- rendering -------------------------------------------------------

    def render_frame(
        self, frame_idx: int, camera: Camera
    ) -> np.ndarray:
        """(H, W, 3) uint8 render of stored frame ``frame_idx``
        (reference neuma_instance.py:338-386)."""
        objs = [o for o in self.objects if o.enabled]
        opac = jnp.concatenate([o.gaussians.get_opacity for o in objs])
        shs = jnp.concatenate([o.gaussians.get_features for o in objs])
        sh_degree = objs[0].gaussians.sh_degree
        frame = self.frames[int(np.clip(frame_idx, 0,
                                        len(self.frames) - 1))]
        img = rasterize(
            jnp.asarray(frame["means"]),
            jnp.asarray(frame["cov"]),
            opac,
            camera,
            self.background,
            shs=shs,
            sh_degree=sh_degree,
            cfg=self.raster_cfg,
        )
        arr = np.clip(
            np.asarray(img).transpose(1, 2, 0) * 255, 0, 255
        ).astype(np.uint8)
        return arr
