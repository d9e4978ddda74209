"""Analytic constitutive laws (elasticity F -> Cauchy stress, plasticity
F -> corrected F) as pure-jnp functional modules.

TPU-native re-implementation of the reference's preset materials
(``modules/nclaw/material/preset.py`` in the reference repo). Each material
is a small class holding static config; ``init(key)`` returns a param
pytree (learnable log-E etc.), ``apply(params, F)`` is pure/jittable and
batched over the leading particle dim.

Numerics match the reference, including the sigma >= 0.05 clamps that
guard the plasticity return maps (preset.py:214-215, 262-263).
"""
from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

from ..ops.svd3 import svd3

Params = Dict


def _lame(E, nu):
    mu = E / (2.0 * (1.0 + nu))
    la = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, la


class _ElasticBase:
    """Common learnable-log-E scaffolding (preset.py:30-38 pattern)."""

    def __init__(self, cfg):
        self.E = float(cfg["E"])
        self.nu = float(cfg["nu"])
        self.random = bool(cfg.get("random", False))

    def init(self, key=None) -> Params:
        log_e = math.log(self.E)
        if self.random:
            log_e *= 0.8
        return {"log_E": jnp.asarray([log_e], jnp.float32)}

    def _params(self, params):
        E = jnp.exp(params["log_E"])
        return _lame(E, self.nu)


class CorotatedElasticity(_ElasticBase):
    """preset.py:30-58: 2 mu (F - R) F^T + la J (J-1) I."""

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        mu, la = self._params(params)
        U, sigma, Vh = svd3(F)
        R = U @ Vh
        Ft = jnp.swapaxes(F, -1, -2)
        corotated = 2.0 * mu * ((F - R) @ Ft)
        J = jnp.prod(sigma, axis=-1)[..., None, None]
        eye = jnp.eye(3, dtype=F.dtype)
        volume = la * J * (J - 1.0) * eye
        return corotated + volume


class StVKElasticity(_ElasticBase):
    """preset.py:61-94: 2 mu F E_green + la J (J-1) I."""

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        mu, la = self._params(params)
        _, sigma, _ = svd3(F)
        eye = jnp.eye(3, dtype=F.dtype)
        Ft = jnp.swapaxes(F, -1, -2)
        green = 0.5 * (Ft @ F - eye)
        stvk = 2.0 * mu * (F @ green)
        J = jnp.prod(sigma, axis=-1)[..., None, None]
        volume = la * J * (J - 1.0) * eye
        return stvk + volume


class VolumeElasticity(_ElasticBase):
    """preset.py:97-137: pressure-only EOS ('ziran' | 'taichi' modes)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.mode = str(cfg.get("mode", "taichi")).casefold()
        if self.mode not in ("ziran", "taichi"):
            raise ValueError(f"invalid mode for volume elasticity: {self.mode}")

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        mu, la = self._params(params)
        J = jnp.linalg.det(F)[..., None, None]
        eye = jnp.eye(3, dtype=F.dtype)
        if self.mode == "ziran":
            kappa = 2.0 / 3.0 * mu + la
            gamma = 2.0
            return kappa * (J - 1.0 / jnp.power(J, gamma - 1.0)) * eye
        return la * J * (J - 1.0) * eye


class SigmaElasticity(_ElasticBase):
    """preset.py:140-166: Hencky-strain Kirchhoff stress
    U diag(2 mu log s + la tr(log s)) U^T."""

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        mu, la = self._params(params)
        U, sigma, _ = svd3(F)
        epsilon = jnp.log(sigma)
        trace = jnp.sum(epsilon, axis=-1, keepdims=True)
        tau = 2.0 * mu * epsilon + la * trace
        Ut = jnp.swapaxes(U, -1, -2)
        return (U * tau[..., None, :]) @ Ut


class IdentityPlasticity:
    """preset.py:170-172."""

    def __init__(self, cfg=None):
        pass

    def init(self, key=None) -> Params:
        return {}

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        return F


class SigmaPlasticity:
    """preset.py:175-187: isotropic volume projection F -> J^(1/3) I."""

    def __init__(self, cfg=None):
        pass

    def init(self, key=None) -> Params:
        return {}

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        J = jnp.linalg.det(F)
        Je_1_3 = jnp.cbrt(J)[..., None]
        eye = jnp.eye(3, dtype=F.dtype)
        return Je_1_3[..., None] * eye


class VonMisesPlasticity:
    """preset.py:190-230: log-sigma yield-surface projection."""

    def __init__(self, cfg):
        self.E = float(cfg["E"])
        self.nu = float(cfg["nu"])
        self.sigma_y = float(cfg["sigma_y"])
        self.random = bool(cfg.get("random", False))
        self.dim = 3

    def init(self, key=None) -> Params:
        log_e = math.log(self.E)
        sy = self.sigma_y
        if self.random:
            log_e *= 0.8
            sy *= 0.8
        return {
            "log_E": jnp.asarray([log_e], jnp.float32),
            "sigma_y": jnp.asarray([sy], jnp.float32),
        }

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        E = jnp.exp(params["log_E"])
        mu, _ = _lame(E, self.nu)
        sigma_y = params["sigma_y"]

        U, sigma, Vh = svd3(F)
        sigma = jnp.maximum(sigma, 0.05)  # NaN guard (preset.py:214-215)

        epsilon = jnp.log(sigma)
        trace = jnp.sum(epsilon, axis=-1, keepdims=True)
        epsilon_hat = epsilon - trace / self.dim
        ehn = jnp.linalg.norm(epsilon_hat, axis=-1, keepdims=True)

        delta_gamma = ehn - sigma_y / (2.0 * mu)
        cond_yield = (delta_gamma > 0.0)[..., None]

        safe_ehn = jnp.where(ehn > 0, ehn, 1.0)
        yield_eps = epsilon - (delta_gamma / safe_ehn) * epsilon_hat
        yield_F = (U * jnp.exp(yield_eps)[..., None, :]) @ Vh
        return jnp.where(cond_yield, yield_F, F)


class DruckerPragerPlasticity:
    """preset.py:233-282: friction-cone return map for granular media."""

    def __init__(self, cfg):
        self.E = float(cfg["E"])
        self.nu = float(cfg["nu"])
        self.friction_angle = float(cfg["friction_angle"])
        self.cohesion = float(cfg.get("cohesion", 0.0))
        self.random = bool(cfg.get("random", False))
        self.dim = 3

    def init(self, key=None) -> Params:
        log_e = math.log(self.E)
        fa = self.friction_angle
        if self.random:
            log_e *= 0.8
            fa *= 0.8
        return {
            "log_E": jnp.asarray([log_e], jnp.float32),
            "friction_angle": jnp.asarray([fa], jnp.float32),
        }

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        E = jnp.exp(params["log_E"])
        mu, la = _lame(E, self.nu)
        sin_phi = jnp.sin(jnp.deg2rad(params["friction_angle"]))
        alpha = math.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi)
        cohesion = self.cohesion

        U, sigma, Vh = svd3(F)
        sigma = jnp.maximum(sigma, 0.05)  # NaN guard (preset.py:262-263)

        epsilon = jnp.log(sigma)
        trace = jnp.sum(epsilon, axis=-1, keepdims=True)
        epsilon_hat = epsilon - trace / self.dim
        ehn = jnp.linalg.norm(epsilon_hat, axis=-1, keepdims=True)

        expand_epsilon = jnp.full_like(epsilon, cohesion)
        shifted_trace = trace - cohesion * self.dim
        cond_yield = shifted_trace < 0.0  # (..., 1)

        delta_gamma = ehn + (self.dim * la + 2.0 * mu) / (
            2.0 * mu
        ) * shifted_trace * alpha
        safe_ehn = jnp.where(ehn > 0, ehn, 1.0)
        compress_epsilon = epsilon - (
            jnp.maximum(delta_gamma, 0.0) / safe_ehn
        ) * epsilon_hat

        epsilon = jnp.where(cond_yield, compress_epsilon, expand_epsilon)
        return (U * jnp.exp(epsilon)[..., None, :]) @ Vh
