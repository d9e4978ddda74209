"""Neural material adaptors (NCLaw-style meta materials) with LoRA.

TPU-native re-implementation of ``modules/nclaw/material/meta.py`` from the
reference repo. The flagship pair used by NeuMA's grounding pipeline is
``InvariantFullMetaElasticity`` / ``InvariantFullMetaPlasticity``
(reference ``experiments/finetune.py:29,608``): featurize F into
[sigma - 1 (3), flat(F^T F - I) (9), det(F) - 1 (1)], run an MLP, build a
symmetric correction, rotate by R = U V^h.

Every adaptor exposes:
    init(key) -> params
    apply(params, F) -> stress (elasticity) or corrected F (plasticity)
    init_lora(params, key, r, alpha) -> params with LoRA leaves
    lora_mask(params) / lora_params(params)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.mlp import (
    MLPConfig,
    add_lora_to_mlp,
    apply_mlp,
    init_mlp,
    lora_mask as _lora_mask,
    lora_params as _lora_params,
)
from ..ops.svd3 import svd3, svd3c

Params = Dict


@dataclasses.dataclass(frozen=True)
class MetaMaterialConfig:
    """Mirror of the reference constitution sub-config
    (``configs/synthetic/finetune-bb.yaml:63-94``)."""

    layer_widths: Sequence[int] = (64, 64)
    norm: Optional[str] = None
    nonlinearity: Optional[str] = "gelu"
    no_bias: bool = True
    normalize_input: bool = True
    alpha: float = 1e-3  # plasticity correction scale (meta.py:362)

    @classmethod
    def from_cfg(cls, cfg) -> "MetaMaterialConfig":
        return cls(
            layer_widths=tuple(cfg.get("layer_widths", (64, 64))),
            norm=cfg.get("norm"),
            nonlinearity=cfg.get("nonlinearity", "gelu"),
            no_bias=bool(cfg.get("no_bias", True)),
            normalize_input=bool(cfg.get("normalize_input", True)),
            alpha=float(cfg.get("alpha", 1e-3)),
        )


def _sym(x):
    return 0.5 * (x + jnp.swapaxes(x, -1, -2))


def _flatten33(x):
    return x.reshape(x.shape[:-2] + (9,))


def _unflatten33(x):
    return x.reshape(x.shape[:-1] + (3, 3))


class _MetaBase:
    in_dim: int = 13
    out_dim: int = 9

    def __init__(self, cfg):
        if not isinstance(cfg, MetaMaterialConfig):
            cfg = MetaMaterialConfig.from_cfg(cfg)
        self.cfg = cfg
        self.mlp_cfg = MLPConfig(
            in_dim=self.in_dim,
            out_dim=self.out_dim,
            layer_widths=tuple(cfg.layer_widths),
            norm=cfg.norm,
            nonlinearity=cfg.nonlinearity,
            no_bias=cfg.no_bias,
        )

    def init(self, key) -> Params:
        return init_mlp(key, self.mlp_cfg)

    def init_lora(self, params: Params, key, r: int, alpha: float) -> Params:
        return add_lora_to_mlp(params, key, r, alpha)

    def lora_mask(self, params: Params) -> Params:
        return _lora_mask(params)

    def lora_params(self, params: Params) -> Params:
        return _lora_params(params)

    def _mlp(self, params, x):
        return apply_mlp(params, self.mlp_cfg, x)


def _mm9(a, b):
    """Row-major component 3x3 matmul: c[3i+j] = sum_k a[3i+k] b[3k+j]."""
    return [
        sum(a[3 * i + k] * b[3 * k + j] for k in range(3))
        for i in range(3)
        for j in range(3)
    ]


class _InvariantFullFeatures:
    """Featurization shared by the InvariantFull pair (meta.py:196-213,
    468-480).

    Fully scalarized: on TPU an f32[N,3,3] array is tiled T(4,128) (9 of
    512 tile slots used), so the R = U@Vh / F^T F / det tensor ops — and
    especially their VJPs — each pay ~50x their natural bandwidth. The
    component form keeps the whole featurization and output assembly in
    full-lane (N,) fusions; measured ~12 ms/substep of material-layer
    backward at 30k particles collapsed to the MLP's matmuls.
    """

    @staticmethod
    def features_c(f9, normalize):
        """f9: row-major 9-tuple of (N,) f32 components of F. Returns
        (x, r9) with x the (N, 13) MLP input and r9 = components of
        R = U @ Vh."""
        u9, s3, vh9 = svd3c(f9)
        r9 = _mm9(u9, vh9)
        # FtF[i][j] = sum_r F[r,i] F[r,j]  (symmetric; all 9 emitted to
        # match the reference's flat(FtF) feature layout)
        ftf = [
            sum(f9[3 * r + i] * f9[3 * r + j] for r in range(3))
            for i in range(3)
            for j in range(3)
        ]
        det = (
            f9[0] * (f9[4] * f9[8] - f9[5] * f9[7])
            - f9[1] * (f9[3] * f9[8] - f9[5] * f9[6])
            + f9[2] * (f9[3] * f9[7] - f9[4] * f9[6])
        )
        if normalize:
            feats = (
                [s - 1.0 for s in s3]
                + [c - 1.0 if k in (0, 4, 8) else c
                   for k, c in enumerate(ftf)]
                + [det - 1.0]
            )
        else:
            feats = list(s3) + list(ftf) + [det]
        x = jnp.stack(feats, axis=-1)
        return x, r9

    @staticmethod
    def features(F, normalize):
        """Tensor-form wrapper kept for the non-hot-path variants."""
        f9 = _unpack9(F)
        x, r9 = _InvariantFullFeatures.features_c(f9, normalize)
        R = _pack9(r9, F.dtype)
        return x, R, jnp.swapaxes(F, -1, -2)


def _unpack9(F):
    F9 = F.astype(jnp.float32).reshape(F.shape[:-2] + (9,))
    return tuple(F9[..., k] for k in range(9))


def _pack9(c9, dtype):
    return (
        jnp.stack(c9, axis=-1)
        .reshape(c9[0].shape + (3, 3))
        .astype(dtype)
    )


def _rsym9(r9, y):
    """Components of R @ sym(Y) where Y = unflatten(y) for y (N, 9)."""
    y9 = [y[..., k] for k in range(9)]
    s = [
        0.5 * (y9[3 * i + j] + y9[3 * j + i])
        for i in range(3)
        for j in range(3)
    ]
    return _mm9(r9, s)


class InvariantFullMetaElasticity(_MetaBase):
    """meta.py:170-221. F -> cauchy stress = (R sym(MLP(feat))) F^T."""

    in_dim = 13
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        f9 = _unpack9(F)
        x, r9 = _InvariantFullFeatures.features_c(
            f9, self.cfg.normalize_input
        )
        y = self._mlp(params, x)
        p9 = _rsym9(r9, y)
        # cauchy[i][j] = sum_k P[i,k] Ft[k,j] = sum_k P[i,k] F[j,k]
        c9 = [
            sum(p9[3 * i + k] * f9[3 * j + k] for k in range(3))
            for i in range(3)
            for j in range(3)
        ]
        return _pack9(c9, F.dtype)


class InvariantFullMetaPlasticity(_MetaBase):
    """meta.py:442-489. F -> F + alpha * R sym(MLP(feat)).
    Note: featurization is always normalized here (meta.py:476-478)."""

    in_dim = 13
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        f9 = _unpack9(F)
        x, r9 = _InvariantFullFeatures.features_c(f9, True)
        y = self._mlp(params, x)
        d9 = _rsym9(r9, y)
        a = self.cfg.alpha
        out9 = [f9[k] + a * d9[k] for k in range(9)]
        return _pack9(out9, F.dtype)


class PlainMetaElasticity(_MetaBase):
    """meta.py:58-86. Input flat(F - I) (or flat F), P = MLP out,
    cauchy = P F^T."""

    in_dim = 9
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        eye = jnp.eye(3, dtype=F.dtype)
        x = _flatten33(F - eye) if self.cfg.normalize_input else _flatten33(F)
        P = _unflatten33(self._mlp(params, x))
        return P @ jnp.swapaxes(F, -1, -2)


class PlainMetaPlasticity(_MetaBase):
    """meta.py:373-401."""

    in_dim = 9
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        eye = jnp.eye(3, dtype=F.dtype)
        x = _flatten33(F - eye) if self.cfg.normalize_input else _flatten33(F)
        delta = self.cfg.alpha * _unflatten33(self._mlp(params, x))
        return F + delta


class PolarMetaElasticity(_MetaBase):
    """meta.py:89-124. Polar split F = R S; MLP on S."""

    in_dim = 9
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        eye = jnp.eye(3, dtype=F.dtype)
        U, sigma, Vh = svd3(F)
        R = U @ Vh
        V = jnp.swapaxes(Vh, -1, -2)
        S = (V * sigma[..., None, :]) @ Vh
        x = _flatten33(S - eye) if self.cfg.normalize_input else _flatten33(S)
        y = _sym(_unflatten33(self._mlp(params, x)))
        P = R @ y
        return P @ jnp.swapaxes(F, -1, -2)


class PolarMetaPlasticity(_MetaBase):
    """meta.py:404-439."""

    in_dim = 9
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        eye = jnp.eye(3, dtype=F.dtype)
        U, sigma, Vh = svd3(F)
        R = U @ Vh
        V = jnp.swapaxes(Vh, -1, -2)
        S = (V * sigma[..., None, :]) @ Vh
        x = _flatten33(S - eye) if self.cfg.normalize_input else _flatten33(S)
        y = _sym(_unflatten33(self._mlp(params, x)))
        return F + self.cfg.alpha * (R @ y)


class InvariantMetaElasticity(_MetaBase):
    """meta.py:127-167. Scalar invariants [tr sigma, tr F^T F, det F]."""

    in_dim = 3
    out_dim = 9

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        U, sigma, Vh = svd3(F)
        R = U @ Vh
        Ft = jnp.swapaxes(F, -1, -2)
        tr_ftf = jnp.trace(Ft @ F, axis1=-2, axis2=-1)
        det = jnp.linalg.det(F)
        if self.cfg.normalize_input:
            i1 = jnp.sum(sigma, axis=-1) - 3.0
            i2 = tr_ftf - 1.0
            i3 = det - 1.0
        else:
            i1 = jnp.sum(sigma, axis=-1)
            i2 = tr_ftf
            i3 = det
        x = jnp.stack([i1, i2, i3], axis=-1)
        y = _sym(_unflatten33(self._mlp(params, x)))
        P = R @ y
        return P @ Ft


class SVDMetaElasticity(_MetaBase):
    """meta.py:224-256. MLP on sigma; P = U diag(out) Vh."""

    in_dim = 3
    out_dim = 3

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        U, sigma, Vh = svd3(F)
        x = sigma - 1.0 if self.cfg.normalize_input else sigma
        y = self._mlp(params, x)
        P = (U * y[..., None, :]) @ Vh
        return P @ jnp.swapaxes(F, -1, -2)


class SVDMetaPlasticity(_MetaBase):
    """meta.py:577-607."""

    in_dim = 3
    out_dim = 3

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        U, sigma, Vh = svd3(F)
        x = sigma - 1.0 if self.cfg.normalize_input else sigma
        y = self._mlp(params, x)
        delta = self.cfg.alpha * ((U * y[..., None, :]) @ Vh)
        return F + delta


class _SplineBase:
    """Xu et al. 2015 cubic-spline material editor (meta.py:260-355 /
    492-574): three learnable 1D splines f (principal stretch), g (areas),
    h (volume) over uniform knots."""

    def __init__(self, cfg):
        self.num_side_points = int(cfg["num_side_points"])
        self.xk_max = float(cfg["xk_max"])
        self.yk_max = float(cfg["yk_max"])
        self.alpha = float(cfg.get("alpha", 1e-3))
        left = np.linspace(0.0, 1.0, self.num_side_points + 1)
        right = np.linspace(1.0, self.xk_max, self.num_side_points + 1)
        xk = np.array(list(left[:-1]) + [1.0] + list(right[1:]), np.float32)
        self.xk = jnp.asarray(xk)
        self.w = jnp.asarray(
            [
                [-1.0, 3.0, -3.0, 1.0],
                [3.0, -6.0, 3.0, 0.0],
                [-3.0, 3.0, 0.0, 0.0],
                [-1.0, 0.0, 0.0, 0.0],
            ],
            jnp.float32,
        )

    def init(self, key=None, zero_init=False) -> Params:
        n = self.xk.shape[0]
        if zero_init:
            yk = jnp.zeros((n,), jnp.float32)
            return {"yk_f": yk, "yk_g": yk, "yk_h": yk}
        lin = jnp.linspace(-self.yk_max, self.yk_max, n, dtype=jnp.float32)
        return {"yk_f": lin, "yk_g": lin, "yk_h": lin}

    def _ak(self, yk):
        ak_1 = 2.0 / 3.0 * yk[0] + 2.0 / 3.0 * yk[1] - 1.0 / 3.0 * yk[2]
        ak_else = yk[1:-1] - yk[:-2] / 6.0 + yk[2:] / 6.0
        return jnp.concatenate([ak_1[None], ak_else], axis=0)

    def _bk(self, yk):
        bk_else = yk[1:-1] + yk[:-2] / 6.0 - yk[2:] / 6.0
        bk_m = 2.0 / 3.0 * yk[-1] + 2.0 / 3.0 * yk[-2] - 1.0 / 3.0 * yk[-3]
        return jnp.concatenate([bk_else, bk_m[None]], axis=0)

    def _spline(self, yk, lam):
        """Evaluate the spline at lam (..., k). Mirrors meta.py:310-330
        including the index clamp to [0, num_side_points - 1]."""
        idx = jnp.searchsorted(self.xk, lam, side="left")
        idx = jnp.clip(idx, 0, self.num_side_points - 1)
        ak = self._ak(yk)
        bk = self._bk(yk)
        y_left = yk[idx]
        y_right = yk[idx + 1]
        a = ak[idx]
        b = bk[idx]
        right = jnp.stack([y_left, a, b, y_right], axis=-1)  # (..., 4)
        xi = (lam - self.xk[idx]) / (self.xk[idx + 1] - self.xk[idx])
        xi_vec = jnp.stack(
            [xi ** 3, xi ** 2, xi, jnp.ones_like(xi)], axis=-1
        )
        left = xi_vec @ self.w  # (..., 4)
        return jnp.sum(left * right, axis=-1)

    def _new_sigma(self, params, F):
        U, sigma, Vh = svd3(F)
        f = self._spline(params["yk_f"], sigma)
        areas = jnp.stack(
            [
                sigma[..., 0] * sigma[..., 1],
                sigma[..., 1] * sigma[..., 2],
                sigma[..., 0] * sigma[..., 2],
            ],
            axis=-1,
        )
        g = self._spline(params["yk_g"], areas)
        g1 = g[..., (0, 0, 2)] * sigma[..., (1, 0, 0)]
        g2 = g[..., (2, 1, 1)] * sigma[..., (2, 2, 1)]
        volume = (sigma[..., 0] * sigma[..., 1] * sigma[..., 2])[..., None]
        h = (
            self._spline(params["yk_h"], volume)
            * sigma[..., (1, 0, 0)]
            * sigma[..., (2, 2, 1)]
        )
        return U, f + g1 + g2 + h, Vh

    def init_lora(self, params, key, r, alpha):
        return params  # splines have no linear layers

    def lora_mask(self, params):
        return jax.tree_util.tree_map(lambda _: False, params)

    def lora_params(self, params):
        return {}


class SplineMetaElasticity(_SplineBase):
    """meta.py:260-355."""

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        U, new_sigma, Vh = self._new_sigma(params, F)
        P = (U * new_sigma[..., None, :]) @ Vh
        return P @ jnp.swapaxes(F, -1, -2)


class SplineMetaPlasticity(_SplineBase):
    """meta.py:492-574 (zero-init knots)."""

    def init(self, key=None, zero_init=True) -> Params:
        return super().init(key, zero_init=True)

    def apply(self, params: Params, F: jnp.ndarray) -> jnp.ndarray:
        U, new_sigma, Vh = self._new_sigma(params, F)
        delta = self.alpha * ((U * new_sigma[..., None, :]) @ Vh)
        return F + delta
