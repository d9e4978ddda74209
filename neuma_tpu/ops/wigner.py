"""Rotation of real spherical-harmonic coefficients (bands 1..3).

TPU-native replacement for the reference's e3nn-based SH rotation
(``modules/d3gs/utils/transform_utils.py:41-104``, used by the
real-world registration stage to rotate Gaussian SH features). Instead of
e3nn's angle extraction + wigner_D, the band rotation matrices are built
directly from the 3x3 rotation matrix with the Ivanic-Ruedenberg
recursion ("Rotation Matrices for Real Spherical Harmonics", J. Phys.
Chem. 1996 + errata) — pure jnp, differentiable, no dependencies.

Basis convention: PlenOctree real SH ordering (ops/sh.py), band l index
m = -l..l; band-1 basis components correspond to (y, z, x).
"""
from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp


def _band1_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """D^1 in the Ivanic-Ruedenberg real-SH convention: (m=-1, 0, 1) ==
    (y, z, x) ordering without Condon-Shortley signs — entries of R
    permuted so that D1[m'][m] = R[P(m'), P(m)] with P = {-1: y, 0: z,
    1: x}."""
    P = [1, 2, 0]
    return jnp.stack(
        [jnp.stack([R[P[i], P[j]] for j in range(3)]) for i in range(3)]
    )


def _cs_conjugate(D: jnp.ndarray, l: int) -> jnp.ndarray:
    """Convert a band-l rotation from the I-R basis to the PlenOctree
    basis, which carries Condon-Shortley (-1)^m signs on its constants:
    D_ours = S D S with S = diag((-1)^m), m = -l..l."""
    s = jnp.asarray(
        [(-1.0) ** m for m in range(-l, l + 1)], D.dtype
    )
    return D * s[:, None] * s[None, :]


def _next_band(M: jnp.ndarray, Dl1: jnp.ndarray, l: int) -> jnp.ndarray:
    """Build D^l from D^1 (= M) and D^{l-1} (Ivanic-Ruedenberg)."""

    def m1(i):  # M indexed by m in {-1,0,1}
        return M[i + 1]

    def dl1(a, b):  # D^{l-1} indexed by m in [-(l-1), l-1]
        return Dl1[a + l - 1, b + l - 1]

    def Pf(i, a, b):
        if abs(b) < l:
            return m1(i)[0 + 1] * dl1(a, b)
        if b == l:
            return m1(i)[1 + 1] * dl1(a, l - 1) - m1(i)[-1 + 1] * dl1(
                a, -l + 1
            )
        # b == -l
        return m1(i)[1 + 1] * dl1(a, -l + 1) + m1(i)[-1 + 1] * dl1(
            a, l - 1
        )

    def Uf(m, n):
        return Pf(0, m, n)

    def Vf(m, n):
        if m == 0:
            return Pf(1, 1, n) + Pf(-1, -1, n)
        if m > 0:
            d = 1.0 if m == 1 else 0.0
            return Pf(1, m - 1, n) * math.sqrt(1 + d) - Pf(
                -1, -m + 1, n
            ) * (1 - d)
        d = 1.0 if m == -1 else 0.0
        return Pf(1, m + 1, n) * (1 - d) + Pf(
            -1, -m - 1, n
        ) * math.sqrt(1 + d)

    def Wf(m, n):
        if m == 0:
            return 0.0
        if m > 0:
            return Pf(1, m + 1, n) + Pf(-1, -m - 1, n)
        return Pf(1, m - 1, n) - Pf(-1, -m + 1, n)

    rows = []
    for m in range(-l, l + 1):
        cols = []
        for n in range(-l, l + 1):
            if abs(n) < l:
                denom = (l + n) * (l - n)
            else:
                denom = (2 * l) * (2 * l - 1)
            dm0 = 1.0 if m == 0 else 0.0
            u = math.sqrt((l + m) * (l - m) / denom)
            v = (
                0.5
                * math.sqrt(
                    (1 + dm0) * (l + abs(m) - 1) * (l + abs(m)) / denom
                )
                * (1 - 2 * dm0)
            )
            w = (
                -0.5
                * math.sqrt((l - abs(m) - 1) * (l - abs(m)) / denom)
                * (1 - dm0)
            )
            entry = 0.0
            if u != 0.0:
                entry = entry + u * Uf(m, n)
            if v != 0.0:
                entry = entry + v * Vf(m, n)
            if w != 0.0:
                entry = entry + w * Wf(m, n)
            cols.append(entry)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def sh_rotation_matrices(R: jnp.ndarray, l_max: int = 3) -> List[jnp.ndarray]:
    """Band rotation matrices [D^1, ..., D^{l_max}] for a single 3x3
    rotation R, such that coefficients of a rotated function satisfy
    c_rot^l = D^l @ c^l."""
    D1 = _band1_matrix(R)
    mats: List[jnp.ndarray] = [_cs_conjugate(D1, 1)]
    prev = D1
    for l in range(2, l_max + 1):
        prev = _next_band(D1, prev, l)
        mats.append(_cs_conjugate(prev, l))
    return mats


def rotate_sh(f_rest: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Rotate SH 'rest' coefficients (N, (deg+1)^2 - 1, C) by R (the DC
    band is rotation-invariant and excluded, matching the reference which
    only transforms _features_rest)."""
    n_rest = f_rest.shape[1]
    l_max = int(round(math.sqrt(n_rest + 1))) - 1
    mats = sh_rotation_matrices(R, l_max)
    out = []
    start = 0
    for l in range(1, l_max + 1):
        width = 2 * l + 1
        band = f_rest[:, start : start + width, :]  # (N, w, C)
        out.append(jnp.einsum("ij,njc->nic", mats[l - 1], band))
        start += width
    return jnp.concatenate(out, axis=1)
