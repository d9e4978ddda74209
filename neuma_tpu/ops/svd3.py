"""Batched differentiable 3x3 SVD for TPU.

TPU-native replacement for the reference's Warp ``wp.svd3`` kernel + torch
autograd bridge (``modules/nclaw/warp/svd.py`` in the reference repo).

Design notes
------------
* Forward: fully-scalarized one-sided Jacobi — the 3x3 matrix is carried
  as nine (N,) component arrays so every op is a full-lane VPU op over
  the batch dim (trailing size-3 dims would waste 125/128 lanes). Fixed
  sweep count, no data-dependent control flow.
* Component API (``svd3c``): takes/returns *flat row-major component
  tuples* of (N,) arrays instead of (N, 3, 3) tensors. On TPU an
  f32[N,3,3] array is tiled T(4,128) — 9 of 512 tile slots used — so
  every op touching it pays ~50x its natural bandwidth (measured: the
  material-layer backward was ~14 ms/substep of such ops at 30k
  particles). The component form keeps the whole SVD and its adjoint
  in full-lane (N,) fusions; ``svd3`` packs/unpacks only at the API
  boundary for callers that want tensors.
* Sign convention matches the reference (``svd.py:76-92``): ``det(U) > 0``
  and ``det(V) > 0`` are enforced by flipping the third column of U/V and
  the sign of ``sigma[2]``. Singular values are sorted by magnitude
  descending; ``sigma[2]`` may therefore be negative for reflections.
* Backward: custom VJP using the standard full-SVD adjoint with clamped
  ``1/(s_j^2 - s_i^2)`` denominators so near-degenerate singular values
  produce large-but-finite gradients (the reference relies on Warp's svd3
  adjoint plus NaN scrubbing downstream; we keep the scrub in the sim's
  VJP as well for parity). The adjoint is likewise fully scalarized.

``svd3`` returns (U, sigma, Vh) with shapes (..., 3, 3), (..., 3),
(..., 3, 3) such that ``A == U @ diag(sigma) @ Vh``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 6  # 3 pairs/sweep; 6 sweeps converges f32 for well-scaled F


def _svd3_core(b, sweeps: int = _JACOBI_SWEEPS):
    """One-sided Jacobi on column-major component lists.

    ``b[c][r]`` = A[r, c] as (N,) arrays (f32). Returns ``(u, sig, v)``
    in the same column-major nested-list form: ``u[c]``/``v[c]`` are the
    columns of U/V, ``sig[c]`` the signed singular values (descending by
    magnitude, reflection sign on ``sig[2]``).
    """
    b = [[x for x in col] for col in b]
    one = jnp.ones_like(b[0][0])
    zero = jnp.zeros_like(b[0][0])
    v = [
        [one if r == c else zero for r in range(3)] for c in range(3)
    ]

    def rotate(p, q):
        bp, bq = b[p], b[q]
        alpha = bp[0] * bp[0] + bp[1] * bp[1] + bp[2] * bp[2]
        beta = bq[0] * bq[0] + bq[1] * bq[1] + bq[2] * bq[2]
        gamma = bp[0] * bq[0] + bp[1] * bq[1] + bp[2] * bq[2]
        # Skip (identity rotation) once the pair is numerically
        # orthogonal — roundoff-level gamma with alpha ~ beta would
        # otherwise produce large spurious rotations.
        denom_ok = gamma * gamma > (1e-14 * alpha * beta + 1e-38)
        safe_gamma = jnp.where(denom_ok, gamma, 1.0)
        zeta = (beta - alpha) / (2.0 * safe_gamma)
        t = jnp.sign(zeta) / (jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
        t = jnp.where(denom_ok, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = c * t
        b[p] = [c * bp[r] - s * bq[r] for r in range(3)]
        b[q] = [s * bp[r] + c * bq[r] for r in range(3)]
        vp, vq = v[p], v[q]
        v[p] = [c * vp[r] - s * vq[r] for r in range(3)]
        v[q] = [s * vp[r] + c * vq[r] for r in range(3)]

    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            rotate(p, q)

    sig = [
        jnp.sqrt(b[c][0] ** 2 + b[c][1] ** 2 + b[c][2] ** 2)
        for c in range(3)
    ]

    # Sort columns by sigma descending: comparator network (0,1)(1,2)(0,1).
    def cswap(i, j):
        swap = sig[i] < sig[j]

        def sel(x, y):
            return jnp.where(swap, y, x), jnp.where(swap, x, y)

        sig[i], sig[j] = sel(sig[i], sig[j])
        for r in range(3):
            b[i][r], b[j][r] = sel(b[i][r], b[j][r])
            v[i][r], v[j][r] = sel(v[i][r], v[j][r])

    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)

    # U columns = normalized B columns, with a cross-product fallback for
    # a collapsed third column (keeps U orthonormal; reference Warp svd3
    # is robust here too).
    u = [[None] * 3 for _ in range(3)]
    for c in range(3):
        inv = 1.0 / jnp.maximum(sig[c], 1e-30)
        for r in range(3):
            u[c][r] = b[c][r] * inv
    cx = u[0][1] * u[1][2] - u[0][2] * u[1][1]
    cy = u[0][2] * u[1][0] - u[0][0] * u[1][2]
    cz = u[0][0] * u[1][1] - u[0][1] * u[1][0]
    cn = jnp.maximum(jnp.sqrt(cx * cx + cy * cy + cz * cz), 1e-30)
    tiny = sig[2] < 1e-8
    u[2][0] = jnp.where(tiny, cx / cn, u[2][0])
    u[2][1] = jnp.where(tiny, cy / cn, u[2][1])
    u[2][2] = jnp.where(tiny, cz / cn, u[2][2])

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[1][0] * (m[0][1] * m[2][2] - m[0][2] * m[2][1])
            + m[2][0] * (m[0][1] * m[1][2] - m[0][2] * m[1][1])
        )

    # Sign fix: det(U) > 0, det(V) > 0 via 3rd-column flips folded into
    # sigma[2] (reference modules/nclaw/warp/svd.py:76-92).
    for cols in (u, v):
        flip = det3(cols) < 0.0
        sgn = jnp.where(flip, -1.0, 1.0)
        for r in range(3):
            cols[2][r] = cols[2][r] * sgn
        sig[2] = sig[2] * sgn

    return u, sig, v


def _svd3c_fwd_impl(F9):
    """Row-major 9-tuple of (N,) f32 -> (u9, s3, vh9) row-major tuples:
    ``u9[3r+c] = U[r,c]``, ``vh9[3i+j] = Vh[i,j]``."""
    # column-major lists for the core: b[c][r] = A[r, c] = F9[3r+c]
    b = [[F9[3 * r + c] for r in range(3)] for c in range(3)]
    u, sig, v = _svd3_core(b)
    u9 = tuple(u[c][r] for r in range(3) for c in range(3))
    s3 = tuple(sig)
    # Vh[i, j] = V[j, i] = v[i][j]
    vh9 = tuple(v[i][j] for i in range(3) for j in range(3))
    return u9, s3, vh9


@jax.custom_vjp
def svd3c(F9):
    """Component-form batched signed 3x3 SVD.

    ``F9`` is a row-major 9-tuple of identically-shaped f32 arrays
    (``F9[3r+c] = A[..., r, c]``). Returns ``(u9, s3, vh9)`` row-major
    component tuples with the same convention as :func:`svd3`. Runs
    entirely on full-lane batch-shaped arrays — the production path for
    the material layer.
    """
    return _svd3c_fwd_impl(F9)


def _svd3c_fwd(F9):
    out = _svd3c_fwd_impl(F9)
    return out, out


def _svd3c_bwd(res, cots):
    u9, s3, vh9 = res
    du9, ds3, dvh9 = cots

    def U(r, c):
        return u9[3 * r + c]

    def dU(r, c):
        return du9[3 * r + c]

    def Vh(i, j):
        return vh9[3 * i + j]

    def dVh(i, j):
        return dvh9[3 * i + j]

    zero = jnp.zeros_like(s3[0])
    du_ = [
        [dU(r, c) if du9[3 * r + c] is not None else zero
         for c in range(3)] for r in range(3)
    ]
    dvh_ = [
        [dVh(i, j) if dvh9[3 * i + j] is not None else zero
         for j in range(3)] for i in range(3)
    ]
    ds_ = [d if d is not None else zero for d in ds3]

    # F_ij = 1 / (s_j^2 - s_i^2), i != j, clamped for near-degenerate
    # pairs (same clamp as the tensor-form adjoint had).
    s2 = [s * s for s in s3]
    eps = 1e-10

    def Fm(i, j):
        diff = s2[j] - s2[i]
        return jnp.sign(diff) / jnp.maximum(jnp.abs(diff), eps)

    # UtdU[i][j] = sum_r U[r,i] dU[r,j];  VtdV[i][j] = sum_r Vh[i,r] dVh[j,r]
    UtdU = [
        [sum(U(r, i) * du_[r][j] for r in range(3)) for j in range(3)]
        for i in range(3)
    ]
    VtdV = [
        [sum(Vh(i, r) * dvh_[j][r] for r in range(3)) for j in range(3)]
        for i in range(3)
    ]

    inner = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            if i == j:
                inner[i][j] = ds_[i]
            else:
                f = Fm(i, j)
                J = f * (UtdU[i][j] - UtdU[j][i])
                K = f * (VtdV[i][j] - VtdV[j][i])
                inner[i][j] = J * s3[j] + s3[i] * K

    # dA[r, c] = sum_{i,j} U[r,i] inner[i][j] Vh[j,c]
    dA9 = []
    for r in range(3):
        for c in range(3):
            acc = zero
            for i in range(3):
                for j in range(3):
                    acc = acc + U(r, i) * inner[i][j] * Vh(j, c)
            dA9.append(acc)
    return (tuple(dA9),)


svd3c.defvjp(_svd3c_fwd, _svd3c_bwd)


def unpack33(A):
    """(..., 3, 3) -> row-major 9-tuple of (...,) f32 components."""
    A9 = A.astype(jnp.float32).reshape(A.shape[:-2] + (9,))
    return tuple(A9[..., k] for k in range(9))


def pack33(c9, dtype=None):
    """Row-major 9-tuple of (...,) components -> (..., 3, 3)."""
    out = jnp.stack(c9, axis=-1).reshape(c9[0].shape + (3, 3))
    return out if dtype is None else out.astype(dtype)


def svd3(A: jnp.ndarray):
    """Batched signed 3x3 SVD: A = U @ diag(sigma) @ Vh with det(U) > 0,
    det(V) > 0 (sigma[2] carries reflection sign). Tensor-form wrapper
    around :func:`svd3c` (gradients flow through its scalarized VJP)."""
    orig_dtype = A.dtype
    u9, s3, vh9 = svd3c(unpack33(A))
    U = pack33(u9, orig_dtype)
    s = jnp.stack(s3, axis=-1).astype(orig_dtype)
    Vh = pack33(vh9, orig_dtype)
    return U, s, Vh
