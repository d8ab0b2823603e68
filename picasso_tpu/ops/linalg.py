"""Batched small-matrix linear algebra, unrolled for the TPU VPU.

XLA's batched LAPACK-style factorizations (jnp.linalg.inv / cholesky)
lower poorly for huge batches of tiny (5x5/6x6) systems on TPU. These
routines unroll the factorizations over the static matrix dimension and
keep the batch index N on the last (lane) axis, so every operation is a
fused elementwise op over (N,) vectors.

Used by the MLE CRLB (Fisher inverse diagonal — the float32
equilibrated replacement for the reference's float64 pinv,
picasso/gaussmle.py:689-742) and the LM normal-equation solves
(replacing scipy leastsq / Gpufit, picasso/gausslq.py:240/388).

Matrix layout convention: ``A[p][q]`` is a python list-of-lists of
(N,) arrays (so indexing is static); helpers convert from (P, P, N)
stacked arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def _to_rows(A: jnp.ndarray) -> list[list[jnp.ndarray]]:
    P = A.shape[0]
    return [[A[i, j] for j in range(P)] for i in range(P)]


def chol_factor(A: jnp.ndarray) -> list[list[jnp.ndarray]]:
    """Unrolled Cholesky A = L L^T for SPD (P, P, N) batches. Returns L
    as a lower-triangular list-of-lists of (N,) arrays. Non-SPD inputs
    produce NaNs (propagated downstream like the reference's failed
    fits)."""
    a = _to_rows(A)
    P = len(a)
    L: list[list[jnp.ndarray | None]] = [
        [None] * P for _ in range(P)
    ]
    for j in range(P):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, P):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L  # type: ignore[return-value]


def chol_solve(L: list[list[jnp.ndarray]], b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = chol(A); b is (P, N), returns (P, N)."""
    P = len(L)
    y = [None] * P
    for i in range(P):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def chol_inv_diag(L: list[list[jnp.ndarray]]) -> jnp.ndarray:
    """diag(A^-1) from L = chol(A): columns of Z = L^-1 give
    diag(A^-1)_k = sum_{j>=k} Z[j,k]^2. Returns (P, N)."""
    P = len(L)
    out = []
    for k in range(P):
        z = [None] * P
        z[k] = 1.0 / L[k][k]
        acc = z[k] * z[k]
        for j in range(k + 1, P):
            s = 0.0
            for m in range(k, j):
                s = s - L[j][m] * z[m]
            z[j] = s / L[j][j]
            acc = acc + z[j] * z[j]
        out.append(acc)
    return jnp.stack(out)


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD A x = b for (P, P, N) / (P, N) batches."""
    return chol_solve(chol_factor(A), b)


def spd_inv_diag(A: jnp.ndarray) -> jnp.ndarray:
    """diag(A^-1) for SPD (P, P, N) batches; (P, N)."""
    return chol_inv_diag(chol_factor(A))
