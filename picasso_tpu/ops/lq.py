"""Batched least-squares 2D elliptical Gaussian fitting on TPU via
fixed-iteration Levenberg–Marquardt.

This single kernel replaces BOTH of the reference's LQ paths: the
per-spot ``scipy.optimize.leastsq`` calls farmed out to a process pool
(picasso/gausslq.py:206-343, ftol=xtol=1e-2) and the vendored CUDA
Gpufit DLL (GAUSS_2D_ELLIPTIC, tol 1e-2, ≤20 LM iterations,
picasso/gausslq.py:346-395). The model is the plain (non-integrated)
normalized Gaussian of gausslq.py:33; parameters are
[x, y, photons, bg, sx, sy] with x/y relative to the box center.

All spots advance together; the 6x6 normal equations are solved with a
batched Cholesky factorization after diagonal (Marquardt) damping;
rejected steps raise the damping per spot. Converged spots freeze and
the while_loop exits early once the whole chunk has converged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from picasso_tpu.ops.gaussian import gaussian_pdf

_DEFAULT_CHUNK = 16384


def initial_parameters(spots: jnp.ndarray) -> jnp.ndarray:
    """theta0 = [x, y, photons, bg, sx, sy], x/y relative to the box
    center (picasso/gausslq.py:95-112)."""
    n, s, _ = spots.shape
    half = s // 2
    bg = jnp.min(spots, axis=(1, 2))
    nobg = spots - bg[:, None, None]
    idx = jnp.arange(s, dtype=spots.dtype)
    total = jnp.sum(nobg, axis=(1, 2))
    y_com = jnp.sum(nobg * idx[None, :, None], axis=(1, 2)) / total
    x_com = jnp.sum(nobg * idx[None, None, :], axis=(1, 2)) / total
    degenerate = total <= 0.0
    center = (s - 1) / 2.0
    total_d = jnp.where(degenerate, 0.01, total)
    y_com = jnp.where(degenerate, center, y_com)
    x_com = jnp.where(degenerate, center, x_com)
    photons = jnp.maximum(1.0, total_d)
    dy2 = (idx[None, :, None] - y_com[:, None, None]) ** 2
    dx2 = (idx[None, None, :] - x_com[:, None, None]) ** 2
    sy = jnp.sqrt(jnp.sum(nobg * dy2, axis=(1, 2)) / total_d)
    sx = jnp.sqrt(jnp.sum(nobg * dx2, axis=(1, 2)) / total_d)
    return jnp.stack(
        [x_com - half, y_com - half, photons, bg, sx, sy], axis=1
    )


def _model_and_jacobian(theta: jnp.ndarray, s: int):
    """Gaussian model on the centered grid plus its analytic Jacobian
    w.r.t. [x, y, photons, bg, sx, sy]. Axis factors are (N, S); the
    full pixel grids are outer products."""
    half = s // 2
    grid = jnp.arange(-half, half + 1, dtype=theta.dtype)
    x, y = theta[:, 0:1], theta[:, 1:2]
    photons = theta[:, 2, None, None]
    bg = theta[:, 3, None, None]
    sx, sy = theta[:, 4:5], theta[:, 5:6]

    dx = grid[None, :] - x
    dy = grid[None, :] - y
    gx = gaussian_pdf(dx, sx)  # (N, S)
    gy = gaussian_pdf(dy, sy)
    GX = gx[:, None, :]
    GY = gy[:, :, None]
    model = photons * GY * GX + bg

    dgx_dx = gx * dx / sx**2
    dgy_dy = gy * dy / sy**2
    dgx_dsx = gx * (dx**2 / sx**3 - 1.0 / sx)
    dgy_dsy = gy * (dy**2 / sy**3 - 1.0 / sy)

    J = jnp.stack(
        [
            photons * GY * dgx_dx[:, None, :],
            photons * GX * dgy_dy[:, :, None],
            jnp.broadcast_to(GY * GX, model.shape),
            jnp.ones_like(model),
            photons * GY * dgx_dsx[:, None, :],
            photons * GX * dgy_dsy[:, :, None],
        ],
        axis=1,
    )  # (N, 6, S, S) — derivatives of the model
    return model, J


def _cost(theta: jnp.ndarray, spots: jnp.ndarray, s: int) -> jnp.ndarray:
    half = s // 2
    grid = jnp.arange(-half, half + 1, dtype=theta.dtype)
    gx = gaussian_pdf(grid[None, :] - theta[:, 0:1], theta[:, 4:5])
    gy = gaussian_pdf(grid[None, :] - theta[:, 1:2], theta[:, 5:6])
    model = (
        theta[:, 2, None, None] * gy[:, :, None] * gx[:, None, :]
        + theta[:, 3, None, None]
    )
    r = spots - model
    return jnp.sum(r * r, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("max_it",))
def _fit_chunk(
    spots: jnp.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
) -> jnp.ndarray:
    """LM-fit one padded chunk; returns theta (N, 6)."""
    n, s, _ = spots.shape
    spots = spots.astype(jnp.float32)
    theta0 = initial_parameters(spots)
    cost0 = _cost(theta0, spots, s)
    lam0 = jnp.full((n,), 1e-3, jnp.float32)

    def cond(state):
        theta, lam, cost, done, kk = state
        return (kk < max_it) & ~jnp.all(done)

    def body(state):
        theta, lam, cost, done, kk = state
        model, J = _model_and_jacobian(theta, s)
        r = spots - model  # (N, S, S)
        Jf = J.reshape(n, 6, s * s)
        rf = r.reshape(n, s * s)
        JtJ = jnp.einsum("npk,nqk->npq", Jf, Jf)
        Jtr = jnp.einsum("npk,nk->np", Jf, rf)
        diag = jnp.diagonal(JtJ, axis1=1, axis2=2)
        A = JtJ + (lam[:, None] * diag)[:, None, :] * jnp.eye(6)[None]
        # Solve A delta = Jtr with a batched Cholesky; guard failures.
        L = jnp.linalg.cholesky(A)
        delta = jax.scipy.linalg.cho_solve((L, True), Jtr[..., None])[..., 0]
        ok = jnp.all(jnp.isfinite(delta), axis=1)
        delta = jnp.where(ok[:, None], delta, 0.0)
        trial = theta + delta
        trial_cost = _cost(trial, spots, s)
        improved = ok & (trial_cost < cost) & ~done
        # Relative cost improvement below ftol => converged.
        rel = jnp.abs(cost - trial_cost) / jnp.maximum(cost, 1e-20)
        conv = improved & (rel < ftol)
        theta = jnp.where(improved[:, None], trial, theta)
        cost = jnp.where(improved, trial_cost, cost)
        lam = jnp.where(
            improved, jnp.maximum(lam * 0.1, 1e-9),
            jnp.where(done, lam, jnp.minimum(lam * 10.0, 1e7)),
        )
        # Spots whose damping exploded cannot improve further.
        done = done | conv | (lam >= 1e7)
        return theta, lam, cost, done, kk + 1

    state = (
        theta0, lam0, cost0, jnp.zeros(n, dtype=bool),
        jnp.asarray(0, jnp.int32),
    )
    theta, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return theta


def fit_spots_batched(
    spots: np.ndarray,
    max_it: int = 30,
    chunk: int = _DEFAULT_CHUNK,
    progress_callback=None,
) -> np.ndarray:
    """Fit all spots in device-sized chunks; returns theta (N, 6) with
    columns [x, y, photons, bg, sx, sy]."""
    n = len(spots)
    if n == 0:
        return np.zeros((0, 6), np.float32)
    spots = np.asarray(spots, dtype=np.float32)
    results = []
    for start in range(0, n, chunk):
        part = spots[start:start + chunk]
        n_part = len(part)
        pad = -n_part % 8
        if pad:
            part = np.concatenate(
                [part, np.ones((pad, *part.shape[1:]), part.dtype)], axis=0
            )
        results.append((n_part, _fit_chunk(jnp.asarray(part), max_it)))
    out = []
    done_count = 0
    for n_part, theta in results:
        out.append(np.asarray(theta)[:n_part])
        done_count += n_part
        if callable(progress_callback):
            progress_callback(done_count)
    return np.concatenate(out)
