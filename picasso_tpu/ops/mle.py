"""Batched MLE Gaussian fitting on TPU (Smith et al., Nat. Methods
2010): Newton per-parameter updates on the integrated-Gaussian pixel
model with a Poisson likelihood, Fisher-matrix CRLBs and per-spot
log-likelihoods.

This is the TPU-native replacement for the reference's per-spot numba
loops driven by a lock-stealing thread pool (picasso/gaussmle.py:
_mlefit_sigmaxy :745, _mlefit_sigma :533, gaussmle_async :478). The
whole spot batch advances together: each Newton iteration evaluates the
separable per-axis PSF factors once per spot (two (N, S) arrays) and
combines them with outer products into (N, S, S) pixel grids — pure
VPU-friendly elementwise work with no data-dependent shapes. Per-spot
convergence (|Δx|,|Δy|(,|Δσ|) < eps, gaussmle.py:632/844) is handled
by freezing converged spots; a whole-batch early exit stops the
while_loop when every spot in the chunk has converged.

CRLB: the reference accumulates the Fisher matrix in float64 and
inverts with pinv (gaussmle.py:689-742). TPUs are float32-native, so we
instead diagonally equilibrate the Fisher matrix (unit diagonal) before
the batched inverse — the entries span ~photons²..1, and equilibration
removes that dynamic range so a float32 inverse is accurate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from picasso_tpu.ops.gaussian import (
    derivative_integrated_gaussian,
    derivative_integrated_gaussian_sigma,
    integrated_gaussian,
    iso_sigma_axis_terms,
)

_DEFAULT_CHUNK = 16384


# ---------------------------------------------------------------------------
# Initial parameters (picasso/gaussmle.py:28-168)
# ---------------------------------------------------------------------------


def _mean_filter_min(spots: jnp.ndarray) -> jnp.ndarray:
    """Min over the 3x3-mean-filtered spot — the background initializer
    (picasso/gaussmle.py:62-91, :136)."""
    n, s, _ = spots.shape
    summed = jax.lax.reduce_window(
        spots,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    counts = jax.lax.reduce_window(
        jnp.ones((1, s, s), spots.dtype),
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    return jnp.min(summed / counts, axis=(1, 2))


def initial_theta_sigmaxy(spots: jnp.ndarray) -> jnp.ndarray:
    """theta0 = [x, y, photons, bg, sx, sy] per spot
    (picasso/gaussmle.py:128-168)."""
    n, s, _ = spots.shape
    idx = jnp.arange(s, dtype=spots.dtype)
    total = jnp.sum(spots, axis=(1, 2))
    y_com = jnp.sum(spots * idx[None, :, None], axis=(1, 2)) / total
    x_com = jnp.sum(spots * idx[None, None, :], axis=(1, 2)) / total
    degenerate = total <= 0.0
    center = (s - 1) / 2.0
    total = jnp.where(degenerate, 0.01, total)
    y_com = jnp.where(degenerate, center, y_com)
    x_com = jnp.where(degenerate, center, x_com)

    bg = _mean_filter_min(spots)
    photons = jnp.maximum(1.0, total - s * s * bg)

    # Initial sigmas from second moments of the center row/column of
    # (spot - bg) (picasso/gaussmle.py:95-124).
    half = s // 2
    d2 = (idx - half) ** 2
    nobg = spots - bg[:, None, None]
    col = nobg[:, :, half]  # varies along y
    row = nobg[:, half, :]  # varies along x
    sy = jnp.sqrt(jnp.sum(col * d2, axis=1) / jnp.sum(col, axis=1))
    sx = jnp.sqrt(jnp.sum(row * d2, axis=1) / jnp.sum(row, axis=1))
    sy = jnp.where(jnp.isfinite(sy) & (sy != 0), sy, 0.01)
    sx = jnp.where(jnp.isfinite(sx) & (sx != 0), sx, 0.01)
    return jnp.stack([x_com, y_com, photons, bg, sx, sy], axis=1)


# ---------------------------------------------------------------------------
# Per-iteration Newton terms
# ---------------------------------------------------------------------------


def _pixel_terms_sigmaxy(theta: jnp.ndarray, s: int):
    """Per-axis separable factors for the 6-parameter model. Returns
    per-axis arrays of shape (N, S)."""
    idx = jnp.arange(s, dtype=theta.dtype)
    dx = idx[None, :] - theta[:, 0:1]  # ii - theta_x
    dy = idx[None, :] - theta[:, 1:2]  # jj - theta_y
    sx = theta[:, 4:5]
    sy = theta[:, 5:6]
    psf_x = integrated_gaussian(dx, sx)
    psf_y = integrated_gaussian(dy, sy)
    dmu_x, d2mu_x = derivative_integrated_gaussian(dx, sx)
    dmu_y, d2mu_y = derivative_integrated_gaussian(dy, sy)
    dsig_x, d2sig_x = derivative_integrated_gaussian_sigma(dx, sx)
    dsig_y, d2sig_y = derivative_integrated_gaussian_sigma(dy, sy)
    return (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dsig_x, d2sig_x, dsig_y, d2sig_y,
    )


def _newton_step_sigmaxy(
    theta: jnp.ndarray, spots: jnp.ndarray, max_step: jnp.ndarray
) -> jnp.ndarray:
    """One Newton update of all 6 parameters for every spot
    (picasso/gaussmle.py:793-841)."""
    n, s, _ = spots.shape
    (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dsig_x, d2sig_x, dsig_y, d2sig_y,
    ) = _pixel_terms_sigmaxy(theta, s)
    photons = theta[:, 2, None, None]
    bg = theta[:, 3, None, None]

    # Pixel grids: [n, jj (y/row), ii (x/col)]
    PX = psf_x[:, None, :]
    PY = psf_y[:, :, None]
    model = photons * PY * PX + bg
    data = spots

    valid = model > 10e-3
    cf = jnp.where(valid, data / model - 1.0, 0.0)
    df = jnp.where(valid, data / model**2, 0.0)
    cf = jnp.minimum(cf, 10e4)
    df = jnp.minimum(df, 10e4)

    # First/second derivatives of the model w.r.t. each parameter.
    dudt = jnp.stack(
        [
            photons * PY * dmu_x[:, None, :],
            photons * PX * dmu_y[:, :, None],
            jnp.broadcast_to(PY * PX, model.shape),
            jnp.ones_like(model),
            photons * PY * dsig_x[:, None, :],
            photons * PX * dsig_y[:, :, None],
        ],
        axis=1,
    )  # (n, 6, s, s)
    d2udt2 = jnp.stack(
        [
            photons * PY * d2mu_x[:, None, :],
            photons * PX * d2mu_y[:, :, None],
            jnp.zeros_like(model),
            jnp.zeros_like(model),
            photons * PY * d2sig_x[:, None, :],
            photons * PX * d2sig_y[:, :, None],
        ],
        axis=1,
    )

    numerator = jnp.sum(cf[:, None] * dudt, axis=(2, 3))
    denominator = jnp.sum(
        cf[:, None] * d2udt2 - df[:, None] * dudt**2, axis=(2, 3)
    )

    update = jnp.where(
        denominator == 0.0,
        jnp.sign(numerator) * max_step,
        jnp.clip(numerator / denominator, -max_step, max_step),
    )
    theta = theta - update
    # Constraints (picasso/gaussmle.py:880-884)
    theta = theta.at[:, 2].set(jnp.maximum(theta[:, 2], 1.0))
    theta = theta.at[:, 3].set(jnp.maximum(theta[:, 3], 0.01))
    theta = theta.at[:, 4].set(jnp.maximum(theta[:, 4], 0.01))
    theta = theta.at[:, 5].set(jnp.maximum(theta[:, 5], 0.01))
    return theta


def _newton_step_sigma(
    theta: jnp.ndarray, spots: jnp.ndarray, max_step: jnp.ndarray
) -> jnp.ndarray:
    """One Newton update for the 5-parameter isotropic-sigma model;
    theta columns are [x, y, photons, bg, sigma]
    (picasso/gaussmle.py:574-670)."""
    n, s, _ = spots.shape
    idx = jnp.arange(s, dtype=theta.dtype)
    dx = idx[None, :] - theta[:, 0:1]
    dy = idx[None, :] - theta[:, 1:2]
    sigma = theta[:, 4:5]
    psf_x = integrated_gaussian(dx, sigma)
    psf_y = integrated_gaussian(dy, sigma)
    dmu_x, d2mu_x = derivative_integrated_gaussian(dx, sigma)
    dmu_y, d2mu_y = derivative_integrated_gaussian(dy, sigma)
    dPSFx, d2PSFx = iso_sigma_axis_terms(dx, sigma)
    dPSFy, d2PSFy = iso_sigma_axis_terms(dy, sigma)

    photons = theta[:, 2, None, None]
    bg = theta[:, 3, None, None]
    PX = psf_x[:, None, :]
    PY = psf_y[:, :, None]
    DX = dPSFx[:, None, :]
    DY = dPSFy[:, :, None]
    model = photons * PY * PX + bg
    data = spots

    valid = model > 10e-3
    cf = jnp.where(valid, data / model - 1.0, 0.0)
    df = jnp.where(valid, data / model**2, 0.0)
    cf = jnp.minimum(cf, 10e4)
    df = jnp.minimum(df, 10e4)

    dudt_sigma = photons * (PY * DX + PX * DY)
    # NOTE: the photons factor multiplies only the first term below —
    # this matches the reference expression exactly
    # (picasso/gaussmle.py:380-382).
    d2udt2_sigma = (
        photons * PY * d2PSFx[:, None, :]
        + 2 * DX * DY
        + PX * d2PSFy[:, :, None]
    )

    dudt = jnp.stack(
        [
            photons * PY * dmu_x[:, None, :],
            photons * PX * dmu_y[:, :, None],
            jnp.broadcast_to(PY * PX, model.shape),
            jnp.ones_like(model),
            dudt_sigma,
        ],
        axis=1,
    )
    d2udt2 = jnp.stack(
        [
            photons * PY * d2mu_x[:, None, :],
            photons * PX * d2mu_y[:, :, None],
            jnp.zeros_like(model),
            jnp.zeros_like(model),
            d2udt2_sigma,
        ],
        axis=1,
    )

    numerator = jnp.sum(cf[:, None] * dudt, axis=(2, 3))
    denominator = jnp.sum(
        cf[:, None] * d2udt2 - df[:, None] * dudt**2, axis=(2, 3)
    )

    # The reference's sigma-method zero-denominator branch subtracts
    # sign(numerator * max_step), i.e. ±1 (picasso/gaussmle.py:657-664).
    update = jnp.where(
        denominator == 0.0,
        jnp.sign(numerator * max_step),
        jnp.clip(numerator / denominator, -max_step, max_step),
    )
    theta = theta - update
    theta = theta.at[:, 2].set(jnp.maximum(theta[:, 2], 1.0))
    theta = theta.at[:, 3].set(jnp.maximum(theta[:, 3], 0.01))
    theta = theta.at[:, 4].set(
        jnp.clip(theta[:, 4], 0.01, jnp.asarray(s, theta.dtype))
    )
    return theta


# ---------------------------------------------------------------------------
# CRLB + log-likelihood
# ---------------------------------------------------------------------------


def _first_derivatives_sigmaxy(theta: jnp.ndarray, s: int) -> tuple:
    (
        psf_x, psf_y, dmu_x, _, dmu_y, _,
        dsig_x, _, dsig_y, _,
    ) = _pixel_terms_sigmaxy(theta, s)
    photons = theta[:, 2, None, None]
    bg = theta[:, 3, None, None]
    PX = psf_x[:, None, :]
    PY = psf_y[:, :, None]
    model = photons * PY * PX + bg
    dudt = jnp.stack(
        [
            photons * PY * dmu_x[:, None, :],
            photons * PX * dmu_y[:, :, None],
            jnp.broadcast_to(PY * PX, model.shape),
            jnp.ones_like(model),
            photons * PY * dsig_x[:, None, :],
            photons * PX * dsig_y[:, :, None],
        ],
        axis=1,
    )
    return model, dudt


def _first_derivatives_sigma(theta: jnp.ndarray, s: int) -> tuple:
    idx = jnp.arange(s, dtype=theta.dtype)
    dx = idx[None, :] - theta[:, 0:1]
    dy = idx[None, :] - theta[:, 1:2]
    sigma = theta[:, 4:5]
    psf_x = integrated_gaussian(dx, sigma)
    psf_y = integrated_gaussian(dy, sigma)
    dmu_x, _ = derivative_integrated_gaussian(dx, sigma)
    dmu_y, _ = derivative_integrated_gaussian(dy, sigma)
    dPSFx, _ = iso_sigma_axis_terms(dx, sigma)
    dPSFy, _ = iso_sigma_axis_terms(dy, sigma)
    photons = theta[:, 2, None, None]
    bg = theta[:, 3, None, None]
    PX = psf_x[:, None, :]
    PY = psf_y[:, :, None]
    model = photons * PY * PX + bg
    dudt = jnp.stack(
        [
            photons * PY * dmu_x[:, None, :],
            photons * PX * dmu_y[:, :, None],
            jnp.broadcast_to(PY * PX, model.shape),
            jnp.ones_like(model),
            photons * (PY * dPSFx[:, None, :] + PX * dPSFy[:, :, None]),
        ],
        axis=1,
    )
    return model, dudt


def _crlb_and_likelihood(
    model: jnp.ndarray, dudt: jnp.ndarray, spots: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fisher-matrix CRLBs + Poisson log-likelihood with Stirling
    approximation (picasso/gaussmle.py:684-742/898-954). Equilibrated
    float32 inverse instead of float64 pinv — see module docstring."""
    # Fisher matrix M[p, q] = sum_k dudt_p dudt_q / model
    w = 1.0 / model  # model >= bg >= 0.01 after constraints
    M = jnp.einsum("npij,nqij,nij->npq", dudt, dudt, w)
    diag = jnp.diagonal(M, axis1=1, axis2=2)
    d_inv = jnp.where(diag > 0, 1.0 / jnp.sqrt(diag), 1.0)
    M_eq = M * d_inv[:, :, None] * d_inv[:, None, :]
    M_inv = jnp.linalg.inv(M_eq)
    crlb = jnp.diagonal(M_inv, axis1=1, axis2=2) * d_inv**2

    data = spots
    ll_pos = data * jnp.log(model) - model - data * jnp.log(data) + data
    ll = jnp.where(data > 0, ll_pos, -model)
    ll = jnp.where(model > 0, ll, 0.0)
    log_likelihood = jnp.sum(ll, axis=(1, 2))
    return crlb, log_likelihood


# ---------------------------------------------------------------------------
# Full fit program
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_it", "method"))
def _fit_chunk(
    spots: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit one padded chunk of spots. Returns (thetas (N, 6),
    CRLBs (N, 6), log_likelihoods (N,), iterations (N,))."""
    n, s, _ = spots.shape
    spots = spots.astype(jnp.float32)
    eps = jnp.asarray(eps, jnp.float32)

    theta0_xy = initial_theta_sigmaxy(spots)
    if method == "sigmaxy":
        n_params = 6
        theta0 = theta0_xy
        step_fn = _newton_step_sigmaxy
        # max_step (picasso/gaussmle.py:770-773): [sx, sx, 0.1 N,
        # 0.1 bg, 0.2 sx, 0.2 sy]
        max_step = jnp.stack(
            [
                theta0[:, 4],
                theta0[:, 4],
                0.1 * theta0[:, 2],
                0.1 * theta0[:, 3],
                0.2 * theta0[:, 4],
                0.2 * theta0[:, 5],
            ],
            axis=1,
        )
        conv_cols = jnp.array([0, 1, 4, 5])
    elif method == "sigma":
        n_params = 5
        theta0 = jnp.concatenate(
            [
                theta0_xy[:, :4],
                ((theta0_xy[:, 4] + theta0_xy[:, 5]) / 2)[:, None],
            ],
            axis=1,
        )
        step_fn = _newton_step_sigma
        max_step = jnp.stack(
            [
                theta0[:, 4],
                theta0[:, 4],
                0.1 * theta0[:, 2],
                0.1 * theta0[:, 3],
                0.2 * theta0[:, 4],
            ],
            axis=1,
        )
        conv_cols = jnp.array([0, 1])
    else:
        raise ValueError("Method not available.")

    def cond(state):
        theta, old, done, iters, kk = state
        return (kk < max_it) & ~jnp.all(done)

    def body(state):
        theta, old, done, iters, kk = state
        kk = kk + 1
        new_theta = step_fn(theta, spots, max_step)
        theta = jnp.where(done[:, None], theta, new_theta)
        iters = jnp.where(done, iters, kk)
        conv = jnp.all(
            jnp.abs(old[:, conv_cols] - theta[:, conv_cols]) < eps, axis=1
        )
        done = done | conv
        old = jnp.where(done[:, None], old, theta)
        return theta, old, done, iters, kk

    state = (
        theta0,
        theta0,
        jnp.zeros(n, dtype=bool),
        jnp.zeros(n, dtype=jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    theta, _, _, iters, _ = jax.lax.while_loop(cond, body, state)

    if method == "sigmaxy":
        model, dudt = _first_derivatives_sigmaxy(theta, s)
        crlb, ll = _crlb_and_likelihood(model, dudt, spots)
        thetas6 = theta
        crlb6 = crlb
    else:
        model, dudt = _first_derivatives_sigma(theta, s)
        crlb, ll = _crlb_and_likelihood(model, dudt, spots)
        # Mirror sigma into both sx/sy slots (gaussmle.py:641-642/741-742)
        thetas6 = jnp.concatenate([theta, theta[:, 4:5]], axis=1)
        crlb6 = jnp.concatenate([crlb, crlb[:, 4:5]], axis=1)
    return thetas6, crlb6, ll, iters


def gaussmle_batched(
    spots: np.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    chunk: int = _DEFAULT_CHUNK,
    progress_callback=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fit all spots in device-sized chunks. Chunking bounds device
    memory, lets early whole-chunk convergence pay off, and overlaps
    host staging with device compute (dispatch is async)."""
    n = len(spots)
    if n == 0:
        return (
            np.zeros((0, 6), np.float32),
            np.zeros((0, 6), np.float32),
            np.zeros(0, np.float32),
            np.zeros(0, np.int32),
        )
    spots = np.asarray(spots, dtype=np.float32)
    out_theta, out_crlb, out_ll, out_it = [], [], [], []
    results = []
    for start in range(0, n, chunk):
        part = spots[start:start + chunk]
        n_part = len(part)
        pad = -n_part % 8
        if pad:
            part = np.concatenate(
                [part, np.ones((pad, *part.shape[1:]), part.dtype)], axis=0
            )
        results.append((n_part, _fit_chunk(jnp.asarray(part), eps, max_it,
                                           method=method)))
    done_count = 0
    for n_part, (theta, crlb, ll, iters) in results:
        out_theta.append(np.asarray(theta)[:n_part])
        out_crlb.append(np.asarray(crlb)[:n_part])
        out_ll.append(np.asarray(ll)[:n_part])
        out_it.append(np.asarray(iters)[:n_part])
        done_count += n_part
        if callable(progress_callback):
            progress_callback(done_count)
    return (
        np.concatenate(out_theta),
        np.concatenate(out_crlb),
        np.concatenate(out_ll),
        np.concatenate(out_it),
    )
