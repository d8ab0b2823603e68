"""Batched MLE Gaussian fitting on TPU (Smith et al., Nat. Methods
2010): Newton per-parameter updates on the integrated-Gaussian pixel
model with a Poisson likelihood, Fisher-matrix CRLBs and per-spot
log-likelihoods.

This is the TPU-native replacement for the reference's per-spot numba
loops driven by a lock-stealing thread pool (picasso/gaussmle.py:
_mlefit_sigmaxy :745, _mlefit_sigma :533, gaussmle_async :478).

Performance design
------------------
The model and every derivative are separable into per-axis factors:
dudt_p[j, i] = A_p[j] * B_p[i]. All Newton sums are therefore bilinear
forms  <A, C, B> = sum_ji A[j] C[j,i] B[i]  over the per-pixel factors
C = x/mu - 1 and D = x/mu^2 (eq. 13). The kernel computes a handful of
(S, N) axis vectors per iteration and contracts them against the
(S, S, N) C/D grids — it never materializes (N, P, S, S) derivative
stacks. The spot index N sits on the last (lane) axis so the VPU's
8x128 lanes are fully occupied regardless of the box size; the tiny S
axes live in sublanes/loop.

Per-spot convergence (|dx|,|dy|(,|dsigma|) < eps, gaussmle.py:632/844)
freezes finished spots; the while_loop exits when the whole chunk has
converged. Chunking bounds memory and lets early exits pay off.

CRLB: the reference accumulates the Fisher matrix in float64 and
inverts with pinv (gaussmle.py:689-742). TPUs are float32-native, so we
diagonally equilibrate the Fisher matrix (unit diagonal) before a
batched inverse — entries span ~photons^2..1 and equilibration removes
that dynamic range, making the float32 inverse accurate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from picasso_tpu.ops.gaussian import (
    fused_axis_terms,
    fused_axis_terms_iso,
)

_DEFAULT_CHUNK = 262144


# ---------------------------------------------------------------------------
# Initial parameters (picasso/gaussmle.py:28-168); layout (S, S, N)
# ---------------------------------------------------------------------------


def _mean_filter_min(spots_t: jnp.ndarray) -> jnp.ndarray:
    """Min over the 3x3-mean-filtered spot — the background initializer
    (picasso/gaussmle.py:62-91, :136). spots_t is (S, S, N).

    Written as an unrolled separable 3-window sum (zero-padded slices
    along the two leading axes) with a statically computed counts
    matrix rather than ``lax.reduce_window`` — Mosaic has no TPU
    lowering for reduce_window_sum, and this form also keeps the spot
    index on the lane axis untouched."""
    s = spots_t.shape[0]
    zrow = jnp.zeros_like(spots_t[:1])
    padded = jnp.concatenate([zrow, spots_t, zrow], axis=0)
    rows = padded[0:s] + padded[1:s + 1] + padded[2:s + 2]
    zcol = jnp.zeros_like(rows[:, :1])
    padded = jnp.concatenate([zcol, rows, zcol], axis=1)
    summed = padded[:, 0:s] + padded[:, 1:s + 1] + padded[:, 2:s + 2]
    # Window sizes (2 at the borders, 3 inside) from iota so the kernel
    # captures no constants (a requirement of pallas_call).
    ii = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1)
    ci = jnp.where((ii == 0) | (ii == s - 1), 2.0, 3.0)
    cj = jnp.where((jj == 0) | (jj == s - 1), 2.0, 3.0)
    return jnp.min(summed / (ci * cj), axis=(0, 1))


def initial_theta_sigmaxy_t(spots_t: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Per-spot [x, y, photons, bg, sx, sy] from a (S, S, N) batch
    (picasso/gaussmle.py:128-168). Returns six (N,) arrays."""
    s = spots_t.shape[0]
    # All index grids come from >=2D broadcasted_iota: Mosaic supports
    # neither 1D iota-and-reshape nor middle-axis squeezes, so center
    # row/column extraction is a masked reduction instead of indexing.
    yi = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1)
    yif = yi.astype(spots_t.dtype)
    xif = xi.astype(spots_t.dtype)
    total = jnp.sum(spots_t, axis=(0, 1))
    y_com = jnp.sum(spots_t * yif, axis=(0, 1)) / total
    x_com = jnp.sum(spots_t * xif, axis=(0, 1)) / total
    degenerate = total <= 0.0
    center = (s - 1) / 2.0
    total = jnp.where(degenerate, 0.01, total)
    y_com = jnp.where(degenerate, center, y_com)
    x_com = jnp.where(degenerate, center, x_com)

    bg = _mean_filter_min(spots_t)
    photons = jnp.maximum(1.0, total - s * s * bg)

    # Initial sigmas from second moments of the center row/column of
    # (spot - bg) (picasso/gaussmle.py:95-124).
    half = s // 2
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    d2 = ((idx2 - half) ** 2).astype(spots_t.dtype)  # (S, 1)
    col = (
        jnp.sum(spots_t * (xi == half), axis=1) - bg[None, :]
    )  # varies along y: (S, N)
    row = (
        jnp.sum(spots_t * (yi == half), axis=0) - bg[None, :]
    )  # varies along x: (S, N)
    sy = jnp.sqrt(jnp.sum(col * d2, axis=0) / jnp.sum(col, axis=0))
    sx = jnp.sqrt(jnp.sum(row * d2, axis=0) / jnp.sum(row, axis=0))
    sy = jnp.where(jnp.isfinite(sy) & (sy != 0), sy, 0.01)
    sx = jnp.where(jnp.isfinite(sx) & (sx != 0), sx, 0.01)
    return x_com, y_com, photons, bg, sx, sy


def initial_theta_sigmaxy(spots: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) initial parameters from an (N, S, S) batch."""
    parts = initial_theta_sigmaxy_t(jnp.transpose(spots, (1, 2, 0)))
    return jnp.stack(parts, axis=1)


def _axis_factors_sigmaxy(x, y, photons, sx, sy, s: int):
    """All per-axis (S, N) factors for the 6-parameter model, via the
    fused two-exponential evaluation (ops/gaussian.fused_axis_terms)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(x.dtype)
    dx = idx - x[None, :]
    dy = idx - y[None, :]
    psf_x, dmu_x, d2mu_x, dsig_x, d2sig_x = fused_axis_terms(
        dx, sx[None, :]
    )
    psf_y, dmu_y, d2mu_y, dsig_y, d2sig_y = fused_axis_terms(
        dy, sy[None, :]
    )
    return (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dsig_x, d2sig_x, dsig_y, d2sig_y,
    )


def _newton_step_sigmaxy(theta, spots_t, max_step):
    """One Newton update of all 6 parameters for every spot
    (picasso/gaussmle.py:793-841). theta is (6, N) [x, y, N, bg, sx,
    sy]; all sums are bilinear forms over C/D."""
    s = spots_t.shape[0]
    x, y, photons, bg, sx, sy = theta
    (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dsig_x, d2sig_x, dsig_y, d2sig_y,
    ) = _axis_factors_sigmaxy(x, y, photons, sx, sy, s)
    ph = photons
    ph2 = photons * photons

    # Single-pass accumulation over the x-axis (column) index: the C/D
    # grids are never materialized — each column's cf/df is computed
    # from one (S, N) slice of the (pre-swapped) spots and folded into
    # per-column-factor accumulators. This reads the spot data once per
    # Newton iteration instead of ~18 full-grid reads (the bilinear
    # sums are VMEM-bandwidth bound, not FLOP bound).
    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)
    cf_cols = (dmu_x, psf_x, dsig_x, d2mu_x, d2sig_x)
    df_cols = (dmu_x, psf_x, dsig_x)  # squared below
    Tc = [None] * 6  # 5 factors + plain sum
    Td = [None] * 4  # 3 squared factors + plain sum
    for i in range(s):
        data_i = spots_sw[i]  # (S_j, N)
        model_i = ph[None, :] * psf_y * psf_x[i][None, :] + bg[None, :]
        valid = model_i > 10e-3
        # one reciprocal instead of two divides per column
        r_i = 1.0 / model_i
        dr_i = data_i * r_i
        cf_i = jnp.minimum(jnp.where(valid, dr_i - 1.0, 0.0), 10e4)
        df_i = jnp.minimum(jnp.where(valid, dr_i * r_i, 0.0), 10e4)
        for k, B in enumerate(cf_cols):
            v = cf_i * B[i][None, :]
            Tc[k] = v if Tc[k] is None else Tc[k] + v
        Tc[5] = cf_i if Tc[5] is None else Tc[5] + cf_i
        for k, B in enumerate(df_cols):
            b = B[i][None, :]
            v = df_i * (b * b)
            Td[k] = v if Td[k] is None else Td[k] + v
        Td[3] = df_i if Td[3] is None else Td[3] + df_i

    def _rowdot(A, T):
        return jnp.sum(A * T, axis=0)

    psf_y2 = psf_y * psf_y
    # numerators: sum cf * dudt_p  (dudt_p = scale * A x B)
    num = jnp.stack(
        [
            ph * _rowdot(psf_y, Tc[0]),
            ph * _rowdot(dmu_y, Tc[1]),
            _rowdot(psf_y, Tc[1]),
            jnp.sum(Tc[5], axis=0),
            ph * _rowdot(psf_y, Tc[2]),
            ph * _rowdot(dsig_y, Tc[1]),
        ]
    )
    # denominators: sum cf * d2udt2_p - df * dudt_p^2
    den = jnp.stack(
        [
            ph * _rowdot(psf_y, Tc[3])
            - ph2 * _rowdot(psf_y2, Td[0]),
            ph * _rowdot(d2mu_y, Tc[1])
            - ph2 * _rowdot(dmu_y * dmu_y, Td[1]),
            -_rowdot(psf_y2, Td[1]),
            -jnp.sum(Td[3], axis=0),
            ph * _rowdot(psf_y, Tc[4])
            - ph2 * _rowdot(psf_y2, Td[2]),
            ph * _rowdot(d2sig_y, Tc[1])
            - ph2 * _rowdot(dsig_y * dsig_y, Td[1]),
        ]
    )

    update = jnp.where(
        den == 0.0,
        jnp.sign(num) * max_step,
        jnp.clip(num / den, -max_step, max_step),
    )
    theta = theta - update
    # Constraints (picasso/gaussmle.py:880-884). Rebuilt by stacking
    # rows — static-index .at[].set lowers to scatter, which the
    # Mosaic (Pallas TPU) backend cannot compile.
    theta = jnp.stack(
        [
            theta[0],
            theta[1],
            jnp.maximum(theta[2], 1.0),
            jnp.maximum(theta[3], 0.01),
            jnp.maximum(theta[4], 0.01),
            jnp.maximum(theta[5], 0.01),
        ]
    )
    return theta


def _newton_step_sigmaxy_early(theta, spots_t, max_step):
    """One Newton update — early-reduction form of
    :func:`_newton_step_sigmaxy` (round 5).

    The y-axis (sublane) reduction moves INSIDE the column loop: per
    column i the C/D slices contract against the y-factor rows down to
    (N,) scalars immediately (t/u dots below), so the loop carries 16
    (N,) accumulators instead of 10 (S, N) rows — ~8× less accumulator
    read/write traffic per iteration at identical FLOPs. The roofline
    pins VMEM traffic (not FLOPs) as the binding cost of the fit
    kernel (docs/performance.md), which is exactly what this form
    removes. Same update math as the reference
    (picasso/gaussmle.py:793-841); the f32 reduction order differs
    (j-then-i), so parameters agree to fp tolerance, not bitwise.
    """
    s = spots_t.shape[0]
    x, y, photons, bg, sx, sy = theta
    (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dsig_x, d2sig_x, dsig_y, d2sig_y,
    ) = _axis_factors_sigmaxy(x, y, photons, sx, sy, s)
    ph = photons
    ph2 = photons * photons

    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)
    psf_y2 = psf_y * psf_y
    dmu_y2 = dmu_y * dmu_y
    dsig_y2 = dsig_y * dsig_y
    acc = [None] * 16

    def _add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(s):
        data_i = spots_sw[i]  # (S_j, N)
        model_i = ph[None, :] * psf_y * psf_x[i][None, :] + bg[None, :]
        valid = model_i > 10e-3
        r_i = 1.0 / model_i
        dr_i = data_i * r_i
        cf_i = jnp.minimum(jnp.where(valid, dr_i - 1.0, 0.0), 10e4)
        df_i = jnp.minimum(jnp.where(valid, dr_i * r_i, 0.0), 10e4)
        # y-contractions to (N,) — the whole point of this form
        t1 = jnp.sum(psf_y * cf_i, axis=0)
        t2 = jnp.sum(dmu_y * cf_i, axis=0)
        t3 = jnp.sum(cf_i, axis=0)
        t4 = jnp.sum(dsig_y * cf_i, axis=0)
        t5 = jnp.sum(d2mu_y * cf_i, axis=0)
        t6 = jnp.sum(d2sig_y * cf_i, axis=0)
        u1 = jnp.sum(psf_y2 * df_i, axis=0)
        u2 = jnp.sum(dmu_y2 * df_i, axis=0)
        u3 = jnp.sum(df_i, axis=0)
        u4 = jnp.sum(dsig_y2 * df_i, axis=0)
        px, px2 = psf_x[i], psf_x[i] * psf_x[i]
        _add(0, dmu_x[i] * t1)                # num x  (× ph below)
        _add(1, px * t2)                      # num y  (× ph)
        _add(2, px * t1)                      # num photons
        _add(3, t3)                           # num bg
        _add(4, dsig_x[i] * t1)               # num sx (× ph)
        _add(5, px * t4)                      # num sy (× ph)
        _add(6, d2mu_x[i] * t1)               # den x cf
        _add(7, dmu_x[i] * dmu_x[i] * u1)     # den x df
        _add(8, px * t5)                      # den y cf
        _add(9, px2 * u2)                     # den y df
        _add(10, px2 * u1)                    # den photons
        _add(11, u3)                          # den bg
        _add(12, d2sig_x[i] * t1)             # den sx cf
        _add(13, dsig_x[i] * dsig_x[i] * u1)  # den sx df
        _add(14, px * t6)                     # den sy cf
        _add(15, px2 * u4)                    # den sy df

    num = jnp.stack(
        [
            ph * acc[0], ph * acc[1], acc[2], acc[3],
            ph * acc[4], ph * acc[5],
        ]
    )
    den = jnp.stack(
        [
            ph * acc[6] - ph2 * acc[7],
            ph * acc[8] - ph2 * acc[9],
            -acc[10],
            -acc[11],
            ph * acc[12] - ph2 * acc[13],
            ph * acc[14] - ph2 * acc[15],
        ]
    )

    update = jnp.where(
        den == 0.0,
        jnp.sign(num) * max_step,
        jnp.clip(num / den, -max_step, max_step),
    )
    theta = theta - update
    theta = jnp.stack(
        [
            theta[0],
            theta[1],
            jnp.maximum(theta[2], 1.0),
            jnp.maximum(theta[3], 0.01),
            jnp.maximum(theta[4], 0.01),
            jnp.maximum(theta[5], 0.01),
        ]
    )
    return theta


def _axis_factors_sigma(x, y, sigma, s: int):
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(x.dtype)
    dx = idx - x[None, :]
    dy = idx - y[None, :]
    sg = sigma[None, :]
    psf_x, dmu_x, d2mu_x, dPSFx, d2PSFx = fused_axis_terms_iso(dx, sg)
    psf_y, dmu_y, d2mu_y, dPSFy, d2PSFy = fused_axis_terms_iso(dy, sg)
    return (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dPSFx, d2PSFx, dPSFy, d2PSFy,
    )


def _newton_step_sigma(theta, spots_t, max_step):
    """One Newton update for the 5-parameter isotropic-sigma model
    (picasso/gaussmle.py:574-670); theta is (5, N)
    [x, y, photons, bg, sigma]."""
    s = spots_t.shape[0]
    x, y, photons, bg, sigma = theta
    (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dPSFx, d2PSFx, dPSFy, d2PSFy,
    ) = _axis_factors_sigma(x, y, sigma, s)
    ph = photons
    ph2 = photons * photons

    # Single-pass column accumulation — see _newton_step_sigmaxy.
    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)
    cf_cols = (dmu_x, psf_x, dPSFx, d2mu_x, d2PSFx)
    Tc = [None] * 6  # 5 factors + plain sum
    Td = [None] * 5  # dmu_x^2, psf_x^2, dPSFx^2, dPSFx*psf_x, plain
    for i in range(s):
        data_i = spots_sw[i]  # (S_j, N)
        model_i = ph[None, :] * psf_y * psf_x[i][None, :] + bg[None, :]
        valid = model_i > 10e-3
        # one reciprocal instead of two divides per column
        r_i = 1.0 / model_i
        dr_i = data_i * r_i
        cf_i = jnp.minimum(jnp.where(valid, dr_i - 1.0, 0.0), 10e4)
        df_i = jnp.minimum(jnp.where(valid, dr_i * r_i, 0.0), 10e4)
        for k, B in enumerate(cf_cols):
            v = cf_i * B[i][None, :]
            Tc[k] = v if Tc[k] is None else Tc[k] + v
        Tc[5] = cf_i if Tc[5] is None else Tc[5] + cf_i
        dsq = (
            df_i * (dmu_x[i] * dmu_x[i])[None, :],
            df_i * (psf_x[i] * psf_x[i])[None, :],
            df_i * (dPSFx[i] * dPSFx[i])[None, :],
            df_i * (dPSFx[i] * psf_x[i])[None, :],
            df_i,
        )
        for k, v in enumerate(dsq):
            Td[k] = v if Td[k] is None else Td[k] + v

    def _rowdot(A, T):
        return jnp.sum(A * T, axis=0)

    psf_y2 = psf_y * psf_y
    # dudt_sigma = ph * (PSFy x dPSFx + dPSFy x PSFx): two separable
    # terms; its square expands to three.
    num_sigma = ph * (
        _rowdot(psf_y, Tc[2]) + _rowdot(dPSFy, Tc[1])
    )
    # d2udt2_sigma per the reference expression (photons multiplies only
    # the first term — picasso/gaussmle.py:380-382):
    den_sigma_cf = (
        ph * _rowdot(psf_y, Tc[4])
        + 2 * _rowdot(dPSFy, Tc[2])
        + _rowdot(d2PSFy, Tc[1])
    )
    den_sigma_df = ph2 * (
        _rowdot(psf_y2, Td[2])
        + 2 * _rowdot(psf_y * dPSFy, Td[3])
        + _rowdot(dPSFy * dPSFy, Td[1])
    )

    num = jnp.stack(
        [
            ph * _rowdot(psf_y, Tc[0]),
            ph * _rowdot(dmu_y, Tc[1]),
            _rowdot(psf_y, Tc[1]),
            jnp.sum(Tc[5], axis=0),
            num_sigma,
        ]
    )
    den = jnp.stack(
        [
            ph * _rowdot(psf_y, Tc[3])
            - ph2 * _rowdot(psf_y2, Td[0]),
            ph * _rowdot(d2mu_y, Tc[1])
            - ph2 * _rowdot(dmu_y * dmu_y, Td[1]),
            -_rowdot(psf_y2, Td[1]),
            -jnp.sum(Td[4], axis=0),
            den_sigma_cf - den_sigma_df,
        ]
    )

    # The reference's sigma-method zero-denominator branch subtracts
    # sign(numerator * max_step), i.e. +-1 (picasso/gaussmle.py:657-664).
    update = jnp.where(
        den == 0.0,
        jnp.sign(num * max_step),
        jnp.clip(num / den, -max_step, max_step),
    )
    theta = theta - update
    theta = jnp.stack(
        [
            theta[0],
            theta[1],
            jnp.maximum(theta[2], 1.0),
            jnp.maximum(theta[3], 0.01),
            jnp.clip(theta[4], 0.01, jnp.asarray(s, theta.dtype)),
        ]
    )
    return theta


def _newton_step_sigma_early(theta, spots_t, max_step):
    """Early-reduction form of :func:`_newton_step_sigma` — see
    :func:`_newton_step_sigmaxy_early` for the rationale. 18 (N,)
    accumulators replace 11 (S, N) rows."""
    s = spots_t.shape[0]
    x, y, photons, bg, sigma = theta
    (
        psf_x, psf_y, dmu_x, d2mu_x, dmu_y, d2mu_y,
        dPSFx, d2PSFx, dPSFy, d2PSFy,
    ) = _axis_factors_sigma(x, y, sigma, s)
    ph = photons
    ph2 = photons * photons

    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)
    psf_y2 = psf_y * psf_y
    dmu_y2 = dmu_y * dmu_y
    pd_y = psf_y * dPSFy
    dPSFy2 = dPSFy * dPSFy
    acc = [None] * 18

    def _add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(s):
        data_i = spots_sw[i]  # (S_j, N)
        model_i = ph[None, :] * psf_y * psf_x[i][None, :] + bg[None, :]
        valid = model_i > 10e-3
        r_i = 1.0 / model_i
        dr_i = data_i * r_i
        cf_i = jnp.minimum(jnp.where(valid, dr_i - 1.0, 0.0), 10e4)
        df_i = jnp.minimum(jnp.where(valid, dr_i * r_i, 0.0), 10e4)
        t1 = jnp.sum(psf_y * cf_i, axis=0)
        t2 = jnp.sum(dmu_y * cf_i, axis=0)
        t3 = jnp.sum(cf_i, axis=0)
        t5 = jnp.sum(d2mu_y * cf_i, axis=0)
        t7 = jnp.sum(dPSFy * cf_i, axis=0)
        t8 = jnp.sum(d2PSFy * cf_i, axis=0)
        u1 = jnp.sum(psf_y2 * df_i, axis=0)
        u2 = jnp.sum(dmu_y2 * df_i, axis=0)
        u3 = jnp.sum(df_i, axis=0)
        u5 = jnp.sum(pd_y * df_i, axis=0)
        u6 = jnp.sum(dPSFy2 * df_i, axis=0)
        px, px2 = psf_x[i], psf_x[i] * psf_x[i]
        _add(0, dmu_x[i] * t1)                 # num x (× ph)
        _add(1, px * t2)                       # num y (× ph)
        _add(2, px * t1)                       # num photons
        _add(3, t3)                            # num bg
        _add(4, dPSFx[i] * t1)                 # num sigma term 1
        _add(5, px * t7)                       # num sigma term 2
        _add(6, d2mu_x[i] * t1)                # den x cf
        _add(7, dmu_x[i] * dmu_x[i] * u1)      # den x df
        _add(8, px * t5)                       # den y cf
        _add(9, px2 * u2)                      # den y df
        _add(10, px2 * u1)                     # den photons
        _add(11, u3)                           # den bg
        _add(12, d2PSFx[i] * t1)               # den sigma cf 1
        _add(13, dPSFx[i] * t7)                # den sigma cf 2
        _add(14, px * t8)                      # den sigma cf 3
        _add(15, dPSFx[i] * dPSFx[i] * u1)     # den sigma df 1
        _add(16, dPSFx[i] * px * u5)           # den sigma df 2
        _add(17, px2 * u6)                     # den sigma df 3

    num = jnp.stack(
        [
            ph * acc[0], ph * acc[1], acc[2], acc[3],
            ph * (acc[4] + acc[5]),
        ]
    )
    # d2udt2_sigma: photons multiplies only the first term
    # (picasso/gaussmle.py:380-382 quirk, reproduced)
    den_sigma_cf = ph * acc[12] + 2 * acc[13] + acc[14]
    den_sigma_df = ph2 * (acc[15] + 2 * acc[16] + acc[17])
    den = jnp.stack(
        [
            ph * acc[6] - ph2 * acc[7],
            ph * acc[8] - ph2 * acc[9],
            -acc[10],
            -acc[11],
            den_sigma_cf - den_sigma_df,
        ]
    )

    update = jnp.where(
        den == 0.0,
        jnp.sign(num * max_step),
        jnp.clip(num / den, -max_step, max_step),
    )
    theta = theta - update
    theta = jnp.stack(
        [
            theta[0],
            theta[1],
            jnp.maximum(theta[2], 1.0),
            jnp.maximum(theta[3], 0.01),
            jnp.clip(theta[4], 0.01, jnp.asarray(s, theta.dtype)),
        ]
    )
    return theta


# ---------------------------------------------------------------------------
# CRLB + log-likelihood
# ---------------------------------------------------------------------------


def _fisher_terms_sigmaxy(theta, s):
    """Per-parameter first-derivative factor lists [(scale, A, B)] for
    the Fisher matrix; dudt_p = scale * A x B."""
    x, y, photons, bg, sx, sy = theta
    (
        psf_x, psf_y, dmu_x, _, dmu_y, _,
        dsig_x, _, dsig_y, _,
    ) = _axis_factors_sigmaxy(x, y, photons, sx, sy, s)
    ones = jnp.ones_like(psf_x)
    ph = photons
    one = jnp.ones_like(ph)
    terms = [
        [(ph, psf_y, dmu_x)],
        [(ph, dmu_y, psf_x)],
        [(one, psf_y, psf_x)],
        [(one, ones, ones)],
        [(ph, psf_y, dsig_x)],
        [(ph, dsig_y, psf_x)],
    ]
    return terms, psf_x, psf_y


def _fisher_terms_sigma(theta, s):
    x, y, photons, bg, sigma = theta
    (
        psf_x, psf_y, dmu_x, _, dmu_y, _,
        dPSFx, _, dPSFy, _,
    ) = _axis_factors_sigma(x, y, sigma, s)
    ones = jnp.ones_like(psf_x)
    ph = photons
    one = jnp.ones_like(ph)
    terms = [
        [(ph, psf_y, dmu_x)],
        [(ph, dmu_y, psf_x)],
        [(one, psf_y, psf_x)],
        [(one, ones, ones)],
        [(ph, psf_y, dPSFx), (ph, dPSFy, psf_x)],
    ]
    return terms, psf_x, psf_y


def _crlb_and_likelihood(terms, psf_x, psf_y, photons, bg, spots_t):
    """Fisher-matrix CRLBs + Poisson log-likelihood with Stirling
    approximation (picasso/gaussmle.py:684-742/898-954). Each Fisher
    entry is a sum of bilinear forms over W = 1/model; the float32
    inverse runs on the diagonally equilibrated matrix.

    Single column pass: W and the log-likelihood are computed per spot
    column and folded into deduplicated B-product accumulators, so the
    spot data is read once and no (S, S, N) grids are materialized
    (same structure as the Newton steps)."""
    from picasso_tpu.ops.linalg import spd_inv_diag

    P = len(terms)
    s = spots_t.shape[0]
    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)

    # distinct column-factor (B) vectors across all terms, by identity
    b_list: list = []
    b_ids: dict[int, int] = {}
    for plist in terms:
        for (_, _, B) in plist:
            if id(B) not in b_ids:
                b_ids[id(B)] = len(b_list)
                b_list.append(B)
    nB = len(b_list)

    T: dict[tuple[int, int], jnp.ndarray] = {}
    ll_acc = None
    for i in range(s):
        data_i = spots_sw[i]  # (S_j, N)
        model_i = (
            photons[None, :] * psf_y * psf_x[i][None, :] + bg[None, :]
        )
        W_i = 1.0 / model_i  # model >= bg >= 0.01 after constraints
        for a in range(nB):
            Ba_i = b_list[a][i][None, :]
            for b in range(a, nB):
                v = W_i * (Ba_i * b_list[b][i][None, :])
                T[(a, b)] = v if (a, b) not in T else T[(a, b)] + v
        ll_pos = (
            data_i * jnp.log(model_i)
            - model_i
            - data_i * jnp.log(data_i)
            + data_i
        )
        ll_i = jnp.where(data_i > 0, ll_pos, -model_i)
        ll_i = jnp.where(model_i > 0, ll_i, 0.0)
        ll_acc = ll_i if ll_acc is None else ll_acc + ll_i

    def _T(Bp, Bq):
        a, b = b_ids[id(Bp)], b_ids[id(Bq)]
        return T[(min(a, b), max(a, b))]

    # Built as nested stacks (not .at[p, q].set — that would lower to
    # scatter, unsupported by Mosaic); entries are symmetric-cached.
    entries: dict[tuple[int, int], jnp.ndarray] = {}
    for p in range(P):
        for q in range(p, P):
            acc = None
            for (sp, Ap, Bp) in terms[p]:
                for (sq, Aq, Bq) in terms[q]:
                    v = sp * sq * jnp.sum(
                        Ap * Aq * _T(Bp, Bq), axis=0
                    )
                    acc = v if acc is None else acc + v
            entries[(p, q)] = entries[(q, p)] = acc
    M = jnp.stack(
        [
            jnp.stack([entries[(p, q)] for q in range(P)])
            for p in range(P)
        ]
    )
    diag = jnp.stack([M[p, p] for p in range(P)])  # (P, N)
    d_inv = jnp.where(diag > 0, 1.0 / jnp.sqrt(diag), 1.0)
    M_eq = M * d_inv[:, None, :] * d_inv[None, :, :]
    crlb = spd_inv_diag(M_eq) * d_inv**2  # (P, N)

    log_likelihood = jnp.sum(ll_acc, axis=0)
    return crlb, log_likelihood


# ---------------------------------------------------------------------------
# Full fit program
# ---------------------------------------------------------------------------


def _init_state(spots_t: jnp.ndarray, method: str):
    """Initial fit state (theta, old, done, iters, max_step): theta0
    from the moment estimates, f32 (1, N) masks per the Mosaic carry
    rules, max_step from the INITIAL parameters
    (picasso/gaussmle.py:770-773) so it must be carried across resumed
    rounds."""
    x0, y0, ph0, bg0, sx0, sy0 = initial_theta_sigmaxy_t(spots_t)
    if method == "sigmaxy":
        theta0 = jnp.stack([x0, y0, ph0, bg0, sx0, sy0])  # (6, N)
        max_step = jnp.stack(
            [sx0, sx0, 0.1 * ph0, 0.1 * bg0, 0.2 * sx0, 0.2 * sy0]
        )
    elif method == "sigma":
        theta0 = jnp.stack([x0, y0, ph0, bg0, (sx0 + sy0) / 2])
        max_step = jnp.stack(
            [theta0[4], theta0[4], 0.1 * ph0, 0.1 * bg0, 0.2 * theta0[4]]
        )
    else:
        raise ValueError("Method not available.")
    # NaN-safe data-derived zeros: device-varying under shard_map and
    # non-replicated initial layouts for Mosaic (see notes below).
    row_zero = (
        jnp.where(jnp.isfinite(theta0[:1]), theta0[:1], 0.0) * 0.0
    )
    return theta0, theta0, row_zero, row_zero, max_step


def _run_newton_rounds(
    spots_t, theta, old, done, iters, max_step, eps: float,
    n_iters: int, method: str,
):
    """Run up to n_iters Newton iterations from carried state; exits
    early when every spot has converged. Resumable: calling this twice
    with n_iters a+b is bit-identical to once with a+b.

    Loop-carry layout rules for the Mosaic (Pallas TPU) backend:
    vector carries must be 2D (1, N) and float — 1D carries cannot be
    relayouted and boolean/int vector carries fail to legalize across
    scf.yield. done/iters are therefore f32 {0,1}/count masks."""
    eps = float(eps)
    # PICASSO_TPU_MLE_STEP selects the Newton-step formulation at
    # trace time: "rowacc" (round-2 (S, N) row accumulators) or
    # "early" (round-5 early y-reduction, (N,) accumulators). Same
    # math, different f32 summation order; the on-chip A/B decides
    # the default (docs/performance.md).
    import os

    early = os.environ.get("PICASSO_TPU_MLE_STEP", "rowacc") == "early"
    if method == "sigmaxy":
        step_fn = (
            _newton_step_sigmaxy_early if early
            else _newton_step_sigmaxy
        )
        conv_rows = (0, 1, 4, 5)
    else:
        step_fn = (
            _newton_step_sigma_early if early else _newton_step_sigma
        )
        conv_rows = (0, 1)

    def cond(state):
        theta, old, done, iters, kk = state
        return (kk < n_iters) & (jnp.sum(1.0 - done) > 0.0)

    def body(state):
        theta, old, done, iters, kk = state
        kk = kk + 1
        frozen = done > 0.5
        new_theta = step_fn(theta, spots_t, max_step)
        theta = jnp.where(frozen, theta, new_theta)
        iters = iters + (1.0 - done)
        conv = 1.0 - done * 0.0
        for r in conv_rows:
            conv = conv * (
                jnp.abs(old[r:r + 1] - theta[r:r + 1]) < eps
            )
        done = jnp.maximum(done, conv)
        old = jnp.where(done > 0.5, old, theta)
        return theta, old, done, iters, kk

    data_zero = (done[0, 0] * 0.0).astype(jnp.int32)
    state = (theta, old, done, iters, data_zero)
    theta, old, done, iters, _ = jax.lax.while_loop(cond, body, state)
    return theta, old, done, iters


def _crlb_ll_for(theta, spots_t, method: str):
    """CRLB + log-likelihood at theta, padded to 6 rows for the sigma
    method (gaussmle.py:641-642/741-742)."""
    s = spots_t.shape[0]
    if method == "sigmaxy":
        terms, fpx, fpy = _fisher_terms_sigmaxy(theta, s)
        crlb, ll = _crlb_and_likelihood(
            terms, fpx, fpy, theta[2], theta[3], spots_t
        )
        return theta, crlb, ll
    terms, fpx, fpy = _fisher_terms_sigma(theta, s)
    crlb, ll = _crlb_and_likelihood(
        terms, fpx, fpy, theta[2], theta[3], spots_t
    )
    return (
        jnp.concatenate([theta, theta[4:5]]),
        jnp.concatenate([crlb, crlb[4:5]]),
        ll,
    )


def _freeze_tail(done0, n_valid, lane0):
    """Mark lanes at global index >= n_valid as converged (bucket
    padding must not drag tiles, or the XLA whole-batch loop, to
    max_it)."""
    lane = jax.lax.broadcasted_iota(
        jnp.int32, done0.shape, done0.ndim - 1
    )
    if lane0 is not None:
        lane = lane + lane0
    return jnp.maximum(done0, (lane >= n_valid).astype(done0.dtype))


def _fit_start(spots_t, eps, k, method, n_valid=None, lane0=None):
    """Phase-boundary entry: init + up to ``k`` Newton iterations.
    Returns the resumable carry (theta (R,N), old (R,N), done (1,N),
    iters (1,N), max_step (R,N)); R = 6 (sigmaxy) or 5 (sigma).
    ``_fit_start(k1)`` → ``_fit_resume(k2)`` → ``_fit_finish(k3)`` is
    bit-identical to ``_fit_core`` with max_it = k1+k2+k3 — the
    orchestrator in ops/mle_pallas.py permutes lanes between phases
    (stragglers first) so converged Pallas tiles exit immediately."""
    theta0, old0, done0, iters0, max_step = _init_state(
        spots_t, method
    )
    if n_valid is not None:
        done0 = _freeze_tail(done0, n_valid, lane0)
    theta, old, done, iters = _run_newton_rounds(
        spots_t, theta0, old0, done0, iters0, max_step, eps, k,
        method,
    )
    return theta, old, done, iters, max_step


def _fit_resume(spots_t, theta, old, done, iters, max_step, eps, k,
                method):
    """Continue a carried fit for up to ``k`` more iterations (see
    :func:`_fit_start`; resumability per `_run_newton_rounds`)."""
    theta, old, done, iters = _run_newton_rounds(
        spots_t, theta, old, done, iters, max_step, eps, k, method
    )
    return theta, old, done, iters, max_step


def _fit_finish(spots_t, theta, old, done, iters, max_step, eps, k,
                method):
    """Final phase: up to ``k`` more iterations, then CRLB +
    log-likelihood at the converged theta. Returns (theta6, crlb6,
    ll (N,), iters (N,) i32)."""
    theta, _, _, iters2 = _run_newton_rounds(
        spots_t, theta, old, done, iters, max_step, eps, k, method
    )
    thetas6, crlb6, ll = _crlb_ll_for(theta, spots_t, method)
    return thetas6, crlb6, ll, iters2[0].astype(jnp.int32)


def _fit_core(
    spots_t: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    n_valid=None,
    lane0=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit a (S, S, N) spot batch in lanes-last layout. Returns
    (thetas (6, N), CRLBs (6, N), log_likelihoods (N,),
    iterations (N,)). Pure function — also runs inside the Pallas
    tile kernel (ops/mle_pallas.py).

    ``n_valid``/``lane0``: optional traced scalars marking lanes at
    global index >= n_valid as padding — they start CONVERGED, so a
    bucket's clamped-garbage tail never drags its tile (or, in the
    XLA path, the whole batch) to max_it. Round-5 measurement: the
    dense chain's junk tail ran the full 100 iterations in every
    tail tile. Results for real lanes are bit-identical (convergence
    freezing is per-lane).
    """
    s = spots_t.shape[0]
    theta0, old0, done0, iters0, max_step = _init_state(
        spots_t, method
    )
    if n_valid is not None:
        done0 = _freeze_tail(done0, n_valid, lane0)
    theta, _, _, iters2 = _run_newton_rounds(
        spots_t, theta0, old0, done0, iters0, max_step, eps, max_it,
        method,
    )
    iters = iters2[0].astype(jnp.int32)

    thetas6, crlb6, ll = _crlb_ll_for(theta, spots_t, method)
    return thetas6, crlb6, ll, iters


@functools.partial(
    jax.jit, static_argnames=("eps", "max_it", "method")
)
def _fit_chunk(
    spots: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit one padded chunk of (N, S, S) spots. Returns
    (thetas (N, 6), CRLBs (N, 6), log_likelihoods (N,),
    iterations (N,))."""
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    thetas6, crlb6, ll, iters = _fit_core(
        spots_t, eps, max_it, method=method
    )
    return thetas6.T, crlb6.T, ll, iters


@functools.partial(jax.jit)
def _photon_convert(spots, baseline, factor):
    """(raw - baseline) * sensitivity / gain on device — lets callers
    upload raw u16 ROIs (half the bytes of f32) and convert in HBM
    (picasso/localize.py:1101 semantics)."""
    return (spots.astype(jnp.float32) - baseline) * factor


def gaussmle_batched(
    spots: np.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    chunk: int = _DEFAULT_CHUNK,
    progress_callback=None,
    photon_conversion: tuple[float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fit all spots in device-sized chunks. Chunking bounds device
    memory, lets whole-chunk convergence pay off, and overlaps host
    staging with device compute (dispatch is async).

    With ``photon_conversion=(baseline, factor)`` spots may be raw
    camera counts of any dtype; they upload as-is and convert to
    photons on device."""
    n = len(spots)
    if n == 0:
        return (
            np.zeros((0, 6), np.float32),
            np.zeros((0, 6), np.float32),
            np.zeros(0, np.float32),
            np.zeros(0, np.int32),
        )
    if photon_conversion is None:
        spots = np.asarray(spots, dtype=np.float32)
    else:
        spots = np.asarray(spots)
    out_theta, out_crlb, out_ll, out_it = [], [], [], []
    results = []
    done_count = 0

    def _gather(n_part, fit):
        nonlocal done_count
        theta, crlb, ll, iters = fit
        out_theta.append(np.asarray(theta)[:n_part])
        out_crlb.append(np.asarray(crlb)[:n_part])
        out_ll.append(np.asarray(ll)[:n_part])
        out_it.append(np.asarray(iters)[:n_part])
        done_count += n_part
        if callable(progress_callback):
            progress_callback(done_count)

    # Prefer the tiled Pallas kernel (per-tile early exit + VMEM
    # residency) when the backend supports it.
    import os

    use_pallas = False
    if os.environ.get("PICASSO_TPU_NO_PALLAS", "0") != "1":
        from picasso_tpu.ops import mle_pallas

        use_pallas = mle_pallas.pallas_supported(
            int(spots.shape[-1]), method
        )
    for start in range(0, n, chunk):
        part = spots[start:start + chunk]
        n_part = len(part)
        multiple = (
            mle_pallas.TILE if use_pallas else 128
        )
        pad = -n_part % multiple
        if pad:
            part = np.concatenate(
                [part, np.ones((pad, *part.shape[1:]), part.dtype)], axis=0
            )
        dev = jnp.asarray(part)
        if photon_conversion is not None:
            baseline, factor = photon_conversion
            dev = _photon_convert(
                dev, jnp.float32(baseline), jnp.float32(factor)
            )
        if use_pallas:
            # Boundary compaction pays for the MLE's heavy-tailed
            # iteration counts (same default as the fused chain;
            # PICASSO_TPU_FIT_BOUNDARY=0/1 forces).
            boundary = (
                os.environ.get("PICASSO_TPU_FIT_BOUNDARY", "auto")
                != "0"
            )
            fit = (
                mle_pallas.fit_pallas_boundary
                if boundary else mle_pallas.fit_pallas
            )
            results.append(
                (
                    n_part,
                    fit(dev, float(eps), max_it, method=method),
                )
            )
        else:
            results.append(
                (
                    n_part,
                    _fit_chunk(
                        dev, float(eps), max_it, method=method,
                    ),
                )
            )
        # Double buffering: keep at most two chunks in flight so HBM
        # holds O(chunk) inputs while host staging of the next chunk
        # overlaps device compute of the current one.
        while len(results) > 2:
            _gather(*results.pop(0))
    for pending in results:
        _gather(*pending)
    return (
        np.concatenate(out_theta),
        np.concatenate(out_crlb),
        np.concatenate(out_ll),
        np.concatenate(out_it),
    )
