"""Batched least-squares 2D elliptical Gaussian fitting on TPU via
fixed-iteration Levenberg–Marquardt.

This single kernel replaces BOTH of the reference's LQ paths: the
per-spot ``scipy.optimize.leastsq`` calls farmed out to a process pool
(picasso/gausslq.py:206-343, ftol=xtol=1e-2) and the vendored CUDA
Gpufit DLL (GAUSS_2D_ELLIPTIC, tol 1e-2, <=20 LM iterations,
picasso/gausslq.py:346-395). The model is the plain (non-integrated)
normalized Gaussian of gausslq.py:33; parameters are
[x, y, photons, bg, sx, sy] with x/y relative to the box center.

Performance design: every Jacobian column is separable into per-axis
factors J_p = a_p x b_p, so the normal equations assemble from 1D dot
products — JtJ[p,q] = (a_p . a_q)(b_p . b_q) and Jtr[p] = <a_p, R,
b_p> — with no (N, 6, S, S) Jacobian tensor. The spot index N sits on
the last (lane) axis for full VPU occupancy. The damped 6x6 systems
solve with a batched Cholesky; rejected steps raise the per-spot
damping, and the while_loop exits when the whole chunk converges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


_DEFAULT_CHUNK = 262144


def initial_parameters_t(spots_t: jnp.ndarray) -> jnp.ndarray:
    """theta (6, N) = [x, y, photons, bg, sx, sy], x/y relative to the
    box center (picasso/gausslq.py:95-112). spots_t is (S, S, N)."""
    s = spots_t.shape[0]
    half = s // 2
    bg = jnp.min(spots_t, axis=(0, 1))
    nobg = spots_t - bg[None, None, :]
    # >=2D broadcasted_iota index grids (Mosaic-lowerable; see
    # ops/mle.py for the backend's layout rules).
    yi = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0).astype(
        spots_t.dtype
    )
    xi = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1).astype(
        spots_t.dtype
    )
    total = jnp.sum(nobg, axis=(0, 1))
    y_com = jnp.sum(nobg * yi, axis=(0, 1)) / total
    x_com = jnp.sum(nobg * xi, axis=(0, 1)) / total
    degenerate = total <= 0.0
    center = (s - 1) / 2.0
    total_d = jnp.where(degenerate, 0.01, total)
    y_com = jnp.where(degenerate, center, y_com)
    x_com = jnp.where(degenerate, center, x_com)
    photons = jnp.maximum(1.0, total_d)
    dy2 = (yi - y_com[None, None, :]) ** 2
    dx2 = (xi - x_com[None, None, :]) ** 2
    sy = jnp.sqrt(jnp.sum(nobg * dy2, axis=(0, 1)) / total_d)
    sx = jnp.sqrt(jnp.sum(nobg * dx2, axis=(0, 1)) / total_d)
    return jnp.stack([x_com - half, y_com - half, photons, bg, sx, sy])


def initial_parameters(spots: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) initial parameters from an (N, S, S) batch."""
    return initial_parameters_t(jnp.transpose(spots, (1, 2, 0))).T


def _axis_factors(theta, s: int):
    """Per-axis (S, N) model factors and their derivatives."""
    half = s // 2
    grid = (
        jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(theta.dtype)
        - half
    )
    x, y, photons, bg, sx, sy = theta
    dx = grid - x[None, :]
    dy = grid - y[None, :]
    # one reciprocal per axis; all derivative factors are products
    inv_sx = 1.0 / sx[None, :]
    inv_sy = 1.0 / sy[None, :]
    norm = 0.3989422804014327
    gx = norm * inv_sx * jnp.exp(-0.5 * (dx * inv_sx) ** 2)
    gy = norm * inv_sy * jnp.exp(-0.5 * (dy * inv_sy) ** 2)
    dgx_dx = gx * dx * inv_sx * inv_sx
    dgy_dy = gy * dy * inv_sy * inv_sy
    dgx_dsx = gx * inv_sx * ((dx * inv_sx) ** 2 - 1.0)
    dgy_dsy = gy * inv_sy * ((dy * inv_sy) ** 2 - 1.0)
    return gx, gy, dgx_dx, dgy_dy, dgx_dsx, dgy_dsy


def _cost(theta, spots_t, s: int):
    """Sum of squared residuals, accumulated per spot column so no
    (S, S, N) residual grid is materialized."""
    gx, gy, *_ = _axis_factors(theta, s)
    ph = theta[2]
    bg = theta[3]
    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)
    acc = None
    for i in range(spots_t.shape[0]):
        r_i = spots_sw[i] - (
            ph[None, :] * gy * gx[i][None, :] + bg[None, :]
        )
        v = r_i * r_i
        acc = v if acc is None else acc + v
    return jnp.sum(acc, axis=0)


def _normal_equations(theta, spots_t, s: int):
    """JtJ (N, 6, 6) and Jtr (N, 6) assembled from separable axis
    factors — no Jacobian tensor is materialized."""
    gx, gy, dgx_dx, dgy_dy, dgx_dsx, dgy_dsy = _axis_factors(theta, s)
    photons = theta[2]
    ones = jnp.ones_like(gx)
    one = jnp.ones_like(photons)
    # (scale, row factor a (over j/y), col factor b (over i/x))
    terms = [
        (photons, gy, dgx_dx),  # d/dx
        (photons, dgy_dy, gx),  # d/dy
        (one, gy, gx),  # d/dphotons
        (one, ones, ones),  # d/dbg
        (photons, gy, dgx_dsx),  # d/dsx
        (photons, dgy_dsy, gx),  # d/dsy
    ]
    # Single column pass for J^T r: the residual is computed per spot
    # column and folded into per-column-factor accumulators, so the
    # spot data is read once and no residual grid is materialized (the
    # same structure as the MLE Newton steps). JtJ needs only 1D dot
    # products of the separable factors. Nested stacks instead of
    # .at[].set — scatter has no Mosaic (Pallas TPU) lowering.
    bg = theta[3]
    b_cols = (dgx_dx, gx, dgx_dsx)
    Tc = [None] * 4  # 3 factors + plain sum (for the bg column)
    spots_sw = jnp.transpose(spots_t, (1, 0, 2))  # (S_i, S_j, N)
    for i in range(s):
        r_i = spots_sw[i] - (
            photons[None, :] * gy * gx[i][None, :] + bg[None, :]
        )
        for k, B in enumerate(b_cols):
            v = r_i * B[i][None, :]
            Tc[k] = v if Tc[k] is None else Tc[k] + v
        Tc[3] = r_i if Tc[3] is None else Tc[3] + r_i

    def _rowdot(A, T):
        return jnp.sum(A * T, axis=0)

    Jtr = jnp.stack(
        [
            photons * _rowdot(gy, Tc[0]),
            photons * _rowdot(dgy_dy, Tc[1]),
            _rowdot(gy, Tc[1]),
            jnp.sum(Tc[3], axis=0),
            photons * _rowdot(gy, Tc[2]),
            photons * _rowdot(dgy_dsy, Tc[1]),
        ]
    )

    P = 6
    entries: dict[tuple[int, int], jnp.ndarray] = {}
    for p in range(P):
        sp, ap, bp = terms[p]
        for q in range(p, P):
            sq, aq, bq = terms[q]
            val = (
                sp * sq
                * jnp.sum(ap * aq, axis=0)
                * jnp.sum(bp * bq, axis=0)
            )
            entries[(p, q)] = entries[(q, p)] = val
    JtJ = jnp.stack(
        [jnp.stack([entries[(p, q)] for q in range(P)]) for p in range(P)]
    )
    return JtJ, Jtr, None


@functools.partial(jax.jit, static_argnames=("max_it",))
def _fit_chunk(
    spots: jnp.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
) -> jnp.ndarray:
    """LM-fit one padded chunk; returns theta (N, 6)."""
    n, s, _ = spots.shape
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    theta = _lm_core(spots_t, max_it, ftol)
    return theta.T


def _lm_core(
    spots_t: jnp.ndarray, max_it: int, ftol: float,
    n_valid=None, lane0=None,
) -> jnp.ndarray:
    """LM loop on a (S, S, N) batch; returns theta (6, N). Pure — also
    runs inside the Pallas tile kernel (ops/lq_pallas.py), so loop
    carries follow the Mosaic layout rules (2D (1, N) f32 masks, no
    captured constants; see ops/mle.py).

    ``n_valid``/``lane0``: lanes at global index >= n_valid start
    converged so bucket-padding garbage never drags a tile (or the
    XLA whole-batch loop) to max_it; real lanes are bit-identical
    (convergence is per-lane). See ops/mle._fit_core."""
    theta0, lam0, cost0, done0 = _lm_init(spots_t, n_valid, lane0)
    theta, _, _, _ = _lm_rounds(
        spots_t, theta0, lam0, cost0, done0, max_it, ftol
    )
    return theta


def _lm_init(spots_t, n_valid=None, lane0=None):
    """Initial LM state (theta (6,N), lam (1,N), cost (1,N),
    done (1,N))."""
    s = spots_t.shape[0]
    theta0 = initial_parameters_t(spots_t)  # (6, N)
    cost0 = _cost(theta0, spots_t, s)[None, :]  # (1, N)
    # NaN-safe data-derived zero row (degenerate spots have NaN cost —
    # cost0 * 0.0 would poison the done mask and the loop condition).
    zero_row = jnp.where(jnp.isfinite(cost0), cost0, 0.0) * 0.0
    if n_valid is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, zero_row.shape, 1)
        if lane0 is not None:
            lane = lane + lane0
        done0 = jnp.maximum(
            zero_row, (lane >= n_valid).astype(zero_row.dtype)
        )
    else:
        done0 = zero_row
    lam0 = zero_row + 1e-3
    return theta0, lam0, cost0, done0


def _lm_rounds(spots_t, theta0, lam0, cost0, done0, max_it, ftol):
    """Run up to max_it LM iterations from carried state; RESUMABLE —
    two calls of a then b iterations are bit-identical to one of a+b
    (the carry holds everything the body reads). Exits early when
    every lane is done."""
    s = spots_t.shape[0]

    def cond(state):
        theta, lam, cost, done, kk = state
        return (kk < max_it) & (jnp.sum(1.0 - done) > 0.0)

    def body(state):
        theta, lam, cost, done, kk = state
        JtJ, Jtr, _ = _normal_equations(theta, spots_t, s)  # (6,6,N),(6,N)
        # Marquardt damping on the diagonal, then an unrolled batched
        # Cholesky solve (N on lanes — see ops/linalg.py).
        from picasso_tpu.ops.linalg import spd_solve

        diag = jnp.stack([JtJ[p, p] for p in range(6)])  # (6, N)
        damped = diag * (1.0 + lam)  # (6, N)
        A = jnp.stack(
            [
                jnp.stack(
                    [
                        damped[p] if p == q else JtJ[p, q]
                        for q in range(6)
                    ]
                )
                for p in range(6)
            ]
        )
        delta = spd_solve(A, Jtr)  # (6, N)
        finite = jnp.min(
            jnp.isfinite(delta).astype(theta.dtype), axis=0,
            keepdims=True,
        )  # (1, N) AND across rows (reduce_prod has no Mosaic lowering)
        delta = jnp.where(finite > 0.5, delta, 0.0)
        trial = theta + delta
        trial_cost = _cost(trial, spots_t, s)[None, :]
        improved = (
            finite
            * (trial_cost < cost)
            * (1.0 - done)
        )  # (1, N) f32
        rel = jnp.abs(cost - trial_cost) / jnp.maximum(cost, 1e-20)
        conv = improved * (rel < ftol)
        imp = improved > 0.5
        theta = jnp.where(imp, trial, theta)
        cost = jnp.where(imp, trial_cost, cost)
        lam = jnp.where(
            imp, jnp.maximum(lam * 0.1, 1e-9),
            jnp.where(done > 0.5, lam, jnp.minimum(lam * 10.0, 1e7)),
        )
        # Spots whose damping exploded cannot improve further.
        done = jnp.maximum(
            done, jnp.maximum(conv, (lam >= 1e7).astype(done.dtype))
        )
        return theta, lam, cost, done, kk + 1

    # Data-derived zero state: keeps carry types device-varying under
    # shard_map (see ops/mle.py).
    data_zero = (
        (jnp.where(jnp.isfinite(cost0), cost0, 0.0) * 0.0)[0, 0]
    ).astype(jnp.int32)
    state = (theta0, lam0, cost0, done0, data_zero)
    theta, lam, cost, done, _ = jax.lax.while_loop(cond, body, state)
    return theta, lam, cost, done


def fit_spots_batched(
    spots: np.ndarray,
    max_it: int = 30,
    chunk: int = _DEFAULT_CHUNK,
    progress_callback=None,
    photon_conversion: tuple[float, float] | None = None,
) -> np.ndarray:
    """Fit all spots in device-sized chunks; returns theta (N, 6) with
    columns [x, y, photons, bg, sx, sy]. With ``photon_conversion``
    spots upload raw and convert on device (see ops/mle.py)."""
    import os

    n = len(spots)
    if n == 0:
        return np.zeros((0, 6), np.float32)
    if photon_conversion is None:
        spots = np.asarray(spots, dtype=np.float32)
    else:
        spots = np.asarray(spots)
    use_pallas = False
    if os.environ.get("PICASSO_TPU_NO_PALLAS", "0") != "1":
        from picasso_tpu.ops import lq_pallas

        use_pallas = lq_pallas.pallas_supported(int(spots.shape[-1]))
    results = []
    out = []
    done_count = 0

    def _gather(n_part, theta):
        nonlocal done_count
        out.append(np.asarray(theta)[:n_part])
        done_count += n_part
        if callable(progress_callback):
            progress_callback(done_count)

    for start in range(0, n, chunk):
        part = spots[start:start + chunk]
        n_part = len(part)
        multiple = lq_pallas.TILE if use_pallas else 128
        pad = -n_part % multiple
        if pad:
            part = np.concatenate(
                [part, np.ones((pad, *part.shape[1:]), part.dtype)], axis=0
            )
        dev = jnp.asarray(part)
        if photon_conversion is not None:
            from picasso_tpu.ops.mle import _photon_convert

            baseline, factor = photon_conversion
            dev = _photon_convert(
                dev, jnp.float32(baseline), jnp.float32(factor)
            )
        if use_pallas:
            # Boundary compaction default-OFF for LM: measured loss
            # (each boundary costs ~1.4 ms of XLA glue, more than the
            # straggler tail at max_it 30 — tools/measure_r5h).
            # PICASSO_TPU_FIT_BOUNDARY=1 forces it on.
            if os.environ.get("PICASSO_TPU_FIT_BOUNDARY", "auto") == "1":
                fit = lq_pallas.fit_pallas_boundary(dev, max_it)
            else:
                fit = lq_pallas.fit_pallas(dev, max_it)
        else:
            fit = _fit_chunk(dev, max_it)
        results.append((n_part, fit))
        while len(results) > 2:
            _gather(*results.pop(0))
    for pending in results:
        _gather(*pending)
    return np.concatenate(out)
