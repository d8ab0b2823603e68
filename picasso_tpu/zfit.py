"""picasso_tpu.zfit — astigmatism-based 3D: z calibration and per-loc
z fitting (Huang et al., Science 2008).

Capability parity with picasso/zfit.py (calibrate_z :46, _fit_z_target
:255, _fit_z :327, zfit :465, filter_z_fits :675,
axial_localization_precision_astig :747).

The per-loc scalar minimization (reference: scipy minimize_scalar per
loc, farmed to a process pool, zfit.py:416) becomes one dense z-grid
evaluation for the whole batch: the target
(sqrt(sx)-sqrt(wx(z)))^2 + (sqrt(sy)-sqrt(wy(z)))^2 is linear in
(sqrt(sx), sqrt(sy)) per grid point, so the (N, Z) cost matrix is a
rank-2 matmul plus a per-z offset — MXU work — followed by a parabolic
refinement around the grid minimum.
"""

from __future__ import annotations

from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from picasso_tpu import __version__, gausslq, gaussmle, lib

_Z_BOUND = 1000.0  # fit bounds in calibration units (zfit.py:359-363)
_Z_STEP = 1.0


def _interpolate_nan(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, np.float64).copy()
    nans = np.isnan(arr)
    if nans.any() and not nans.all():
        idx = np.arange(len(arr))
        arr[nans] = np.interp(idx[nans], idx[~nans], arr[~nans])
    return arr


def calibrate_z(
    locs: pd.DataFrame,
    info: list[dict],
    d: float,
    magnification_factor: float,
    path: str | None = None,
    frame_bounds: tuple[int, int] | None = None,
) -> dict:
    """Fit 6th-order polynomials to frame-mean sx/sy of a z-stepped
    calibration stack; re-center so the curves cross at z=0
    (picasso/zfit.py:46)."""
    n_frames = lib.get_from_metadata(info, "Frames")
    frame_range = np.arange(n_frames)
    # negated so the first frames of a bottom-to-up scan get positive
    # z (zfit.py:92-94); frame_bounds slice the FULL-stack axis, with
    # inclusive bounds like picasso.localize (zfit.py:95-104)
    z_range = -(frame_range * d - (n_frames - 1) * d / 2)
    if frame_bounds is not None:
        lo = frame_bounds[0] or 0
        hi = frame_bounds[1] or (n_frames - 1)
        frame_range = frame_range[lo:hi + 1]
        z_range = z_range[lo:hi + 1]
        locs = locs[(locs["frame"] >= lo) & (locs["frame"] <= hi)]

    def frame_means(col):
        s = locs.groupby("frame")[col].mean()
        return np.array(
            [s.get(f, np.nan) for f in frame_range]
        )

    # raw per-frame stats for outlier rejection: single-loc frames
    # have NaN variance, so their locs are dropped (as the reference's
    # un-interpolated comparison does, zfit.py:112-125)
    mean_sx = frame_means("sx")
    mean_sy = frame_means("sy")
    var_sx = np.array(
        [locs.groupby("frame")["sx"].var().get(f, np.nan)
         for f in frame_range]
    )
    var_sy = np.array(
        [locs.groupby("frame")["sy"].var().get(f, np.nan)
         for f in frame_range]
    )
    frame_idx = locs["frame"].to_numpy() - frame_range[0]
    keep = (
        (locs["sx"].to_numpy() - mean_sx[frame_idx]) ** 2
        < var_sx[frame_idx]
    ) & (
        (locs["sy"].to_numpy() - mean_sy[frame_idx]) ** 2
        < var_sy[frame_idx]
    )
    locs = locs[keep]
    mean_sx = _interpolate_nan(frame_means("sx"))
    mean_sy = _interpolate_nan(frame_means("sy"))
    cx = np.polyfit(z_range, mean_sx, 6)
    cy = np.polyfit(z_range, mean_sy, 6)
    # re-center where curves cross (zfit.py:143-148)
    z = np.linspace(z_range[0], z_range[-1], 10000)
    crossing = z[
        np.argmin(np.abs(np.polyval(cx, z) - np.polyval(cy, z)))
    ]
    z_range = z_range - crossing
    cx = np.polyfit(z_range, mean_sx, 6)
    cy = np.polyfit(z_range, mean_sy, 6)
    calibration = {
        "X Coefficients": [float(_) for _ in cx],
        "Y Coefficients": [float(_) for _ in cy],
        "Number of frames": int(n_frames),
        "Step size in nm": float(d),
        "Magnification factor": float(magnification_factor),
        "Path": path if path is not None else "N/A",
        "Frame bounds": frame_bounds,
    }
    if path is not None:
        import yaml

        with open(path, "w") as f:
            yaml.dump(calibration, f)
    return calibration


@jax.jit
def _fit_z_batched(
    sx: jnp.ndarray,
    sy: jnp.ndarray,
    u: jnp.ndarray,  # sqrt(wx(z_grid)), +inf where invalid
    v: jnp.ndarray,  # sqrt(wy(z_grid))
    c: jnp.ndarray,  # wx + wy per grid point
    z_grid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """argmin_z of (sqrt(sx)-u)^2 + (sqrt(sy)-v)^2 for every loc,
    with parabolic sub-grid refinement. Returns (z, min_target)."""
    a = jnp.sqrt(sx)
    b = jnp.sqrt(sy)
    # cost[n, z] = sx + sy + c_z - 2 a_n u_z - 2 b_n v_z
    AB = jnp.stack([a, b], axis=1)  # (N, 2)
    UV = jnp.stack([u, v], axis=0)  # (2, Z)
    cross = AB @ UV  # (N, Z) — MXU
    cost = c[None, :] - 2.0 * cross
    valid = jnp.isfinite(c)[None, :] & jnp.isfinite(cross)
    cost = jnp.where(valid, cost, jnp.inf)
    idx = jnp.argmin(cost, axis=1)
    Z = cost.shape[1]
    idx_c = jnp.clip(idx, 1, Z - 2)
    f0 = jnp.take_along_axis(cost, (idx_c - 1)[:, None], 1)[:, 0]
    f1 = jnp.take_along_axis(cost, idx_c[:, None], 1)[:, 0]
    f2 = jnp.take_along_axis(cost, (idx_c + 1)[:, None], 1)[:, 0]
    denom = f0 - 2 * f1 + f2
    delta = jnp.where(
        (denom > 0) & jnp.isfinite(f0) & jnp.isfinite(f2),
        0.5 * (f0 - f2) / denom,
        0.0,
    )
    delta = jnp.clip(delta, -1.0, 1.0)
    step = z_grid[1] - z_grid[0]
    z_best = z_grid[idx_c] + delta * step
    min_target = f1 - 0.25 * (f0 - f2) * delta
    min_target = jnp.minimum(
        min_target, jnp.take_along_axis(cost, idx[:, None], 1)[:, 0]
    )
    # add back the constant (sx + sy) part of the target
    return z_best, min_target + sx + sy


def _fit_z(
    locs: pd.DataFrame,
    info: list[dict],
    calibration: dict,
    magnification_factor: float,
    pixelsize: float,
    fitting_method: Literal["gausslq", "gaussmle"] = "gausslq",
    filter: int = 2,
    progress_callback=None,
) -> pd.DataFrame:
    """Vectorized z fit of all locs (picasso/zfit.py:327)."""
    locs = locs.copy()
    cx = np.asarray(calibration["X Coefficients"], np.float64)
    cy = np.asarray(calibration["Y Coefficients"], np.float64)
    z_grid = np.arange(-_Z_BOUND, _Z_BOUND + _Z_STEP, _Z_STEP)
    wx = np.polyval(cx, z_grid)
    wy = np.polyval(cy, z_grid)
    ok = (wx > 0) & (wy > 0)
    u = np.where(ok, np.sqrt(np.maximum(wx, 0)), np.nan)
    v = np.where(ok, np.sqrt(np.maximum(wy, 0)), np.nan)
    c = np.where(ok, wx + wy, np.nan)
    z, sq_d = _fit_z_batched(
        jnp.asarray(locs["sx"].to_numpy(), jnp.float32),
        jnp.asarray(locs["sy"].to_numpy(), jnp.float32),
        jnp.asarray(u, jnp.float32),
        jnp.asarray(v, jnp.float32),
        jnp.asarray(c, jnp.float32),
        jnp.asarray(z_grid, jnp.float32),
    )
    z = np.asarray(z, np.float64)
    sq_d = np.asarray(sq_d, np.float64)
    locs["z"] = (z * magnification_factor).astype(np.float32)
    locs["d_zcalib"] = np.sqrt(np.maximum(sq_d, 0)).astype(np.float32)
    locs["lpz"] = _axial_localization_precision_astig(
        locs, cx, cy, magnification_factor, pixelsize, fitting_method
    ).astype(np.float32)
    if callable(progress_callback):
        progress_callback(len(locs))
    locs = lib.ensure_sanity(locs, info)
    return filter_z_fits(locs, filter)


def zfit(
    locs: pd.DataFrame,
    info: list[dict],
    *,
    calibration: dict,
    magnification_factor: float | None = None,
    pixelsize: float | None = None,
    fitting_method: Literal["gausslq", "gaussmle"] = "gausslq",
    filter: int = 2,
    multiprocess: bool = False,
    progress_callback=None,
    abort_callback=None,
) -> tuple[pd.DataFrame, list[dict]]:
    """Fit z to all locs; returns (locs, updated info)
    (picasso/zfit.py:465). ``multiprocess`` accepted for API
    compatibility — the batched fit always covers all locs at once."""
    assert fitting_method in ("gausslq", "gaussmle")
    assert filter >= 0
    assert isinstance(calibration, dict)
    if magnification_factor is None:
        magnification_factor = calibration["Magnification factor"]
    if pixelsize is None:
        pixelsize = lib.get_from_metadata(
            info, "Pixelsize", raise_error=True
        )
    if abort_callback is not None and abort_callback():
        return None, None
    locs = _fit_z(
        locs,
        info,
        calibration,
        magnification_factor,
        pixelsize,
        fitting_method,
        filter,
        progress_callback,
    )
    new_info = info + [
        {
            "Generated by": f"Picasso v{__version__} Fit Z",
            "Calibration": calibration,
            "Magnification factor": magnification_factor,
        }
    ]
    return locs, new_info


def filter_z_fits(locs: pd.DataFrame, range: int) -> pd.DataFrame:
    """Drop locs with z-calibration residual above range * RMSD
    (picasso/zfit.py:675)."""
    if "d_zcalib" not in locs.columns:
        return locs
    if range > 0:
        rmsd = np.sqrt(np.nanmean(locs["d_zcalib"] ** 2))
        locs = locs[locs["d_zcalib"] <= range * rmsd]
    return locs


def _get_calib_size(coeffs: np.ndarray, z) -> np.ndarray:
    return np.polyval(coeffs, np.asarray(z))


def _get_prime_calib_size(coeffs: np.ndarray, z) -> np.ndarray:
    return np.polyval(np.polyder(coeffs), np.asarray(z))


def axial_localization_precision_astig(
    locs: pd.DataFrame,
    info: list[dict],
    calibration: dict,
    fitting_method: Literal["gausslq", "gaussmle"] = "gausslq",
) -> np.ndarray:
    """Public analytic lpz (Kowalewski, Reinhardt et al., Nat. Comms
    2026; picasso/zfit.py:747)."""
    pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    cx = np.asarray(calibration["X Coefficients"], np.float64)
    cy = np.asarray(calibration["Y Coefficients"], np.float64)
    return _axial_localization_precision_astig(
        locs,
        cx,
        cy,
        calibration["Magnification factor"],
        pixelsize,
        fitting_method,
    )


def _axial_localization_precision_astig(
    locs, cx, cy, magnification_factor, pixelsize,
    fitting_method="gausslq",
) -> np.ndarray:
    """Analytic axial precision via error propagation of the sigma
    uncertainties through the calibration curves
    (picasso/zfit.py:805)."""
    if fitting_method == "gausslq":
        se_sx = gausslq.sigma_uncertainty(
            locs["sx"], locs["sy"], locs["photons"], locs["bg"]
        ) * pixelsize
        se_sy = gausslq.sigma_uncertainty(
            locs["sy"], locs["sx"], locs["photons"], locs["bg"]
        ) * pixelsize
    elif fitting_method == "gaussmle":
        if "sx_unc" not in locs.columns or "sy_unc" not in locs.columns:
            se_sx = gaussmle.sigma_uncertainty(
                locs["sx"], locs["sy"], locs["photons"], locs["bg"]
            ) * pixelsize
            se_sy = gaussmle.sigma_uncertainty(
                locs["sy"], locs["sx"], locs["photons"], locs["bg"]
            ) * pixelsize
        else:
            se_sx = locs["sx_unc"] * pixelsize
            se_sy = locs["sy_unc"] * pixelsize
    else:
        raise ValueError(
            "fitting_method must be 'gausslq' or 'gaussmle'."
        )
    z = locs["z"] / magnification_factor
    wx_calib = _get_calib_size(cx, z) * pixelsize
    wy_calib = _get_calib_size(cy, z) * pixelsize
    wx_prime = _get_prime_calib_size(cx, z) * pixelsize
    wy_prime = _get_prime_calib_size(cy, z) * pixelsize
    sqrt_wx = np.sqrt(wx_calib)
    sqrt_wx_prime = wx_prime / (2 * sqrt_wx)
    sqrt_wy = np.sqrt(wy_calib)
    sqrt_wy_prime = wy_prime / (2 * sqrt_wy)
    d_sqrt_wx = (1 / (2 * np.sqrt(locs["sx"] * pixelsize))) * se_sx
    d_sqrt_wy = (1 / (2 * np.sqrt(locs["sy"] * pixelsize))) * se_sy
    swxc2 = sqrt_wx_prime**2
    swyc2 = sqrt_wy_prime**2
    lpz = np.sqrt(
        (swxc2 * d_sqrt_wx**2 + swyc2 * d_sqrt_wy**2)
        / (swxc2 + swyc2) ** 2
    )
    return lpz * magnification_factor


# API-compatibility aliases (picasso/zfit.py deprecated names).
def fit_z(locs, info, calibration, magnification_factor, pixelsize,
          fitting_method="gausslq", filter=2, progress_callback=None):
    """Deprecated alias of the batched z fit (picasso/zfit.py:296)."""
    return _fit_z(
        locs, info, calibration, magnification_factor, pixelsize,
        fitting_method, filter, progress_callback,
    )


def fit_z_parallel(locs, info, calibration, magnification_factor,
                   pixelsize, fitting_method="gausslq", filter=2,
                   asynch=False):
    """Deprecated alias — the batched fit covers all locs at once
    (picasso/zfit.py:416). With asynch=True the reference returns
    futures for locs_from_futures; we honor that contract with one
    already-completed future wrapping the batched result."""
    result = _fit_z(
        locs, info, calibration, magnification_factor, pixelsize,
        fitting_method, filter,
    )
    if asynch:
        from concurrent.futures import Future

        future = Future()
        future.set_result(result)
        return [future]
    return result


def locs_from_futures(futures, filter=2):
    """Collect partial z-fit results (picasso/zfit.py:460)."""
    import pandas as pd

    locs = pd.concat([f.result() for f in futures],
                     ignore_index=True)
    return filter_z_fits(locs, filter)


def axial_localization_precision(locs, info, calibration,
                                 fitting_method="gausslq",
                                 modality="astigmatic"):
    """Modality dispatcher (picasso/zfit.py:706); only astigmatic 3D
    is implemented."""
    assert modality == "astigmatic", (
        "Only astigmatic 3D is supported."
    )
    return axial_localization_precision_astig(
        locs, info, calibration, fitting_method
    )
