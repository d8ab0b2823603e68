"""picasso_tpu.gausslq — least-squares 2D Gaussian fitting API.

Same public surface as picasso/gausslq.py (fit_spot :206, fit_spots
:247, fit_spots_parallel :292, fit_spots_gpufit :346, locs_from_fits
:404, localization_precision :547, sigma_uncertainty :592). All three
reference execution paths (scipy leastsq, process pool, CUDA Gpufit)
collapse into one batched LM kernel (picasso_tpu.ops.lq); the
``*_gpufit`` aliases are kept for API compatibility and run the same
kernel.
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np
import pandas as pd

from picasso_tpu import lib
from picasso_tpu.ops import lq as _lq

# The TPU LM kernel is always available — unlike the reference's CUDA
# DLL (Windows-only). Kept for API compatibility checks.
GPUFIT_INSTALLED = True


def fit_spot(spot: np.ndarray) -> np.ndarray:
    """Fit one spot; returns [x, y, photons, bg, sx, sy] with x/y
    relative to the box center (picasso/gausslq.py:206)."""
    return fit_spots(spot[None])[0]


def fit_spots(
    spots: np.ndarray,
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
    photon_conversion: tuple[float, float] | None = None,
) -> np.ndarray:
    """Batched LM fit of all spots (picasso/gausslq.py:247)."""
    with lib.progress_reporter(
        progress_callback, len(spots), "Fitting (LQ)"
    ) as rep:
        theta = _lq.fit_spots_batched(
            spots, progress_callback=rep.set_value,
            photon_conversion=photon_conversion,
        )
    if callable(progress_callback):
        for i in range(len(spots)):
            progress_callback(i)
    return theta


def fit_spots_parallel(
    spots: np.ndarray, asynch: bool = False
) -> np.ndarray:
    """The reference farms chunks to a process pool here
    (picasso/gausslq.py:292); on TPU the batched kernel already
    processes every spot concurrently."""
    theta = fit_spots(spots)
    if asynch:
        return [_CompletedFuture(theta)]
    return theta


class _CompletedFuture:
    """Minimal Future-compatible wrapper for the asynch=True API."""

    def __init__(self, result):
        self._result = result

    def result(self):
        return self._result

    def done(self):
        return True


def fits_from_futures(futures) -> np.ndarray:
    return np.vstack([f.result() for f in futures])


def fit_spots_gpufit(spots: np.ndarray) -> np.ndarray:
    """API-compatible with the reference CUDA path
    (picasso/gausslq.py:346): returns columns
    [photons, x, y, sx, sy, bg] with x/y in box coordinates."""
    theta = fit_spots(spots)
    size = spots.shape[1]
    half = int(size / 2)
    out = np.empty_like(theta)
    out[:, 0] = theta[:, 2]
    out[:, 1] = theta[:, 0] + half
    out[:, 2] = theta[:, 1] + half
    out[:, 3] = theta[:, 4]
    out[:, 4] = theta[:, 5]
    out[:, 5] = theta[:, 3]
    return out


def locs_from_fits(
    identifications: pd.DataFrame,
    theta: np.ndarray,
    box: int,
    em: bool,
) -> pd.DataFrame:
    """Assemble the locs table from LQ fit results
    (picasso/gausslq.py:404-484)."""
    x = theta[:, 0] + identifications["x"].to_numpy()
    y = theta[:, 1] + identifications["y"].to_numpy()
    lpx = localization_precision(
        theta[:, 2], theta[:, 4], theta[:, 5], theta[:, 3], em=em
    )
    lpy = localization_precision(
        theta[:, 2], theta[:, 5], theta[:, 4], theta[:, 3], em=em
    )
    ellipticity = np.abs(theta[:, 4] - theta[:, 5]) / np.maximum(
        theta[:, 4], theta[:, 5]
    )
    f32 = lambda v: np.asarray(v, dtype=np.float32)  # noqa: E731
    data = {
        "frame": identifications["frame"].to_numpy().astype(np.uint32),
        "x": f32(x),
        "y": f32(y),
        "photons": f32(theta[:, 2]),
        "sx": f32(theta[:, 4]),
        "sy": f32(theta[:, 5]),
        "bg": f32(theta[:, 3]),
        "lpx": f32(lpx),
        "lpy": f32(lpy),
        "ellipticity": f32(ellipticity),
        "net_gradient": f32(
            identifications["net_gradient"].to_numpy()
        ),
    }
    if "n_id" in identifications.columns:
        data["n_id"] = identifications["n_id"].to_numpy().astype(np.uint32)
        locs = pd.DataFrame(data)
        locs.sort_values(by="n_id", kind="quicksort", inplace=True)
    else:
        locs = pd.DataFrame(data)
        locs.sort_values(by="frame", kind="quicksort", inplace=True)
    return locs


def locs_from_fits_gpufit(
    identifications: pd.DataFrame,
    theta: np.ndarray,
    box: int,
    em: bool,
) -> pd.DataFrame:
    """Assemble locs from gpufit-layout fits
    (picasso/gausslq.py:487-544)."""
    box_offset = int(box / 2)
    x = theta[:, 1] + identifications["x"].to_numpy() - box_offset
    y = theta[:, 2] + identifications["y"].to_numpy() - box_offset
    lpx = localization_precision(
        theta[:, 0], theta[:, 3], theta[:, 4], theta[:, 5], em=em
    )
    lpy = localization_precision(
        theta[:, 0], theta[:, 4], theta[:, 3], theta[:, 5], em=em
    )
    ellipticity = np.abs(theta[:, 3] - theta[:, 4]) / np.maximum(
        theta[:, 3], theta[:, 4]
    )
    f32 = lambda v: np.asarray(v, dtype=np.float32)  # noqa: E731
    locs = pd.DataFrame(
        {
            "frame": identifications["frame"].to_numpy().astype(np.uint32),
            "x": f32(x),
            "y": f32(y),
            "photons": f32(theta[:, 0]),
            "sx": f32(theta[:, 3]),
            "sy": f32(theta[:, 4]),
            "bg": f32(theta[:, 5]),
            "lpx": f32(lpx),
            "lpy": f32(lpy),
            "ellipticity": f32(ellipticity),
            "net_gradient": f32(
                identifications["net_gradient"].to_numpy()
            ),
        }
    )
    locs.sort_values(by="frame", kind="quicksort", inplace=True)
    return locs


def localization_precision(
    photons, s, s_orth, bg, em: bool
) -> np.ndarray:
    """Mortensen localization precision for a 2D unweighted Gaussian
    fit, diagonal-covariance form (picasso/gausslq.py:547-589); EMCCD
    excess-noise doubles the variance."""
    # f64: diverged fits carry huge sigma/bg and the sa*sa_orth*bg
    # product overflows f32 to inf with a RuntimeWarning; the result
    # lands in the f32 lpx/lpy columns unchanged for sane spots
    s = np.asarray(s, np.float64)
    s_orth = np.asarray(s_orth, np.float64)
    bg = np.asarray(bg, np.float64)
    photons = np.asarray(photons, np.float64)
    s2 = s**2
    sa2 = s2 + 1 / 12
    sa = sa2**0.5
    sa_orth = (s_orth**2 + 1 / 12) ** 0.5
    v = sa2 * (16 / 9 + (8 * np.pi * sa * sa_orth * bg) / photons) / photons
    if em:
        v = v * 2
    with np.errstate(invalid="ignore"):
        return np.sqrt(v)


def sigma_uncertainty(
    sigma, sigma_orth, photons, bg
) -> np.ndarray:
    """Standard error of fitted sigma for the LQ model (Kowalewski,
    Reinhardt et al., Nat. Comms 2026; picasso/gausslq.py:592-633)."""
    sa2 = sigma**2 + 1 / 12
    sa4 = sa2**2
    sa = sa2**0.5
    sa_orth = (sigma_orth**2 + 1 / 12) ** 0.5
    var_sa2 = (
        sa4 / photons
        * (512 / 81 + (64 * np.pi * sa * sa_orth * bg) / (3 * photons))
    )
    var_sigma = var_sa2 / (4 * sigma**2)
    return np.sqrt(var_sigma)


def _initial_parameters_gpufit(
    spots: np.ndarray, size: int
) -> np.ndarray:
    """Initial parameters in gpufit layout — amplitude, x, y, sx, sy,
    bg per spot (picasso/gausslq.py:128)."""
    center = (size / 2.0) - 0.5
    initial_width = max(size / 5.0, 1.0)
    spot_max = np.amax(spots, axis=(1, 2))
    spot_min = np.amin(spots, axis=(1, 2))
    initial = np.empty((len(spots), 6), dtype=np.float32)
    initial[:, 0] = spot_max - spot_min
    initial[:, 1] = center
    initial[:, 2] = center
    initial[:, 3] = initial_width
    initial[:, 4] = initial_width
    initial[:, 5] = spot_min
    return initial


def initial_parameters_gpufit(spots: np.ndarray, size: int) -> np.ndarray:
    """Deprecated alias of _initial_parameters_gpufit
    (picasso/gausslq.py:115)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _initial_parameters_gpufit instead."
    )
    return _initial_parameters_gpufit(spots, size)
