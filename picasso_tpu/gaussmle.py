"""picasso_tpu.gaussmle — MLE Gaussian fitting API (Smith et al.,
Nature Methods 2010).

Same public surface as picasso/gaussmle.py (gaussmle :409,
gaussmle_async :478, locs_from_fits :957, sigma_uncertainty :1040), but
the fits run as one batched XLA program on TPU
(picasso_tpu.ops.mle) instead of per-spot numba threads.
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np
import pandas as pd

from picasso_tpu import lib
from picasso_tpu.ops import mle as _mle


def gaussmle(
    spots: np.ndarray,
    eps: float,
    max_it: int,
    method: Literal["sigma", "sigmaxy"] = "sigmaxy",
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
    photon_conversion: tuple[float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fit integrated Gaussians by MLE to a batch of spots.

    Returns (thetas (N, 6), CRLBs (N, 6), likelihoods (N,),
    iterations (N,)); thetas columns are [x, y, photons, bg, sx, sy]
    with x/y in box coordinates (center at box//2), matching
    picasso/gaussmle.py:409-475.
    """
    with lib.progress_reporter(
        progress_callback, len(spots), "Fitting (MLE)"
    ) as rep:
        thetas, crlbs, lls, its = _mle.gaussmle_batched(
            spots, eps, max_it, method=method,
            photon_conversion=photon_conversion,
            progress_callback=rep.set_value,
        )
    if callable(progress_callback):
        progress_callback(len(spots))
    return thetas, crlbs, lls, its


def gaussmle_async(
    spots: np.ndarray,
    eps: float,
    max_it: int,
    method: Literal["sigma", "sigmaxy"] = "sigmaxy",
):
    """API-compatible shim for the reference's thread-pool launcher
    (picasso/gaussmle.py:478). The batched TPU fit completes eagerly;
    the returned ``current`` marker is already at N."""
    thetas, CRLBs, likelihoods, iterations = gaussmle(
        spots, eps, max_it, method=method
    )
    return [len(spots)], thetas, CRLBs, likelihoods, iterations


def locs_from_fits(
    identifications: pd.DataFrame,
    theta: np.ndarray,
    CRLBs: np.ndarray,
    log_likelihoods: np.ndarray,
    iterations: np.ndarray,
    box: int,
) -> pd.DataFrame:
    """Assemble the locs table from MLE fit results
    (picasso/gaussmle.py:957-1037)."""
    box_offset = int(box / 2)
    x = theta[:, 0] + identifications["x"].to_numpy() - box_offset
    y = theta[:, 1] + identifications["y"].to_numpy() - box_offset
    # one vectorized sqrt turns the CRLB diagonal into per-parameter
    # 1-sigma uncertainties (column order x, y, photons, bg, sx, sy —
    # same as theta; reference gaussmle.py:570/1002)
    with np.errstate(invalid="ignore"):
        unc = np.sqrt(CRLBs.astype(np.float32))
        ellipticity = np.abs(theta[:, 4] - theta[:, 5]) / np.maximum(
            theta[:, 4], theta[:, 5]
        )
    f32 = lambda v: np.asarray(v, dtype=np.float32)  # noqa: E731
    locs = pd.DataFrame(
        {
            "frame": identifications["frame"].to_numpy(dtype=np.uint32),
            "x": f32(x),
            "y": f32(y),
            "photons": f32(theta[:, 2]),
            "sx": f32(theta[:, 4]),
            "sy": f32(theta[:, 5]),
            "bg": f32(theta[:, 3]),
            "lpx": unc[:, 0],
            "lpy": unc[:, 1],
            "ellipticity": f32(ellipticity),
            "net_gradient": f32(
                identifications["net_gradient"].to_numpy()
            ),
            "log_likelihood": f32(log_likelihoods),
            "iterations": iterations.astype(np.uint32),
            "photons_unc": unc[:, 2],
            "bg_unc": unc[:, 3],
            "sx_unc": unc[:, 4],
            "sy_unc": unc[:, 5],
        }
    )
    if "n_id" in identifications.columns:
        locs["n_id"] = identifications["n_id"].to_numpy(dtype=np.uint32)
        locs.sort_values(by=["n_id"], kind="quicksort", inplace=True)
    else:
        locs.sort_values(by=["frame"], kind="quicksort", inplace=True)
    return locs


def sigma_uncertainty(
    sigma,
    sigma_orth,
    photons,
    bg,
) -> np.ndarray:
    """Standard error of fitted sigma (Rieger & Stallinga,
    ChemPhysChem 2014; picasso/gaussmle.py:1040)."""
    sa2 = sigma**2 + 1 / 12
    tau = (2 * np.pi * sa2 * bg) / photons
    delta_sigma_sq = (sigma**2 / (4 * photons)) * (
        1 + 8 * tau + np.sqrt((8 * tau) / (1 + 2 * tau))
    )
    return np.sqrt(delta_sigma_sq)


def _mean_filter(spot: np.ndarray, size: int) -> np.ndarray:
    """3x3 edge-clipped mean filter over a size x size patch
    (picasso/gaussmle.py:62) — the background initializer's smoothing
    step (the batched TPU path fuses this into ops/mle.py
    _mean_filter_min)."""
    spot = np.asarray(spot, dtype=np.float64)
    padded = np.pad(spot, 1)
    sums = sum(
        padded[1 + di:1 + di + size, 1 + dj:1 + dj + size]
        for di in (-1, 0, 1) for dj in (-1, 0, 1)
    )
    rows = np.minimum(np.arange(size) + 2, size) - np.maximum(
        np.arange(size) - 1, 0
    )
    counts = rows[:, None] * rows[None, :]
    return sums / counts


def mean_filter(spot: np.ndarray, size: int) -> np.ndarray:
    """Deprecated alias of _mean_filter (picasso/gaussmle.py:52)."""
    print(
        "mean_filter is deprecated and will become a private function "
        "in v0.11.0. Use _mean_filter instead."
    )
    return _mean_filter(spot, size)
