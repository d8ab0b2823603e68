"""picasso_tpu.avgroi — "avg" fit method: photon sum with a fixed
center, used for picked-spot photometry (reference picasso/avgroi.py).
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np
import pandas as pd

from picasso_tpu import gausslq


def fit_spot(spot: np.ndarray) -> list[float]:
    """[x, y, photons, bg, sx, sy] with photons = bg = pixel sum
    (picasso/avgroi.py:35)."""
    avg_roi = float(np.sum(spot))
    return [0, 0, avg_roi, avg_roi, 1, 1]


def fit_spots(
    spots: np.ndarray,
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
) -> np.ndarray:
    """Vectorized pixel sums for every spot (picasso/avgroi.py:43)."""
    sums = np.sum(np.asarray(spots, np.float32), axis=(1, 2))
    theta = np.empty((len(spots), 6), dtype=np.float32)
    theta[:, 0] = 0
    theta[:, 1] = 0
    theta[:, 2] = sums
    theta[:, 3] = sums
    theta[:, 4] = 1
    theta[:, 5] = 1
    if callable(progress_callback):
        progress_callback(len(spots))
    return theta


def fit_spots_parallel(spots: np.ndarray, asynch: bool = False):
    """Vectorized — no pool needed (picasso/avgroi.py:66)."""
    theta = fit_spots(spots)
    if asynch:
        return [gausslq._CompletedFuture(theta)]
    return theta


def fits_from_futures(futures) -> np.ndarray:
    return np.vstack([f.result() for f in futures])


def locs_from_fits(
    identifications: pd.DataFrame,
    theta: np.ndarray,
    box: int,
    em: float,
) -> pd.DataFrame:
    """Assemble the locs table (picasso/avgroi.py:103)."""
    x = theta[:, 0] + identifications["x"].to_numpy()
    y = theta[:, 1] + identifications["y"].to_numpy()
    lpx = gausslq.localization_precision(
        theta[:, 2], theta[:, 4], theta[:, 5], theta[:, 3], em=em
    )
    lpy = gausslq.localization_precision(
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
        data["n_id"] = (
            identifications["n_id"].to_numpy().astype(np.uint32)
        )
        locs = pd.DataFrame(data)
        locs.sort_values(by="n_id", kind="quicksort", inplace=True)
    else:
        locs = pd.DataFrame(data)
        locs.sort_values(by="frame", kind="quicksort", inplace=True)
    return locs
