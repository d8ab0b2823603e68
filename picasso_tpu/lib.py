"""picasso_tpu.lib — shared utilities for the localization data model.

DataFrame/recarray helpers, metadata access, sanity filtering, geometry
(picks), kinetics fitting and the pairwise-shift solver used by drift
correction.

Behavioral reference: picasso/lib.py (get_from_metadata :878,
ensure_sanity :1786, minimize_shifts :2034, fit_cum_exp :1273,
calculate_optimal_bins :1540, check_if_in_polygon :1885,
check_if_in_rectangle :1956, polygon_area :2228, pick_areas :2303).
All hot paths here are vectorized numpy / jnp instead of numba loops.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Literal

import numpy as np
import pandas as pd
from scipy import optimize

# ---------------------------------------------------------------------------
# Metadata access
# ---------------------------------------------------------------------------


class AutoDict(dict):
    """A dict that creates nested AutoDicts on missing keys (cf.
    picasso/lib.py:608)."""

    def __getitem__(self, key):
        try:
            return super().__getitem__(key)
        except KeyError:
            value = type(self)()
            self[key] = value
            return value


def get_from_metadata(
    info: list[dict] | dict,
    key: Any,
    default=None,
    *,
    raise_error: bool = False,
) -> Any:
    """Fetch ``key`` from a metadata dict or info chain (list of dicts,
    searched newest-to-oldest). Matches picasso/lib.py:878 semantics,
    including the truthiness-based skip of falsy values in lists."""
    if isinstance(info, dict):
        if raise_error and key not in info:
            raise KeyError(f"Key '{key}' not found in metadata.")
        return info.get(key, default)
    elif isinstance(info, list):
        for block in info[::-1]:
            if val := block.get(key):
                return val
        if raise_error:
            raise KeyError(f"Key '{key}' not found in metadata.")
        return default
    raise ValueError("info must be a dict or a list of dicts.")


# ---------------------------------------------------------------------------
# Localization table sanity
# ---------------------------------------------------------------------------

_NONNEGATIVE_COLUMNS = [
    "x",
    "y",
    "lpx",
    "lpy",
    "lpz",
    "photons",
    "ellipticity",
    "sx",
    "sy",
]


def ensure_sanity(locs: pd.DataFrame, info: list[dict]) -> pd.DataFrame:
    """Drop non-finite rows, rows outside the FOV and rows with negative
    precision/photon columns. Run on every load AND save, like the
    reference (picasso/lib.py:1786)."""
    locs = locs.copy()
    locs.replace([np.inf, -np.inf], np.nan, inplace=True)
    locs.dropna(axis=0, how="any", inplace=True)
    for key in ("Width", "Height", "Frames"):
        if get_from_metadata(info, key) is None:
            raise KeyError(f"Metadata is missing required key: '{key}'")
    locs = locs[locs["x"] < get_from_metadata(info, "Width")]
    locs = locs[locs["y"] < get_from_metadata(info, "Height")]
    for col in _NONNEGATIVE_COLUMNS:
        if col in locs.columns:
            locs = locs[locs[col] >= 0]
    return locs


def append_to_rec(
    locs: pd.DataFrame, data: np.ndarray, name: str
) -> pd.DataFrame:
    """Add a column to a locs table (API-compatible with the reference's
    recarray-era helper, picasso/lib.py:1660)."""
    locs = locs.copy()
    locs[name] = data
    return locs


def merge_locs(
    locs_list: list[pd.DataFrame], increment_frames: bool = False
) -> pd.DataFrame:
    """Concatenate several locs tables; optionally shift the frame
    numbers of each subsequent table past the previous table's maximum
    (picasso/lib.py:1700)."""
    if increment_frames:
        shifted = []
        offset = 0
        for locs in locs_list:
            locs = locs.copy()
            locs["frame"] = locs["frame"] + offset
            offset = int(locs["frame"].max()) + 1 if len(locs) else offset
            shifted.append(locs)
        locs_list = shifted
    return pd.concat(locs_list, ignore_index=True)


# ---------------------------------------------------------------------------
# Geometry: picks
# ---------------------------------------------------------------------------


def is_loc_at(
    x: float, y: float, locs: pd.DataFrame, r: float
) -> np.ndarray:
    """Boolean mask of locs within radius r of (x, y)
    (picasso/lib.py:1836)."""
    dx = locs["x"].to_numpy() - x
    dy = locs["y"].to_numpy() - y
    return dx * dx + dy * dy < r * r


def locs_at(x: float, y: float, locs: pd.DataFrame, r: float) -> pd.DataFrame:
    """Locs within radius r of (x, y) (picasso/lib.py:1861)."""
    return locs[is_loc_at(x, y, locs, r)]


def check_if_in_polygon(
    x: np.ndarray, y: np.ndarray, X: np.ndarray, Y: np.ndarray
) -> np.ndarray:
    """Ray-casting point-in-polygon test, vectorized over points
    (picasso/lib.py:1885)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    n = len(X)
    inside = np.zeros(len(x), dtype=bool)
    j = n - 1
    for i in range(n):
        cond = (Y[i] > y) != (Y[j] > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (X[j] - X[i]) * (y - Y[i]) / (Y[j] - Y[i]) + X[i]
        crossing = cond & (x < xint)
        inside ^= crossing
        j = i
    return inside


def check_if_in_rectangle(
    x: np.ndarray,
    y: np.ndarray,
    X: np.ndarray,
    Y: np.ndarray,
) -> np.ndarray:
    """Point-in-(possibly rotated)-rectangle test via the polygon path
    (picasso/lib.py:1956)."""
    return check_if_in_polygon(x, y, X, Y)


def polygon_area(X: np.ndarray, Y: np.ndarray) -> float:
    """Shoelace polygon area (picasso/lib.py:2228)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    return 0.5 * abs(np.dot(X, np.roll(Y, -1)) - np.dot(Y, np.roll(X, -1)))


def pick_areas_polygon(picks: list) -> np.ndarray:
    """Areas of polygon picks (picasso/lib.py:2303)."""
    areas = []
    for pick in picks:
        pick = np.asarray(pick)
        if len(pick) < 3:
            continue
        areas.append(polygon_area(pick[:, 0], pick[:, 1]))
    return np.array(areas)


def pick_areas_circle(picks: list, r: float) -> np.ndarray:
    """Areas of circular picks (picasso/lib.py:2270)."""
    return np.pi * r**2 * np.ones(len(picks))


def pick_areas_rectangle(picks: list, w: float) -> np.ndarray:
    """Areas of rectangular picks given width w (picasso/lib.py:2285)."""
    areas = []
    for (xs, ys), (xe, ye) in picks:
        length = np.hypot(xe - xs, ye - ys)
        areas.append(length * w)
    return np.array(areas)


def get_pick_rectangle_corners(
    start_x: float, start_y: float, end_x: float, end_y: float, width: float
) -> tuple[list[float], list[float]]:
    """4 corners of a rectangle defined by a center line and a width
    (picasso/lib.py:2005-like helper used for rectangle picks)."""
    if end_x == start_x:
        alpha = np.pi / 2
    else:
        alpha = np.arctan((end_y - start_y) / (end_x - start_x))
    dx = width * np.sin(alpha) / 2
    dy = width * np.cos(alpha) / 2
    x1 = start_x - dx
    x2 = start_x + dx
    x4 = end_x - dx
    x3 = end_x + dx
    y1 = start_y + dy
    y2 = start_y - dy
    y4 = end_y + dy
    y3 = end_y - dy
    return [x1, x2, x3, x4], [y1, y2, y3, y4]


def overwrite_metadata(info: list[dict], key, value) -> list[dict]:
    """Set a key in the newest info block that contains it, or append
    to the last block (picasso/lib.py:918-like)."""
    from copy import deepcopy

    info = deepcopy(info)
    for block in info[::-1]:
        if key in block:
            block[key] = value
            return info
    info[-1][key] = value
    return info


def unfold_localizations_square(
    locs: pd.DataFrame,
    info: list[dict],
    *,
    n_square: int = 10,
    spacing: float = 1,
):
    """Tile picked groups onto a square grid for side-by-side viewing
    (picasso/lib.py:2547). Vectorized with groupby transforms."""
    assert "group" in locs.columns, (
        "Localizations must contain a 'group' column."
    )
    from copy import deepcopy

    locs = locs.copy()
    updated_info = deepcopy(info)
    unique_groups = np.unique(locs["group"])
    mapping = {old: new for new, old in enumerate(unique_groups)}
    locs["group"] = locs["group"].map(mapping)
    cx = get_from_metadata(updated_info, "Width", raise_error=True) / 2
    cy = get_from_metadata(updated_info, "Height", raise_error=True) / 2
    g = locs.groupby("group")
    locs["x"] = locs["x"] + cx - g["x"].transform("mean")
    locs["y"] = locs["y"] + cy - g["y"].transform("mean")
    locs["x"] += np.mod(locs["group"], n_square) * spacing
    locs["y"] += np.floor(locs["group"] / n_square) * spacing
    locs["x"] -= locs["x"].mean()
    locs["y"] -= locs["y"].mean()
    locs["x"] += np.abs(locs["x"].min())
    locs["y"] += np.abs(locs["y"].min())
    updated_info = overwrite_metadata(
        updated_info, "Width", int(np.ceil(locs["x"].max()))
    )
    updated_info = overwrite_metadata(
        updated_info, "Height", int(np.ceil(locs["y"].max()))
    )
    return locs, updated_info


def sync_groups(locs: list[pd.DataFrame]) -> list[pd.DataFrame]:
    """Keep only group ids present in every locs list
    (picasso/lib.py:2616)."""
    assert all("group" in loc.columns for loc in locs), (
        "All localization lists must contain a 'group' column."
    )
    unique_groups = [np.unique(loc["group"]) for loc in locs]
    common = set(unique_groups[0]).intersection(*unique_groups)
    return [
        loc[loc["group"].isin(common)].reset_index(drop=True)
        for loc in locs
    ]


# ---------------------------------------------------------------------------
# Kinetics
# ---------------------------------------------------------------------------


def cumulative_exponential(
    x: np.ndarray, a: float, t: float, c: float
) -> np.ndarray:
    """a * (1 - exp(-x/t)) + c — model for binding-kinetics CDFs."""
    return a * (1 - np.exp(-x / t)) + c


def fit_cum_exp(data: np.ndarray) -> dict:
    """Fit a cumulative exponential to sorted event durations
    (picasso/lib.py:1273)."""
    data = np.sort(np.asarray(data, dtype=np.float64))
    n = len(data)
    y = np.arange(1, n + 1)
    data_min = data.min()
    data_max = data.max()
    p0 = [n, float(np.mean(data)), data_min]
    bounds = ([0, data_min, 0], [np.inf, data_max, np.inf])
    popt, _ = optimize.curve_fit(
        cumulative_exponential, data, y, p0=p0, bounds=bounds
    )
    return {
        "best_values": {"a": popt[0], "t": popt[1], "c": popt[2]},
        "data": data,
        "best_fit": cumulative_exponential(data, *popt),
    }


def estimate_kinetic_rate(data: np.ndarray) -> float:
    """Mean dark/bright time via cumulative-exponential fit
    (picasso/lib.py:1325)."""
    data = np.asarray(data, dtype=np.float64)
    if len(data) > 2:
        if data.max() - data.min() == 0:
            return float(np.nanmean(data))
        return float(fit_cum_exp(data)["best_values"]["t"])
    return float(np.nanmean(data))


def find_local_minima(arr: np.ndarray) -> np.ndarray:
    """Indices of strict local minima of a 1D array
    (picasso/lib.py:1243)."""
    arr = np.asarray(arr)
    if len(arr) < 3:
        return np.array([], dtype=int)
    return (
        np.nonzero(
            (arr[1:-1] < arr[:-2]) & (arr[1:-1] < arr[2:])
        )[0]
        + 1
    )


# ---------------------------------------------------------------------------
# Histograms / binning
# ---------------------------------------------------------------------------


def calculate_optimal_bins(
    data: np.ndarray,
    max_n_bins: int | None = None,
    sample_size: int = 1_000_000,
) -> np.ndarray:
    """Display bin edges sized by the Freedman–Diaconis rule
    (width = 2·IQR·n^(-1/3); picasso/lib.py:1540 uses the same rule).

    The IQR is estimated from a fixed-seed subsample above
    ``sample_size`` rows (quantiles sort; min/max stay O(n) over the
    full data). Integer data never bins finer than 1 unit, and the
    first edge sits half a bin below the minimum so the smallest
    value falls inside the first bin rather than on its edge.
    """
    data = np.asarray(data)
    n = len(data)
    if n == 0:
        return np.array([0.0, 1.0])
    is_float = data.dtype.kind == "f"
    lo = np.nanmin(data) if is_float else data.min()
    hi = np.nanmax(data) if is_float else data.max()
    sample = data
    if n > sample_size:
        idx = np.random.default_rng(0).choice(
            n, sample_size, replace=False
        )
        sample = data[idx]
    if is_float:
        sample = sample[np.isfinite(sample)]
        if not len(sample):
            return np.array([lo - 1.0, hi + 1.0])
    q1, q3 = np.quantile(sample, [0.25, 0.75])
    iqr = q3 - q1
    if iqr == 0:
        return np.array([data[0] - 1.0, data[0] + 1.0])
    width = 2.0 * iqr / np.cbrt(n)
    if data.dtype.kind in "ui":
        width = max(width, 1)
    start = lo - width / 2
    try:
        n_bins = int((hi - start) / width)
    except Exception:
        n_bins = 10
    if max_n_bins:
        n_bins = min(n_bins, max_n_bins)
    return np.linspace(start, hi, n_bins)


def hist2d(
    x: np.ndarray,
    y: np.ndarray,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    nx: int,
    ny: int,
) -> np.ndarray:
    """Fast uniform-bin 2D histogram, counts[ix, iy]; right-edge values
    folded into the last bin like np.histogram2d
    (picasso/lib.py:1602)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    finite = np.isfinite(x) & np.isfinite(y)
    x, y = x[finite], y[finite]
    dx = (x_max - x_min) / nx
    dy = (y_max - y_min) / ny
    ix = ((x - x_min) / dx).astype(np.int64)
    iy = ((y - y_min) / dy).astype(np.int64)
    ix[ix == nx] = nx - 1
    iy[iy == ny] = ny - 1
    keep = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    counts = np.bincount(ix[keep] * ny + iy[keep], minlength=nx * ny)
    return counts.reshape(nx, ny)


# ---------------------------------------------------------------------------
# Drift: pairwise-shift least-squares solver
# ---------------------------------------------------------------------------


def minimize_shifts(
    shifts_x: np.ndarray,
    shifts_y: np.ndarray,
    shifts_z: np.ndarray | None = None,
):
    """Solve per-segment shifts from all-pairs relative shifts by
    least squares — the RCC "redundancy" step (picasso/lib.py:2034).

    Builds the pair → interval incidence matrix and solves with pinv;
    cumulative sums give the absolute shift of each segment relative to
    the first."""
    n = shifts_x.shape[0]
    n_pairs = n * (n - 1) // 2
    n_dims = 2 if shifts_z is None else 3
    rij = np.zeros((n_pairs, n_dims))
    A = np.zeros((n_pairs, n - 1))
    k = 0
    for i in range(n - 1):
        for j in range(i + 1, n):
            rij[k, 0] = shifts_y[i, j]
            rij[k, 1] = shifts_x[i, j]
            if n_dims == 3:
                rij[k, 2] = shifts_z[i, j]
            A[k, i:j] = 1
            k += 1
    Dj = np.linalg.pinv(A) @ rij
    shift_y = np.insert(np.cumsum(Dj[:, 0]), 0, 0)
    shift_x = np.insert(np.cumsum(Dj[:, 1]), 0, 0)
    if n_dims == 2:
        return shift_y, shift_x
    shift_z = np.insert(np.cumsum(Dj[:, 2]), 0, 0)
    return shift_y, shift_x, shift_z


def deprecation_warning(message: str) -> None:
    """Print a deprecation notice (picasso/lib.py convention)."""
    print(message)


def n_futures_done(futures) -> int:
    """Count finished futures (picasso/lib.py:2083)."""
    return sum(f.done() for f in futures)


def is_hexadecimal(text: str) -> bool:
    """True if text is a #RRGGBB hex color."""
    if not isinstance(text, str) or not text.startswith("#"):
        return False
    if len(text) != 7:
        return False
    try:
        int(text[1:], 16)
        return True
    except ValueError:
        return False


def get_colors(n_channels: int) -> list[tuple[float, float, float]]:
    """Evenly hue-spaced RGB colors for multichannel display
    (picasso/lib.py convention)."""
    import colorsys

    return [
        colorsys.hsv_to_rgb(i / n_channels, 1.0, 1.0)
        for i in range(n_channels)
    ]


def locs_in_polygon(
    locs: pd.DataFrame, X, Y
) -> pd.DataFrame:
    """Locs within the polygon with corners (X, Y)."""
    inside = check_if_in_polygon(
        locs["x"].to_numpy(), locs["y"].to_numpy(),
        np.asarray(X), np.asarray(Y),
    )
    return locs[inside]


def locs_in_rectangle(locs: pd.DataFrame, X, Y) -> pd.DataFrame:
    """Locs within the (possibly rotated) rectangle with corners
    (X, Y)."""
    inside = check_if_in_rectangle(
        locs["x"].to_numpy(), locs["y"].to_numpy(),
        np.asarray(X), np.asarray(Y),
    )
    return locs[inside]


def pick_areas(
    pick_shape: str, picks: list, pick_size: float | None = None
) -> np.ndarray:
    """Areas of picks of any shape (camera px^2)
    (picasso/lib.py:2303)."""
    if pick_shape == "Circle":
        return pick_areas_circle(picks, pick_size / 2)
    if pick_shape == "Rectangle":
        return pick_areas_rectangle(picks, pick_size)
    if pick_shape == "Polygon":
        return pick_areas_polygon(picks)
    if pick_shape == "Square":
        return pick_size**2 * np.ones(len(picks))
    raise ValueError(f"Unknown pick shape: {pick_shape}")


def extract_filter_steps(info: list[dict], current_columns):
    """Collect numeric [min, max] filter ranges recorded in the info
    chain by Filter stages (picasso/lib.py:923)."""
    current = set(current_columns)
    ranges: dict[str, list[float]] = {}
    to_remove: list[str] = []
    missing: list[str] = []
    for d in info:
        if not isinstance(d, dict):
            continue
        gen_by = str(get_from_metadata(d, "Generated by", default=""))
        if "Filter" not in gen_by:
            continue
        entries = d.get("Filters", None)
        if isinstance(entries, list):
            # picasso-tpu Filter app convention
            for e in entries:
                col = e.get("Column")
                if col is None:
                    continue
                if col not in current:
                    missing.append(col)
                    continue
                lo, hi = float(e["Min"]), float(e["Max"])
                if col in ranges:
                    ranges[col][0] = max(ranges[col][0], lo)
                    ranges[col][1] = min(ranges[col][1], hi)
                else:
                    ranges[col] = [lo, hi]
            continue
        for key, value in d.items():
            if key == "Generated by":
                continue
            if key == "Removed columns" and isinstance(value, list):
                to_remove.extend(
                    c for c in value if c in current
                )
                continue
            if (
                isinstance(value, (list, tuple))
                and len(value) == 2
                and all(isinstance(v, (int, float)) for v in value)
            ):
                if key not in current:
                    missing.append(key)
                    continue
                lo, hi = float(value[0]), float(value[1])
                if key in ranges:
                    ranges[key][0] = max(ranges[key][0], lo)
                    ranges[key][1] = min(ranges[key][1], hi)
                else:
                    ranges[key] = [lo, hi]
    return ranges, to_remove, missing


def apply_filter_steps(locs: pd.DataFrame, info: list[dict]):
    """Re-apply filters recorded in the info chain
    (picasso/lib.py:998)."""
    ranges, to_remove, missing = extract_filter_steps(
        info, locs.columns
    )
    for field, (xmin, xmax) in ranges.items():
        locs = locs[(locs[field] > xmin) & (locs[field] < xmax)]
    if to_remove:
        locs = locs.drop(columns=to_remove)
    return locs, ranges, to_remove, missing


def permutation_test(
    arr1: np.ndarray,
    arr2: np.ndarray,
    iterations: int = 1000,
) -> tuple[float, float, float]:
    """Two-sample KS permutation test: observed statistic, permutation
    p-value and the analytic KS p-value (picasso/lib.py
    permutation_test)."""
    from scipy import stats

    arr1 = np.asarray(arr1)
    arr2 = np.asarray(arr2)
    n1 = len(arr1)
    combined = np.concatenate([arr1, arr2])
    obs_d, ks_pval = stats.ks_2samp(arr1, arr2)
    null = np.empty(iterations)
    for i in range(iterations):
        shuffled = np.random.permutation(combined)
        null[i], _ = stats.ks_2samp(shuffled[:n1], shuffled[n1:])
    p_perm = float(np.sum(null >= obs_d) / iterations)
    return float(obs_d), p_perm, float(ks_pval)


def plot_cumulative_exponential_fit(
    data, fit_result: dict, fig=None, ax=None
):
    """Histogram + cumulative-exponential fit display
    (picasso/lib.py:1360)."""
    import matplotlib.pyplot as plt

    if fig is None or ax is None:
        fig, ax = plt.subplots()
    else:
        ax.clear()
    srt = np.sort(np.asarray(data))
    ax.plot(srt, np.arange(1, len(srt) + 1), ".", label="data")
    ax.plot(
        fit_result["data"], fit_result["best_fit"], label="fit"
    )
    t = fit_result["best_values"]["t"]
    ax.set_title(f"mean time: {t:.1f} frames")
    ax.set_xlabel("time (frames)")
    ax.set_ylabel("cumulative counts")
    ax.legend()
    return fig


# ---------------------------------------------------------------------------
# Progress reporting
# ---------------------------------------------------------------------------


class MockProgress:
    """No-op progress reporter (picasso/lib.py:426)."""

    def __init__(self, *a, **kw):
        pass

    def set_value(self, value):
        pass

    def update(self, n=1):
        pass

    def close(self):
        pass

    def zero_progress(self, description: str | None = None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class TqdmProgress:
    """tqdm-backed progress reporter (picasso/lib.py:464)."""

    def __init__(self, total: int, description: str = "", **kw):
        from tqdm import tqdm

        self._tqdm = tqdm(total=total, desc=description, **kw)
        self._value = 0

    def set_value(self, value: int):
        delta = value - self._value
        if delta > 0:
            self._tqdm.update(delta)
            self._value = value

    def update(self, n: int = 1):
        self._value += n
        self._tqdm.update(n)

    def close(self):
        self._tqdm.close()

    def zero_progress(self, description: str | None = None):
        if description is not None:
            self._tqdm.set_description(description)
        self._tqdm.reset()
        self._value = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def progress_reporter(
    progress: Callable[[int], None] | Literal["console"] | None,
    total: int,
    description: str = "",
):
    """Normalize the reference's progress_callback convention
    ("console" | callable | None) to a reporter object."""
    if progress == "console":
        return TqdmProgress(total, description)
    return MockProgress()


# ---------------------------------------------------------------------------
# Batch mapping over files
# ---------------------------------------------------------------------------


def locs_glob_map(
    func: Callable,
    pattern: str,
    args=[],
    kwargs={},
    extension: str = "",
) -> list:
    """Map a function over all locs files matching a glob pattern and
    save outputs with an extension-inserted filename
    (picasso/lib.py:2112)."""
    import glob as _glob
    import os as _os

    from picasso_tpu import io as _io

    paths = _glob.glob(pattern)
    results = []
    for path in paths:
        locs, info = _io.load_locs(path)
        result = func(locs, info, path, *args, **kwargs)
        if extension:
            base, ext = _os.path.splitext(path)
            out_path = base + "_" + extension + ".hdf5"
            out_locs, out_info = result
            _io.save_locs(out_path, out_locs, out_info)
        results.append(result)
    return results


# ---------------------------------------------------------------------------
# Public constants and type aliases (picasso/lib.py:46-83)
# ---------------------------------------------------------------------------

SOUND_NOTIFICATION_DURATION = 60  # seconds

# Columns that every locs table must carry for 3D analysis
REQUIRED_COLUMNS = ["frame", "x", "y", "z", "lpx", "lpy", "lpz"]

# Type aliases used throughout the reference API docs. We keep them as
# plain ndarray aliases — shape/dtype parametrization adds nothing at
# runtime and the reference's forms require Python >= 3.11 semantics.
IntArray1D = np.ndarray
IntArray2D = np.ndarray
IntArray3D = np.ndarray
FloatArray1D = np.ndarray
FloatArray2D = np.ndarray
FloatArray3D = np.ndarray
BoolArray1D = np.ndarray
BoolArray2D = np.ndarray
Array3x3 = np.ndarray
SeriesOrFloatArray1D = "pd.Series | np.ndarray"
SeriesOrIntArray1D = "pd.Series | np.ndarray"


# ---------------------------------------------------------------------------
# Misc helpers for API parity (picasso/lib.py:765-2504)
# ---------------------------------------------------------------------------


def hist2d_numba(x, y, x_min, x_max, y_min, y_max, nx, ny):
    """Alias of ``hist2d`` under the reference's name
    (picasso/lib.py:1603; 'numba' is historical — this build bins with
    vectorized numpy)."""
    return hist2d(x, y, x_min, x_max, y_min, y_max, nx, ny)


def is_path_available(path, *, check_ext="", parent=None):
    """For each extension variant of ``path``, True if nothing exists
    there yet (picasso/lib.py:1121). The reference's Qt overwrite
    prompt (``parent``) is accepted for signature parity but headless
    builds never prompt — an existing path is reported unavailable."""
    if check_ext:
        if isinstance(check_ext, str):
            check_ext = [check_ext]
        paths = [os.path.splitext(path)[0] + ext for ext in check_ext]
    else:
        paths = [path]
    return [not os.path.exists(p) for p in paths]


def get_pick_polygon_corners(pick):
    """X and Y corner coordinates of a closed pick polygon, or
    (None, None) if the pick is not closed (picasso/lib.py:2158)."""
    if len(pick) < 3 or pick[0] != pick[-1]:
        return None, None
    return [p[0] for p in pick], [p[1] for p in pick]


def remove_from_rec(rec_array, name):
    """Deprecated recarray column removal (picasso/lib.py:2087)."""
    from numpy.lib.recfunctions import drop_fields

    deprecation_warning(
        "remove_from_rec is deprecated: localization tables are pandas"
        " DataFrames now, so drop columns with"
        " locs.drop(columns='name') instead. The recarray helper will"
        " go away in a future release."
    )
    return drop_fields(rec_array, name, usemask=False, asrecarray=True)


def unpack_calibration(calibration, pixelsize):
    """Deprecated 3D-calibration unpacking for G5M: per-z spot
    width/height from the polynomial coefficients, the z grid in camera
    pixels, and the magnification factor (picasso/lib.py:1488)."""
    deprecation_warning(
        "unpack_calibration is deprecated and slated for removal:"
        " 3D G5M now consumes the x/y polynomial coefficients"
        " directly and no longer needs the unpacked grid."
    )
    cx = calibration["X Coefficients"]
    cy = calibration["Y Coefficients"]
    z_step_size = calibration["Step size in nm"]
    n_frames = calibration["Number of frames"]
    mag_factor = calibration["Magnification factor"]
    z_total_range = (n_frames - 1) * z_step_size
    z_range = -(np.arange(n_frames) * z_step_size - z_total_range / 2)
    spot_size = np.stack(
        (np.polyval(cx, z_range), np.polyval(cy, z_range))
    )
    return spot_size, z_range / pixelsize, mag_factor


# ---------------------------------------------------------------------------
# Sound notifications: settings round-trip without Qt
# (picasso/lib.py:765-840). Actual playback is a GUI concern; headless
# builds only persist the selection.
# ---------------------------------------------------------------------------


def _sound_notification_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.realpath(__file__)),
        "gui",
        "notification_sounds",
    )


def get_sound_notification_path():
    """Path of the configured notification sound, or None when unset,
    missing, or not an mp3/wav (picasso/lib.py:765)."""
    from picasso_tpu import io

    settings = io.load_user_settings()
    if "Sound_notification" not in settings:
        settings["Sound_notification"]["filename"] = None
        io.save_user_settings(settings)
    filename = settings["Sound_notification"]["filename"]
    if filename is None:
        return None
    path = os.path.join(_sound_notification_dir(), filename)
    if not os.path.isfile(path):
        return None
    if os.path.splitext(filename)[1].lower() not in (".mp3", ".wav"):
        return None
    return path


def get_available_sound_notifications():
    """File names of bundled notification sounds, preceded by "None"
    (picasso/lib.py:795)."""
    sounds_dir = _sound_notification_dir()
    filenames = []
    if os.path.isdir(sounds_dir):
        filenames = sorted(
            f for f in os.listdir(sounds_dir)
            if os.path.isfile(os.path.join(sounds_dir, f))
            and os.path.splitext(f)[1].lower() in (".mp3", ".wav")
        )
    return ["None"] + filenames


def set_sound_notification(selection) -> None:
    """Persist the selected notification sound in the user settings
    (picasso/lib.py:815). Accepts a file name or a Qt action with
    ``objectName()``; playback preview is left to the GUI layer."""
    from picasso_tpu import io

    if hasattr(selection, "objectName"):
        selection = selection.objectName()
    if selection == "None":
        selection = None
    settings = io.load_user_settings()
    settings["Sound_notification"]["filename"] = selection
    io.save_user_settings(settings)


# ---------------------------------------------------------------------------
# QC plots (picasso/lib.py:1385 plot_trace, :2381 plot_subclustering_check,
# :2504 plot_rel_sigma_check)
# ---------------------------------------------------------------------------


def plot_trace(locs, info, *, fig=None, include_photons=True,
               return_trace=False):
    """Per-frame trace of one binding site: x, y, ON/OFF and photons
    (picasso/lib.py:1385)."""
    import matplotlib.pyplot as plt

    n_rows = 4 if include_photons else 3
    if fig is None:
        fig, axes = plt.subplots(
            n_rows, 1, figsize=(5, 5), constrained_layout=True,
            sharex=True,
        )
    else:
        fig.clear()
        axes = fig.subplots(n_rows, sharex=True)
    n_frames = get_from_metadata(info, "Frames", raise_error=True)
    xvec = np.arange(n_frames)
    yvec = np.zeros(n_frames, dtype=int)
    yvec[locs["frame"]] = 1
    yvec_ph = np.zeros(n_frames)
    if "photons" in locs.columns:
        yvec_ph[locs["frame"]] = locs["photons"]
    trace_data = (
        (xvec, yvec, yvec_ph) if include_photons else (xvec, yvec)
    )

    axes[0].scatter(locs["frame"], locs["x"], s=2)
    axes[0].set_title("X-pos vs frame")
    axes[0].set_xlim(0, n_frames)
    axes[0].set_ylabel("X-pos [Px]")
    axes[1].scatter(locs["frame"], locs["y"], s=2)
    axes[1].set_title("Y-pos vs frame")
    axes[1].set_ylabel("Y-pos [Px]")
    axes[2].plot(xvec, yvec, linewidth=1)
    axes[2].fill_between(xvec, 0, yvec, facecolor="red")
    axes[2].set_title("Localizations")
    axes[2].set_xlabel("Frames")
    axes[2].set_ylabel("ON")
    axes[2].set_yticks([0, 1])
    axes[2].set_ylim([-0.1, 1.1])
    if include_photons:
        axes[3].plot(xvec, yvec_ph, linewidth=1)
        axes[3].set_title("Photons")
        axes[3].set_xlabel("Frames")
        axes[3].set_ylabel("Photons")
        axes[3].set_ylim([0, max(yvec_ph.max(), 1) * 1.1])
    if return_trace:
        return fig, trace_data
    return fig


def plot_subclustering_check(
    clustered_n_events, sparse_n_events, plot_path="", return_fig=False,
    clustering_dist=None, sparse_dist=None,
):
    """Event-count histograms of clustered vs sparse molecules with a
    KS/permutation test in the title — the QC companion of
    ``clusterer.test_subclustering`` (picasso/lib.py:2381)."""
    import matplotlib.pyplot as plt

    clustered_n_events = np.asarray(clustered_n_events)
    sparse_n_events = np.asarray(sparse_n_events)
    has_clustered = len(clustered_n_events) > 0
    has_sparse = len(sparse_n_events) > 0
    fig, ax = plt.subplots(1, figsize=(6, 4), constrained_layout=True)

    populations = [
        (has_clustered, clustered_n_events, clustering_dist, "<",
         "Clustered", "C0"),
        (has_sparse, sparse_n_events, sparse_dist, ">", "Sparse", "C1"),
    ]
    for present, events, dist, sign, name, color in populations:
        if not present:
            continue
        vals, counts = np.unique(events, return_counts=True)
        label = f"{name} {events.mean():.1f} +/- {events.std():.1f}"
        if dist is not None:
            label = (
                f"{name} (d {sign} {dist:.1f} nm) "
                f"{events.mean():.1f} +/- {events.std():.1f}"
            )
        ax.bar(vals, counts, width=0.8, alpha=0.5, label=label,
               color=color)
        ax.axvline(events.mean(), color=color, linestyle="--")

    if has_clustered or has_sparse:
        all_events = np.concatenate((sparse_n_events, clustered_n_events))
        min_bin, max_bin = np.percentile(all_events, [2.5, 97.5])
        ax.set_xlabel("Number of events")
        ax.set_ylabel("Counts")
        ax.set_xlim(min_bin - 1, max_bin + 1)
        ax.legend()
    if has_clustered and has_sparse:
        stat, p_perm, p = permutation_test(
            clustered_n_events, sparse_n_events
        )
        p_str = r"$p_{value}$"
        title = (
            f"KS test: stat={stat:.4f}\n"
            f"permutation {p_str}={p_perm:.4f}\n"
            f"theoretical {p_str}={p:.4f}"
        )
    elif has_clustered or has_sparse:
        title = (
            "Only one population found, no statistical test performed; "
            "adjust distance parameters."
        )
    else:
        title = (
            "No molecules found in either population, adjust distance"
            " parameters."
        )
    ax.set_title(title, fontsize=10)
    if len(plot_path):
        if isinstance(plot_path, str):
            plot_path = [plot_path]
        for path in plot_path:
            fig.savefig(path, dpi=300)
    if return_fig:
        return fig, ax
    plt.close(fig)
    return None, None


def plot_rel_sigma_check(mols, info, path) -> None:
    """Histogram the relative sigmas of G5M molecules (one panel per
    dimension in 3D) and save to ``path`` (picasso/lib.py:2504)."""
    import matplotlib.pyplot as plt

    if "z" in mols.columns:
        fig, axes = plt.subplots(
            3, 1, figsize=(6, 8), constrained_layout=True
        )
        bins = calculate_optimal_bins(
            np.concatenate([
                mols["rel_sigma_x"], mols["rel_sigma_y"],
                mols["rel_sigma_z"],
            ])
        )
        for i, dim in enumerate("xyz"):
            axes[i].hist(
                mols[f"rel_sigma_{dim}"], bins=bins, color=f"C{i}",
                alpha=0.7,
            )
            axes[i].set_xlabel(f"Relative sigma {dim}")
            axes[i].set_ylabel("Counts")
    else:
        fig, ax = plt.subplots(1, figsize=(6, 4), constrained_layout=True)
        ax.hist(
            mols["rel_sigma"],
            bins=calculate_optimal_bins(mols["rel_sigma"]),
            color="C0", alpha=0.7,
        )
        ax.set_xlabel("Relative sigma")
        ax.set_ylabel("Counts")
    fig.savefig(path, dpi=300)
    plt.close(fig)


class ProgressDialog:
    """Headless stand-in for the reference's Qt progress dialog
    (picasso/lib.py:307): same constructor and method surface —
    ``set_value``, ``zero_progress``, ``close``, ``get_iterator`` — but
    rendered as a tqdm bar, so long-running API calls accept the same
    progress object with or without a GUI."""

    def __init__(self, description, minimum, maximum, parent=None):
        from tqdm import tqdm

        self.description_base = description
        self._minimum = minimum
        self._maximum = maximum
        self._bar = tqdm(
            total=maximum - minimum, desc=description, leave=False
        )
        self._value = minimum

    def value(self):
        return self._value

    def maximum(self):
        return self._maximum

    def set_value(self, value):
        self._value = value
        self._bar.n = value - self._minimum
        self._bar.refresh()

    def setLabelText(self, description):
        self.description_base = description
        self._bar.set_description(description)

    def zero_progress(self, description=None):
        if description:
            self.setLabelText(description)
        self.set_value(self._minimum)

    def get_iterator(self, start=None, end=None):
        start = self._value if start is None else start
        end = self._maximum if end is None else end
        return range(start, end)

    def close(self):
        self._bar.close()

    def closeEvent(self, event=None):
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


ProgressType = ProgressDialog | MockProgress | TqdmProgress


_QT_ONLY_NAMES = {
    "Dialog", "GenericPlotWindow", "HelpButton", "LogDoubleSpinBox",
    "MetadataDialog", "RemoveColumnsDialog", "ScrollableGroupBox",
    "StatusDialog", "UserSettingsDialog", "adjust_widget_size",
    "cancel_dialogs", "get_save_filename_ext_dialog",
    "install_excepthook",
}


class QtOnlyAttributeError(AttributeError):
    """Raised for reference symbols that exist only in Qt builds.
    An AttributeError so hasattr()/getattr(..., default) feature
    probing still works (AttributeError and ImportError cannot be
    combined — their C instance layouts conflict)."""


def __getattr__(name):
    if name in _QT_ONLY_NAMES:
        raise QtOnlyAttributeError(
            f"lib.{name} is a Qt widget/helper in the reference "
            "(picasso/lib.py); this TPU-native build keeps the compute "
            "core headless. Interactive widgets live in "
            "picasso_tpu.gui and require PyQt6."
        )
    raise AttributeError(
        f"module 'picasso_tpu.lib' has no attribute {name!r}"
    )
