"""picasso_tpu.aim — AIM drift correction (Adaptive Intersection
Maximization; Ma et al., Science Advances 2024).

Capability parity with picasso/aim.py (_intersect1d :37,
_point_intersect_2d :297, _point_intersect_3d :377, _get_fft_peak
:444, intersection_max :517, intersection_max_z :662, aim :776).

The reference counts sorted-array intersections once per shift on a
~(2 roi/d + 1)^2 grid using one thread per shift; here all shifts
evaluate in a single vectorized searchsorted pass over the
(n_cells, n_shifts) shifted-coordinate matrix.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
from scipy.interpolate import InterpolatedUnivariateSpline

from picasso_tpu import __version__, lib


def _count_intersections_all_shifts(
    l0_coords: np.ndarray,
    l0_counts: np.ndarray,
    l1_coords: np.ndarray,
    l1_counts: np.ndarray,
    shifts: np.ndarray,
) -> np.ndarray:
    """For every shift, sum min(ref_count, target_count) over cells
    common to the reference and the shifted target — all shifts at
    once (replaces aim.py:95-135 + the per-shift thread pool
    :214-258)."""
    n_shifts = len(shifts)
    out = np.empty(n_shifts, np.int64)
    # chunk the shift axis so the (n1, chunk) temporaries stay ~64 MB
    # even for dense segments with ~1e6 occupied cells
    chunk = max(1, int(8e6 / max(len(l1_coords), 1)))
    for s0 in range(0, n_shifts, chunk):
        block = shifts[s0:s0 + chunk]
        shifted = l1_coords[:, None] + block[None, :]  # (n1, <=chunk)
        pos = np.searchsorted(l0_coords, shifted)
        pos_c = np.minimum(pos, len(l0_coords) - 1)
        hit = l0_coords[pos_c] == shifted
        mins = np.minimum(l0_counts[pos_c], l1_counts[:, None])
        out[s0:s0 + len(block)] = np.sum(
            np.where(hit, mins, 0), axis=0
        )
    return out


def _grid_counts(l1: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return np.unique(l1, return_counts=True)


def _grid_stride(units: float) -> int:
    """Integer row stride for the quantized-cell keys.

    The reference multiplies by the FLOAT width/intersect_d
    (aim.py:337/:421) and truncates to int32, which makes the key
    arithmetic inconsistent with its own integer shift offsets whenever
    the stride is not integer-valued (and risks int32 overflow in 3D).
    Using a rounded-up integer stride matches the reference exactly in
    the (typical) integer case and keeps keys collision-free and
    shift-consistent otherwise."""
    r = round(units)
    if abs(units - r) < 1e-6:
        return int(r)
    return int(np.ceil(units)) + 1


def _point_intersect_2d(
    l0_coords, l0_counts, x1, y1, intersect_d, width_units,
    shifts_xy, box,
) -> np.ndarray:
    """Count intersections for every xy shift of the local search
    region (picasso/aim.py:297)."""
    stride = _grid_stride(width_units)
    x1_units = np.round(np.asarray(x1) / intersect_d).astype(np.int64)
    y1_units = np.round(np.asarray(y1) / intersect_d).astype(np.int64)
    l1 = x1_units + y1_units * stride
    l1_coords, l1_counts = _grid_counts(l1)
    counts = _count_intersections_all_shifts(
        l0_coords, l0_counts, l1_coords, l1_counts, shifts_xy
    )
    return counts.reshape(box, box)


def _point_intersect_3d(
    l0_coords, l0_counts, x1, y1, z1, intersect_d, width_units,
    height_units, shifts_z,
) -> np.ndarray:
    """Count intersections for every z shift (picasso/aim.py:377)."""
    sw = _grid_stride(width_units)
    sh = _grid_stride(height_units)
    x1_units = np.round(np.asarray(x1) / intersect_d).astype(np.int64)
    y1_units = np.round(np.asarray(y1) / intersect_d).astype(np.int64)
    z1_units = np.round(np.asarray(z1) / intersect_d).astype(np.int64)
    l1 = x1_units + y1_units * sw + z1_units * sw * sh
    l1_coords, l1_counts = _grid_counts(l1)
    return _count_intersections_all_shifts(
        l0_coords, l0_counts, l1_coords, l1_counts, shifts_z
    )


def _get_fft_peak(roi_cc: np.ndarray, roi_size: float):
    """Phase-based sub-pixel peak of the intersection-count map
    (picasso/aim.py:444)."""
    fft_values = np.fft.fft2(roi_cc.T)
    ang_x = np.angle(fft_values[0, 1])
    ang_x = ang_x - 2 * np.pi * (ang_x > 0)
    px = (
        np.abs(ang_x) / (2 * np.pi / roi_cc.shape[0])
        - (roi_cc.shape[0] - 1) / 2
    )
    px *= roi_size / roi_cc.shape[0]
    ang_y = np.angle(fft_values[1, 0])
    ang_y = ang_y - 2 * np.pi * (ang_y > 0)
    py = (
        np.abs(ang_y) / (2 * np.pi / roi_cc.shape[1])
        - (roi_cc.shape[1] - 1) / 2
    )
    py *= roi_size / roi_cc.shape[1]
    return px, py


def _get_fft_peak_z(roi_cc: np.ndarray, roi_size: float) -> float:
    """1D phase peak for z (picasso/aim.py:490)."""
    fft_values = np.fft.fft(roi_cc)
    ang_z = np.angle(fft_values[1])
    ang_z = ang_z - 2 * np.pi * (ang_z > 0)
    pz = (
        np.abs(ang_z) / (2 * np.pi / roi_cc.size)
        - (roi_cc.size - 1) / 2
    )
    return pz * roi_size / roi_cc.size


def intersection_max(
    x, y, ref_x, ref_y, frame, seg_bounds, intersect_d, roi_r, width,
    aim_round: int = 1, progress=None,
):
    """Per-segment adaptive intersection maximization in 2D
    (picasso/aim.py:517)."""
    assert aim_round in (1, 2), "aim_round must be 1 or 2."
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    frame = np.asarray(frame)
    n_segments = len(seg_bounds) - 1
    rel_drift_x = 0.0
    rel_drift_y = 0.0
    drift_x = np.zeros(n_segments)
    drift_y = np.zeros(n_segments)

    roi_units = int(np.ceil(roi_r / intersect_d))
    steps = np.arange(-roi_units, roi_units + 1)
    box = len(steps)
    width_units = width / intersect_d
    stride = _grid_stride(width_units)
    # shifts[i, j] = step_x_i + step_y_j * stride, flattened row-major
    # like the reference grid (aim.py:594-601); integer stride keeps
    # the shift offsets exactly consistent with the cell keys
    shifts_xy = (
        steps[:, None] + steps[None, :] * stride
    ).astype(np.int64).reshape(box * box)

    x0_units = np.round(np.asarray(ref_x) / intersect_d).astype(np.int64)
    y0_units = np.round(np.asarray(ref_y) / intersect_d).astype(np.int64)
    l0 = x0_units + y0_units * stride
    l0_coords, l0_counts = _grid_counts(l0)

    start_idx = 1 if aim_round == 1 else 0
    for s in range(start_idx, n_segments):
        sel = (frame > seg_bounds[s]) & (frame <= seg_bounds[s + 1])
        x1 = x[sel]
        y1 = y[sel]
        if len(x1) == 0:
            drift_x[s] = drift_x[s - 1]
            drift_y[s] = drift_y[s - 1]
            continue
        x1 = x1 + rel_drift_x
        y1 = y1 + rel_drift_y
        roi_cc = _point_intersect_2d(
            l0_coords, l0_counts, x1, y1, intersect_d, width_units,
            shifts_xy, box,
        )
        px, py = _get_fft_peak(roi_cc, 2 * roi_r)
        rel_drift_x += px
        rel_drift_y += py
        drift_x[s] = -rel_drift_x
        drift_y[s] = -rel_drift_y
        if progress is not None:
            progress.set_value(s)

    t = (seg_bounds[1:] + seg_bounds[:-1]) / 2
    k = min(3, n_segments - 1)
    drift_x_full = InterpolatedUnivariateSpline(t, drift_x, k=k)(
        np.arange(seg_bounds[-1]) + 1
    )
    drift_y_full = InterpolatedUnivariateSpline(t, drift_y, k=k)(
        np.arange(seg_bounds[-1]) + 1
    )
    x_pdc = x - drift_x_full[frame - 1]
    y_pdc = y - drift_y_full[frame - 1]
    return x_pdc, y_pdc, drift_x_full, drift_y_full


def intersection_max_z(
    x, y, z, ref_x, ref_y, ref_z, frame, seg_bounds, intersect_d,
    roi_r, width, height, pixelsize, aim_round: int = 1, progress=None,
):
    """Per-segment intersection maximization along z (assumes x/y
    already undrifted; z in nm converted via pixelsize;
    picasso/aim.py:662)."""
    assert aim_round in (1, 2)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64) / pixelsize  # nm -> px
    ref_z = np.asarray(ref_z, np.float64) / pixelsize
    frame = np.asarray(frame)
    n_segments = len(seg_bounds) - 1
    rel_drift_z = 0.0
    drift_z = np.zeros(n_segments)

    roi_units = int(np.ceil(roi_r / intersect_d))
    steps = np.arange(-roi_units, roi_units + 1)
    width_units = width / intersect_d
    height_units = height / intersect_d
    sw = _grid_stride(width_units)
    sh = _grid_stride(height_units)
    # int64: z keys reach stride_w * stride_h * z_units and overflow
    # int32 on large FOVs (the reference's int32 keys would wrap)
    shifts_z = (steps * sw * sh).astype(np.int64)

    l0 = (
        np.round(np.asarray(ref_x) / intersect_d).astype(np.int64)
        + np.round(np.asarray(ref_y) / intersect_d).astype(np.int64) * sw
        + np.round(ref_z / intersect_d).astype(np.int64) * sw * sh
    )
    l0_coords, l0_counts = _grid_counts(l0)

    start_idx = 1 if aim_round == 1 else 0
    for s in range(start_idx, n_segments):
        sel = (frame > seg_bounds[s]) & (frame <= seg_bounds[s + 1])
        if not sel.any():
            drift_z[s] = drift_z[s - 1]
            continue
        z1 = z[sel] + rel_drift_z
        roi_cc = _point_intersect_3d(
            l0_coords, l0_counts, x[sel], y[sel], z1, intersect_d,
            width_units, height_units, shifts_z,
        )
        pz = _get_fft_peak_z(roi_cc, 2 * roi_r)
        rel_drift_z += pz
        drift_z[s] = -rel_drift_z
        if progress is not None:
            progress.set_value(s)

    t = (seg_bounds[1:] + seg_bounds[:-1]) / 2
    k = min(3, n_segments - 1)
    drift_z_full = InterpolatedUnivariateSpline(t, drift_z, k=k)(
        np.arange(seg_bounds[-1]) + 1
    )
    z_pdc = z - drift_z_full[frame - 1]
    return z_pdc * pixelsize, drift_z_full * pixelsize


def aim(
    locs: pd.DataFrame,
    info: list[dict],
    segmentation: int = 100,
    intersect_d: float = 20 / 130,
    roi_r: float = 60 / 130,
    progress: Literal["console"] | None = None,
) -> tuple[pd.DataFrame, list[dict], pd.DataFrame]:
    """AIM undrifting: two rounds (first-interval reference, then
    full-dataset reference), optional z rounds (picasso/aim.py:776)."""
    if progress == "console":
        progress = lib.TqdmProgress(
            total=2 * (int(np.ceil(
                lib.get_from_metadata(info, "Frames") / segmentation
            ))),
            description="Undrifting by AIM",
        )
    locs = locs.copy()
    width = lib.get_from_metadata(info, "Width", raise_error=True)
    height = lib.get_from_metadata(info, "Height", raise_error=True)
    pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    n_frames = lib.get_from_metadata(info, "Frames", raise_error=True)

    frame = (
        locs["frame"].to_numpy()
        + 1
        - locs["frame"].to_numpy().min()
    )
    seg_bounds = np.concatenate(
        (np.arange(0, n_frames, segmentation), [n_frames])
    )
    first = frame <= segmentation
    ref_x = locs["x"].to_numpy()[first]
    ref_y = locs["y"].to_numpy()[first]

    x_pdc, y_pdc, drift_x1, drift_y1 = intersection_max(
        locs["x"].to_numpy(), locs["y"].to_numpy(), ref_x, ref_y,
        frame, seg_bounds, intersect_d, roi_r, width, aim_round=1,
        progress=progress,
    )
    x_pdc, y_pdc, drift_x2, drift_y2 = intersection_max(
        x_pdc, y_pdc, x_pdc, y_pdc, frame, seg_bounds, intersect_d,
        roi_r, width, aim_round=2, progress=progress,
    )
    drift_x = drift_x1 + drift_x2
    drift_y = drift_y1 + drift_y2
    shift_x = np.mean(drift_x)
    shift_y = np.mean(drift_y)
    drift_x -= shift_x
    drift_y -= shift_y
    x_pdc += shift_x
    y_pdc += shift_y

    if "z" in locs.columns:
        z_arr = locs["z"].to_numpy()
        ref_sel = frame <= segmentation
        z_pdc, drift_z1 = intersection_max_z(
            x_pdc, y_pdc, z_arr, x_pdc[ref_sel], y_pdc[ref_sel],
            z_arr[ref_sel], frame, seg_bounds, intersect_d, roi_r,
            width, height, pixelsize, aim_round=1, progress=progress,
        )
        z_pdc, drift_z2 = intersection_max_z(
            x_pdc, y_pdc, z_pdc, x_pdc, y_pdc, z_pdc, frame,
            seg_bounds, intersect_d, roi_r, width, height, pixelsize,
            aim_round=2, progress=progress,
        )
        drift_z = drift_z1 + drift_z2
        shift_z = np.mean(drift_z)
        drift_z -= shift_z
        z_pdc += shift_z
        drift = pd.DataFrame(
            {"x": drift_x, "y": drift_y, "z": drift_z},
            dtype="float32",
        )
        locs["z"] = z_pdc.astype(np.float32)
    else:
        drift = pd.DataFrame(
            {"x": drift_x, "y": drift_y}, dtype="float32"
        )
    locs["x"] = x_pdc.astype(np.float32)
    locs["y"] = y_pdc.astype(np.float32)
    new_info = info + [
        {
            "Generated by": f"Picasso v{__version__} AIM",
            "Intersect distance (nm)": intersect_d * pixelsize,
            "Segmentation": segmentation,
            "Search regions radius (nm)": roi_r * pixelsize,
        }
    ]
    if hasattr(progress, "close"):
        progress.close()
    return locs, new_info, drift


# API-compatibility aliases for the reference's public names
# (picasso/aim.py:24-220).
def intersect1d(a, b):
    """Indices of common elements of two sorted unique arrays."""
    aux = np.concatenate((a, b))
    order = np.argsort(aux, kind="stable")
    aux_sorted = aux[order]
    mask = aux_sorted[1:] == aux_sorted[:-1]
    return order[:-1][mask], order[1:][mask] - a.size


def count_intersections(l0_coords, l0_counts, l1_coords, l1_counts):
    """Min-count overlap of two gridded localization sets."""
    return int(
        _count_intersections_all_shifts(
            l0_coords, l0_counts, l1_coords, l1_counts,
            np.zeros(1, np.int64),
        )[0]
    )


get_fft_peak = _get_fft_peak
get_fft_peak_z = _get_fft_peak_z
point_intersect_2d = _point_intersect_2d
point_intersect_3d = _point_intersect_3d


def run_intersections(l0_coords, l0_counts, l1_coords, l1_counts,
                      shifts_xy, box):
    """Intersection counts for all shifts (vectorized; the reference
    used one thread per shift)."""
    counts = _count_intersections_all_shifts(
        l0_coords, l0_counts, l1_coords, l1_counts,
        np.asarray(shifts_xy),
    )
    return counts.reshape(box, box) if box > 1 else counts


run_intersections_multithread = run_intersections
