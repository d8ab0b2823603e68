"""3D particle averaging: iterative per-group rotation scans around the
x/y/z axes with FFT cross-correlation against the ensemble average,
plus per-axis translation alignment.

Headless capability analogue of the reference Average3 app
(picasso/gui/average3.py): rotate_axis :73, angle grid
a_step = arcsin(1/(oversampling*r)) :1157-1164, projection planes
xy/yz/xz :1186-1198, per-group convolution scan
rotatexy_convolution_group :1065, axis translations translate() :885.
The per-group scan evaluates ALL angles in one batched histogram +
FFT stack instead of the reference's per-angle Python loop
(same de-serialization as picasso_tpu.average.align_group_core).

z is in nanometers throughout (the data contract); rotations around
x/y convert with the camera pixel size exactly like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from picasso_tpu import lib
from picasso_tpu.average import build_group_index

#: rotation axis -> projection plane whose image the scan correlates
ROT_PLANES = {"z": "xy", "x": "yz", "y": "xz"}


def rotate_axis(axis, vx, vy, vz, angle, pixelsize):
    """Rotate (x[px], y[px], z[nm]) around a coordinate axis
    (picasso/gui/average3.py:73)."""
    c, s = np.cos(angle), np.sin(angle)
    if axis == "z":
        return c * vx - s * vy, s * vx + c * vy, vz
    if axis == "y":
        return (
            c * vx + s * (vz / pixelsize),
            vy,
            -s * vx * pixelsize + c * vz,
        )
    if axis == "x":
        return (
            vx,
            c * vy - s * (vz / pixelsize),
            s * vy * pixelsize + c * vz,
        )
    raise ValueError(f"unknown axis {axis!r}")


def _plane_coords(x, y, z_px, proplane):
    """The two in-plane coordinate arrays (rows, cols) of a projection."""
    if proplane == "xy":
        return y, x
    if proplane == "yz":
        return z_px, y
    if proplane == "xz":
        return z_px, x
    raise ValueError(f"unknown plane {proplane!r}")


def _hist_stack(rows, cols, oversampling, t_min, t_max):
    """Batched 2D histograms: rows/cols are (A, n_locs) for A angles."""
    n_pixel = int(np.ceil(oversampling * (t_max - t_min)))
    A = rows.shape[0]
    in_view = (
        (rows > t_min) & (cols > t_min) & (rows < t_max) & (cols < t_max)
    )
    ri = np.clip(
        (oversampling * (rows - t_min)).astype(np.int32), 0, n_pixel - 1
    )
    ci = np.clip(
        (oversampling * (cols - t_min)).astype(np.int32), 0, n_pixel - 1
    )
    images = np.zeros((A, n_pixel, n_pixel), np.float32)
    a_idx = np.broadcast_to(np.arange(A)[:, None], ri.shape)
    np.add.at(
        images, (a_idx[in_view], ri[in_view], ci[in_view]), 1.0
    )
    return images


def _com_align3(locs: pd.DataFrame) -> pd.DataFrame:
    locs = locs.copy().reset_index(drop=True)
    g = locs.groupby("group")
    for c in ("x", "y", "z"):
        locs[c] = locs[c] - g[c].transform("mean")
    return locs


def _align_rotation_axis(
    locs, group_index, rotaxis, angles, oversampling, t_min, t_max,
    pixelsize,
):
    """One full rotation-scan pass over all groups around one axis."""
    proplane = ROT_PLANES[rotaxis]
    x = locs["x"].to_numpy().copy()
    y = locs["y"].to_numpy().copy()
    z = locs["z"].to_numpy().copy()
    n_pixel = int(np.ceil(oversampling * (t_max - t_min)))
    half = n_pixel / 2

    # ensemble average image in the scan plane
    rows, cols = _plane_coords(x, y, z / pixelsize, proplane)
    avg = _hist_stack(
        rows[None], cols[None], oversampling, t_min, t_max
    )[0]
    CF_avg = np.conj(np.fft.fft2(avg))

    n_groups = group_index.shape[0]
    for g in range(n_groups):
        idx = group_index[g].nonzero()[1]
        xg, yg, zg = x[idx], y[idx], z[idx]
        # all rotated copies at once: (A, n)
        xr, yr, zr = rotate_axis(
            rotaxis, xg[None, :], yg[None, :], zg[None, :],
            angles[:, None], pixelsize,
        )
        rows, cols = _plane_coords(xr, yr, zr / pixelsize, proplane)
        images = _hist_stack(rows, cols, oversampling, t_min, t_max)
        F = np.fft.fft2(images)
        xcorr = np.fft.fftshift(
            np.real(np.fft.ifft2(F * CF_avg[None])), axes=(1, 2)
        )
        flat = xcorr.reshape(len(angles), -1)
        a_best = int(np.argmax(flat.max(axis=1)))
        r_max, c_max = np.unravel_index(
            int(np.argmax(flat[a_best])), (n_pixel, n_pixel)
        )
        dr = np.ceil(r_max - half) / oversampling
        dc = np.ceil(c_max - half) / oversampling
        xb, yb, zb = rotate_axis(
            rotaxis, xg, yg, zg, angles[a_best], pixelsize
        )
        if proplane == "xy":
            yb = yb - dr
            xb = xb - dc
        elif proplane == "yz":
            zb = zb - dr * pixelsize
            yb = yb - dc
        else:  # xz
            zb = zb - dr * pixelsize
            xb = xb - dc
        x[idx], y[idx], z[idx] = xb, yb, zb
    locs = locs.copy()
    locs["x"], locs["y"], locs["z"] = x, y, z
    return locs


def prepare_locs_for_save(
    locs: pd.DataFrame, info: list[dict], params: dict | None = None
) -> tuple[pd.DataFrame, list[dict]]:
    """Shift origin-centered 3D averages back into the FOV and append a
    provenance block (cf. picasso_tpu.average.prepare_locs_for_save —
    the save-time sanity filter drops negative coordinates)."""
    locs = locs.copy()
    locs["x"] += lib.get_from_metadata(info, "Width") / 2
    locs["y"] += lib.get_from_metadata(info, "Height") / 2
    block = {"Generated by": "Picasso Average3"}
    block.update(params or {})
    return locs, info + [block]


def average3(
    locs: pd.DataFrame,
    info: list[dict],
    *,
    iterations: int = 3,
    oversampling: float = 10.0,
    rot_axes: tuple[str, ...] = ("z", "x", "y"),
    angle_range: float | None = None,
    progress_callback=None,
) -> pd.DataFrame:
    """Iteratively align picked 3D particles (group column required).

    Per iteration, every group is rotation-scanned around each axis in
    *rot_axes* (full circle by default, +-angle_range radians if given)
    and shifted to its correlation peak; groups are re-centered after
    each pass. Returns the aligned locs centered at the origin."""
    assert "group" in locs.columns, "average3 needs picked (grouped) locs"
    assert "z" in locs.columns, "average3 needs 3D locs"
    pixelsize = lib.get_from_metadata(info, "Pixelsize", 130)
    locs = _com_align3(locs)
    group_index = build_group_index(locs)

    r = 2 * np.sqrt(
        (
            locs["x"] ** 2
            + locs["y"] ** 2
            + (locs["z"] / pixelsize) ** 2
        ).mean()
    )
    t_min, t_max = -r, r
    a_step = np.arcsin(1 / (oversampling * r))
    if angle_range is None:
        angles = np.arange(0, 2 * np.pi, a_step)
    else:
        angles = np.arange(-angle_range, angle_range, a_step)

    done = 0
    total = iterations * len(rot_axes)
    for _ in range(iterations):
        for axis in rot_axes:
            locs = _align_rotation_axis(
                locs, group_index, axis, angles, oversampling,
                t_min, t_max, pixelsize,
            )
            # GLOBAL recentring only: per-group COM alignment here
            # would exactly cancel the translation each group just
            # received from its correlation peak
            locs = locs.copy()
            locs["x"] -= locs["x"].mean()
            locs["y"] -= locs["y"].mean()
            locs["z"] -= locs["z"].mean()
            done += 1
            if callable(progress_callback):
                progress_callback(done, total)
    return locs
