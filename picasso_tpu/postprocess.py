"""picasso_tpu.postprocess — the analysis toolbox.

Capability parity with picasso/postprocess.py: spatial block index
(:37), picks (:375), pick_similar (:597), distance histogram (:1002),
NeNA (:1058), FRC (:1320), pair correlation (:1505), local density
(:1582), dark times (:1920), linking (:2007), drift correction (RCC
:2903, fiducial :2964), channel alignment (:3296), group statistics
(:3580), FRET (:3652), nearest neighbors (:3704) and RESI (:3742).

Implementation stance: the reference's numba-loop + thread-pool
kernels become vectorized numpy / device programs — segment rendering
and RCC FFTs run batched on device, NeNA's next-frame pair search uses
a single 3D KDTree embedding of (x, y, frame), group aggregation uses
pandas groupby instead of per-group python loops.
"""

from __future__ import annotations

import itertools
import os
from collections import OrderedDict
from typing import Callable, Literal

import numpy as np
import pandas as pd
from scipy import interpolate
from scipy.optimize import curve_fit
from scipy.spatial import cKDTree as KDTree

from picasso_tpu import __version__, imageprocess, lib, masking, render


def _device_neighbors() -> bool:
    """Route pairwise-distance work to the blocked device kernels
    (ops.neighbors) or the host KDTree.

    ``PICASSO_TPU_NEIGHBORS`` = device|host forces a path; the default
    (auto) uses the device kernels on TPU — where brute-force distance
    tiles beat a pointer-chasing KDTree by orders of magnitude — and
    the KDTree on CPU backends, where it is the stronger algorithm.
    """
    from picasso_tpu.ops import neighbors as _nb

    return _nb.use_device()


# ---------------------------------------------------------------------------
# Spatial block index (picasso/postprocess.py:37-206)
# ---------------------------------------------------------------------------


def _index_blocks_shape(info: list[dict], size: float) -> tuple[int, int]:
    n_blocks_y = int(np.ceil(info[0]["Height"] / size))
    n_blocks_x = int(np.ceil(info[0]["Width"] / size))
    return n_blocks_y, n_blocks_x


def get_index_blocks(locs: pd.DataFrame, info: list[dict], size: float):
    """Bucket locs into a uint32 grid of (size x size) blocks; sorted
    by (y_index, x_index) so each block is one contiguous range.
    Returns (locs, size, x_index, y_index, block_starts, block_ends,
    K, L) like the reference (picasso/postprocess.py:37)."""
    locs = lib.ensure_sanity(locs, info)
    x_index = np.uint32(locs["x"].to_numpy() / size)
    y_index = np.uint32(locs["y"].to_numpy() / size)
    order = np.lexsort([x_index, y_index])
    locs = locs.iloc[order]
    x_index = x_index[order]
    y_index = y_index[order]
    K, L = _index_blocks_shape(info, size)
    block_starts = np.zeros((K, L), np.uint32)
    block_ends = np.zeros((K, L), np.uint32)
    if len(locs):
        flat = y_index.astype(np.int64) * L + x_index.astype(np.int64)
        change = np.nonzero(np.diff(flat))[0] + 1
        run_starts = np.concatenate([[0], change])
        run_ends = np.concatenate([change, [len(flat)]])
        ids = np.clip(flat[run_starts], 0, K * L - 1)
        block_starts.reshape(-1)[ids] = run_starts
        block_ends.reshape(-1)[ids] = run_ends
    return locs, size, x_index, y_index, block_starts, block_ends, K, L


def get_block_locs_at(x: float, y: float, index_blocks) -> np.ndarray:
    """Indices (into the index-sorted locs) of the 3x3 block
    neighborhood around (x, y)."""
    locs, size, _, _, block_starts, block_ends, K, L = index_blocks
    x_ = int(x / size)
    y_ = int(y / size)
    parts = []
    for k in range(max(0, y_ - 1), min(K, y_ + 2)):
        for ll in range(max(0, x_ - 1), min(L, x_ + 2)):
            s, e = int(block_starts[k, ll]), int(block_ends[k, ll])
            if e > s:
                parts.append(np.arange(s, e))
    if not parts:
        return np.empty(0, np.int64)
    return np.concatenate(parts)


# ---------------------------------------------------------------------------
# Picks (picasso/postprocess.py:375-596)
# ---------------------------------------------------------------------------


def picked_locs(
    locs: pd.DataFrame,
    info: list[dict],
    picks: list,
    pick_shape: Literal["Circle", "Rectangle", "Polygon", "Square"],
    pick_size: float | None = None,
    add_group: bool = True,
    index_blocks=None,
    callback=None,
) -> list[pd.DataFrame]:
    """Locs within each pick region, one DataFrame per pick
    (picasso/postprocess.py:375)."""
    _valid = ("Circle", "Rectangle", "Polygon", "Square")
    assert pick_shape in _valid, f"Invalid pick shape: {pick_shape}"
    if len(picks) == 0:
        return []
    out = []
    rep = lib.progress_reporter(callback, len(picks), "Picking locs")
    if pick_shape == "Circle":
        if index_blocks is None:
            index_blocks = get_index_blocks(locs, info, pick_size)
        ilocs = index_blocks[0]
        xs = ilocs["x"].to_numpy()
        ys = ilocs["y"].to_numpy()
        for i, (px, py) in enumerate(picks):
            block_idx = get_block_locs_at(px, py, index_blocks)
            bx = xs[block_idx]
            by = ys[block_idx]
            inside = (bx - px) ** 2 + (by - py) ** 2 < pick_size**2
            group_locs = ilocs.iloc[block_idx[inside]].copy()
            if add_group:
                group_locs["group"] = np.int32(i)
            group_locs.sort_values(by="frame", inplace=True)
            out.append(group_locs)
            rep.set_value(i + 1)
    elif pick_shape == "Rectangle":
        x = locs["x"].to_numpy()
        y = locs["y"].to_numpy()
        for i, pick in enumerate(picks):
            (xs_, ys_), (xe, ye) = pick
            X, Y = lib.get_pick_rectangle_corners(
                xs_, ys_, xe, ye, pick_size
            )
            inside = lib.check_if_in_rectangle(
                x, y, np.array(X), np.array(Y)
            )
            group_locs = locs.iloc[np.nonzero(inside)[0]].copy()
            # coordinates rotated into the pick frame (y along the
            # center axis) — consumed by pick profiles and saved with
            # picked locs (picasso/postprocess.py:281-288)
            angle = 0.5 * np.pi - np.arctan2(ye - ys_, xe - xs_)
            x_shifted = group_locs["x"] - xs_
            y_shifted = group_locs["y"] - ys_
            group_locs["x_pick_rot"] = (
                x_shifted * np.cos(angle)
                - y_shifted * np.sin(angle)
            )
            group_locs["y_pick_rot"] = (
                x_shifted * np.sin(angle)
                + y_shifted * np.cos(angle)
            )
            if add_group:
                group_locs["group"] = np.int32(i)
            group_locs.sort_values(by="frame", inplace=True)
            out.append(group_locs)
            rep.set_value(i + 1)
    elif pick_shape == "Polygon":
        x = locs["x"].to_numpy()
        y = locs["y"].to_numpy()
        for i, pick in enumerate(picks):
            # unclosed/in-progress polygons are skipped entirely — no
            # list entry, like the reference (postprocess.py:312-318)
            X, Y = lib.get_pick_polygon_corners(
                [tuple(p) for p in pick]
            )
            if X is None:
                rep.set_value(i + 1)
                continue
            inside = lib.check_if_in_polygon(
                x, y, np.asarray(X), np.asarray(Y)
            )
            group_locs = locs.iloc[np.nonzero(inside)[0]].copy()
            if add_group:
                group_locs["group"] = np.int32(i)
            group_locs.sort_values(by="frame", inplace=True)
            out.append(group_locs)
            rep.set_value(i + 1)
    else:  # Square
        x = locs["x"].to_numpy()
        y = locs["y"].to_numpy()
        half = pick_size / 2
        for i, (px, py) in enumerate(picks):
            inside = (
                (x > px - half) & (x < px + half)
                & (y > py - half) & (y < py + half)
            )
            group_locs = locs.iloc[np.nonzero(inside)[0]].copy()
            if add_group:
                group_locs["group"] = np.int32(i)
            group_locs.sort_values(by="frame", inplace=True)
            out.append(group_locs)
            rep.set_value(i + 1)
    rep.close()
    return out


def pick_similar(
    locs: pd.DataFrame,
    info: list[dict],
    picks: list,
    d: float,
    std_range: float = 2.0,
    index_blocks=None,
) -> list:
    """Find circular picks over the FOV whose loc count and RMSD match
    the given picks within std_range standard deviations
    (picasso/postprocess.py:597). Vectorized: hex grid of candidate
    centers, KDTree radius queries, center-of-mass refinement iterated
    to 1e-3 convergence (max 500 steps, like the reference)."""
    r = d / 2
    # duplicate suppression radius is the full DIAMETER
    # (picasso/postprocess.py:529 d2 = d**2)
    d2 = d**2
    x = locs["x"].to_numpy()
    y = locs["y"].to_numpy()
    tree = KDTree(np.column_stack([x, y]))

    # Reference statistics from the given picks
    n_locs_list, rmsd_list = [], []
    for px, py in picks:
        idx = tree.query_ball_point([px, py], r)
        n_locs_list.append(len(idx))
        if len(idx) > 1:
            dx = x[idx] - np.mean(x[idx])
            dy = y[idx] - np.mean(y[idx])
            rmsd_list.append(np.sqrt(np.mean(dx**2 + dy**2)))
        else:
            rmsd_list.append(0.0)
    mean_n = np.mean(n_locs_list)
    std_n = np.std(n_locs_list)
    mean_rmsd = np.mean(rmsd_list)
    std_rmsd = np.std(rmsd_list)
    min_n = mean_n - std_range * std_n
    max_n = mean_n + std_range * std_n
    min_rmsd = mean_rmsd - std_range * std_rmsd
    max_rmsd = mean_rmsd + std_range * std_rmsd

    # Hex grid of overlapping candidate picks over the FOV
    width = info[0]["Width"]
    height = info[0]["Height"]
    gx = np.arange(r, width, d * np.sqrt(3) / 2)
    out_x, out_y = [], []
    for i, cx in enumerate(gx):
        gy = np.arange(r + (i % 2) * r, height, d)
        for cy in gy:
            idx = tree.query_ball_point([cx, cy], r)
            if len(idx) < max(2, min_n):
                continue
            # walk to the local center-of-mass peak
            # (picasso/postprocess.py:700-723: iterate to 1e-3)
            comx, comy = np.mean(x[idx]), np.mean(y[idx])
            prev_x, prev_y = cx, cy
            count = 0
            while (
                abs(comx - prev_x) > 1e-3 or abs(comy - prev_y) > 1e-3
            ):
                count += 1
                if count > 500:
                    break
                prev_x, prev_y = comx, comy
                idx = tree.query_ball_point([comx, comy], r)
                if len(idx) <= 1:
                    break
                comx, comy = np.mean(x[idx]), np.mean(y[idx])
            idx = tree.query_ball_point([comx, comy], r)
            n = len(idx)
            if not (min_n <= n <= max_n) or n < 2:
                continue
            dx = x[idx] - np.mean(x[idx])
            dy = y[idx] - np.mean(y[idx])
            rmsd = np.sqrt(np.mean(dx**2 + dy**2))
            if not (min_rmsd <= rmsd <= max_rmsd):
                continue
            # skip duplicates closer than r to an accepted pick
            dup = False
            for ax, ay in zip(out_x, out_y):
                if (comx - ax) ** 2 + (comy - ay) ** 2 < d2:
                    dup = True
                    break
            if not dup:
                out_x.append(comx)
                out_y.append(comy)
    return list(zip(out_x, out_y))


def rmsd_at_com(locs_xy: np.ndarray) -> float:
    """RMSD of locs about their center of mass; locs_xy is (2, n)
    (picasso/postprocess.py:948)."""
    com_x = np.mean(locs_xy[0])
    com_y = np.mean(locs_xy[1])
    return float(
        np.sqrt(
            np.mean(
                (locs_xy[0] - com_x) ** 2 + (locs_xy[1] - com_y) ** 2
            )
        )
    )


def remove_locs_in_picks(
    locs: pd.DataFrame,
    info: list[dict],
    *,
    picks: list,
    pick_shape: Literal["Circle", "Rectangle", "Polygon", "Square"],
    pick_size: float | None = None,
    index_blocks=None,
) -> pd.DataFrame:
    """Drop all locs inside the pick regions
    (picasso/postprocess.py:739)."""
    assert pick_shape in ("Circle", "Rectangle", "Polygon", "Square")
    if pick_shape != "Polygon":
        assert isinstance(pick_size, (int, float))
    if pick_shape == "Circle":
        pick_size = pick_size / 2
    else:
        index_blocks = None
    all_picked = picked_locs(
        locs=locs, info=info, picks=picks, pick_shape=pick_shape,
        pick_size=pick_size, add_group=False,
        index_blocks=index_blocks,
    )
    idx = np.concatenate(
        [p.index.to_numpy() for p in all_picked]
    ) if all_picked else np.array([], int)
    return locs.drop(index=np.unique(idx))


def combine_locs_in_picks(
    locs: pd.DataFrame,
    info: list[dict],
    *,
    picks: list,
    pick_shape: Literal["Circle", "Rectangle", "Polygon", "Square"],
    pick_size: float | None = None,
    index_blocks=None,
    progress_callback=None,
) -> pd.DataFrame:
    """Combine all locs within each pick into one localization
    (weighted means, summed photons; picasso/postprocess.py:2076)."""
    assert pick_shape in ("Circle", "Rectangle", "Polygon", "Square")
    if pick_shape in ("Circle", "Rectangle", "Square"):
        assert pick_size is not None
    size = pick_size / 2 if pick_shape == "Circle" else pick_size
    all_picked = picked_locs(
        locs=locs, info=info, picks=picks, pick_shape=pick_shape,
        pick_size=size, add_group=True,
        index_blocks=index_blocks, callback=progress_callback,
    )
    combined = []
    for p in all_picked:
        if not len(p):
            continue
        # link everything in the pick into one event
        linked = link(
            p, info, r_max=1e9, max_dark_time=10**9,
            remove_ambiguous_lengths=False,
        )
        linked["group"] = p["group"].iloc[0]
        combined.append(linked)
    if not combined:
        return locs.iloc[:0].copy()
    return pd.concat(combined, ignore_index=True)


def evaluate_picks(
    picked_locs_list: list[pd.DataFrame],
    info: list[dict],
    *,
    max_dark_time: int = 3,
    progress_callback=None,
):
    """Per-pick statistics: loc counts, binding events, RMSD(z),
    bright/dark kinetics (picasso/postprocess.py:1634)."""
    import warnings as _warnings

    pixelsize = lib.get_from_metadata(info, "Pixelsize", default=1.0)
    n_picks = len(picked_locs_list)
    N = np.full(n_picks, np.nan)
    n_events = np.full(n_picks, np.nan)
    rmsd = np.full(n_picks, np.nan)
    rmsd_z = np.full(n_picks, np.nan)
    length = np.full(n_picks, np.nan)
    dark = np.full(n_picks, np.nan)
    has_z = (
        len(picked_locs_list)
        and "z" in picked_locs_list[0].columns
    )
    new_locs = []
    rep = lib.progress_reporter(
        progress_callback, n_picks, "Evaluating picks"
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", category=RuntimeWarning)
        for i, pick_locs in enumerate(picked_locs_list):
            rep.set_value(i + 1)
            if not len(pick_locs):
                continue
            N[i] = len(pick_locs)
            rmsd[i] = rmsd_at_com(
                np.stack(
                    [
                        pick_locs["x"].to_numpy(),
                        pick_locs["y"].to_numpy(),
                    ]
                )
            ) * pixelsize
            if has_z:
                z = pick_locs["z"].to_numpy()
                rmsd_z[i] = np.sqrt(np.mean((z - z.mean()) ** 2))
            if "len" not in pick_locs.columns:
                pick_locs = link(
                    pick_locs, info, r_max=999999,
                    max_dark_time=max_dark_time,
                )
            pick_locs = compute_dark_times(pick_locs)
            if not len(pick_locs):
                continue
            n_events[i] = len(pick_locs)
            length[i] = lib.estimate_kinetic_rate(
                pick_locs["len"].to_numpy()
            )
            dark[i] = lib.estimate_kinetic_rate(
                pick_locs["dark"].to_numpy()
            )
            new_locs.append(pick_locs)
    rep.close()
    new_locs = (
        pd.concat(new_locs, ignore_index=True)
        if new_locs
        else pd.DataFrame()
    )
    return N, n_events, rmsd, rmsd_z, length, dark, new_locs


def pick_kinetics(
    picked_locs_list: list[pd.DataFrame],
    info: list[dict],
    *,
    max_dark_time: int = 3,
    progress_callback=None,
):
    """Binding kinetics per pick (picasso/postprocess.py:1778).
    Returns (length, dark, no_locs, out_locs)."""
    out_locs, dark, length, no_locs = [], [], [], []
    rep = lib.progress_reporter(
        progress_callback, len(picked_locs_list),
        "Calculating kinetics",
    )
    for i, pick_locs in enumerate(picked_locs_list):
        rep.set_value(i + 1)
        if not len(pick_locs):
            continue
        if "len" not in pick_locs.columns:
            pick_locs = link(
                pick_locs, info, r_max=999999,
                max_dark_time=max_dark_time,
            )
        if not len(pick_locs):
            continue
        pick_locs = compute_dark_times(pick_locs)
        if not len(pick_locs):
            continue
        try:
            l_ = lib.estimate_kinetic_rate(
                pick_locs["len"].to_numpy()
            )
            d_ = lib.estimate_kinetic_rate(
                pick_locs["dark"].to_numpy()
            )
        except RuntimeError:
            continue
        length.append(l_)
        dark.append(d_)
        no_locs.append(len(pick_locs))
        out_locs.append(pick_locs)
    rep.close()
    out_locs = (
        pd.concat(out_locs, ignore_index=True)
        if out_locs
        else pd.DataFrame()
    )
    return (
        np.array(length), np.array(dark), np.array(no_locs), out_locs,
    )


def pick_properties(
    picked_locs_list: list[pd.DataFrame],
    info: list[dict],
    *,
    max_dark_time: int = 3,
    influx_rate: float = 0.03,
    pick_areas=None,
    kinetics_progress=None,
    groupprops_progress=None,
) -> pd.DataFrame:
    """Per-pick statistics incl. qPAINT binding-site estimates
    (picasso/postprocess.py:1855)."""
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        length, dark, no_locs, out_locs = pick_kinetics(
            picked_locs_list, info, max_dark_time=max_dark_time,
            progress_callback=kinetics_progress,
        )
        props = groupprops(out_locs, callback=groupprops_progress)
        if pick_areas is not None:
            props["pick_area_um2"] = pick_areas
    props["n_units"] = 1 / (influx_rate * dark)
    props["locs"] = no_locs
    props["length_cdf"] = length
    props["dark_cdf"] = dark
    props["qpaint_idx_cdf"] = dark**-1.0
    return props


# ---------------------------------------------------------------------------
# Distance histogram / pair correlation / local density
# (picasso/postprocess.py:961-1680)
# ---------------------------------------------------------------------------


def distance_histogram(
    locs: pd.DataFrame,
    info: list[dict],
    bin_size: float,
    r_max: float,
) -> np.ndarray:
    """Histogram of pairwise distances below r_max, each pair counted
    once (picasso/postprocess.py:1002).

    Intentional divergence: the reference's block scan only visits the
    2x2 forward window (postprocess.py:984-989) and structurally misses
    pairs whose blocks are diagonal down-left of each other, so it
    undercounts; this implementation counts ALL pairs, making results
    here >= the reference's on real data (quantified in
    tests/test_neighbors.py::test_divergence_vs_reference_block_scan).
    On TPU the pairs are streamed through the blocked device kernel
    (ops.neighbors.pairwise_distance_histogram); on CPU a KDTree
    count_neighbors sweep computes the same histogram."""
    locs = lib.ensure_sanity(locs, info)
    pts = np.column_stack(
        [locs["x"].to_numpy(), locs["y"].to_numpy()]
    )
    n_bins = int(np.uint32(r_max / bin_size))
    if _device_neighbors():
        from picasso_tpu.ops import neighbors as _nb

        dh = _nb.pairwise_distance_histogram(pts, bin_size, n_bins)
        return dh.astype(np.uint32)
    tree = KDTree(pts)
    edges = np.linspace(0, n_bins * bin_size, n_bins + 1)
    # Reference bins are left-closed [k*bs, (k+1)*bs)
    # (postprocess.py:996); count_neighbors uses d <= r, so query just
    # below each edge.
    edges_open = np.nextafter(edges, -np.inf)
    counts = tree.count_neighbors(tree, edges_open)
    # remove self-pairs (only counted where the query radius >= 0) and
    # halve ordered pairs
    pair_counts = np.where(
        edges_open >= 0, (counts - len(pts)) // 2, 0
    )
    dh = np.diff(pair_counts)
    return dh.astype(np.uint32)


def pair_correlation(
    locs: pd.DataFrame,
    info: list[dict],
    bin_size: float,
    r_max: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Ring-area-normalized pair correlation
    (picasso/postprocess.py:1505)."""
    dh = distance_histogram(locs, info, bin_size, r_max)
    bins_lower = np.arange(bin_size, r_max + bin_size, bin_size)
    if len(bins_lower) > len(dh):
        bins_lower = bins_lower[: len(dh)]
    area = np.pi * bin_size * (2 * bins_lower + bin_size)
    return bins_lower, dh / area


def compute_local_density(
    locs: pd.DataFrame,
    info: list[dict],
    radius: float,
) -> pd.DataFrame:
    """Per-loc neighbor counts within radius
    (picasso/postprocess.py:1582)."""
    locs = lib.ensure_sanity(locs, info)
    pts = np.column_stack(
        [locs["x"].to_numpy(), locs["y"].to_numpy()]
    )
    if _device_neighbors():
        from picasso_tpu.ops import neighbors as _nb

        counts = _nb.radius_count(
            pts, pts, radius, exclude_self=True
        )
    else:
        tree = KDTree(pts)
        counts = tree.query_ball_point(
            pts, radius, return_length=True
        ) - 1  # exclude self
    locs = locs.copy()
    locs["density"] = counts.astype(np.uint32)
    return locs


# ---------------------------------------------------------------------------
# NeNA (picasso/postprocess.py:1058-1272)
# ---------------------------------------------------------------------------


def _next_frame_neighbor_distance_histogram(
    locs: pd.DataFrame, callback=None
) -> tuple[np.ndarray, np.ndarray]:
    """Histogram of distances between locs in consecutive frames (same
    group). One 3D KDTree with the frame embedded as a scaled third
    coordinate finds all next-frame pairs at once
    (replaces the per-loc scan of picasso/postprocess.py:1179-1272)."""
    locs = locs.sort_values(kind="quicksort", by="frame")
    frame = locs["frame"].to_numpy().astype(np.int64)
    x = locs["x"].to_numpy()
    y = locs["y"].to_numpy()
    if "group" in locs.columns:
        group = locs["group"].to_numpy().astype(np.int64)
    else:
        group = np.zeros(len(locs), np.int64)
    bin_size = 0.001
    d_max = 1.0
    bins = np.arange(0, d_max, bin_size)
    dnfl = np.zeros(len(bins))
    if len(locs):
        D = 8.0 * d_max  # frame-axis spacing >> spatial extent
        key = frame + group * (frame.max() + 10)
        pts = np.column_stack([x, y, key * D])
        tree = KDTree(pts)
        pairs = tree.query_pairs(
            np.sqrt(D**2 + d_max**2), output_type="ndarray"
        )
        if len(pairs):
            ki = key[pairs[:, 0]]
            kj = key[pairs[:, 1]]
            sel = np.abs(ki - kj) == 1
            pairs = pairs[sel]
            dx = x[pairs[:, 0]] - x[pairs[:, 1]]
            dy = y[pairs[:, 0]] - y[pairs[:, 1]]
            ok = (dx**2 <= d_max**2) & (dy**2 <= d_max**2)
            d = np.sqrt(dx[ok] ** 2 + dy[ok] ** 2)
            d = d[d <= d_max]
            idx = (d / bin_size).astype(int)
            idx = idx[idx < len(bins)]
            dnfl += np.bincount(idx, minlength=len(bins))
    if callback is not None:
        callback(100)
    return bins + bin_size / 2, dnfl


def nena(
    locs: pd.DataFrame,
    info=None,
    callback=None,
) -> tuple[dict, float]:
    """NeNA experimental localization precision (Endesfelder et al.,
    Histochem. Cell Biol. 2014; picasso/postprocess.py:1058)."""
    bin_centers, dnfl = _next_frame_neighbor_distance_histogram(
        locs, callback
    )

    def func(d, delta_a, s, ac, dc, sc):
        a = ac + delta_a
        p_single = a * (d / (2 * s**2)) * np.exp(-(d**2) / (4 * s**2))
        p_short = (
            ac / (sc * np.sqrt(2 * np.pi))
            * np.exp(-0.5 * ((d - dc) / sc) ** 2)
        )
        return p_single + p_short

    area = np.trapezoid(dnfl, bin_centers)
    median_lp = np.mean(
        [np.median(locs["lpx"]), np.median(locs["lpy"])]
    )
    p0 = [0.8 * area, median_lp, 0.1 * area, 2 * median_lp, median_lp]
    bounds = ([0, 0, 0, 0, 0], [np.inf] * 5)
    popt, _ = curve_fit(func, bin_centers, dnfl, p0=p0, bounds=bounds)
    result = {
        "d": bin_centers,
        "data": dnfl,
        "best_fit": func(bin_centers, *popt),
        "best_values": {
            "delta_a": popt[0],
            "s": popt[1],
            "ac": popt[2],
            "dc": popt[3],
            "sc": popt[4],
        },
    }
    return result, popt[1]


# ---------------------------------------------------------------------------
# FRC (picasso/postprocess.py:1320-1504)
# ---------------------------------------------------------------------------


def frc(
    locs: pd.DataFrame,
    info: list[dict],
    viewport,
    *,
    random_seed: int = 42,
) -> dict:
    """Fourier Ring Correlation resolution (Nieuwenhuizen et al., Nat.
    Methods 2013; picasso/postprocess.py:1320)."""
    pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    lp = nena(locs, info)[1]
    vw = viewport[1][1] - viewport[0][1]
    vh = viewport[1][0] - viewport[0][0]
    if vw < vh:
        yc = 0.5 * (viewport[0][0] + viewport[1][0])
        viewport = (
            (yc - vw / 2, viewport[0][1]),
            (yc + vw / 2, viewport[1][1]),
        )
    elif vh < vw:
        xc = 0.5 * (viewport[0][1] + viewport[1][1])
        viewport = (
            (viewport[0][0], xc - vh / 2),
            (viewport[1][0], xc + vh / 2),
        )
    (y_min, x_min), (y_max, x_max) = viewport
    in_view = (
        (locs["x"] > x_min) & (locs["y"] > y_min)
        & (locs["x"] < x_max) & (locs["y"] < y_max)
    )
    locs = locs.loc[in_view]
    np.random.seed(random_seed)
    r_idx = np.random.permutation(len(locs))
    locs1 = locs.iloc[r_idx[: len(r_idx) // 2]]
    locs2 = locs.iloc[r_idx[len(r_idx) // 2:]]
    curve, smooth, freqs, res, images = _frc(
        locs1, locs2, pixelsize, lp, viewport
    )
    return {
        "frc_curve": curve,
        "frc_curve_smooth": smooth,
        "frequencies": freqs,
        "resolution": res,
        "images": images,
    }


def _frc(locs1, locs2, pixelsize, lp, viewport):
    binsize = lp / 2
    oversampling = 1 / binsize
    dummy_info = [{"Pixelsize": pixelsize}]
    im1 = render.render(
        locs1, dummy_info, oversampling, viewport, None
    )[1]
    im2 = render.render(
        locs2, dummy_info, oversampling, viewport, None
    )[1]
    if im1.shape[0] % 2 == 0:
        im1 = im1[:-1, :-1]
        im2 = im2[:-1, :-1]
    mask = masking.threshold_tukey(im1)
    im1 = im1 * mask
    im2 = im2 * mask
    f1 = np.fft.fftshift(np.fft.fft2(im1))
    f2 = np.fft.fftshift(np.fft.fft2(im2))
    # FRC(q) = Re Σ_ring F1·F2* / sqrt(Σ_ring |F1|² · Σ_ring |F2|²).
    # radial_sum is linear, so the real part can be taken per-pixel
    # before ring-summing; |F|² expands to re²+im² (exact, no abs).
    cross = imageprocess.radial_sum(
        f1.real * f2.real + f1.imag * f2.imag
    )
    power1 = imageprocess.radial_sum(f1.real**2 + f1.imag**2)
    power2 = imageprocess.radial_sum(f2.real**2 + f2.imag**2)
    with np.errstate(divide="ignore", invalid="ignore"):
        frc_curve = np.nan_to_num(
            cross / np.sqrt(power1 * power2),
            nan=0.0, posinf=0.0, neginf=0.0,
        )
    sspan = max(int(np.ceil(int(im1.shape[0] / 2) / 20)), 5)
    frc_smooth = masking.loess_smooth(frc_curve, sspan)
    freqs = (
        np.arange(len(frc_curve)) / im1.shape[0] / (pixelsize * binsize)
    )
    threshold = 1 / 7
    resolution = None
    for i in range(1, len(frc_smooth)):
        if frc_smooth[i - 1] >= threshold and frc_smooth[i] < threshold:
            f1_, f2_ = freqs[i - 1], freqs[i]
            r1, r2 = frc_smooth[i - 1], frc_smooth[i]
            f_res = f1_ + (threshold - r1) * (f2_ - f1_) / (r2 - r1)
            resolution = 1 / f_res
            break
    return frc_curve, frc_smooth, freqs, resolution, (im1, im2)


# ---------------------------------------------------------------------------
# Dark times (picasso/postprocess.py:1920-2006)
# ---------------------------------------------------------------------------


def dark_times(
    locs: pd.DataFrame, group: np.ndarray | None = None
) -> np.ndarray:
    """Dark time before each binding event: frame_i minus the latest
    earlier last-frame in the same group; -1 if none
    (picasso/postprocess.py:1952). Vectorized with per-group sorted
    searches instead of the O(N^2) scan."""
    frame = locs["frame"].to_numpy().astype(np.int64)
    lens = locs["len"].to_numpy().astype(np.int64)
    last_frame = frame + lens - 1
    if group is None:
        if "group" in locs.columns:
            group = locs["group"].to_numpy()
        else:
            group = np.zeros(len(locs), np.int64)
    group = np.asarray(group)
    dark = np.full(len(frame), -1, np.int64)
    for g in np.unique(group):
        sel = np.nonzero(group == g)[0]
        lf_sorted = np.sort(last_frame[sel])
        # index of the largest last_frame strictly below frame_i
        pos = np.searchsorted(lf_sorted, frame[sel], side="left") - 1
        has_prev = pos >= 0
        d = np.where(
            has_prev, frame[sel] - lf_sorted[np.maximum(pos, 0)], -1
        )
        dark[sel] = d
    return dark.astype(np.int32)


def compute_dark_times(
    locs: pd.DataFrame, group=None
) -> pd.DataFrame:
    """Add the 'dark' column and drop events without a predecessor
    (picasso/postprocess.py:1920)."""
    if "len" not in locs.columns:
        raise AttributeError(
            "Length not found. Please link localizations first."
        )
    locs = locs.copy()
    locs["dark"] = np.int32(dark_times(locs, group))
    return locs[locs["dark"] != -1]


# ---------------------------------------------------------------------------
# Linking (picasso/postprocess.py:2007-2680)
# ---------------------------------------------------------------------------


def _get_link_groups(
    frame, x, y, d_max, max_dark_time, group
) -> np.ndarray:
    """Greedy spatiotemporal chaining (picasso/postprocess.py:2441):
    process locs in frame order; each unassigned loc starts a chain and
    repeatedly claims the first unassigned loc within d_max in frames
    (f+1 .. f+max_dark_time+1] of the same group."""
    N = len(x)
    link_group = -np.ones(N, np.int32)
    # Precompute frame window boundaries once
    frame = np.asarray(frame, np.int64)
    min_idx = np.searchsorted(frame, frame + 1, side="left")
    d_max_2 = d_max**2
    current = -1
    for i in range(N):
        if link_group[i] != -1:
            continue
        current += 1
        link_group[i] = current
        ci = i
        while True:
            f = frame[ci]
            lo = min_idx[ci]
            hi = np.searchsorted(
                frame, f + max_dark_time + 1, side="right"
            )
            nxt = -1
            for j in range(lo, hi):
                if (
                    link_group[j] == -1
                    and group[j] == group[ci]
                ):
                    dx2 = (x[ci] - x[j]) ** 2
                    if dx2 <= d_max_2:
                        dy2 = (y[ci] - y[j]) ** 2
                        if dy2 <= d_max_2 and dx2 + dy2 <= d_max_2:
                            nxt = j
                            break
            if nxt == -1:
                break
            link_group[nxt] = current
            ci = nxt
    return link_group


def link(
    locs: pd.DataFrame,
    info: list[dict],
    r_max: float = 0.05,
    max_dark_time: int = 3,
    combine_mode: Literal["average", "refit"] = "average",
    remove_ambiguous_lengths: bool = True,
) -> pd.DataFrame:
    """Group locs into binding events by spatiotemporal proximity
    (picasso/postprocess.py:2007)."""
    if len(locs) == 0:
        linked = locs.copy()
        if "frame" in locs.columns:
            linked["len"] = np.array([], np.int32)
            linked["n"] = np.array([], np.int32)
        if "photons" in locs.columns:
            linked["photon_rate"] = np.array([], np.float32)
        return linked
    locs = locs.sort_values(kind="quicksort", by="frame")
    group = (
        locs["group"].to_numpy()
        if "group" in locs.columns
        else np.zeros(len(locs), np.int32)
    )
    from picasso_tpu import native

    if native.AVAILABLE:
        link_group = native.link_groups(
            locs["frame"].to_numpy(),
            locs["x"].to_numpy(),
            locs["y"].to_numpy(),
            np.ascontiguousarray(group, np.int32),
            r_max,
            max_dark_time,
        )
    else:
        link_group = _get_link_groups(
            locs["frame"].to_numpy(),
            locs["x"].to_numpy(),
            locs["y"].to_numpy(),
            r_max,
            max_dark_time,
            group,
        )
    if combine_mode != "average":
        raise NotImplementedError(
            "Refit mode is not implemented yet. Please use 'average'."
        )
    return _link_loc_groups(
        locs, info, link_group, remove_ambiguous_lengths
    )


def _segsum(col, link_group, n_groups):
    return np.bincount(
        link_group, weights=col, minlength=n_groups
    )


def _link_loc_groups(
    locs: pd.DataFrame,
    info: list[dict],
    link_group: np.ndarray,
    remove_ambiguous_lengths: bool = True,
) -> pd.DataFrame:
    """Aggregate linked locs into binding events — weighted means for
    positions, sums for photons/bg, means elsewhere
    (picasso/postprocess.py:2680-2820). Vectorized with bincount
    segment sums."""
    n_groups = int(link_group.max()) + 1
    n_ = np.bincount(link_group, minlength=n_groups)
    cols = OrderedDict()

    def seg_mean(col):
        return (
            _segsum(col, link_group, n_groups) / n_
        ).astype(np.float32)

    frame_arr = locs["frame"].to_numpy().astype(np.int64)
    first_frame = np.full(n_groups, frame_arr.max(), np.int64)
    np.minimum.at(first_frame, link_group, frame_arr)
    last_frame = np.full(n_groups, frame_arr.min(), np.int64)
    np.maximum.at(last_frame, link_group, frame_arr)
    cols["frame"] = first_frame
    if "x" in locs.columns:
        wx = 1 / locs["lpx"].to_numpy() ** 2
        swx = _segsum(wx, link_group, n_groups)
        cols["x"] = (
            _segsum(locs["x"].to_numpy() * wx, link_group, n_groups)
            / swx
        ).astype(np.float32)
    if "y" in locs.columns:
        wy = 1 / locs["lpy"].to_numpy() ** 2
        swy = _segsum(wy, link_group, n_groups)
        cols["y"] = (
            _segsum(locs["y"].to_numpy() * wy, link_group, n_groups)
            / swy
        ).astype(np.float32)
    if "photons" in locs.columns:
        cols["photons"] = _segsum(
            locs["photons"].to_numpy(), link_group, n_groups
        ).astype(np.float32)
    for name in ("sx", "sy"):
        if name in locs.columns:
            cols[name] = seg_mean(locs[name].to_numpy())
    if "bg" in locs.columns:
        cols["bg"] = _segsum(
            locs["bg"].to_numpy(), link_group, n_groups
        ).astype(np.float32)
    if "x" in locs.columns:
        cols["lpx"] = np.sqrt(1 / swx).astype(np.float32)
    if "y" in locs.columns:
        cols["lpy"] = np.sqrt(1 / swy).astype(np.float32)
    for name in ("ellipticity", "net_gradient", "likelihood",
                 "log_likelihood", "iterations"):
        if name in locs.columns:
            cols[name] = seg_mean(locs[name].to_numpy())
    if "z" in locs.columns:
        if "lpz" in locs.columns:
            wz = 1 / locs["lpz"].to_numpy() ** 2
            swz = _segsum(wz, link_group, n_groups)
            cols["z"] = (
                _segsum(
                    locs["z"].to_numpy() * wz, link_group, n_groups
                )
                / swz
            ).astype(np.float32)
            cols["lpz"] = np.sqrt(1 / swz).astype(np.float32)
        else:
            cols["z"] = seg_mean(locs["z"].to_numpy())
    if "d_zcalib" in locs.columns:
        cols["d_zcalib"] = seg_mean(locs["d_zcalib"].to_numpy())
    if "group" in locs.columns:
        grp = np.zeros(n_groups, locs["group"].dtype)
        grp[link_group] = locs["group"].to_numpy()  # last wins
        cols["group"] = grp
    cols["len"] = (last_frame - first_frame + 1).astype(np.int64)
    cols["n"] = n_
    if "photons" in locs.columns:
        cols["photon_rate"] = np.float32(cols["photons"] / n_)
    linked = pd.DataFrame(cols)
    if remove_ambiguous_lengths:
        valid = (first_frame > 0) & (last_frame < info[0]["Frames"])
        linked = linked[valid]
    return linked


def cluster_combine(locs: pd.DataFrame) -> pd.DataFrame:
    """Per-(group, cluster) combined properties — photon-weighted COM,
    SEM spreads (picasso/postprocess.py:2174). Vectorized with pandas
    groupby."""
    has_z = "z" in locs.columns
    keys = ["group", "cluster"]
    g = locs.groupby(keys, sort=True)
    w = locs["photons"]
    agg = pd.DataFrame(
        {
            "mean_frame": g["frame"].mean(),
            "std_frame": g["frame"].std(),
            "n": g.size(),
        }
    )
    for coord in ["x", "y"] + (["z"] if has_z else []):
        wsum = (locs[coord] * w).groupby(
            [locs[k] for k in keys]
        ).sum()
        agg[coord] = wsum / g["photons"].sum()
        agg["lp" + coord[-1]] = g[coord].std() / np.sqrt(agg["n"])
    agg = agg.reset_index()
    out = pd.DataFrame(
        {
            "group": agg["group"],
            "cluster": agg["cluster"],
            "mean_frame": agg["mean_frame"].astype(np.float32),
            "x": agg["x"].astype(np.float32),
            "y": agg["y"].astype(np.float32),
        }
    )
    if has_z:
        out["z"] = agg["z"].astype(np.float32)
    out["std_frame"] = agg["std_frame"].astype(np.float32)
    out["lpx"] = agg["lpx"].astype(np.float32)
    out["lpy"] = agg["lpy"].astype(np.float32)
    if has_z:
        out["lpz"] = agg["lpz"].astype(np.float32)
    out["n"] = agg["n"].astype(np.int32)
    return out


def cluster_combine_dist(
    locs: pd.DataFrame, pixelsize: float | None = None
) -> pd.DataFrame:
    """Nearest-neighbor cluster distances within each group, appended
    to ALREADY-COMBINED cluster locs (the `cluster_combine` output
    with mean_frame/lp*/n columns — picasso/postprocess.py:2291 reads
    those columns directly). 2D adds ``min_dist``; 3D scales z by the
    pixel size (130 nm default) and adds both ``min_dist`` (xyz) and
    ``mind_dist_xy`` (the reference's column name, typo included).
    Groups with a single cluster get inf (the reference errors on
    them; documented divergence)."""
    combined = locs.copy()
    has_z = "z" in combined.columns
    min_dist = np.full(len(combined), np.inf, np.float32)
    min_dist_xy = np.full(len(combined), np.inf, np.float32)
    if has_z:
        pixelsize = 130 if pixelsize is None else pixelsize
    groups = combined["group"].to_numpy()
    x = combined["x"].to_numpy()
    y = combined["y"].to_numpy()
    z = (
        combined["z"].to_numpy() / pixelsize if has_z else None
    )
    for g in np.unique(groups):
        sel = np.nonzero(groups == g)[0]
        if len(sel) < 2:
            continue
        pts_xy = np.stack([x[sel], y[sel]], axis=1)
        tree_xy = KDTree(pts_xy)
        d_xy, _ = tree_xy.query(pts_xy, k=2)
        if has_z:
            pts = np.stack([x[sel], y[sel], z[sel]], axis=1)
            tree = KDTree(pts)
            d, _ = tree.query(pts, k=2)
            min_dist[sel] = d[:, 1]
            min_dist_xy[sel] = d_xy[:, 1]
        else:
            min_dist[sel] = d_xy[:, 1]
    combined["min_dist"] = min_dist
    if has_z:
        combined["mind_dist_xy"] = min_dist_xy
    return combined


# ---------------------------------------------------------------------------
# Temporal segmentation + drift correction
# (picasso/postprocess.py:2846-3295)
# ---------------------------------------------------------------------------


def n_segments(info: list[dict], segmentation: int) -> int:
    n_frames = lib.get_from_metadata(info, "Frames")
    n_seg = int(np.round(n_frames / segmentation))
    if n_seg < 2:
        raise ValueError(
            f"Segmentation {segmentation} gives {n_seg} segment(s) for"
            f" {n_frames} frames; drift correction needs at least 2."
            " Choose a smaller segmentation."
        )
    return n_seg


def segment(
    locs: pd.DataFrame,
    info: list[dict],
    segmentation: int,
    kwargs: dict = {},
    callback=None,
):
    """Split locs into temporal segments and render each
    (picasso/postprocess.py:2846)."""
    Y = info[0]["Height"]
    X = info[0]["Width"]
    n_frames = info[0]["Frames"]
    n_seg = n_segments(info, segmentation)
    bounds = np.linspace(0, n_frames - 1, n_seg + 1, dtype=np.uint32)
    segments = np.zeros((n_seg, Y, X))
    rep = lib.progress_reporter(
        callback if callback is not None else "console",
        n_seg,
        "Generating segments",
    )
    frames = locs["frame"].to_numpy()
    for i in range(n_seg):
        seg_locs = locs[
            (frames >= bounds[i]) & (frames < bounds[i + 1])
        ]
        _, segments[i] = render.render(seg_locs, info, **kwargs)
        rep.set_value(i + 1)
        if callable(callback):
            callback(i + 1)
    rep.close()
    return bounds, segments


def undrift(
    locs: pd.DataFrame,
    info: list[dict],
    segmentation: int,
    display: bool = True,
    segmentation_callback=None,
    rcc_callback=None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """RCC drift correction (Wang, Schnitzbauer et al., Opt. Express
    2014; picasso/postprocess.py:2903): segment -> batched pairwise
    FFT correlation -> least-squares shifts -> cubic-spline per-frame
    drift."""
    locs = locs.copy()
    bounds, segments = segment(
        locs,
        info,
        segmentation,
        {"blur_method": "gaussian", "min_blur_width": 1},
        segmentation_callback
        if segmentation_callback is not None
        else lib.MockProgress().set_value,
    )
    shift_y, shift_x = imageprocess.rcc(
        segments, 32, rcc_callback
        if rcc_callback is not None
        else lib.MockProgress().set_value,
    )
    t = (bounds[1:] + bounds[:-1]) / 2
    drift_x_pol = interpolate.InterpolatedUnivariateSpline(
        t, shift_x, k=min(3, len(t) - 1)
    )
    drift_y_pol = interpolate.InterpolatedUnivariateSpline(
        t, shift_y, k=min(3, len(t) - 1)
    )
    t_inter = np.arange(info[0]["Frames"])
    drift = pd.DataFrame(
        {"x": drift_x_pol(t_inter), "y": drift_y_pol(t_inter)}
    )
    locs = apply_drift(locs, info, drift=drift)
    return drift, locs


def undrift_from_picked(
    picked_locs: list[pd.DataFrame], info: list[dict]
) -> pd.DataFrame:
    """Drift from per-pick center-of-mass traces, MSD-weighted across
    picks (picasso/postprocess.py:3062)."""
    drift_x = _undrift_from_picked_coordinate(picked_locs, info, "x")
    drift_y = _undrift_from_picked_coordinate(picked_locs, info, "y")
    drift = pd.DataFrame({"x": drift_x, "y": drift_y})
    if all("z" in p.columns for p in picked_locs):
        drift["z"] = _undrift_from_picked_coordinate(
            picked_locs, info, "z"
        )
    return drift


def _undrift_from_picked_coordinate(
    picked_locs, info, coordinate
) -> np.ndarray:
    n_picks = len(picked_locs)
    n_frames = info[0]["Frames"]
    drift = np.full((n_picks, n_frames), np.nan)
    for i, locs in enumerate(picked_locs):
        coords = locs[coordinate].to_numpy()
        drift[i, locs["frame"].to_numpy()] = coords - np.mean(coords)
    # frames with no contributing pick stay NaN here and are filled by
    # the interpolation below; guard the all-NaN columns explicitly so
    # the passing path emits no RuntimeWarning
    has_any = ~np.all(np.isnan(drift), axis=0)
    drift_mean = np.full(n_frames, np.nan)
    if has_any.any():
        drift_mean[has_any] = np.nanmean(drift[:, has_any], 0)
    sd = (drift - drift_mean) ** 2
    pick_has_any = ~np.all(np.isnan(sd), axis=1)
    msd = np.full(n_picks, np.nan)
    if pick_has_any.any():
        msd[pick_has_any] = np.nanmean(sd[pick_has_any], 1)
    msd = np.where(np.isnan(msd), np.inf, msd)
    # a pick that tracks the mean drift exactly (e.g. a single pick)
    # has msd 0; floor it so the 1/msd weights stay finite
    msd = np.maximum(msd, 1e-12)
    nan_mask = np.isnan(drift)
    drift_ma = np.ma.MaskedArray(drift, mask=nan_mask)
    drift_mean = np.ma.average(drift_ma, axis=0, weights=1 / msd)
    drift_mean = drift_mean.filled(np.nan)
    nans = np.isnan(drift_mean)
    if nans.any() and not nans.all():
        idx = np.arange(n_frames)
        drift_mean[nans] = np.interp(
            idx[nans], idx[~nans], drift_mean[~nans]
        )
    return drift_mean


def undrift_from_fiducials(
    locs: pd.DataFrame,
    info: list[dict],
    picks: list | None = None,
    pick_size: float | None = None,
    undrift_z: bool = True,
    index_blocks=None,
) -> tuple[pd.DataFrame, list[dict], pd.DataFrame]:
    """Undrift from fiducial markers, auto-detected if no picks are
    given (picasso/postprocess.py:2964)."""
    locs = locs.copy()
    pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    auto_detect = picks is None
    if auto_detect:
        picks, box = imageprocess.find_fiducials(locs, info)
        pick_radius = box / 2
        # any caller-supplied spatial index was built for a different
        # radius than the auto-detected one — rebuild inside picked_locs
        index_blocks = None
    elif pick_size is None:
        raise ValueError(
            "explicit pick coordinates need a pick_size "
            "(the pick radius, in camera pixels)"
        )
    else:
        pick_radius = pick_size
    if not len(picks):
        raise ValueError(
            "no fiducial picks available — cannot estimate drift"
        )
    pl = picked_locs(
        locs, info, picks, "Circle", pick_size=pick_radius,
        add_group=False, index_blocks=index_blocks,
    )
    drift = undrift_from_picked(pl, info)
    if not undrift_z:
        drift = drift.drop(columns="z", errors="ignore")
    locs = apply_drift(locs, info, drift=drift)
    new_info = info + [
        {
            "Generated by": (
                f"Picasso v{__version__} Undrift from picked"
            ),
            "Number of picks": len(picks),
            "Pick radius (nm)": pick_radius * pixelsize,
        }
    ]
    return locs, new_info, drift


def apply_drift(
    locs: pd.DataFrame, info: list[dict], *, drift
) -> pd.DataFrame:
    """Subtract per-frame drift from loc coordinates
    (picasso/postprocess.py:3171)."""
    if isinstance(drift, np.ndarray):
        cols = ["x", "y", "z"][: drift.shape[1]]
        drift = pd.DataFrame(drift, columns=cols)
    locs = locs.copy()
    frames = locs["frame"].to_numpy()
    locs["x"] = locs["x"] - drift["x"].to_numpy()[frames]
    locs["y"] = locs["y"] - drift["y"].to_numpy()[frames]
    if "z" in drift.columns and "z" in locs.columns:
        locs["z"] = locs["z"] - drift["z"].to_numpy()[frames]
    return locs


# ---------------------------------------------------------------------------
# Channel alignment (picasso/postprocess.py:3296-3580)
# ---------------------------------------------------------------------------


def align(
    locs: list[pd.DataFrame],
    infos: list,
    display: bool = False,
    *,
    apply_shifts: bool = True,
    return_shifts: bool = False,
):
    """One RCC alignment pass across channels
    (picasso/postprocess.py:3296)."""
    images = []
    for locs_, info_ in zip(locs, infos):
        _, image = render.render(locs_, info_, blur_method="smooth")
        images.append(image)
    shift_y, shift_x = imageprocess.rcc(
        images, callback=lib.MockProgress().set_value
    )
    if apply_shifts:
        for locs_, dx, dy in zip(locs, shift_x, shift_y):
            locs_["y"] -= dy
            locs_["x"] -= dx
    if return_shifts:
        return locs, (shift_x, shift_y)
    return locs


def align_from_picked(
    all_locs: list[pd.DataFrame],
    infos: list,
    *,
    picks: list,
    pick_shape: Literal[
        "Circle", "Rectangle", "Polygon", "Square"
    ] = "Circle",
    pick_size: float | None = None,
    return_shifts: bool = False,
    index_blocks=None,
):
    """Align channels from the centers of mass of picked fiducial
    regions: all-pairs per-pick COM shifts for every coordinate
    (including z when all channels carry it), solved jointly with the
    least-squares redundancy step, exactly like the reference
    (picasso/postprocess.py:3446/_shifts_from_picked_coordinate
    :3538)."""
    assert pick_shape in ("Circle", "Rectangle", "Polygon", "Square")
    size = pick_size / 2 if pick_shape == "Circle" else pick_size
    pl = []
    for ch, (locs_, info_) in enumerate(zip(all_locs, infos)):
        ib = index_blocks[ch] if index_blocks else None
        pl.append(
            picked_locs(
                locs_, info_, picks, pick_shape, pick_size=size,
                add_group=False, index_blocks=ib,
            )
        )

    def pair_shifts(coordinate):
        coms = [
            np.array([
                p[coordinate].mean() if len(p) else np.nan
                for p in channel
            ])
            for channel in pl
        ]
        n = len(coms)
        shifts = np.zeros((n, n))
        for i in range(n - 1):
            for j in range(i + 1, n):
                shifts[i, j] = np.nanmean(coms[j] - coms[i])
        return shifts

    dy = pair_shifts("y")
    dx = pair_shifts("x")
    dz = (
        pair_shifts("z")
        if all("z" in channel[0].columns for channel in pl)
        else None
    )
    shift = lib.minimize_shifts(dx, dy, shifts_z=dz)
    aligned = []
    for ch, locs_ in enumerate(all_locs):
        out = locs_.copy()
        out["y"] = out["y"] - shift[0][ch]
        out["x"] = out["x"] - shift[1][ch]
        if len(shift) == 3:
            out["z"] = out["z"] - shift[2][ch]
        aligned.append(out)
    if return_shifts:
        return aligned, shift
    return aligned


def plot_drift(drift: pd.DataFrame, pixelsize: float = 1.0, fig=None):
    """Plot the estimated drift trajectory
    (picasso/postprocess.py:2823-like)."""
    import matplotlib.pyplot as plt

    if fig is None:
        fig = plt.figure(figsize=(8, 4))
    ax = fig.add_subplot(121)
    frames = np.arange(len(drift))
    ax.plot(frames, drift["x"] * pixelsize, label="x")
    ax.plot(frames, drift["y"] * pixelsize, label="y")
    if "z" in drift.columns:
        ax.plot(frames, drift["z"], label="z")
    ax.set_xlabel("frame")
    ax.set_ylabel("drift (nm)" if pixelsize != 1 else "drift (px)")
    ax.legend()
    ax2 = fig.add_subplot(122)
    ax2.plot(drift["x"] * pixelsize, drift["y"] * pixelsize, lw=0.5)
    ax2.set_xlabel("x")
    ax2.set_ylabel("y")
    ax2.set_aspect("equal")
    return fig


def plot_nena(nena_result: dict, fig=None):
    """Plot the NeNA histogram and fit
    (picasso/postprocess.py:1147-like)."""
    import matplotlib.pyplot as plt

    if fig is None:
        fig = plt.figure()
    ax = fig.add_subplot(111)
    ax.semilogx(
        nena_result["d"], nena_result["data"], label="data"
    )
    ax.semilogx(
        nena_result["d"], nena_result["best_fit"], label="fit"
    )
    s = nena_result["best_values"]["s"]
    ax.set_title(f"NeNA precision: {s:.4f} px")
    ax.set_xlabel("distance (px)")
    ax.set_ylabel("counts")
    ax.legend()
    return fig


def plot_frc(frc_result: dict, fig=None):
    """Plot the FRC curve and resolution
    (picasso/postprocess.py:1279)."""
    import matplotlib.pyplot as plt

    if fig is None:
        fig = plt.figure()
    ax = fig.add_subplot(111)
    q = frc_result["frequencies"]
    ax.plot(
        q, frc_result["frc_curve"], color="gray", alpha=0.5,
        label="FRC curve",
    )
    ax.plot(q, frc_result["frc_curve_smooth"], label="Smoothed")
    ax.axhline(
        1 / 7, color="black", linewidth=1.0, linestyle="--",
        label="1/7 threshold",
    )
    res = frc_result["resolution"]
    ax.set_xlabel("Spatial frequency (nm^-1)")
    ax.set_ylabel("FRC")
    if res is not None:
        ax.set_title(f"FIRE resolution: {res:.2f} nm")
    ax.legend()
    return fig


def align_rcc(
    locs: list[pd.DataFrame],
    infos: list,
    display: bool = False,
    return_shifts: bool = False,
):
    """Iterative RCC alignment until convergence (<0.001 px) or 5
    iterations (picasso/postprocess.py:3352)."""
    from copy import deepcopy

    locs = deepcopy(locs)
    convergence = 0.001
    shift_x_hist, shift_y_hist = [], []
    for _ in range(5):
        completed = True
        _, shift = align(
            locs, infos, apply_shifts=False, return_shifts=True
        )
        tx, ty = [], []
        for i, locs_ in enumerate(locs):
            if abs(shift[0][i]) + abs(shift[1][i]) > convergence:
                completed = False
            locs_["x"] -= shift[0][i]
            locs_["y"] -= shift[1][i]
            tx.append(shift[0][i])
            ty.append(shift[1][i])
        shift_x_hist.append(np.mean(tx))
        shift_y_hist.append(np.mean(ty))
        if completed:
            break
    if return_shifts:
        return locs, (shift_x_hist, shift_y_hist)
    return locs


# ---------------------------------------------------------------------------
# Group statistics / FRET / NND / RESI
# (picasso/postprocess.py:3580-4001)
# ---------------------------------------------------------------------------


def groupprops(locs: pd.DataFrame, callback=None) -> pd.DataFrame:
    """Mean and std of every column per group + qPAINT index
    (picasso/postprocess.py:3580). Vectorized groupby instead of the
    per-group python loop."""
    if "dark" in locs.columns:
        locs = locs[locs["dark"] != -1]
    g = locs.groupby("group", sort=True)
    means = g.mean()
    stds = g.std()
    n_events = g.size()
    group_ids = means.index.to_numpy()
    groups = pd.DataFrame(
        {"group": group_ids.astype(np.int32),
         "n_events": n_events.to_numpy().astype(np.int32)}
    )
    for name in locs.columns:
        if name == "group":
            # groupby drops the key column; its per-group mean is the
            # id itself and its std is 0 (matches the reference's
            # per-group loop output).
            groups["group_mean"] = group_ids.astype(np.float32)
            groups["group_std"] = np.zeros(
                len(group_ids), np.float32
            )
            continue
        groups[name + "_mean"] = means[name].to_numpy().astype(
            np.float32
        )
        groups[name + "_std"] = stds[name].to_numpy().astype(
            np.float32
        )
    if callable(callback):
        callback(len(groups))
    if "dark_mean" in groups.columns:
        groups["qpaint_idx"] = 1 / groups["dark_mean"]
    return groups


def calculate_fret(
    acc_locs: pd.DataFrame, don_locs: pd.DataFrame
) -> tuple[dict, pd.DataFrame]:
    """FRET efficiency trace from acceptor/donor locs in one pick
    (picasso/postprocess.py:3652)."""
    fret_dict = {}
    if len(acc_locs) == 0:
        max_frames = don_locs["frame"].max()
    elif len(don_locs) == 0:
        max_frames = acc_locs["frame"].max()
    else:
        max_frames = max(
            acc_locs["frame"].max(), don_locs["frame"].max()
        )
    xvec = np.arange(max_frames + 1)
    acc_trace = np.zeros(len(xvec))
    don_trace = np.zeros(len(xvec))
    acc_trace[acc_locs["frame"]] = (
        acc_locs["photons"] - acc_locs["bg"]
    )
    don_trace[don_locs["frame"]] = (
        don_locs["photons"] - don_locs["bg"]
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        fret_trace = acc_trace / (acc_trace + don_trace)
    selector = (fret_trace > 0) & (fret_trace < 1)
    fret_events = fret_trace[selector]
    fret_timepoints = np.arange(len(fret_trace))[selector]
    f_locs = []
    if len(fret_timepoints) > 0:
        sel_locs = [
            don_locs[don_locs["frame"] == t] for t in fret_timepoints
        ]
        f_locs = pd.concat(sel_locs, ignore_index=True)
        f_locs["fret"] = np.array(fret_events)
    fret_dict["fret_events"] = np.array(fret_events)
    fret_dict["fret_timepoints"] = fret_timepoints
    fret_dict["acc_trace"] = acc_trace
    fret_dict["don_trace"] = don_trace
    fret_dict["frames"] = xvec
    fret_dict["maxframes"] = max_frames
    return fret_dict, f_locs


def nn_analysis(
    X1: np.ndarray, X2: np.ndarray, nn_count: int
) -> np.ndarray:
    """K nearest-neighbor distances from X1 into X2
    (picasso/postprocess.py:3704)."""
    if X1.shape[1] != X2.shape[1]:
        raise ValueError(
            "X1 and X2 must have the same number of dimensions."
        )
    same = np.array_equal(X1, X2)
    if _device_neighbors():
        from picasso_tpu.ops import neighbors as _nb

        return _nb.knn(X1, X2, nn_count, exclude_self=same)
    tree = KDTree(X2)
    if same:
        distances, _ = tree.query(X1, k=nn_count + 1)
        nn = distances[:, 1:]
    else:
        distances, _ = tree.query(X1, k=nn_count)
        nn = distances
        if nn.ndim == 1:
            nn = nn[:, None]
    return nn.reshape(-1, nn_count)


def resi(
    locs: list[pd.DataFrame],
    infos: list,
    radius_xy,
    radius_z=None,
    min_locs=10,
    apply_fa: bool = True,
    save_clustered_locs: bool = False,
    save_cluster_centers: bool = False,
    resi_path: str | None = None,
    output_paths: list[str] | None = None,
    suffix_locs: str = "_clustered",
    suffix_centers: str = "_cluster_centers",
    progress_callback=None,
) -> tuple[pd.DataFrame, list[dict]]:
    """RESI: per-channel SMLM clustering -> cluster centers ->
    combined channels with resi_channel_id
    (picasso/postprocess.py:3742)."""
    import os

    from picasso_tpu import clusterer as _clusterer
    from picasso_tpu import io as _io

    n_channels = len(locs)
    if n_channels < 2:
        raise ValueError(
            f"RESI requires at least 2 channels, but got {n_channels}."
            " Consider using SMLM Clusterer for single-channel"
            " clustering."
        )

    def as_list(v, name):
        if isinstance(v, (int, float)):
            return [v] * n_channels
        if len(v) != n_channels:
            raise ValueError(
                f"{name} list length ({len(v)}) must match number of"
                f" channels ({n_channels})"
            )
        return list(v)

    radius_xy = as_list(radius_xy, "radius_xy")
    min_locs = as_list(min_locs, "min_locs")
    if radius_z is not None:
        radius_z = as_list(radius_z, "radius_z")

    centers_all = []
    channel_params = []
    for c in range(n_channels):
        if callable(progress_callback):
            progress_callback(c)
        elif progress_callback == "console":
            print(f"RESI: clustering channel {c + 1}/{n_channels}")
        pixelsize = lib.get_from_metadata(
            infos[c], "Pixelsize", default=130
        )
        rz = radius_z[c] if radius_z is not None else None
        clustered = _clusterer.cluster(
            locs[c],
            radius_xy=radius_xy[c],
            min_locs=min_locs[c],
            frame_analysis=apply_fa,
            radius_z=rz,
            pixelsize=pixelsize,
        )
        centers = _clusterer.find_cluster_centers(clustered, pixelsize)
        if save_clustered_locs and output_paths:
            base = os.path.splitext(output_paths[c])[0]
            _io.save_locs(
                base + suffix_locs + ".hdf5", clustered, infos[c]
            )
        if save_cluster_centers and output_paths:
            base = os.path.splitext(output_paths[c])[0]
            _io.save_locs(
                base + suffix_centers + ".hdf5", centers, infos[c]
            )
        centers = centers.copy()
        centers["resi_channel_id"] = np.int8(c)
        centers_all.append(centers)
        channel_params.append(
            {
                "Channel": c,
                "Radius xy (px)": radius_xy[c],
                "Radius z (px)": (
                    radius_z[c] if radius_z is not None else None
                ),
                "Min locs": min_locs[c],
            }
        )
    resi_centers = pd.concat(centers_all, ignore_index=True)
    if "group" in resi_centers.columns:
        resi_centers = resi_centers.rename(
            columns={"group": "cluster_id"}
        )
    resi_info = list(infos[0]) + [
        {
            "Generated by": f"Picasso v{__version__} RESI",
            "Channels": channel_params,
        }
    ]
    if resi_path is not None:
        _io.save_locs(resi_path, resi_centers, resi_info)
    return resi_centers, resi_info


# ---------------------------------------------------------------------------
# Deprecated public aliases kept for API parity with the reference,
# which keeps these shims around until its v0.11.0
# (picasso/postprocess.py:97/802/890/932/1165/2422/2664).
# ---------------------------------------------------------------------------


def index_blocks_shape(info: list[dict], size: float) -> tuple[int, int]:
    """Deprecated alias of _index_blocks_shape
    (picasso/postprocess.py:97)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _index_blocks_shape instead."
    )
    return _index_blocks_shape(info, size)


def n_block_locs_at(
    x_range: int,
    y_range: int,
    K: int,
    L: int,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
) -> int:
    """Deprecated: number of locs in the 3x3 block neighborhood of the
    given grid cell (picasso/postprocess.py:802; note the reference
    excludes row/column 0 here, unlike _get_block_locs_at_numba)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use the block index returned by get_index_blocks."
    )
    total = np.uint32(0)
    for k in range(y_range - 1, y_range + 2):
        if 0 < k < K:
            for ll in range(x_range - 1, x_range + 2):
                if 0 < ll < L:
                    total += np.uint32(
                        block_ends[k][ll] - block_starts[k][ll]
                    )
    return total


def _block_neighborhood_indices(
    x_index: int,
    y_index: int,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
    K: int,
    L: int,
) -> np.ndarray:
    """Indices of locs in the 3x3 block neighborhood
    (picasso/postprocess.py:849)."""
    chunks = []
    for k in range(y_index - 1, y_index + 2):
        if 0 <= k < K:
            for ll in range(x_index - 1, x_index + 2):
                if 0 <= ll < L and block_ends[k, ll] > block_starts[k, ll]:
                    chunks.append(
                        np.arange(
                            block_starts[k, ll],
                            block_ends[k, ll],
                            dtype=np.uint32,
                        )
                    )
    if not chunks:
        return np.empty(0, dtype=np.uint32)
    return np.concatenate(chunks)


def get_block_locs_at_numba(
    x_index: int,
    y_index: int,
    locs_xy: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
    K: int,
    L: int,
) -> np.ndarray:
    """Deprecated: the locs (columns of ``locs_xy``, shape (2, N)
    lexsorted by block) in the 3x3 block neighborhood of the given cell
    (picasso/postprocess.py:890)."""
    indices = _block_neighborhood_indices(
        x_index, y_index, block_starts, block_ends, K, L
    )
    return locs_xy[:, indices]


def locs_at_numba(
    x: float, y: float, locs_xy: np.ndarray, r: float
) -> np.ndarray:
    """Deprecated: columns of ``locs_xy`` within radius ``r`` of (x, y)
    (picasso/postprocess.py:932)."""
    dx = locs_xy[0] - x
    dy = locs_xy[1] - y
    return locs_xy[:, dx**2 + dy**2 < r**2]


def next_frame_neighbor_distance_histogram(locs, callback=None):
    """Deprecated alias of _next_frame_neighbor_distance_histogram
    (picasso/postprocess.py:1165)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _next_frame_neighbor_distance_histogram instead."
    )
    return _next_frame_neighbor_distance_histogram(locs, callback)


def get_link_groups(
    frame: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    d_max: float,
    max_dark_time: int,
    group: np.ndarray,
) -> np.ndarray:
    """Deprecated alias of _get_link_groups
    (picasso/postprocess.py:2422)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _get_link_groups instead."
    )
    return _get_link_groups(frame, x, y, d_max, max_dark_time, group)


def link_loc_groups(
    locs: pd.DataFrame,
    info: list[dict],
    link_group: np.ndarray,
    remove_ambiguous_lengths: bool = True,
) -> pd.DataFrame:
    """Deprecated alias of _link_loc_groups
    (picasso/postprocess.py:2664)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _link_loc_groups instead."
    )
    return _link_loc_groups(
        locs, info, link_group, remove_ambiguous_lengths
    )
