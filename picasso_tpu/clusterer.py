"""picasso_tpu.clusterer — SMLM clustering (KDTree local-maxima),
DBSCAN/HDBSCAN wrappers, cluster centers, areas and subclustering test.

Capability parity with picasso/clusterer.py (_cluster :114, cluster
:291, frame_analysis :76, _dbscan :410, _hdbscan :547,
find_cluster_centers :803, cluster_areas :1112, test_subclustering
:1172). The local-maxima search uses vectorized pair queries +
scatter-max instead of per-point python list scans.
"""

from __future__ import annotations

import os
from typing import Callable, Literal

import numpy as np
import pandas as pd
from scipy.ndimage import gaussian_filter
from scipy.spatial import ConvexHull, cKDTree as KDTree
from scipy.spatial import QhullError

from picasso_tpu import __version__, lib, masking


# ---------------------------------------------------------------------------
# Frame analysis QC (picasso/clusterer.py:34-112)
# ---------------------------------------------------------------------------


def frame_analysis(labels: np.ndarray, frame: np.ndarray) -> np.ndarray:
    """Reject clusters whose mean frame lies outside [20, 80]% of the
    acquisition or with >80% of locs in one 1/20 time bin
    (picasso/clusterer.py:76). Vectorized over clusters."""
    labels = np.asarray(labels)
    frame = np.asarray(frame)
    n_frames = frame.max() + 1
    valid = labels != -1
    if not valid.any():
        return labels
    lab = labels[valid]
    frm = frame[valid]
    df = pd.DataFrame({"label": lab, "frame": frm})
    g = df.groupby("label")
    mean_frame = g["frame"].mean()
    n_locs = g.size()
    # max locs in any 1/20 bin per cluster
    bin_idx = np.clip(
        (frm / n_frames * 20).astype(int), 0, 19
    )
    binc = (
        pd.DataFrame({"label": lab, "bin": bin_idx, "one": 1})
        .groupby(["label", "bin"])["one"]
        .sum()
        .groupby("label")
        .max()
    )
    bad = mean_frame.index[
        (mean_frame < 0.2 * n_frames)
        | (mean_frame > 0.8 * n_frames)
        | (binc > 0.8 * n_locs)
    ]
    labels = labels.copy()
    labels[np.isin(labels, bad)] = -1
    return labels


# ---------------------------------------------------------------------------
# SMLM clusterer (picasso/clusterer.py:114-290)
# ---------------------------------------------------------------------------


def _cluster(
    X: np.ndarray,
    radius: float,
    min_locs: int,
    frame: pd.Series | None = None,
) -> np.ndarray:
    """Local-maxima clustering (Schlichthaerle et al., Nat. Comm 2021;
    picasso/clusterer.py:114). Neighbor counts and the
    neighborhood-max test run vectorized over all pairs; the label
    pass iterates only over local maxima."""
    from picasso_tpu import native as _native
    from picasso_tpu.ops import neighbors as _nb

    n = X.shape[0]
    device = (
        _nb.use_device()
        and os.environ.get("PICASSO_TPU_NEIGHBORS") == "device"
    )
    if (
        _native.AVAILABLE
        and not device
        and os.environ.get("PICASSO_TPU_CLUSTERER") != "host"
    ):
        # grid-hash C++ core: counts + neighborhood max + label sweep
        # in one native pass (no KDTree, no pair materialization)
        labels = _native.cluster_smlm(X, radius, min_locs)
        values, cluster_counts = np.unique(
            labels, return_counts=True
        )
        to_discard = values[cluster_counts < min_locs]
        labels[np.isin(labels, to_discard)] = -1
        if frame is not None:
            labels = frame_analysis(labels, frame.to_numpy())
        return labels
    if device:
        # neighbor counts + neighborhood reduces as blocked device
        # distance tiles. Opt-in ONLY: measured on a TPU v5e at 100k
        # locs / r=0.15 px the O(N^2) tiles run slower than the host
        # KDTree — short-radius neighbor counting is the KDTree's
        # home turf. The kernels stay the default for all-pairs work
        # (distance histograms, NND).
        pairs = None
        counts = _nb.radius_count(X, X, radius).astype(np.int64)
        max_nb = _nb.radius_max(
            X, X, radius, counts.astype(np.float32)
        ).astype(np.int64)
    else:
        tree = KDTree(X)
        counts = tree.query_ball_point(
            X, radius, return_length=True
        )
        # max neighbor count within each point's neighborhood
        # (incl. self)
        max_nb = counts.astype(np.int64).copy()
        pairs = tree.query_pairs(radius, output_type="ndarray")
        if len(pairs):
            np.maximum.at(max_nb, pairs[:, 0], counts[pairs[:, 1]])
            np.maximum.at(max_nb, pairs[:, 1], counts[pairs[:, 0]])
    lm = (counts > min_locs) & (counts == max_nb)

    # Label assignment: the reference's sequential sweep over local
    # maxima (picasso/clusterer.py:176-187 — an unassigned maximum
    # OVERWRITES its whole neighborhood with its own index; an
    # already-assigned one only fills unassigned neighbors), with the
    # per-maximum neighbor lists built from the pairs array as CSR
    # instead of a second KDTree ball query (the query was the single
    # hottest step at bench scale: 0.8 s of a 1.6 s total).
    labels = -np.ones(n, np.int32)
    lm_idx = np.nonzero(lm)[0]
    if len(lm_idx):
        if pairs is None:
            tree = KDTree(X)
            pairs = tree.query_pairs(radius, output_type="ndarray")
        if len(pairs):
            rows = np.concatenate([pairs[:, 0], pairs[:, 1]])
            cols = np.concatenate([pairs[:, 1], pairs[:, 0]])
            sel = lm[rows]
            rows = rows[sel]
            cols = cols[sel]
            srt = np.argsort(rows, kind="stable")
            rows = rows[srt]
            cols = cols[srt]
            starts = np.searchsorted(rows, lm_idx, side="left")
            stops = np.searchsorted(rows, lm_idx, side="right")
        else:
            cols = np.empty(0, np.int64)
            starts = stops = np.zeros(len(lm_idx), np.int64)
        from picasso_tpu import native as _native

        if _native.AVAILABLE:
            _native.cluster_label_sweep(
                lm_idx, starts, stops, cols, labels
            )
        else:
            for count, (i, lo, hi) in enumerate(
                zip(lm_idx, starts, stops)
            ):
                nbrs = cols[lo:hi]
                label = labels[i]
                if label == -1:
                    labels[nbrs] = count
                    labels[i] = count
                else:
                    unassigned = nbrs[labels[nbrs] == -1]
                    if len(unassigned):
                        labels[unassigned] = label
    # discard clusters below min_locs
    values, cluster_counts = np.unique(labels, return_counts=True)
    to_discard = values[cluster_counts < min_locs]
    labels[np.isin(labels, to_discard)] = -1
    if frame is not None:
        labels = frame_analysis(labels, frame.to_numpy())
    return labels


def cluster_2D(
    locs: pd.DataFrame, radius: float, min_locs: int, fa: bool
) -> np.ndarray:
    """2D wrapper (picasso/clusterer.py:204)."""
    X = locs[["x", "y"]].to_numpy()
    return _cluster(
        X, radius, min_locs, locs["frame"] if fa else None
    )


def cluster_3D(
    locs: pd.DataFrame,
    radius_xy: float,
    radius_z: float,
    min_locs: int,
    fa: bool,
) -> np.ndarray:
    """3D wrapper — z scaled by radius_xy/radius_z so a Euclidean
    search is an ellipsoidal neighborhood
    (picasso/clusterer.py:241)."""
    X = locs[["x", "y", "z"]].to_numpy().copy()
    X[:, 2] *= radius_xy / radius_z
    return _cluster(
        X, radius_xy, min_locs, locs["frame"] if fa else None
    )


def extract_valid_labels(
    locs: pd.DataFrame, labels: np.ndarray
) -> pd.DataFrame:
    """Append 'group' column, drop unclustered (-1) locs
    (picasso/clusterer.py:665)."""
    locs = locs.copy()
    locs["group"] = labels
    return locs[locs["group"] != -1]


def cluster(
    locs: pd.DataFrame,
    radius_xy: float,
    min_locs: int,
    frame_analysis: bool,
    radius_z: float | None = None,
    pixelsize: float | None = None,
    return_info: bool = False,
):
    """SMLM clusterer entry (picasso/clusterer.py:291). 3D when a 'z'
    column exists (z in nm; converted to px internally)."""
    locs = locs.copy()
    n_raw = len(locs)
    if "z" in locs.columns:
        if pixelsize is None or radius_z is None:
            raise ValueError(
                "Camera pixel size and clustering radius in z must be"
                " specified for 3D clustering."
            )
        locs["z"] = locs["z"] / pixelsize
        labels = cluster_3D(
            locs, radius_xy, radius_z, min_locs, frame_analysis
        )
    else:
        labels = cluster_2D(locs, radius_xy, min_locs, frame_analysis)
    locs = extract_valid_labels(locs, labels)
    if "z" in locs.columns:
        locs["z"] = locs["z"] * pixelsize
    info = {
        "Generated by": f"Picasso v{__version__} SMLM clusterer",
        "Number of clusters": len(np.unique(locs["group"]))
        if len(locs)
        else 0,
        "Min. cluster size": min_locs,
        "Performed basic frame analysis": frame_analysis,
        "Fraction of rejected locs (%)": (
            100 * (n_raw - len(locs)) / n_raw if n_raw else 0.0
        ),
    }
    unit = "nm" if pixelsize is not None else "px"
    scale = pixelsize if pixelsize is not None else 1
    if "z" in locs.columns:
        info[f"Clustering radius xy ({unit})"] = radius_xy * scale
        info[f"Clustering radius z ({unit})"] = radius_z * scale
    else:
        info[f"Clustering radius ({unit})"] = radius_xy * scale
    if return_info:
        return locs, info
    return locs


# ---------------------------------------------------------------------------
# DBSCAN / HDBSCAN (picasso/clusterer.py:410-664)
# ---------------------------------------------------------------------------


def _dbscan(
    X, radius: float, min_density: int, min_locs: int = 0
) -> np.ndarray:
    from sklearn.cluster import DBSCAN

    labels = DBSCAN(eps=radius, min_samples=min_density).fit(X).labels_
    if min_locs > 0:
        values, counts = np.unique(
            labels[labels != -1], return_counts=True
        )
        small = values[counts < min_locs]
        labels[np.isin(labels, small)] = -1
    return labels


def dbscan(
    locs: pd.DataFrame,
    radius: float,
    min_density: int,
    pixelsize: float | None = None,
    return_info: bool = False,
    min_locs: int = 0,
    radius_z: float | None = None,
):
    """DBSCAN wrapper (Ester et al. 1996; picasso/clusterer.py:448).

    With ``radius_z`` set on 3D data, clustering is anisotropic: z is
    scaled by ``radius / radius_z`` so the isotropic epsilon search
    corresponds to an ellipsoidal neighborhood with semi-axes
    (radius, radius, radius_z), as in the reference since v0.10.1.
    Clusters smaller than ``min_locs`` are dropped."""
    locs = locs.copy()
    n_raw = len(locs)
    is_3d = "z" in locs.columns
    if is_3d:
        if pixelsize is None:
            raise ValueError(
                "Camera pixel size must be specified for 3D DBSCAN."
            )
        X = locs[["x", "y", "z"]].to_numpy().copy()
        X[:, 2] /= pixelsize
        if radius_z is not None:
            X[:, 2] *= radius / radius_z
    else:
        X = locs[["x", "y"]].to_numpy()
    labels = _dbscan(X, radius, min_density, min_locs)
    locs = extract_valid_labels(locs, labels)
    info = {
        "Generated by": f"Picasso v{__version__} DBSCAN",
        "Number of clusters": len(np.unique(locs["group"]))
        if len(locs)
        else 0,
        "Radius (px)": radius,
        "Min. density": min_density,
        "Min. localizations per cluster": min_locs,
        "Fraction of rejected locs (%)": (
            100 * (n_raw - len(locs)) / n_raw if n_raw else 0.0
        ),
    }
    if is_3d and radius_z is not None:
        info["Radius z (px)"] = radius_z
    if return_info:
        return locs, info
    return locs


def _hdbscan(
    X, min_cluster_size: int, min_samples: int,
    cluster_eps: float = 0.0,
) -> np.ndarray:
    from sklearn.cluster import HDBSCAN

    return (
        HDBSCAN(
            min_cluster_size=min_cluster_size,
            min_samples=min_samples,
            cluster_selection_epsilon=cluster_eps,
            copy=True,
        )
        .fit(X)
        .labels_
    )


def hdbscan(
    locs: pd.DataFrame,
    min_cluster_size: int,
    min_samples: int,
    pixelsize: float | None = None,
    cluster_eps: float = 0.0,
    return_info: bool = False,
):
    """HDBSCAN wrapper (Campello et al. 2013;
    picasso/clusterer.py:585)."""
    locs = locs.copy()
    if "z" in locs.columns:
        if pixelsize is None:
            raise ValueError(
                "Camera pixel size must be specified for 3D HDBSCAN."
            )
        X = locs[["x", "y", "z"]].to_numpy().copy()
        X[:, 2] /= pixelsize
    else:
        X = locs[["x", "y"]].to_numpy()
    labels = _hdbscan(X, min_cluster_size, min_samples, cluster_eps)
    locs = extract_valid_labels(locs, labels)
    info = {
        "Generated by": f"Picasso v{__version__} HDBSCAN",
        "Number of clusters": len(np.unique(locs["group"]))
        if len(locs)
        else 0,
        "Min. cluster size": min_cluster_size,
        "Min. samples": min_samples,
        "Intercluster distance": cluster_eps,
    }
    if return_info:
        return locs, info
    return locs


# ---------------------------------------------------------------------------
# Cluster centers (picasso/clusterer.py:694-1067)
# ---------------------------------------------------------------------------


def _count_binding_events(group_arr, frame_arr):
    """Events per cluster: within a cluster's frame-ordered
    localizations, a gap of more than 3 frames opens a new binding
    event (semantics of picasso/clusterer.py:728).

    Sorts by (group, frame) — a lexsort, so clusters whose rows arrive
    frame-shuffled still count correctly — then segments the sorted
    run once: an event starts at every cluster boundary and at every
    intra-cluster frame gap > 3, and ``np.add.reduceat`` over the
    cluster boundaries totals the starts per cluster.

    Returns ``(n_events, order, group_sorted)``; ``order`` is reused
    by the caller for the per-cluster convex-hull pass.
    """
    m = len(group_arr)
    if m == 0:
        return (
            np.zeros(0, np.int64), np.zeros(0, np.intp),
            np.asarray(group_arr),
        )
    order = np.lexsort((frame_arr, group_arr))
    group_s = group_arr[order]
    frame_s = frame_arr[order]
    boundary = np.flatnonzero(
        np.diff(group_s, prepend=group_s[0] - 1) != 0
    )
    event_start = np.diff(frame_s, prepend=frame_s[0]) > 3
    event_start[boundary] = True
    n_events = np.add.reduceat(event_start.astype(np.int64), boundary)
    return n_events, order, group_s


def find_cluster_centers(
    locs: pd.DataFrame, pixelsize: float | None = None
) -> pd.DataFrame:
    """Per-cluster centers in locs format: means/stds, SEM precisions,
    weighted z, binding-event counts, convex hulls and area/volume
    estimates (picasso/clusterer.py:803)."""
    has_z = "z" in locs.columns
    if has_z and pixelsize is None:
        raise ValueError(
            "Camera pixel size must be specified for 3D cluster"
            " centers calculation."
        )
    group_arr = locs["group"].to_numpy()
    frame_arr = locs["frame"].to_numpy()
    mean_cols = [
        "frame", "x", "y", "photons", "sx", "sy", "bg", "net_gradient",
    ]
    # imported data (e.g. ThunderSTORM csv) may lack some columns the
    # localizer always produces; aggregate what exists, fill the rest
    mean_cols = [c for c in mean_cols if c in locs.columns]
    std_cols = ["frame", "x", "y"]
    if has_z:
        mean_cols.append("z")
        std_cols.append("z")
    gb = locs.groupby("group", sort=True)
    means = gb[mean_cols].mean()
    stds = gb[std_cols].std()
    n_locs = gb.size().to_numpy()
    unique_groups = means.index.to_numpy()

    lpx = stds["x"].to_numpy() / np.sqrt(n_locs)
    lpy = stds["y"].to_numpy() / np.sqrt(n_locs)
    if "sx" in means.columns and "sy" in means.columns:
        ellipticity = means["sx"].to_numpy() / means["sy"].to_numpy()
    else:
        ellipticity = np.ones(len(means))
    n_events, order, group_s = _count_binding_events(
        group_arr, frame_arr
    )

    # convex hulls (the only per-cluster loop)
    coord_cols = ["x", "y", "z"] if has_z else ["x", "y"]
    coords_sorted = (
        locs[coord_cols].to_numpy()[order].astype(np.float64, copy=True)
    )
    if has_z:
        coords_sorted[:, 2] /= pixelsize
    offsets = np.searchsorted(group_s, unique_groups, side="left")
    offsets = np.append(offsets, len(group_s))
    convexhull = np.zeros(len(unique_groups))
    for i in range(len(unique_groups)):
        pts = coords_sorted[offsets[i]:offsets[i + 1]]
        try:
            convexhull[i] = ConvexHull(pts).volume
        except QhullError:
            convexhull[i] = 0.0

    columns = {
        "frame": means["frame"].to_numpy().astype(np.float32),
        "std_frame": stds["frame"].to_numpy().astype(np.float32),
        "x": means["x"].to_numpy().astype(np.float32),
        "y": means["y"].to_numpy().astype(np.float32),
        "std_x": stds["x"].to_numpy().astype(np.float32),
        "std_y": stds["y"].to_numpy().astype(np.float32),
    }
    if has_z:
        if "lpx" in locs.columns and "lpy" in locs.columns:
            w = 1.0 / (
                locs["lpx"].to_numpy() + locs["lpy"].to_numpy()
            ) ** 2
        else:  # imported data without precision columns: plain mean
            w = np.ones(len(locs))
        wz = pd.Series(locs["z"].to_numpy() * w).groupby(
            group_arr, sort=True
        ).sum()
        ws = pd.Series(w).groupby(group_arr, sort=True).sum()
        columns["z"] = (wz / ws).to_numpy().astype(np.float32)
    # optional columns: present only when the input carried them
    # (imported data, e.g. ThunderSTORM csv, may lack these)
    for col in ("photons", "sx", "sy", "bg"):
        if col in means.columns:
            columns[col] = means[col].to_numpy().astype(np.float32)
    columns.update(
        {
            "lpx": lpx.astype(np.float32),
            "lpy": lpy.astype(np.float32),
        }
    )
    if has_z:
        columns["lpz"] = (
            stds["z"].to_numpy() / np.sqrt(n_locs)
        ).astype(np.float32)
        columns["std_z"] = stds["z"].to_numpy().astype(np.float32)
    columns.update(
        {
            "ellipticity": ellipticity.astype(np.float32),
            "net_gradient": (
                means["net_gradient"].to_numpy()
                if "net_gradient" in means.columns
                else np.zeros(len(means))
            ).astype(np.float32),
            "n_locs": n_locs.astype(np.uint32),
            "n_events": n_events.astype(np.int32),
        }
    )
    if has_z:
        std_z = stds["z"].to_numpy()
        volume = (
            np.power(
                (stds["x"].to_numpy() + stds["y"].to_numpy()
                 + std_z / pixelsize) / 3 * 2, 3
            )
            * 4.18879
        )
        columns["volume"] = volume.astype(np.float32)
    else:
        area = np.power(
            stds["x"].to_numpy() + stds["y"].to_numpy(), 2
        ) * np.pi
        columns["area"] = area.astype(np.float32)
    columns["convexhull"] = convexhull.astype(np.float32)
    columns["group"] = unique_groups.astype(np.int32)
    if "group_input" in locs.columns:
        columns["group_input"] = (
            gb["group_input"].first().to_numpy().astype(np.int32)
        )
    return pd.DataFrame(columns)


# ---------------------------------------------------------------------------
# Cluster areas / subclustering QC (picasso/clusterer.py:1068-1237)
# ---------------------------------------------------------------------------


def _cluster_area(X: np.ndarray, lp: float) -> float:
    """Otsu-thresholded rendered area (2D, in LP^2) or volume (3D, in
    LP^3) of one cluster (picasso/clusterer.py:1068)."""
    bin_size = lp / 2
    if X.shape[1] == 3:
        bin_size_z = bin_size * 2.5
        edges = [
            np.arange(X[:, 0].min(), X[:, 0].max() + bin_size, bin_size),
            np.arange(X[:, 1].min(), X[:, 1].max() + bin_size, bin_size),
            np.arange(
                X[:, 2].min(), X[:, 2].max() + bin_size_z, bin_size_z
            ),
        ]
    else:
        edges = [
            np.arange(X[:, 0].min(), X[:, 0].max() + bin_size, bin_size),
            np.arange(X[:, 1].min(), X[:, 1].max() + bin_size, bin_size),
        ]
    image = np.histogramdd(X, bins=edges)[0]
    image = gaussian_filter(image, sigma=2)
    thresh = masking.threshold_otsu(image.reshape(-1))
    if X.shape[1] == 3:
        return np.sum(image >= thresh) / (16 / 5)
    return np.sum(image >= thresh) / 4


def cluster_areas(
    locs: pd.DataFrame,
    info: list[dict],
    progress: Callable[[int], None] | None = None,
) -> pd.DataFrame:
    """Per-cluster areas/volumes via Otsu thresholding
    (picasso/clusterer.py:1112)."""
    assert "group" in locs.columns, (
        "Localizations must contain 'group' column."
    )
    pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    has_z = "z" in locs.columns
    coord_cols = ["x", "y", "z"] if has_z else ["x", "y"]
    # dataset-wide median localization precision sets the Otsu grid
    lp = float(np.median(
        (locs["lpx"].to_numpy() + locs["lpy"].to_numpy()) / 2.0
    ))
    group_ids: list[int] = []
    values: list[float] = []
    # groupby yields each cluster's rows once (sorted ids, matching
    # the reference's np.unique iteration order) without the O(G*N)
    # per-group boolean scans
    for n_done, (gid, pts_df) in enumerate(
        locs.groupby("group", sort=True), start=1
    ):
        pts = pts_df[coord_cols].to_numpy(np.float64)
        if has_z:
            pts[:, 2] = pts[:, 2] / pixelsize  # nm -> camera px
        group_ids.append(int(gid))
        values.append(_cluster_area(pts, lp))
        if progress is not None:
            progress(n_done)
    area_key = "Volume (LP^3)" if has_z else "Area (LP^2)"
    return pd.DataFrame({
        "group": np.asarray(group_ids, np.int32),
        area_key: np.asarray(values, np.float32),
    })


def test_subclustering(
    mols: pd.DataFrame,
    info: list[dict],
    clustering_dist: float = 25,
    sparse_dist: float = 80,
) -> tuple[np.ndarray, np.ndarray]:
    """Compare binding-event counts of clustered vs sparse molecules to
    detect subclustering (Kowalewski, Reinhardt et al., Nat. Comms
    2026; picasso/clusterer.py:1172)."""
    assert "n_events" in mols.columns, (
        "The input molecules must have n_events attribute."
    )
    assert sparse_dist > clustering_dist, (
        "The sparse distance must be larger than the clustering"
        " distance."
    )
    pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    if "z" in mols.columns:
        coords = mols[["x", "y", "z"]].to_numpy().copy()
        coords[:, 2] /= pixelsize
    else:
        coords = mols[["x", "y"]].to_numpy()
    tree = KDTree(coords)
    distances, _ = tree.query(coords, k=2)
    nnd1 = distances[:, 1]
    close = np.nonzero(nnd1 < clustering_dist / pixelsize)[0]
    far = np.nonzero(nnd1 >= sparse_dist / pixelsize)[0]
    return (
        mols.iloc[close]["n_events"].to_numpy(),
        mols.iloc[far]["n_events"].to_numpy(),
    )


def cluster_center(grouplocs, pixelsize=None, separate_lp=False):
    """Deprecated single-group center calculation
    (picasso/clusterer.py:900); use find_cluster_centers."""
    df = grouplocs if isinstance(grouplocs, pd.DataFrame) else (
        pd.DataFrame(grouplocs)
    )
    df = df.copy()
    df["group"] = 0
    centers = find_cluster_centers(df, pixelsize)
    return centers.iloc[0].tolist()
