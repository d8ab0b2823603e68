"""Example 3 — clustering (counterpart of
sample_notebook_3_clustering.ipynb): DBSCAN, the SMLM clusterer,
frame analysis, cluster centers, G5M molecular mapping, RESI.

Run: python examples/03_clustering.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

INFO = [{"Frames": 1000, "Height": 32, "Width": 32, "Pixelsize": 130}]


def _synthetic_clustered_locs(seed=0, n_sites=12, locs_per_site=40):
    """DNA-PAINT-like localizations: tight clouds at random sites."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    sites = rng.uniform(4, 28, (n_sites, 2))
    xs, ys, frames = [], [], []
    for sx, sy in sites:
        n = locs_per_site
        xs.append(rng.normal(sx, 0.08, n))
        ys.append(rng.normal(sy, 0.08, n))
        frames.append(np.sort(rng.integers(0, 1000, n)))
    n_total = n_sites * locs_per_site
    return pd.DataFrame({
        "frame": np.concatenate(frames).astype(np.uint32),
        "x": np.concatenate(xs).astype(np.float32),
        "y": np.concatenate(ys).astype(np.float32),
        "photons": rng.uniform(500, 3000, n_total).astype(np.float32),
        "sx": np.full(n_total, 1.1, np.float32),
        "sy": np.full(n_total, 1.0, np.float32),
        "bg": rng.uniform(5, 20, n_total).astype(np.float32),
        "lpx": rng.uniform(0.03, 0.1, n_total).astype(np.float32),
        "lpy": rng.uniform(0.03, 0.1, n_total).astype(np.float32),
    })


def main(out_dir: str | None = None):
    from picasso_tpu import clusterer, io, postprocess

    out_dir = out_dir or tempfile.mkdtemp(prefix="picasso_tpu_ex3_")
    locs = _synthetic_clustered_locs()

    # -- DBSCAN --
    db, db_info = clusterer.dbscan(
        locs, radius=0.3, min_density=5, return_info=True
    )
    print(f"DBSCAN: {db_info['Number of clusters']} clusters")
    io.save_locs(
        os.path.join(out_dir, "dbscan_locs.hdf5"), db,
        INFO + [db_info],
    )

    # -- SMLM clusterer (used by RESI) + frame analysis QC --
    sm = clusterer.cluster(
        locs, radius_xy=0.3, min_locs=10, frame_analysis=True
    )
    print(f"SMLM clusterer: {sm['group'].nunique()} clusters "
          f"after frame analysis")

    # -- weighted cluster centers --
    centers = clusterer.find_cluster_centers(sm, pixelsize=130)
    print(f"centers: {len(centers)} rows, "
          f"mean locs/cluster {centers['n_locs'].mean():.1f}")

    # -- G5M molecular mapping on the clustered locs --
    from picasso_tpu import g5m as _g5m

    mols, mols_locs, mols_info = _g5m.g5m(sm, INFO)
    print(f"G5M: {len(mols)} molecules")

    # -- RESI: per-channel clustering -> combined cluster centers --
    half = len(locs) // 2
    resi_centers, resi_info = postprocess.resi(
        [locs.iloc[:half], locs.iloc[half:]],
        [INFO, INFO],
        radius_xy=[0.3, 0.3],
        min_locs=[5, 5],
    )
    print(f"RESI: {len(resi_centers)} combined centers")
    return centers, resi_centers


if __name__ == "__main__":
    main(*sys.argv[1:])
