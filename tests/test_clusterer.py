"""Clustering: SMLM clusterer recovery, frame analysis, DBSCAN/HDBSCAN,
cluster centers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import clusterer

INFO = [{"Frames": 1000, "Height": 64, "Width": 64, "Pixelsize": 130}]


def _clustered_locs(seed=0, n_clusters=5, n_per=50, sigma=0.05,
                    n_noise=40):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(5, 59, (n_clusters, 2))
    pts = []
    true = []
    for i, c in enumerate(centers):
        pts.append(rng.normal(c, sigma, (n_per, 2)))
        true.extend([i] * n_per)
    pts.append(rng.uniform(0, 64, (n_noise, 2)))
    true.extend([-1] * n_noise)
    pts = np.vstack(pts)
    n = len(pts)
    locs = pd.DataFrame(
        {
            "frame": rng.integers(0, 1000, n).astype(np.uint32),
            "x": pts[:, 0].astype(np.float32),
            "y": pts[:, 1].astype(np.float32),
            "photons": rng.uniform(500, 2000, n).astype(np.float32),
            "sx": np.full(n, 1.1, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 10.0, np.float32),
            "lpx": np.full(n, 0.03, np.float32),
            "lpy": np.full(n, 0.03, np.float32),
            "net_gradient": np.full(n, 1e4, np.float32),
        }
    )
    return locs, centers


class TestSMLMClusterer:
    def test_recovers_clusters(self):
        locs, centers = _clustered_locs()
        out = clusterer.cluster(
            locs, radius_xy=0.3, min_locs=10, frame_analysis=False
        )
        assert len(np.unique(out["group"])) == len(centers)
        # each recovered cluster center near a true center
        for g in np.unique(out["group"]):
            sub = out[out["group"] == g]
            cx, cy = sub["x"].mean(), sub["y"].mean()
            d = np.min(np.hypot(
                centers[:, 0] - cx, centers[:, 1] - cy
            ))
            assert d < 0.1

    def test_min_locs_filter(self):
        locs, _ = _clustered_locs(n_per=5)
        out = clusterer.cluster(
            locs, radius_xy=0.3, min_locs=10, frame_analysis=False
        )
        assert len(out) == 0

    def test_frame_analysis_rejects_stuck(self):
        """A cluster whose locs all sit in a narrow time window must be
        rejected (reference clusterer.py:66-70 semantics)."""
        rng = np.random.default_rng(1)
        good = rng.normal((10, 10), 0.05, (60, 2))
        stuck = rng.normal((40, 40), 0.05, (60, 2))
        pts = np.vstack([good, stuck])
        frames = np.concatenate(
            [
                rng.integers(0, 1000, 60),  # spread over time
                rng.integers(100, 120, 60),  # burst (stuck fiducial)
            ]
        )
        locs = pd.DataFrame(
            {
                "frame": frames.astype(np.uint32),
                "x": pts[:, 0].astype(np.float32),
                "y": pts[:, 1].astype(np.float32),
                "photons": np.full(120, 1000, np.float32),
                "sx": np.full(120, 1.0, np.float32),
                "sy": np.full(120, 1.0, np.float32),
                "bg": np.full(120, 10, np.float32),
                "lpx": np.full(120, 0.03, np.float32),
                "lpy": np.full(120, 0.03, np.float32),
                "net_gradient": np.full(120, 1e4, np.float32),
            }
        )
        out = clusterer.cluster(
            locs, radius_xy=0.3, min_locs=10, frame_analysis=True
        )
        # only the time-spread cluster survives
        assert len(np.unique(out["group"])) == 1
        assert out["x"].mean() == pytest.approx(10, abs=0.5)

    def test_3d_clustering(self):
        locs, centers = _clustered_locs()
        rng = np.random.default_rng(2)
        locs["z"] = rng.normal(0, 10, len(locs)).astype(np.float32)
        out = clusterer.cluster(
            locs, radius_xy=0.3, min_locs=10, frame_analysis=False,
            radius_z=0.6, pixelsize=130,
        )
        assert len(np.unique(out["group"])) == len(centers)
        assert "z" in out.columns


class TestSklearnWrappers:
    def test_dbscan(self):
        locs, centers = _clustered_locs()
        out = clusterer.dbscan(locs, radius=0.3, min_density=5)
        assert len(np.unique(out["group"])) == len(centers)

    def test_hdbscan(self):
        locs, centers = _clustered_locs()
        out = clusterer.hdbscan(
            locs, min_cluster_size=10, min_samples=10
        )
        assert len(np.unique(out["group"])) == len(centers)


class TestClusterCenters:
    def test_centers(self):
        locs, centers = _clustered_locs()
        out = clusterer.cluster(
            locs, radius_xy=0.3, min_locs=10, frame_analysis=False
        )
        cc = clusterer.find_cluster_centers(out)
        assert len(cc) == len(centers)
        for col in ("frame", "x", "y", "photons", "lpx", "lpy",
                    "n_locs", "n_events", "area", "convexhull",
                    "group"):
            assert col in cc.columns
        # every center near a true center
        for _, row in cc.iterrows():
            d = np.min(np.hypot(
                centers[:, 0] - row["x"], centers[:, 1] - row["y"]
            ))
            assert d < 0.1
        assert (cc["n_locs"] == 50).all()

    def test_cluster_areas(self):
        locs, _ = _clustered_locs()
        out = clusterer.cluster(
            locs, radius_xy=0.3, min_locs=10, frame_analysis=False
        )
        areas = clusterer.cluster_areas(
            out, INFO, progress=lambda i: None
        )
        assert "Area (LP^2)" in areas.columns
        assert (areas["Area (LP^2)"] > 0).all()


class TestResi:
    def test_resi_combines_channels(self):
        from picasso_tpu import postprocess

        locs1, _ = _clustered_locs(seed=10)
        locs2, _ = _clustered_locs(seed=11)
        centers, info = postprocess.resi(
            [locs1, locs2], [INFO, INFO], radius_xy=0.3, min_locs=10,
            apply_fa=False,
        )
        assert "resi_channel_id" in centers.columns
        assert set(centers["resi_channel_id"]) == {0, 1}
        assert info[-1]["Generated by"].endswith("RESI")

    def test_resi_requires_two_channels(self):
        from picasso_tpu import postprocess

        locs1, _ = _clustered_locs()
        with pytest.raises(ValueError):
            postprocess.resi([locs1], [INFO], radius_xy=0.3)


class TestClustererErrorsAndInfo:
    def test_3d_requires_pixelsize_and_radius_z(self):
        locs = _clustered_locs()[0]
        locs = locs.assign(z=np.float32(0.0))
        with pytest.raises(ValueError):
            clusterer.cluster(locs, 0.2, 10, False)

    def test_cluster_return_info(self):
        locs, true_centers = _clustered_locs()
        out, info = clusterer.cluster(
            locs, 0.2, 10, False, return_info=True
        )
        assert info["Number of clusters"] == len(true_centers)
        assert "Clustering radius (px)" in info
        assert 0 <= info["Fraction of rejected locs (%)"] <= 100

    def test_dbscan_return_info(self):
        locs, _ = _clustered_locs()
        out, info = clusterer.dbscan(
            locs, 0.3, 5, return_info=True
        )
        assert "Generated by" in info

    def test_hdbscan_return_info(self):
        locs, _ = _clustered_locs()
        out, info = clusterer.hdbscan(
            locs, 10, 5, return_info=True
        )
        assert "Generated by" in info

    def test_cluster_info_3d_radius_in_nm(self):
        locs, _ = _clustered_locs()
        rng = np.random.default_rng(0)
        locs = locs.assign(
            z=rng.normal(0, 10, len(locs)).astype(np.float32),
            lpz=np.float32(20.0),
        )
        out, info = clusterer.cluster(
            locs, 0.2, 10, False, radius_z=30.0, pixelsize=130,
            return_info=True,
        )
        assert "Clustering radius xy (nm)" in info
        assert info["Clustering radius xy (nm)"] == pytest.approx(
            0.2 * 130
        )


class TestAnisotropicDBSCAN:
    """radius_z anisotropy and min_locs filtering
    (picasso/clusterer.py:448, v0.10.1 changelog)."""

    def _locs_3d(self):
        rng = np.random.default_rng(11)
        # tight cluster in xy but spread in z, plus a sparse background
        n = 60
        cx = rng.normal(10, 0.05, n)
        cy = rng.normal(10, 0.05, n)
        cz = rng.normal(0, 150, n)  # nm, elongated along z
        bx = rng.uniform(0, 20, 30)
        by = rng.uniform(0, 20, 30)
        bz = rng.uniform(-500, 500, 30)
        return pd.DataFrame({
            "frame": np.zeros(n + 30, np.uint32),
            "x": np.concatenate([cx, bx]).astype(np.float32),
            "y": np.concatenate([cy, by]).astype(np.float32),
            "z": np.concatenate([cz, bz]).astype(np.float32),
        })

    def test_radius_z_recovers_elongated_cluster(self):
        locs = self._locs_3d()
        # isotropic with small radius splits the z-elongated cluster
        iso = clusterer.dbscan(
            locs, radius=0.3, min_density=5, pixelsize=130
        )
        aniso = clusterer.dbscan(
            locs, radius=0.3, min_density=5, pixelsize=130,
            radius_z=3.0,
        )
        assert len(aniso) >= len(iso)
        assert len(aniso) >= 50  # most of the cluster kept together
        assert aniso["group"].nunique() == 1

    def test_min_locs_drops_small_clusters(self):
        rng = np.random.default_rng(12)
        big = rng.normal(5, 0.05, (40, 2))
        small = rng.normal(15, 0.05, (4, 2))
        locs = pd.DataFrame({
            "frame": np.zeros(44, np.uint32),
            "x": np.concatenate([big[:, 0], small[:, 0]]).astype(
                np.float32
            ),
            "y": np.concatenate([big[:, 1], small[:, 1]]).astype(
                np.float32
            ),
        })
        out, info = clusterer.dbscan(
            locs, radius=0.3, min_density=3, min_locs=10,
            return_info=True,
        )
        assert out["group"].nunique() == 1
        assert len(out) == 40
        assert info["Min. localizations per cluster"] == 10
        assert info["Fraction of rejected locs (%)"] == pytest.approx(
            100 * 4 / 44
        )


class TestClusterCentersMinimalColumns:
    def test_imported_data_without_fit_columns(self):
        """ThunderSTORM-style imports lack sx/sy/photons/bg; centers
        must still compute (picasso/clusterer.py:803 tolerance)."""
        rng = np.random.default_rng(3)
        n = 120
        locs = pd.DataFrame({
            "frame": np.sort(rng.integers(0, 50, n)).astype(np.uint32),
            "x": np.concatenate([
                rng.normal(5, 0.05, n // 2), rng.normal(15, 0.05, n // 2)
            ]).astype(np.float32),
            "y": np.concatenate([
                rng.normal(5, 0.05, n // 2), rng.normal(15, 0.05, n // 2)
            ]).astype(np.float32),
            "group": np.repeat([0, 1], n // 2).astype(np.int32),
        })
        centers = clusterer.find_cluster_centers(locs, pixelsize=130)
        assert len(centers) == 2
        assert "x" in centers.columns and "lpx" in centers.columns
        for absent in ("photons", "sx", "sy", "bg"):
            assert absent not in centers.columns
        np.testing.assert_allclose(
            centers["ellipticity"], [1.0, 1.0]
        )

    def test_3d_centers_without_precision_columns(self):
        rng = np.random.default_rng(4)
        n = 60
        locs = pd.DataFrame({
            "frame": np.sort(rng.integers(0, 50, n)).astype(np.uint32),
            "x": rng.normal(5, 0.05, n).astype(np.float32),
            "y": rng.normal(5, 0.05, n).astype(np.float32),
            "z": rng.normal(100, 20, n).astype(np.float32),
            "group": np.zeros(n, np.int32),
        })
        centers = clusterer.find_cluster_centers(locs, pixelsize=130)
        assert len(centers) == 1
        assert centers["z"].iloc[0] == pytest.approx(
            locs["z"].mean(), abs=1.0
        )


class TestLabelSweepEquivalence:
    """The vectorized chain-root label pass must match the reference's
    sequential local-maxima sweep exactly."""

    @staticmethod
    def _sequential_labels(X, radius, min_locs):
        from scipy.spatial import cKDTree as KDTree

        n = len(X)
        tree = KDTree(X)
        counts = tree.query_ball_point(X, radius, return_length=True)
        max_nb = counts.astype(np.int64).copy()
        pairs = tree.query_pairs(radius, output_type="ndarray")
        if len(pairs):
            np.maximum.at(max_nb, pairs[:, 0], counts[pairs[:, 1]])
            np.maximum.at(max_nb, pairs[:, 1], counts[pairs[:, 0]])
        lm = (counts > min_locs) & (counts == max_nb)
        labels = -np.ones(n, np.int32)
        lm_idx = np.nonzero(lm)[0]
        if len(lm_idx):
            lm_neighbors = tree.query_ball_point(X[lm_idx], radius)
            for count, (i, nbrs) in enumerate(
                zip(lm_idx, lm_neighbors)
            ):
                label = labels[i]
                nbrs = np.asarray(nbrs)
                if label == -1:
                    labels[nbrs] = count
                else:
                    unassigned = nbrs[labels[nbrs] == -1]
                    if len(unassigned):
                        labels[unassigned] = label
        # post-filter like _cluster
        values, cluster_counts = np.unique(
            labels, return_counts=True
        )
        to_discard = values[cluster_counts < min_locs]
        labels[np.isin(labels, to_discard)] = -1
        return labels

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_sequential_sweep(self, seed):
        rng = np.random.default_rng(seed)
        # overlapping clusters + background so chains actually occur
        centers = rng.uniform(1, 19, (30, 2))
        pts = [
            centers[rng.integers(0, 30, 1500)]
            + rng.normal(0, 0.12, (1500, 2)),
            rng.uniform(0, 20, (300, 2)),  # sparse background
        ]
        X = np.vstack(pts).astype(np.float64)
        got = clusterer._cluster(X, 0.3, 8, None)
        exp = self._sequential_labels(X, 0.3, 8)
        np.testing.assert_array_equal(got, exp)


class TestNativeGridClusterer:
    """The C++ grid-hash clusterer core must label identically to the
    host KDTree path (2D and 3D), including min_locs discard."""

    @pytest.mark.parametrize("dims", [2, 3])
    def test_native_matches_host(self, monkeypatch, dims):
        from picasso_tpu import native

        if not native.AVAILABLE:
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(dims)
        centers = rng.uniform(2, 30, (40, dims))
        X = np.vstack([
            centers[rng.integers(0, 40, 2000)]
            + rng.normal(0, 0.08, (2000, dims)),
            rng.uniform(0, 32, (400, dims)),
        ]).astype(np.float32)
        got = clusterer._cluster(X, 0.25, 6, None)
        monkeypatch.setenv("PICASSO_TPU_CLUSTERER", "host")
        exp = clusterer._cluster(X, 0.25, 6, None)
        np.testing.assert_array_equal(got, exp)
        assert got.max() >= 0
