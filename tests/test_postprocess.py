"""Postprocessing: picks, NeNA, linking, dark times, drift correction,
group stats, nearest neighbors, FRC."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import postprocess

INFO = [{"Frames": 1000, "Height": 64, "Width": 64, "Pixelsize": 130}]


def _make_locs(n=3000, seed=0, n_frames=1000, lp=0.1):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "frame": np.sort(
                rng.integers(0, n_frames, n)
            ).astype(np.uint32),
            "x": rng.uniform(2, 62, n).astype(np.float32),
            "y": rng.uniform(2, 62, n).astype(np.float32),
            "photons": rng.uniform(500, 5000, n).astype(np.float32),
            "sx": rng.uniform(0.8, 1.5, n).astype(np.float32),
            "sy": rng.uniform(0.8, 1.5, n).astype(np.float32),
            "bg": rng.uniform(0, 20, n).astype(np.float32),
            "lpx": np.full(n, lp, np.float32),
            "lpy": np.full(n, lp, np.float32),
        }
    )


class TestIndexBlocksAndPicks:
    def test_picked_circle(self):
        locs = _make_locs()
        picks = [(10.0, 10.0), (40.0, 40.0)]
        picked = postprocess.picked_locs(
            locs, INFO, picks, "Circle", pick_size=3.0
        )
        assert len(picked) == 2
        for i, (px, py) in enumerate(picks):
            p = picked[i]
            d2 = (p["x"] - px) ** 2 + (p["y"] - py) ** 2
            assert (d2 < 9.0).all()
            assert (p["group"] == i).all()
        # brute force count check
        d2 = (locs["x"] - 10) ** 2 + (locs["y"] - 10) ** 2
        assert len(picked[0]) == (d2 < 9.0).sum()

    def test_picked_square_and_polygon(self):
        locs = _make_locs()
        sq = postprocess.picked_locs(
            locs, INFO, [(32.0, 32.0)], "Square", pick_size=10.0
        )[0]
        assert (abs(sq["x"] - 32) < 5).all()
        # polygons must be closed (first point repeated at the end)
        poly = postprocess.picked_locs(
            locs,
            INFO,
            [[(20, 20), (44, 20), (44, 44), (20, 44), (20, 20)]],
            "Polygon",
        )[0]
        inside = (
            (locs["x"] > 20) & (locs["x"] < 44)
            & (locs["y"] > 20) & (locs["y"] < 44)
        )
        assert abs(len(poly) - inside.sum()) <= len(poly) // 50
        # an unclosed polygon is skipped entirely, like the reference
        # (picasso/postprocess.py:312-318)
        skipped = postprocess.picked_locs(
            locs,
            INFO,
            [[(20, 20), (44, 20), (44, 44), (20, 44)]],
            "Polygon",
        )
        assert skipped == []

    def test_pick_similar_finds_dense_regions(self):
        rng = np.random.default_rng(1)
        # two slightly different dense blobs + sparse background
        # (two reference picks -> nonzero std tolerance)
        blob1 = rng.normal((10, 10), 0.2, (200, 2))
        blob2 = rng.normal((30, 30), 0.22, (215, 2))
        bg = rng.uniform(0, 64, (100, 2))
        pts = np.vstack([blob1, blob2, bg])
        locs = pd.DataFrame(
            {
                "frame": np.zeros(len(pts), np.uint32),
                "x": pts[:, 0].astype(np.float32),
                "y": pts[:, 1].astype(np.float32),
                "lpx": np.full(len(pts), 0.1, np.float32),
                "lpy": np.full(len(pts), 0.1, np.float32),
                "photons": np.ones(len(pts), np.float32),
            }
        )
        picks = postprocess.pick_similar(
            locs, INFO, [(10.0, 10.0), (30.0, 30.0)], d=2.0,
            std_range=3.0,
        )
        found = np.array(picks)
        assert any(
            np.hypot(px - 30, py - 30) < 1.0 for px, py in found
        )
        assert any(
            np.hypot(px - 10, py - 10) < 1.0 for px, py in found
        )
        # the sparse background must not produce many picks
        assert len(found) < 10


class TestNena:
    def test_nena_recovers_precision(self):
        """Repeated localizations jittered by a known sigma must give
        NeNA ~ sigma."""
        rng = np.random.default_rng(2)
        n_sites = 200
        sigma = 0.12
        sites = rng.uniform(5, 59, (n_sites, 2))
        rows = []
        for f in range(60):
            jitter = rng.normal(0, sigma, (n_sites, 2))
            for s in range(n_sites):
                rows.append(
                    (f, sites[s, 0] + jitter[s, 0],
                     sites[s, 1] + jitter[s, 1])
                )
        arr = np.array(rows)
        locs = pd.DataFrame(
            {
                "frame": arr[:, 0].astype(np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "lpx": np.full(len(arr), sigma, np.float32),
                "lpy": np.full(len(arr), sigma, np.float32),
            }
        )
        result, s = postprocess.nena(locs, INFO)
        assert s == pytest.approx(sigma, rel=0.15)


class TestLink:
    def test_link_chains_events(self):
        """Three binding events with known durations."""
        rows = []
        # event A: frames 10-14 at (5, 5)
        for f in range(10, 15):
            rows.append((f, 5.0, 5.0))
        # event B: frames 20-22 at (5.01, 5.0) (same site, new event)
        for f in range(20, 23):
            rows.append((f, 5.01, 5.0))
        # event C: frames 10-11 at (20, 20)
        for f in range(10, 12):
            rows.append((f, 20.0, 20.0))
        arr = np.array(rows)
        locs = pd.DataFrame(
            {
                "frame": arr[:, 0].astype(np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "photons": np.full(len(arr), 1000, np.float32),
                "sx": np.full(len(arr), 1.0, np.float32),
                "sy": np.full(len(arr), 1.0, np.float32),
                "bg": np.full(len(arr), 10, np.float32),
                "lpx": np.full(len(arr), 0.05, np.float32),
                "lpy": np.full(len(arr), 0.05, np.float32),
            }
        )
        linked = postprocess.link(
            locs, INFO, r_max=0.1, max_dark_time=3
        )
        assert len(linked) == 3
        lens = sorted(linked["len"].tolist())
        assert lens == [2, 3, 5]
        # photons summed per event
        assert linked["photons"].max() == pytest.approx(5000)

    def test_link_empty(self):
        locs = _make_locs(0)
        linked = postprocess.link(locs, INFO)
        assert len(linked) == 0
        assert "len" in linked.columns

    def test_dark_times(self):
        linked = pd.DataFrame(
            {
                "frame": np.array([10, 20, 50], np.int64),
                "len": np.array([5, 3, 2], np.int64),
                "x": np.zeros(3, np.float32),
                "y": np.zeros(3, np.float32),
            }
        )
        dark = postprocess.dark_times(linked)
        # event 0 has no predecessor -> -1
        assert dark[0] == -1
        # event 1 starts at 20; event 0 ends at 14 -> dark 6
        assert dark[1] == 6
        # event 2 starts at 50; event 1 ends at 22 -> dark 28
        assert dark[2] == 28


class TestUndrift:
    def test_rcc_recovers_linear_drift(self):
        """Synthetic drifting dataset: RCC must recover the drift."""
        rng = np.random.default_rng(3)
        n_sites = 150
        n_frames = 1000
        sites = rng.uniform(5, 59, (n_sites, 2))
        drift_x = np.linspace(0, 2.0, n_frames)
        drift_y = np.linspace(0, -1.5, n_frames)
        rows = []
        for f in range(n_frames):
            on = rng.random(n_sites) < 0.12
            for s in np.nonzero(on)[0]:
                rows.append(
                    (
                        f,
                        sites[s, 0] + drift_x[f]
                        + rng.normal(0, 0.03),
                        sites[s, 1] + drift_y[f]
                        + rng.normal(0, 0.03),
                    )
                )
        arr = np.array(rows)
        locs = pd.DataFrame(
            {
                "frame": arr[:, 0].astype(np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "lpx": np.full(len(arr), 0.03, np.float32),
                "lpy": np.full(len(arr), 0.03, np.float32),
            }
        )
        drift, undrifted = postprocess.undrift(
            locs, INFO, segmentation=100, display=False
        )
        rec_x = drift["x"].to_numpy()
        rec_y = drift["y"].to_numpy()
        # compare drift shape (up to a constant offset)
        err_x = (rec_x - rec_x[0]) - (drift_x - drift_x[0])
        err_y = (rec_y - rec_y[0]) - (drift_y - drift_y[0])
        assert np.sqrt(np.mean(err_x**2)) < 0.1
        assert np.sqrt(np.mean(err_y**2)) < 0.1

    def test_undrift_from_picked(self):
        """Fiducial-style traces give exact drift recovery."""
        n_frames = 1000
        drift_x = 0.5 * np.sin(np.arange(n_frames) / 100)
        drift_y = np.linspace(0, 1, n_frames)
        picked = []
        for px, py in [(10, 10), (30, 40), (50, 20)]:
            picked.append(
                pd.DataFrame(
                    {
                        "frame": np.arange(n_frames, dtype=np.uint32),
                        "x": (px + drift_x).astype(np.float32),
                        "y": (py + drift_y).astype(np.float32),
                    }
                )
            )
        drift = postprocess.undrift_from_picked(picked, INFO)
        err = drift["x"].to_numpy() - (drift_x - drift_x.mean())
        assert np.abs(err).max() < 1e-4

    def test_apply_drift(self):
        locs = _make_locs(100)
        drift = pd.DataFrame(
            {
                "x": np.ones(1000, np.float64),
                "y": -np.ones(1000, np.float64),
            }
        )
        out = postprocess.apply_drift(locs, INFO, drift=drift)
        np.testing.assert_allclose(out["x"], locs["x"] - 1, rtol=1e-6)
        np.testing.assert_allclose(out["y"], locs["y"] + 1, rtol=1e-6)


class TestGroupStats:
    def test_groupprops(self):
        locs = _make_locs(1000)
        locs["group"] = np.arange(1000) % 10
        groups = postprocess.groupprops(locs)
        assert len(groups) == 10
        assert "x_mean" in groups.columns
        assert "photons_std" in groups.columns
        assert (groups["n_events"] == 100).all()
        g0 = locs[locs["group"] == 0]
        assert groups.iloc[0]["x_mean"] == pytest.approx(
            g0["x"].mean(), rel=1e-5
        )

    def test_nn_analysis(self):
        X = np.array([[0.0, 0], [1, 0], [5, 0]])
        nnd = postprocess.nn_analysis(X, X, 1)
        np.testing.assert_allclose(nnd[:, 0], [1, 1, 4])

    def test_distance_histogram(self):
        locs = pd.DataFrame(
            {
                "frame": np.zeros(3, np.uint32),
                "x": np.array([1.0, 1.5, 10.0], np.float32),
                "y": np.array([1.0, 1.0, 10.0], np.float32),
            }
        )
        dh = postprocess.distance_histogram(locs, INFO, 0.1, 1.0)
        assert dh.sum() == 1  # only the 0.5 px pair is below r_max
        assert dh[5] == 1


class TestFRC:
    def test_frc_returns_resolution(self):
        rng = np.random.default_rng(4)
        n_sites = 100
        sigma = 0.1
        sites = rng.uniform(10, 54, (n_sites, 2))
        rows = []
        for f in range(100):
            for s in range(n_sites):
                rows.append(
                    (
                        f,
                        sites[s, 0] + rng.normal(0, sigma),
                        sites[s, 1] + rng.normal(0, sigma),
                    )
                )
        arr = np.array(rows)
        locs = pd.DataFrame(
            {
                "frame": arr[:, 0].astype(np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "lpx": np.full(len(arr), sigma, np.float32),
                "lpy": np.full(len(arr), sigma, np.float32),
            }
        )
        result = postprocess.frc(
            locs, INFO, ((0, 0), (64, 64))
        )
        assert result["resolution"] is not None
        assert 10 < result["resolution"] < 500  # nm scale sanity


class TestPairCorrelationAndDensity:
    def test_pair_correlation_shape_and_finite(self):
        locs = _make_locs(1500)
        bins, pc = postprocess.pair_correlation(
            locs, INFO, bin_size=0.2, r_max=4.0
        )
        assert len(bins) == len(pc)
        assert np.isfinite(pc).all()
        assert (pc >= 0).all()

    def test_density_column_and_monotonic_radius(self):
        locs = _make_locs(1500)
        d1 = postprocess.compute_local_density(locs, INFO, radius=1.0)
        d2 = postprocess.compute_local_density(locs, INFO, radius=3.0)
        assert "density" in d1.columns
        assert (
            d2["density"].to_numpy() >= d1["density"].to_numpy()
        ).all()

    def test_dense_cluster_has_higher_density(self):
        rng = np.random.default_rng(1)
        sparse = _make_locs(500, seed=2)
        blob = sparse.copy().iloc[:200].reset_index(drop=True)
        blob["x"] = (30 + rng.normal(0, 0.2, 200)).astype(np.float32)
        blob["y"] = (30 + rng.normal(0, 0.2, 200)).astype(np.float32)
        locs = pd.concat([sparse, blob], ignore_index=True)
        out = postprocess.compute_local_density(locs, INFO, radius=1.0)
        dense = out["density"].to_numpy()[len(sparse):]
        rest = out["density"].to_numpy()[: len(sparse)]
        assert np.median(dense) > np.median(rest) * 5


class TestSegmentation:
    def test_segment_shapes(self):
        locs = _make_locs(2000)
        bounds, images = postprocess.segment(
            locs, INFO, segmentation=250
        )
        assert len(images) == 4
        assert len(bounds) == 5

    def test_single_segment_raises(self):
        locs = _make_locs(500)
        with pytest.raises(ValueError):
            postprocess.segment(locs, INFO, segmentation=1000)


class TestApplyDriftVariants:
    def test_ndarray_2d(self):
        locs = _make_locs(200, n_frames=10)
        drift = np.tile([[1.0, -2.0]], (10, 1))
        out = postprocess.apply_drift(locs, INFO, drift=drift)
        np.testing.assert_allclose(
            out["x"], locs["x"] - 1.0, atol=1e-6
        )
        np.testing.assert_allclose(
            out["y"], locs["y"] + 2.0, atol=1e-6
        )

    def test_dataframe_with_z(self):
        locs = _make_locs(100, n_frames=5)
        locs["z"] = np.float32(100.0)
        drift = pd.DataFrame(
            {"x": np.zeros(5), "y": np.zeros(5),
             "z": np.full(5, 10.0)}
        )
        out = postprocess.apply_drift(locs, INFO, drift=drift)
        np.testing.assert_allclose(out["z"], 90.0, atol=1e-5)

    def test_does_not_mutate_input(self):
        locs = _make_locs(100, n_frames=5)
        x_before = locs["x"].copy()
        drift = pd.DataFrame({"x": np.ones(5), "y": np.ones(5)})
        postprocess.apply_drift(locs, INFO, drift=drift)
        np.testing.assert_array_equal(locs["x"], x_before)


class TestAlignChannels:
    def test_known_shift_recovered(self):
        rng = np.random.default_rng(3)
        # structured image so RCC has signal: blobs
        sites = rng.uniform(10, 54, (80, 2))
        def channel(shift):
            rows = []
            for sx, sy in sites:
                for _ in range(25):
                    rows.append(
                        (sx + shift[0] + rng.normal(0, 0.05),
                         sy + shift[1] + rng.normal(0, 0.05))
                    )
            arr = np.array(rows)
            n = len(arr)
            return pd.DataFrame(
                {
                    "frame": np.zeros(n, np.uint32),
                    "x": arr[:, 0].astype(np.float32),
                    "y": arr[:, 1].astype(np.float32),
                    "photons": np.full(n, 1000, np.float32),
                    "sx": np.full(n, 1.0, np.float32),
                    "sy": np.full(n, 1.0, np.float32),
                    "bg": np.full(n, 5, np.float32),
                    "lpx": np.full(n, 0.05, np.float32),
                    "lpy": np.full(n, 0.05, np.float32),
                }
            )
        ch0 = channel((0.0, 0.0))
        ch1 = channel((1.5, -0.8))
        aligned, (sx_, sy_) = postprocess.align(
            [ch0, ch1], [INFO, INFO], display=False,
            return_shifts=True,
        )
        assert sx_[1] - sx_[0] == pytest.approx(1.5, abs=0.2)
        assert sy_[1] - sy_[0] == pytest.approx(-0.8, abs=0.2)
        # channels coincide after alignment
        assert abs(
            aligned[1]["x"].mean() - aligned[0]["x"].mean()
        ) < 0.2

    def test_no_shift_is_noop_within_tolerance(self):
        locs = _make_locs(3000, seed=5)
        aligned = postprocess.align(
            [locs, locs.copy()], [INFO, INFO], display=False
        )
        assert abs(
            aligned[1]["x"].mean() - locs["x"].mean()
        ) < 0.3


class TestClusterCombine:
    def test_combines_groups_to_single_locs(self):
        rng = np.random.default_rng(0)
        rows = []
        for g in range(5):
            cx, cy = rng.uniform(10, 54, 2)
            for k in range(20):
                rows.append((g, k, cx + rng.normal(0, 0.05),
                             cy + rng.normal(0, 0.05)))
        arr = np.array(rows)
        n = len(arr)
        locs = pd.DataFrame(
            {
                "group": arr[:, 0].astype(np.int32),
                "cluster": arr[:, 0].astype(np.int32),
                "frame": arr[:, 1].astype(np.uint32),
                "x": arr[:, 2].astype(np.float32),
                "y": arr[:, 3].astype(np.float32),
                "photons": np.full(n, 1000, np.float32),
                "sx": np.full(n, 1.0, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 5, np.float32),
                "lpx": np.full(n, 0.05, np.float32),
                "lpy": np.full(n, 0.05, np.float32),
            }
        )
        combined = postprocess.cluster_combine(locs)
        assert len(combined) == 5
        # combined x is the precision-weighted mean, close to the mean
        g0 = locs[locs["group"] == 0]
        assert combined.iloc[0]["x"] == pytest.approx(
            g0["x"].mean(), abs=0.05
        )


class TestNenaDetails:
    def test_nena_result_keys_and_s_positive(self):
        rng = np.random.default_rng(7)
        sites = rng.uniform(5, 59, (60, 2))
        rows = []
        for f in range(400):
            on = rng.random(60) < 0.4
            for s_ in np.nonzero(on)[0]:
                rows.append(
                    (f, sites[s_, 0] + rng.normal(0, 0.08),
                     sites[s_, 1] + rng.normal(0, 0.08))
                )
        arr = np.array(rows)
        n = len(arr)
        locs = pd.DataFrame(
            {
                "frame": arr[:, 0].astype(np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "photons": np.full(n, 1000, np.float32),
                "sx": np.full(n, 1.0, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 5, np.float32),
                "lpx": np.full(n, 0.08, np.float32),
                "lpy": np.full(n, 0.08, np.float32),
            }
        ).sort_values("frame")
        result, s = postprocess.nena(locs, INFO)
        assert s > 0
        # recovered precision within 50% of the true 0.08 px
        assert s == pytest.approx(0.08, rel=0.5)


class TestAlignFromPicked:
    def test_recovers_known_shifts_3d(self):
        rng = np.random.default_rng(5)
        # fiducial-like clusters at known sites
        sites = np.array([[10.0, 12.0], [30.0, 40.0], [50.0, 20.0]])
        n_per = 200
        base_x = np.concatenate(
            [rng.normal(sx, 0.05, n_per) for sx, _ in sites]
        )
        base_y = np.concatenate(
            [rng.normal(sy, 0.05, n_per) for _, sy in sites]
        )
        base_z = rng.normal(0, 10, 3 * n_per)

        def channel(dx, dy, dz):
            return pd.DataFrame({
                "frame": np.zeros(3 * n_per, np.uint32),
                "x": (base_x + dx).astype(np.float32),
                "y": (base_y + dy).astype(np.float32),
                "z": (base_z + dz).astype(np.float32),
            })

        true = [(0.0, 0.0, 0.0), (0.7, -0.4, 25.0), (-0.3, 0.9, -12.0)]
        all_locs = [channel(*t) for t in true]
        infos = [INFO] * 3
        aligned, shift = postprocess.align_from_picked(
            all_locs, infos,
            picks=[tuple(s) for s in sites],
            pick_shape="Circle", pick_size=3.0, return_shifts=True,
        )
        assert len(shift) == 3  # y, x AND z solved
        # after alignment all channels agree at each site
        for coord, idx in (("x", 1), ("y", 0), ("z", 2)):
            m0 = aligned[0][coord].mean()
            for ch in (1, 2):
                assert abs(
                    aligned[ch][coord].mean() - m0
                ) < 0.05 + (2.0 if coord == "z" else 0.0)


class TestPickSimilarDedup:
    def test_no_overlapping_accepted_picks(self):
        rng = np.random.default_rng(2)
        blob1 = rng.normal((10, 10), 0.2, (200, 2))
        blob2 = rng.normal((30, 30), 0.22, (215, 2))
        locs = pd.DataFrame({
            "frame": np.zeros(415, np.uint32),
            "x": np.concatenate([blob1[:, 0], blob2[:, 0]]).astype(
                np.float32
            ),
            "y": np.concatenate([blob1[:, 1], blob2[:, 1]]).astype(
                np.float32
            ),
        })
        d = 2.0
        picks = postprocess.pick_similar(
            locs, INFO, [(10.0, 10.0), (30.0, 30.0)], d,
            std_range=3.0,
        )
        # accepted picks must be at least one DIAMETER apart
        # (picasso/postprocess.py:529)
        arr = np.asarray(picks)
        for i in range(len(arr)):
            for j in range(i + 1, len(arr)):
                dist2 = np.sum((arr[i] - arr[j]) ** 2)
                assert dist2 > d**2
