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


class TestPickedLocsContract:
    """Behavioral contract of picked_locs mirrored from the reference
    test suite (reference tests/test_postprocess.py pick classes)."""

    def test_sorted_by_frame_and_unique_groups(self):
        locs = _make_locs().sample(frac=1.0, random_state=1)
        picks = [(10.0, 10.0), (40.0, 40.0), (20.0, 50.0)]
        picked = postprocess.picked_locs(
            locs, INFO, picks, "Circle", pick_size=4.0
        )
        gids = set()
        for p in picked:
            assert (np.diff(p["frame"].to_numpy()) >= 0).all()
            assert p["group"].nunique() <= 1
            gids.update(p["group"].unique().tolist())
        assert gids == {0, 1, 2}

    def test_add_group_false_omits_column(self):
        picked = postprocess.picked_locs(
            _make_locs(), INFO, [(10.0, 10.0)], "Circle",
            pick_size=4.0, add_group=False,
        )
        assert "group" not in picked[0].columns

    def test_empty_picks_returns_empty_list(self):
        assert postprocess.picked_locs(
            _make_locs(), INFO, [], "Circle", pick_size=4.0
        ) == []

    def test_invalid_shape_raises(self):
        with pytest.raises(AssertionError):
            postprocess.picked_locs(
                _make_locs(), INFO, [(1, 1)], "Hexagon", pick_size=1
            )

    def test_precomputed_index_blocks_match_internal(self):
        locs = _make_locs()
        blocks = postprocess.get_index_blocks(locs, INFO, 3.0)
        a = postprocess.picked_locs(
            locs, INFO, [(10.0, 10.0)], "Circle", pick_size=3.0,
            index_blocks=blocks,
        )[0]
        b = postprocess.picked_locs(
            locs, INFO, [(10.0, 10.0)], "Circle", pick_size=3.0
        )[0]
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )

    def test_rectangle_pick_returns_locs(self):
        locs = _make_locs()
        picked = postprocess.picked_locs(
            locs, INFO, [((10.0, 10.0), (20.0, 20.0))],
            "Rectangle", pick_size=6.0,
        )[0]
        assert len(picked) > 0

    def test_polygon_pick_size_ignored(self):
        locs = _make_locs()
        poly = [[(8, 8), (16, 8), (16, 16), (8, 16), (8, 8)]]
        a = postprocess.picked_locs(
            locs, INFO, poly, "Polygon", pick_size=None
        )[0]
        b = postprocess.picked_locs(
            locs, INFO, poly, "Polygon", pick_size=123.0
        )[0]
        assert len(a) == len(b)

    def test_remove_locs_in_picks_removes(self):
        locs = _make_locs()
        out = postprocess.remove_locs_in_picks(
            locs, INFO, picks=[(10.0, 10.0)], pick_shape="Circle",
            pick_size=6.0,
        )
        d2 = (out["x"] - 10) ** 2 + (out["y"] - 10) ** 2
        assert (d2 >= 9.0).all()
        assert len(out) < len(locs)


class TestRmsdAndHistograms:
    def test_rmsd_at_com_known_value(self):
        xy = np.array([[-1.0, 1.0], [0.0, 0.0]])  # x row, y row
        # two points at (-1, 0) and (1, 0): com (0,0), rmsd = 1
        assert postprocess.rmsd_at_com(xy) == pytest.approx(1.0)

    def test_rmsd_zero_for_identical_points(self):
        xy = np.ones((2, 5))
        assert postprocess.rmsd_at_com(xy) == pytest.approx(0.0)

    def test_distance_histogram_grows_with_r_max(self):
        locs = _make_locs(1000)
        h1 = postprocess.distance_histogram(locs, INFO, 0.1, 1.0)
        h2 = postprocess.distance_histogram(locs, INFO, 0.1, 4.0)
        assert h2.sum() > h1.sum() > 0

    def test_next_frame_histogram_nonneg_with_neighbors(self):
        locs = _make_locs(4000, n_frames=50)
        dh = postprocess.next_frame_neighbor_distance_histogram(locs)
        assert (np.asarray(dh) >= 0).all()
        assert np.asarray(dh).sum() > 0

    def test_pair_correlation_normalisation(self):
        """pair_correlation = distance_histogram normalized by the
        annulus area x density terms (reference test)."""
        locs = _make_locs(1500)
        bin_size, r_max = 0.2, 3.0
        dh = postprocess.distance_histogram(
            locs, INFO, bin_size, r_max
        )
        bins_lower, pc = postprocess.pair_correlation(
            locs, INFO, bin_size, r_max
        )
        # the reference starts bins_lower at bin_size ("otherwise
        # area will be 0", picasso/postprocess.py:1527), so
        # area_k = pi b^2 (2k + 3)
        area = (
            np.pi * bin_size**2 * (2 * np.arange(len(pc)) + 3)
        )
        ratio = np.where(dh > 0, pc / (dh / area), np.nan)
        finite = ratio[np.isfinite(ratio)]
        assert np.allclose(finite, finite[0])


class TestLinkAndDarkContract:
    def test_link_refit_not_implemented(self):
        with pytest.raises(NotImplementedError):
            postprocess.link(
                _make_locs(100), INFO, combine_mode="refit"
            )

    def test_dark_times_requires_link(self):
        with pytest.raises(AttributeError, match="link"):
            postprocess.compute_dark_times(_make_locs(100))

    def test_tight_radius_separates_all(self):
        locs = _make_locs(200)
        linked = postprocess.link(
            locs, INFO, r_max=1e-9, max_dark_time=0
        )
        # nothing merges at an infinitesimal radius
        assert len(linked) == len(locs)

    def test_len_within_movie_span(self):
        locs = _make_locs(2000, n_frames=100)
        linked = postprocess.link(
            locs, INFO, r_max=0.3, max_dark_time=2,
            remove_ambiguous_lengths=False,
        )
        assert (linked["len"] >= 1).all()
        assert (linked["len"] <= 100).all()


class TestKineticsAndProperties:
    def _picked(self):
        rng = np.random.default_rng(2)
        out = []
        for g, (cx, cy) in enumerate([(10, 10), (30, 30), (50, 20)]):
            n = 120
            out.append(pd.DataFrame({
                "frame": np.sort(
                    rng.choice(1000, n, replace=False)
                ).astype(np.uint32),
                "x": (cx + rng.normal(0, 0.05, n)).astype(np.float32),
                "y": (cy + rng.normal(0, 0.05, n)).astype(np.float32),
                "photons": rng.uniform(
                    500, 3000, n
                ).astype(np.float32),
                "sx": np.full(n, 1.1, np.float32),
                "sy": np.full(n, 1.1, np.float32),
                "bg": np.full(n, 10, np.float32),
                "lpx": np.full(n, 0.05, np.float32),
                "lpy": np.full(n, 0.05, np.float32),
                "group": np.full(n, g, np.int32),
            }))
        return out

    def test_pick_kinetics_per_pick_arrays(self):
        length, dark, no_locs, out_locs = postprocess.pick_kinetics(
            self._picked(), INFO
        )
        assert len(length) == len(dark) == len(no_locs) == 3
        assert (np.asarray(no_locs) > 0).all()
        assert len(out_locs) > 0

    def test_evaluate_picks_arrays(self):
        N, n_events, rmsd, rmsd_z, length, dark, new_locs = (
            postprocess.evaluate_picks(self._picked(), INFO)
        )
        assert (N == 120).all()
        assert np.isfinite(rmsd).all() and (rmsd > 0).all()
        assert np.isnan(rmsd_z).all()  # 2D picks

    def test_pick_properties_qpaint_inverse(self):
        props = postprocess.pick_properties(
            self._picked(), INFO, influx_rate=0.03
        )
        assert len(props) == 3
        np.testing.assert_allclose(
            props["qpaint_idx_cdf"], props["dark_cdf"] ** -1.0
        )

    def test_combine_locs_in_picks_one_per_pick(self):
        locs = pd.concat(self._picked(), ignore_index=True)
        combined = postprocess.combine_locs_in_picks(
            locs, INFO, picks=[(10, 10), (30, 30), (50, 20)],
            pick_shape="Circle", pick_size=1.0,
        )
        assert len(combined) == 3
        assert set(combined["group"]) == {0, 1, 2}


class TestSegmentationAndFiducials:
    def test_n_segments_rounds(self):
        assert postprocess.n_segments(INFO, 300) == 3
        assert postprocess.n_segments(INFO, 400) == 2

    def test_undrift_from_fiducials_with_user_picks(self):
        rng = np.random.default_rng(3)
        n_frames = 200
        frame = np.arange(n_frames, dtype=np.uint32)
        drift_x = 0.004 * frame
        fid = pd.DataFrame({
            "frame": frame,
            "x": (8 + drift_x + rng.normal(0, 0.005, n_frames)
                  ).astype(np.float32),
            "y": np.full(n_frames, 8, np.float32),
            "photons": np.full(n_frames, 5000, np.float32),
            "sx": np.full(n_frames, 1.0, np.float32),
            "sy": np.full(n_frames, 1.0, np.float32),
            "bg": np.full(n_frames, 10, np.float32),
            "lpx": np.full(n_frames, 0.01, np.float32),
            "lpy": np.full(n_frames, 0.01, np.float32),
        })
        info = [{"Frames": n_frames, "Height": 16, "Width": 16,
                 "Pixelsize": 130}]
        out, new_info, drift = postprocess.undrift_from_fiducials(
            fid, info, picks=[(8.5, 8.0)], pick_size=1.5
        )
        got = drift["x"].to_numpy()
        expect = drift_x - drift_x.mean()
        assert np.abs((got - got.mean()) - expect).max() < 0.02

    def test_fiducial_picks_without_size_raises(self):
        with pytest.raises(ValueError):
            postprocess.undrift_from_fiducials(
                _make_locs(100), INFO, picks=[(8.0, 8.0)]
            )


class TestApplyDriftValidation:
    def test_wrong_shape_raises(self):
        with pytest.raises((ValueError, IndexError, KeyError)):
            postprocess.apply_drift(
                _make_locs(100), INFO, drift=np.zeros((3, 7))
            )

    def test_missing_columns_raises(self):
        bad = pd.DataFrame({"a": np.zeros(1000)})
        with pytest.raises((ValueError, KeyError)):
            postprocess.apply_drift(_make_locs(100), INFO, drift=bad)


class TestAlignContract:
    def test_apply_shifts_false_leaves_locs(self):
        a = _make_locs(2000, seed=5)
        b = a.copy()
        b["x"] += 1.0
        xa, xb = a["x"].to_numpy().copy(), b["x"].to_numpy().copy()
        out, (sx, sy) = postprocess.align(
            [a, b], [INFO, INFO], apply_shifts=False,
            return_shifts=True,
        )
        np.testing.assert_array_equal(a["x"].to_numpy(), xa)
        np.testing.assert_array_equal(b["x"].to_numpy(), xb)
        # but the shift was detected
        assert abs(abs(sx[1] - sx[0]) - 1.0) < 0.3

    def test_align_rcc_converges(self):
        a = _make_locs(3000, seed=6)
        b = a.copy()
        b["x"] += 0.8
        b["y"] -= 0.6
        aligned = postprocess.align_rcc(
            [a.copy(), b], [INFO, INFO]
        )
        dx = np.mean(
            aligned[1]["x"].to_numpy() - a["x"].to_numpy()
        )
        assert abs(dx) < 0.2


class TestClusterCombineDist:
    def _clustered(self, z=False):
        """One pick (group 0) with three subclusters at known
        separations — cluster_combine needs group AND cluster
        columns."""
        rng = np.random.default_rng(7)
        rows = []
        for c, (cx, cy) in enumerate([(10, 10), (11, 10), (30, 40)]):
            n = 40
            d = {
                "frame": np.sort(
                    rng.integers(0, 500, n)
                ).astype(np.uint32),
                "x": (cx + rng.normal(0, 0.03, n)).astype(np.float32),
                "y": (cy + rng.normal(0, 0.03, n)).astype(np.float32),
                "photons": rng.uniform(500, 2000, n).astype(np.float32),
                "sx": np.full(n, 1.0, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 5, np.float32),
                "lpx": np.full(n, 0.04, np.float32),
                "lpy": np.full(n, 0.04, np.float32),
                "group": np.zeros(n, np.int32),
                "cluster": np.full(n, c, np.int32),
            }
            if z:
                d["z"] = (100.0 * c + rng.normal(0, 5, n)).astype(
                    np.float32
                )
            rows.append(pd.DataFrame(d))
        return pd.concat(rows, ignore_index=True)

    def test_combine_one_row_per_cluster_and_nn_dist(self):
        # the reference applies cluster_combine_dist to the COMBINED
        # output (picasso/postprocess.py:2291 reads mean_frame/lpx/n)
        combined = postprocess.cluster_combine(self._clustered())
        out = postprocess.cluster_combine_dist(combined)
        assert len(out) == 3
        d = out.sort_values("cluster")["min_dist"].to_numpy()
        # clusters 0 and 1 are 1 px apart; cluster 2 is far
        assert d[0] == pytest.approx(1.0, abs=0.1)
        assert d[1] == pytest.approx(1.0, abs=0.1)
        assert d[2] > 20
        assert "mind_dist_xy" not in out.columns  # 2D

    def test_nn_dist_3d_finite(self):
        combined = postprocess.cluster_combine(
            self._clustered(z=True)
        )
        out = postprocess.cluster_combine_dist(
            combined, pixelsize=130
        )
        assert np.isfinite(out["min_dist"]).all()
        # 3D adds the xy distance under the reference's column name
        assert np.isfinite(out["mind_dist_xy"]).all()
        assert (
            out["mind_dist_xy"].to_numpy()
            <= out["min_dist"].to_numpy() * (1 + 1e-6)
        ).any()
        assert "lpz" in out.columns


class TestFret:
    def test_keys_and_disjoint_frames_no_events(self):
        don = _make_locs(50, seed=8, n_frames=100)
        don["frame"] = (don["frame"] % 50).astype(np.uint32)
        acc = _make_locs(50, seed=9, n_frames=100)
        acc["frame"] = (50 + acc["frame"] % 50).astype(np.uint32)
        fret_dict, fret_locs = postprocess.calculate_fret(acc, don)
        assert "fret_events" in fret_dict
        assert len(fret_locs) == 0

    def test_fret_efficiency_in_range(self):
        rng = np.random.default_rng(10)
        frames = np.arange(100, dtype=np.uint32)
        don = pd.DataFrame({
            "frame": frames,
            "x": np.full(100, 5.0, np.float32),
            "y": np.full(100, 5.0, np.float32),
            "photons": rng.uniform(1000, 2000, 100).astype(np.float32),
            "bg": np.full(100, 10, np.float32),
            "sx": np.full(100, 1.0, np.float32),
            "sy": np.full(100, 1.0, np.float32),
            "lpx": np.full(100, 0.05, np.float32),
            "lpy": np.full(100, 0.05, np.float32),
        })
        acc = don.copy()
        acc["photons"] = rng.uniform(
            500, 1500, 100
        ).astype(np.float32)
        fret_dict, fret_locs = postprocess.calculate_fret(acc, don)
        eff = np.asarray(fret_dict["fret_events"])
        assert ((eff >= 0) & (eff <= 1)).all()


class TestNNAnalysisContract:
    def test_inter_set_shape(self):
        rng = np.random.default_rng(11)
        X1 = rng.uniform(0, 10, (50, 2))
        X2 = rng.uniform(0, 10, (80, 2))
        nn = postprocess.nn_analysis(X1, X2, 3)
        assert nn.shape == (50, 3)

    def test_self_excludes_zero_distance(self):
        rng = np.random.default_rng(12)
        X = rng.uniform(0, 10, (60, 2))
        nn = postprocess.nn_analysis(X, X, 1)
        assert (nn > 0).all()

    def test_dimension_mismatch_raises(self):
        with pytest.raises(ValueError):
            postprocess.nn_analysis(
                np.zeros((5, 2)), np.zeros((5, 3)), 1
            )


class TestResiContract:
    def test_requires_two_channels(self):
        with pytest.raises(ValueError):
            postprocess.resi([_make_locs(100)], [INFO], 0.1)

    def test_channel_list_length_validated(self):
        with pytest.raises(ValueError):
            postprocess.resi(
                [_make_locs(100), _make_locs(100, seed=1)],
                [INFO, INFO],
                radius_xy=[0.1, 0.1, 0.1],
            )
