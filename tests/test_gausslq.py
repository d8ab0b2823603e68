"""LQ fitter: ground-truth recovery at the reference tolerances
(reference test_gausslq.py), Mortensen precision closed-form checks."""

from __future__ import annotations

import numpy as np
import pytest

from picasso_tpu import gausslq


class TestSingleSpot:
    def test_centered_clean_spot(self, synthetic_spot_factory):
        spot = synthetic_spot_factory()
        x, y, photons, bg, sx, sy = gausslq.fit_spot(spot)
        assert abs(x) < 1e-3
        assert abs(y) < 1e-3
        assert sx == pytest.approx(1.0, abs=1e-3)
        assert sy == pytest.approx(1.0, abs=1e-3)
        assert photons == pytest.approx(5000.0, rel=5e-3)
        assert bg == pytest.approx(10.0, rel=5e-3)

    def test_offcenter_elliptic(self, synthetic_spot_factory):
        spot = synthetic_spot_factory(
            x0=0.3, y0=-0.2, sx=1.3, sy=0.9, photons=3000, bg=50
        )
        x, y, photons, bg, sx, sy = gausslq.fit_spot(spot)
        assert x == pytest.approx(0.3, abs=0.05)
        assert y == pytest.approx(-0.2, abs=0.05)
        assert sx == pytest.approx(1.3, abs=0.05)
        assert sy == pytest.approx(0.9, abs=0.05)
        assert photons == pytest.approx(3000.0, rel=0.02)
        assert bg == pytest.approx(50.0, rel=0.05)


class TestBatch:
    def test_clean_recovery(self, synthetic_spots):
        spots, gt = synthetic_spots
        theta = gausslq.fit_spots(spots)
        assert theta.shape == (len(spots), 6)
        assert theta.dtype == np.float32
        assert np.all(np.isfinite(theta))
        np.testing.assert_allclose(theta[:, 0], gt.x.values, atol=0.05)
        np.testing.assert_allclose(theta[:, 1], gt.y.values, atol=0.05)
        np.testing.assert_allclose(
            theta[:, 2], gt.photons.values, rtol=0.02
        )
        np.testing.assert_allclose(theta[:, 3], gt.bg.values, rtol=0.10)
        np.testing.assert_allclose(theta[:, 4], gt.sx.values, atol=0.03)
        np.testing.assert_allclose(theta[:, 5], gt.sy.values, atol=0.03)

    def test_batch_matches_single(self, synthetic_spots):
        spots, _ = synthetic_spots
        theta_batch = gausslq.fit_spots(spots)
        for i in (0, 7, 31):
            single = gausslq.fit_spot(spots[i])
            np.testing.assert_allclose(
                theta_batch[i], single, atol=1e-4
            )

    def test_parallel_equals_serial(self, synthetic_spots):
        spots, _ = synthetic_spots
        serial = gausslq.fit_spots(spots)
        parallel = gausslq.fit_spots_parallel(spots)
        np.testing.assert_allclose(parallel, serial, rtol=1e-4, atol=1e-4)

    def test_gpufit_layout(self, synthetic_spots):
        spots, gt = synthetic_spots
        theta = gausslq.fit_spots_gpufit(spots)
        half = spots.shape[1] // 2
        np.testing.assert_allclose(
            theta[:, 1] - half, gt.x.values, atol=0.05
        )
        np.testing.assert_allclose(
            theta[:, 0], gt.photons.values, rtol=0.02
        )


class TestLocsFromFits:
    def test_columns_and_precision(self, synthetic_spots):
        import pandas as pd

        spots, gt = synthetic_spots
        theta = gausslq.fit_spots(spots)
        ids = pd.DataFrame(
            {
                "frame": np.arange(len(spots)),
                "x": np.full(len(spots), 10),
                "y": np.full(len(spots), 12),
                "net_gradient": np.full(len(spots), 1e4, np.float32),
            }
        )
        locs = gausslq.locs_from_fits(ids, theta, 7, em=False)
        for col in ("frame", "x", "y", "photons", "sx", "sy", "bg",
                    "lpx", "lpy", "ellipticity", "net_gradient"):
            assert col in locs.columns
        assert len(locs) == len(ids)
        assert (locs["lpx"] > 0).all()
        assert (locs["lpy"] > 0).all()


class TestMortensen:
    def test_em_doubles_variance(self):
        lp = gausslq.localization_precision(
            np.array([5000.0]), np.array([1.2]), np.array([1.1]),
            np.array([10.0]), em=False,
        )
        lp_em = gausslq.localization_precision(
            np.array([5000.0]), np.array([1.2]), np.array([1.1]),
            np.array([10.0]), em=True,
        )
        np.testing.assert_allclose(lp_em / lp, np.sqrt(2.0), rtol=1e-4)

    def test_closed_form(self):
        photons, s, s_orth, bg = 4000.0, 1.1, 1.3, 20.0
        lp = gausslq.localization_precision(
            photons, s, s_orth, bg, em=False
        )
        sa2 = s**2 + 1 / 12
        sa = np.sqrt(sa2)
        sa_orth = np.sqrt(s_orth**2 + 1 / 12)
        v = sa2 * (
            16 / 9 + (8 * np.pi * sa * sa_orth * bg) / photons
        ) / photons
        np.testing.assert_allclose(lp, np.sqrt(v), rtol=1e-6)


class TestAsyncAndFutures:
    def test_async_futures_collated(self, synthetic_spots):
        spots, _ = synthetic_spots
        serial = gausslq.fit_spots(spots)
        futures = gausslq.fit_spots_parallel(spots, asynch=True)
        assert all(f.done() for f in futures)
        collected = gausslq.fits_from_futures(futures)
        np.testing.assert_array_equal(collected, serial)

    def test_progress_callback_invoked(self, synthetic_spots):
        spots, _ = synthetic_spots
        calls = []
        gausslq.fit_spots(spots, progress_callback=calls.append)
        assert calls and max(calls) >= len(spots) - 1


class TestLocsFromFits:
    def _ids(self, n):
        import pandas as pd

        rng = np.random.default_rng(0)
        return pd.DataFrame({
            "frame": np.arange(n, dtype=np.uint32),
            "x": rng.integers(5, 25, n).astype(int),
            "y": rng.integers(5, 25, n).astype(int),
            "net_gradient": rng.uniform(
                1000, 9000, n
            ).astype(np.float32),
        })

    def _theta(self, n):
        rng = np.random.default_rng(1)
        theta = np.zeros((n, 6), np.float32)
        theta[:, 0] = rng.uniform(-0.4, 0.4, n)  # dx
        theta[:, 1] = rng.uniform(-0.4, 0.4, n)  # dy
        theta[:, 2] = rng.uniform(1000, 5000, n)  # photons
        theta[:, 3] = rng.uniform(5, 40, n)  # bg
        theta[:, 4] = rng.uniform(0.9, 1.4, n)  # sx
        theta[:, 5] = rng.uniform(0.9, 1.4, n)  # sy
        return theta

    def test_offsets_columns_lengths(self):
        ids = self._ids(64)
        theta = self._theta(64)
        locs = gausslq.locs_from_fits(ids, theta, 7, em=False)
        assert len(locs) == 64
        for col in ("frame", "x", "y", "photons", "sx", "sy", "bg",
                    "lpx", "lpy", "ellipticity", "net_gradient"):
            assert col in locs.columns
        # x = dx + identification x (frame-sorted)
        merged = locs.sort_values("frame")
        np.testing.assert_allclose(
            merged["x"].to_numpy(),
            theta[:, 0] + ids["x"].to_numpy(),
            rtol=1e-6,
        )
        assert (locs["lpx"] > 0).all()
        assert ((locs["ellipticity"] >= 0)
                & (locs["ellipticity"] < 1)).all()

    def test_em_doubles_precision_variance(self):
        ids = self._ids(32)
        theta = self._theta(32)
        a = gausslq.locs_from_fits(ids, theta, 7, em=False)
        b = gausslq.locs_from_fits(ids, theta, 7, em=True)
        np.testing.assert_allclose(
            (b["lpx"] / a["lpx"]) ** 2, 2.0, rtol=1e-5
        )

    def test_n_id_sorting(self):
        ids = self._ids(16)
        ids["n_id"] = np.arange(16)[::-1].astype(np.uint32)
        theta = self._theta(16)
        locs = gausslq.locs_from_fits(ids, theta, 7, em=False)
        assert (np.diff(locs["n_id"].to_numpy().astype(int))
                >= 0).all()

    def test_gpufit_locs_roundtrip(self):
        ids = self._ids(16)
        theta = self._theta(16)
        # gpufit layout: [photons, x+half, y+half, sx, sy, bg]
        gf = np.column_stack([
            theta[:, 2], theta[:, 0] + 3, theta[:, 1] + 3,
            theta[:, 4], theta[:, 5], theta[:, 3],
        ]).astype(np.float32)
        a = gausslq.locs_from_fits(ids, theta, 7, em=False)
        b = gausslq.locs_from_fits_gpufit(ids, gf, 7, em=False)
        np.testing.assert_allclose(
            a["x"].to_numpy(), b["x"].to_numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            a["lpx"].to_numpy(), b["lpx"].to_numpy(), rtol=1e-5
        )


class TestMortensenPrecision:
    def test_monotonic_in_photons_and_bg(self):
        photons = np.array([1000.0, 2000.0, 4000.0])
        lp = gausslq.localization_precision(
            photons, np.full(3, 1.0), np.full(3, 1.0),
            np.full(3, 10.0), em=False,
        )
        assert (np.diff(lp) < 0).all()
        bgs = np.array([5.0, 20.0, 80.0])
        lp2 = gausslq.localization_precision(
            np.full(3, 2000.0), np.full(3, 1.0), np.full(3, 1.0),
            bgs, em=False,
        )
        assert (np.diff(lp2) > 0).all()

    def test_pandas_series_input(self):
        import pandas as pd

        lp = gausslq.localization_precision(
            pd.Series([2000.0]), pd.Series([1.0]), pd.Series([1.0]),
            pd.Series([10.0]), em=False,
        )
        assert float(np.asarray(lp)[0]) > 0
