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
