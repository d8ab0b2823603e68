"""Simulator: kinetics statistics, photon conservation, and the
closed-loop simulate -> localize -> recover test."""

from __future__ import annotations

import numpy as np
import pytest

from picasso_tpu import simulate


class TestPaintgen:
    def test_kinetics_statistics(self):
        np.random.seed(0)
        photons, trace, sk = simulate.paintgen(
            meandark=5000, meanbright=1000, frames=2000, time=100,
            photonrate=50, photonratestd=0, photonbudget=1e9,
        )
        assert len(photons) == 2000
        assert (photons >= 0).all()
        on_events, n_bright, mean_dark, mean_bright = sk
        assert on_events > 0
        # simulated kinetics within a factor of the requested means
        assert 0.3 * 5000 < mean_dark < 3 * 5000
        assert 0.3 * 1000 < mean_bright < 3 * 1000

    def test_photon_budget_respected(self):
        np.random.seed(1)
        photons, _, _ = simulate.paintgen(
            meandark=100, meanbright=50000, frames=500, time=100,
            photonrate=100, photonratestd=0, photonbudget=5000,
        )
        # no single event may exceed the budget: since bright times are
        # huge, the whole trace is one event capped at ~budget
        assert photons.sum() <= 5000 * 3


class TestStructures:
    def test_define_structure(self):
        s = simulate.defineStructure(
            np.array([0.0, 20, 40]), np.array([0.0, 0, 0]),
            np.array([1, 1, 1]), np.array([0, 0, 0]), pixelsize=130,
        )
        assert s.shape == (4, 3)
        assert s[0].mean() == pytest.approx(0, abs=1e-9)  # centered

    def test_generate_positions_grid(self):
        pos = simulate.generatePositions(9, 64, 5, 0)
        assert pos.shape == (9, 2)
        assert pos.min() >= 5
        assert pos.max() <= 59

    def test_incorporate_structure(self):
        np.random.seed(2)
        s = np.zeros((4, 1000))
        thinned = simulate.incorporateStructure(s, 0.5)
        assert 400 < thinned.shape[1] < 600

    def test_prepare_structures(self):
        np.random.seed(3)
        s = simulate.defineStructure(
            np.array([0.0, 20]), np.array([0.0, 0]),
            np.array([1, 1]), np.array([0, 0]), pixelsize=130,
        )
        pos = simulate.generatePositions(4, 64, 5, 0)
        out = simulate.prepareStructures(s, pos, 0, 4, 1.0, 0)
        assert out.shape == (5, 8)
        assert set(out[3]) == {0, 1, 2, 3}


class TestClosedLoop:
    def test_simulate_then_localize_recovers_sites(self):
        """End-to-end: simulate a movie, run the full localization
        pipeline, and verify the fitted positions cluster at the
        simulated binding sites (SURVEY.md §7 step 9)."""
        from scipy.spatial import cKDTree

        from picasso_tpu import localize

        movie, sites, info = simulate.simulate_movie(
            n_sites=16, imagesize=32, frames=400, taud=3000,
            photonrate=60, seed=7,
        )
        assert movie.dtype == np.uint16
        cam = {"Baseline": 0, "Sensitivity": 1, "Gain": 1,
               "Pixelsize": 130}
        locs = localize.localize(
            movie,
            cam,
            {"Min. Net Gradient": 3000, "Box Size": 7},
            movie_info=[info],
            fitting_method="gaussmle",
            return_info=False,
        )
        assert len(locs) > 50
        # simulate_movie returns sites already in movie coordinates
        tree = cKDTree(sites)
        d, _ = tree.query(np.column_stack([locs["x"], locs["y"]]))
        # majority of locs within 1 px of a site
        assert np.median(d) < 1.0


class TestNoiseAndClipping:
    def test_noisy_clips_negative(self):
        np.random.seed(0)
        img = np.zeros((16, 16))
        out = simulate.noisy(img, mu=-100.0, sigma=1.0)
        assert (out >= 0).all()

    def test_noisy_p_mean_approx(self):
        np.random.seed(1)
        img = np.zeros((64, 64))
        out = simulate.noisy_p(img, mu=20.0)
        assert out.mean() == pytest.approx(20.0, rel=0.1)

    def test_check_type_clamps_uint16(self):
        movie = np.array([[70000.0, 10.0]])
        out = simulate.check_type(movie)
        assert out.dtype == np.dtype("<u2")
        assert out[0, 0] == 2**16 - 1
        assert out[0, 1] == 10


class TestZPSF:
    def test_widths_positive_on_real_calibration(self):
        from tests.conftest import CALIB_3D

        z = np.linspace(-400, 400, 41)
        wx, wy = simulate.calculate_zpsf(
            z, CALIB_3D["X Coefficients"], CALIB_3D["Y Coefficients"]
        )
        assert (np.asarray(wx) > 0).all()
        assert (np.asarray(wy) > 0).all()

    def test_astigmatism_sign_flips_across_focus(self):
        from tests.conftest import CALIB_3D

        wx_m, wy_m = simulate.calculate_zpsf(
            -300.0, CALIB_3D["X Coefficients"],
            CALIB_3D["Y Coefficients"],
        )
        wx_p, wy_p = simulate.calculate_zpsf(
            300.0, CALIB_3D["X Coefficients"],
            CALIB_3D["Y Coefficients"],
        )
        assert (wx_m - wy_m) * (wx_p - wy_p) < 0


class TestStructureHelpers:
    def test_define_structure_centers_when_mean_true(self):
        s = simulate.defineStructure(
            [0.0, 130.0], [0.0, 0.0], [1, 1], [0, 0], 130.0,
            mean=True,
        )
        assert s[0].mean() == pytest.approx(0.0, abs=1e-12)
        # nm -> px conversion
        assert s[0, 1] - s[0, 0] == pytest.approx(1.0)

    def test_define_structure_no_center(self):
        s = simulate.defineStructure(
            [0.0, 130.0], [0.0, 0.0], [1, 1], [0, 0], 130.0,
            mean=False,
        )
        assert s[0, 0] == 0.0

    def test_rotate_preserves_pairwise_distances(self):
        np.random.seed(2)
        s = simulate.defineStructure(
            [0.0, 100.0, 0.0], [0.0, 0.0, 100.0], [1, 1, 1],
            [0, 0, 0], 130.0,
        )
        r = simulate.rotateStructure(s)
        def pdist(a):
            d = a[:2].T
            return np.linalg.norm(d[:, None] - d[None, :], axis=2)
        np.testing.assert_allclose(pdist(s), pdist(r), atol=1e-9)

    def test_rotate_preserves_exchange_and_3d_rows(self):
        np.random.seed(3)
        s = simulate.defineStructure(
            [0.0, 100.0], [0.0, 0.0], [1, 2], [5, 6], 130.0
        )
        r = simulate.rotateStructure(s)
        np.testing.assert_array_equal(r[2], s[2])
        np.testing.assert_array_equal(r[3], s[3])

    def test_incorporation_extremes(self):
        s = simulate.defineStructure(
            [0.0, 100.0, 200.0], [0.0, 0.0, 0.0], [1, 1, 1],
            [0, 0, 0], 130.0,
        )
        assert simulate.incorporateStructure(s, 1.0).shape[1] == 3
        assert simulate.incorporateStructure(s, 0.0).shape[1] == 0

    def test_generate_positions_random_in_range(self):
        np.random.seed(4)
        pos = simulate.generatePositions(50, 64, 5, 1)
        assert pos.shape == (50, 2)
        assert (pos >= 5).all() and (pos <= 59).all()


class TestPaintgenDetails:
    def test_zero_photonrate_gives_dark_trace(self):
        np.random.seed(5)
        photonsinframe, timetrace, kin = simulate.paintgen(
            100, 5, 50, 100, 0.0, 0.0, 1e6
        )
        assert np.sum(photonsinframe) == 0

    def test_kinetics_statistics_match_inputs(self):
        np.random.seed(6)
        meandark, meanbright = 400.0, 80.0
        photonsinframe, timetrace, kin = simulate.paintgen(
            meandark, meanbright, 20000, 100, 3.0, 0.0, 1e12
        )
        n_events, n_on_frames, sim_dark, sim_bright = kin
        assert n_events > 0
        assert sim_dark == pytest.approx(meandark, rel=0.4)
        assert sim_bright == pytest.approx(meanbright, rel=0.4)


class TestNoiseHelpers:
    def test_check_type_clamps_uint16(self):
        movie = np.array([[70000.0, 10.0]])
        out = simulate.check_type(movie)
        assert out.dtype == np.dtype("u2")
        assert out[0, 0] == 65535
        assert out[0, 1] == 10

    def test_noisy_clips_negative(self):
        np.random.seed(0)
        img = np.zeros((16, 16))
        out = simulate.noisy(img, mu=-100.0, sigma=1.0)
        assert (out >= 0).all()

    def test_noisy_p_poisson_mean(self):
        np.random.seed(1)
        img = np.full((64, 64), 7.0)
        out = simulate.noisy_p(img, mu=20.0)
        assert out.mean() == pytest.approx(27.0, rel=0.05)


class TestStructureHelpers:
    def test_define_structure_centers_when_mean_true(self):
        s = simulate.defineStructure(
            [0.0, 10.0], [0.0, 0.0], [1, 1], [0, 0], 130.0,
            mean=True,
        )
        assert s[0].mean() == pytest.approx(0.0)

    def test_define_structure_no_center_when_mean_false(self):
        s = simulate.defineStructure(
            [0.0, 10.0], [0.0, 0.0], [1, 1], [0, 0], 130.0,
            mean=False,
        )
        assert s[0].mean() != pytest.approx(0.0)

    def test_pixelsize_conversion(self):
        s = simulate.defineStructure(
            [130.0], [260.0], [1], [0], 130.0, mean=False
        )
        assert s[0, 0] == pytest.approx(1.0)
        assert s[1, 0] == pytest.approx(2.0)

    def test_grid_positions(self):
        pos = simulate.generatePositions(9, 32, 4, arrangement=0)
        assert pos.shape == (9, 2)
        assert pos.min() >= 4 and pos.max() <= 28
        # grid: 3 unique x values
        assert len(np.unique(pos[:, 0])) == 3

    def test_random_positions_in_range(self):
        np.random.seed(2)
        pos = simulate.generatePositions(50, 32, 4, arrangement=1)
        assert pos.shape == (50, 2)
        assert pos.min() >= 4 and pos.max() <= 28

    def test_rotate_preserves_pairwise_distances(self):
        np.random.seed(3)
        s = simulate.defineStructure(
            [0.0, 10.0, 5.0], [0.0, 0.0, 8.0], [1, 1, 2],
            [0, 0, 0], 130.0,
        )
        r = simulate.rotateStructure(s)
        d0 = np.hypot(s[0, 0] - s[0, 1], s[1, 0] - s[1, 1])
        d1 = np.hypot(r[0, 0] - r[0, 1], r[1, 0] - r[1, 1])
        assert d1 == pytest.approx(d0, rel=1e-6)
        # exchange + 3d rows preserved
        np.testing.assert_array_equal(r[2], s[2])
        np.testing.assert_array_equal(r[3], s[3])

    def test_incorporation_extremes(self):
        s = simulate.defineStructure(
            [0.0, 10.0], [0.0, 0.0], [1, 1], [0, 0], 130.0
        )
        full = simulate.incorporateStructure(s, 1.0)
        assert full.shape[1] == 2
        np.random.seed(4)
        empty = simulate.incorporateStructure(s, 0.0)
        assert empty.shape[1] == 0

    def test_random_exchange_preserves_geometry(self):
        np.random.seed(5)
        s = simulate.defineStructure(
            [0.0, 10.0], [0.0, 5.0], [1, 2], [0, 0], 130.0
        )
        out = simulate.randomExchange(s)
        np.testing.assert_array_equal(out[0], s[0])
        np.testing.assert_array_equal(out[1], s[1])
        np.testing.assert_array_equal(out[3], s[3])


class TestDistPhotons:
    def test_returns_triple_with_per_site_traces(self):
        np.random.seed(6)
        photondist, spotkinetics, timetraces = simulate.distphotons(
            structures=np.array([[0.0, 1.0], [0.0, 0.0],
                                 [1, 1], [0, 0]]),
            itime=300,
            frames=10,
            taud=1000,
            taub=500,
            photonrate=50.0,
            photonratestd=5.0,
            photonbudget=1e9,
        )
        assert photondist.shape == (2, 10)
        assert (photondist >= 0).all()
        assert len(spotkinetics) == len(timetraces) == 2
