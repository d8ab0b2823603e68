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
        # the simulator's movie is vertically flipped relative to site
        # coordinates (reference simulate.py:189 flipud); recovered
        # y ~ H - y_site
        flipped_sites = np.column_stack(
            [sites[:, 0], 32 - sites[:, 1]]
        )
        tree = cKDTree(flipped_sites)
        d, _ = tree.query(np.column_stack([locs["x"], locs["y"]]))
        # majority of locs within 1 px of a site
        assert np.median(d) < 1.0
