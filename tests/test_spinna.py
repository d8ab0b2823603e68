"""SPINNA: structure round trips, simulation statistics, search-space
generation, and stoichiometry recovery on synthetic mixtures."""

from __future__ import annotations

import numpy as np
import pytest

from picasso_tpu import spinna


def _dimer(dist=20.0):
    s = spinna.Structure("dimer")
    s.define_coordinates(
        "A", [-dist / 2, dist / 2], [0.0, 0.0], [0.0, 0.0]
    )
    return s


def _monomer():
    s = spinna.Structure("monomer")
    s.define_coordinates("A", [0.0], [0.0], [0.0])
    return s


class TestStructure:
    def test_counts_and_nn(self):
        d = _dimer()
        assert d.get_all_targets_count() == 2
        assert d.get_ind_target_count(["A", "B"]) == [2, 0]
        assert d.get_max_nn("A", "A") == 1
        assert d.get_max_nn("A", "B") == 0

    def test_yaml_roundtrip(self, tmp_path):
        d = _dimer()
        path = str(tmp_path / "structs.yaml")
        d.save(path)
        loaded, targets = spinna.load_structures(path)
        assert len(loaded) == 1
        assert loaded[0].title == "dimer"
        assert targets == ["A"]
        np.testing.assert_allclose(
            loaded[0].x["A"], [-10.0, 10.0]
        )


class TestSearchSpace:
    def test_generate_N_structures(self):
        counts = spinna.generate_N_structures(
            [_monomer(), _dimer()], {"A": 1000}, granularity=11
        )
        assert set(counts.keys()) == {"monomer", "dimer"}
        n_mono = np.asarray(counts["monomer"])
        n_dim = np.asarray(counts["dimer"])
        # every combination conserves the total target count
        np.testing.assert_allclose(
            n_mono + 2 * n_dim, 1000, atol=1.0
        )
        assert len(n_mono) == 11

    def test_unique_solution(self):
        counts = spinna.generate_N_structures(
            [_dimer()], {"A": 500}, granularity=5
        )
        assert counts["dimer"][0] == 250


class TestSimulator:
    def test_csr_counts_and_roi(self):
        np.random.seed(0)
        sim = spinna.StructureSimulator(
            _dimer(), 500, le=1.0, label_unc=0.0,
            width=2000.0, height=1000.0,
        ).run()
        pos = sim.pos_obs["A"]
        assert pos.shape == (1000, 2)
        assert pos[:, 0].min() > -25 and pos[:, 0].max() < 2025
        assert pos[:, 1].min() > -25 and pos[:, 1].max() < 1025

    def test_labeling_efficiency(self):
        np.random.seed(1)
        sim = spinna.StructureSimulator(
            _monomer(), 2000, le=0.5, label_unc=0.0,
            width=5000.0, height=5000.0,
        ).run()
        assert len(sim.pos_obs["A"]) == 1000

    def test_dimer_distance_preserved(self):
        np.random.seed(2)
        sim = spinna.StructureSimulator(
            _dimer(20.0), 300, le=1.0, label_unc=0.0,
            width=50000.0, height=50000.0,
        ).run()
        pos = sim.pos_obs["A"]
        # LE thinning shuffles the order; check via nearest neighbors:
        # in a huge ROI every molecule's NN is its dimer partner
        d = spinna.get_NN_dist(pos, pos, 1)[:, 0]
        assert np.median(np.abs(d - 20.0)) < 0.5

    def test_mask_placement(self):
        np.random.seed(3)
        mask = np.zeros((10, 10))
        mask[2:4, 5:8] = 1.0
        sim = spinna.StructureSimulator(
            _monomer(), 400, le=1.0, label_unc=0.0,
            mask=mask, mask_info={"Binsize (nm)": 100.0},
        ).run()
        pos = sim.pos_obs["A"]
        # all centers within the masked bins
        assert (pos[:, 0] >= 500).all() and (pos[:, 0] <= 800).all()
        assert (pos[:, 1] >= 200).all() and (pos[:, 1] <= 400).all()


class TestFit:
    @pytest.fixture(scope="class")
    def ground_truth(self):
        """70% dimers / 30% monomers (by targets)."""
        np.random.seed(10)
        mixer = spinna.StructureMixer(
            [_monomer(), _dimer(20.0)],
            label_unc={"ALL": 3.0},
            le={"ALL": 1.0},
            width=20000.0,
            height=20000.0,
        )
        # 300 monomers + 350 dimers -> 1000 targets, 70% in dimers
        gt = mixer.run_simulation([300, 350])
        return mixer, gt

    def test_nnd_score_self_zero(self, ground_truth):
        mixer, gt = ground_truth
        d = spinna.get_NN_dist_experimental(gt, mixer)
        assert spinna.NND_score(d, d) == 0.0

    @pytest.mark.slow
    def test_recovers_stoichiometry(self, ground_truth):
        np.random.seed(11)
        mixer, gt = ground_truth
        spin = spinna.SPINNA(mixer, gt, N_sim=2)
        N_structures = spinna.generate_N_structures(
            mixer.structures, {"A": 1000}, granularity=21
        )
        props, score = spin.fit_stoichiometry(
            N_structures, fitting_mode="brute-force"
        )
        # true proportions: 30% monomer targets, 70% dimer targets
        assert props[0] == pytest.approx(30, abs=10)
        assert props[1] == pytest.approx(70, abs=10)
        assert score < 0.2

    @pytest.mark.slow
    def test_coarse_to_fine_matches_brute(self, ground_truth):
        np.random.seed(12)
        mixer, gt = ground_truth
        spin = spinna.SPINNA(mixer, gt, N_sim=1)
        N_structures = spinna.generate_N_structures(
            mixer.structures, {"A": 1000}, granularity=21
        )
        props, score = spin.fit_stoichiometry(
            N_structures, fitting_mode="coarse-to-fine"
        )
        assert props[1] == pytest.approx(70, abs=15)

    @pytest.mark.slow
    def test_bayesian_mode_runs(self, ground_truth):
        np.random.seed(13)
        mixer, gt = ground_truth
        spin = spinna.SPINNA(mixer, gt, N_sim=1)
        N_structures = spinna.generate_N_structures(
            mixer.structures, {"A": 1000}, granularity=15
        )
        props, score = spin.fit_bayesian(
            N_structures, n_initial=5, n_iterations=5
        )
        assert 0 <= score <= 1
        assert len(props) == 2


class TestMaskGenerator:
    def test_mask_generation(self):
        import pandas as pd

        rng = np.random.default_rng(4)
        locs = pd.DataFrame(
            {
                "frame": np.zeros(500, np.uint32),
                "x": rng.uniform(10, 20, 500).astype(np.float32),
                "y": rng.uniform(10, 20, 500).astype(np.float32),
            }
        )
        info = [{"Width": 64, "Height": 64, "Pixelsize": 130,
                 "Frames": 1}]
        mg = spinna.MaskGenerator(locs, info, binsize=130, sigma=260)
        mask = mg.generate_mask()
        assert mask.shape == (64, 64)
        assert mask.sum() == pytest.approx(1.0)
        assert mg.area is not None and mg.area > 0


class TestRref:
    def test_identity_is_identity(self):
        I = np.eye(3)
        np.testing.assert_array_equal(spinna.rref(I.copy()), I)

    def test_full_rank_3x3(self):
        rng = np.random.default_rng(0)
        M = rng.normal(0, 1, (3, 3)) + 3 * np.eye(3)
        R = spinna.rref(M.copy())
        np.testing.assert_allclose(R, np.eye(3), atol=1e-10)

    def test_does_not_need_mutation(self):
        M = np.array([[2.0, 4.0], [1.0, 2.0]])
        R = spinna.rref(M.copy())
        # rank 1: one pivot row, one zero row
        np.testing.assert_allclose(R[0], [1.0, 2.0], atol=1e-12)
        np.testing.assert_allclose(R[1], [0.0, 0.0], atol=1e-12)


def _mono_dimer():
    mono = spinna.Structure("monomer")
    mono.define_coordinates("R", [0.0], [0.0])
    dimer = spinna.Structure("dimer")
    dimer.define_coordinates("R", [0.0, 20.0], [0.0, 0.0])
    return [mono, dimer]


class TestSearchSpace:
    def test_homo_counts_satisfy_balance(self):
        structures = _mono_dimer()
        N = spinna.generate_N_structures(
            structures, {"R": 120}, granularity=6
        )
        assert set(N) == {"monomer", "dimer"}
        total = np.asarray(N["monomer"]) + 2 * np.asarray(N["dimer"])
        np.testing.assert_allclose(total, 120, atol=1.5)

    def test_higher_granularity_more_rows(self):
        structures = _mono_dimer()
        few = spinna.generate_N_structures(
            structures, {"R": 120}, granularity=4
        )
        many = spinna.generate_N_structures(
            structures, {"R": 120}, granularity=12
        )
        assert len(many["monomer"]) > len(few["monomer"])

    def test_too_few_structures_raises(self):
        mono = spinna.Structure("m")
        mono.define_coordinates("A", [0.0], [0.0])
        mono.define_coordinates("B", [5.0], [0.0])
        with pytest.raises(ValueError):
            spinna.generate_N_structures(
                [mono], {"A": 10, "B": 10}, granularity=4
            )


class TestRotations:
    @pytest.mark.parametrize("mode", ["2D", "3D"])
    def test_orthogonal_and_proper(self, mode):
        R = spinna.random_rotation_matrices(16, mode)
        assert R.shape == (16, 3, 3)
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
            assert np.linalg.det(r) == pytest.approx(1.0)

    def test_2d_does_not_rotate_z(self):
        R = spinna.random_rotation_matrices(8, "2D")
        for r in R:
            np.testing.assert_allclose(r[2], [0, 0, 1], atol=1e-12)
            np.testing.assert_allclose(r[:, 2], [0, 0, 1], atol=1e-12)

    def test_none_is_identity(self):
        R = spinna.random_rotation_matrices(4, None)
        for r in R:
            np.testing.assert_array_equal(r, np.eye(3))

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError):
            spinna.random_rotation_matrices(4, "4D")


class TestCoordsToLocs:
    def test_2d_unit_conversion(self):
        coords = np.array([[130.0, 260.0], [0.0, 130.0]])
        locs = spinna.coords_to_locs(coords, lp=13.0, pixelsize=130)
        np.testing.assert_allclose(locs["x"], [1.0, 0.0])
        np.testing.assert_allclose(locs["y"], [2.0, 1.0])
        np.testing.assert_allclose(locs["lpx"], 0.1)

    def test_3d_keeps_z_in_nm(self):
        coords = np.array([[130.0, 130.0, 75.0]])
        locs = spinna.coords_to_locs(coords, pixelsize=130)
        assert locs["z"].iloc[0] == pytest.approx(75.0)


class TestNNDist:
    def test_unit_grid(self):
        pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                        [1.0, 1.0]])
        d = spinna.get_NN_dist(pts, pts, 1)
        np.testing.assert_allclose(d[:, 0], 1.0)

    def test_excludes_self(self):
        pts = np.random.default_rng(0).random((50, 2))
        d = spinna.get_NN_dist(pts, pts, 1)
        assert (d > 0).all()

    def test_empty_returns_empty(self):
        assert len(spinna.get_NN_dist(np.zeros((0, 2)),
                                      np.zeros((5, 2)), 1)) == 0

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError):
            spinna.get_NN_dist(np.zeros((5, 2)), np.zeros((5, 3)), 1)

    def test_score_identical_near_zero(self):
        rng = np.random.default_rng(0)
        d = rng.exponential(10, (500, 1))
        assert spinna.NND_score([d], [d.copy()]) < 1e-9

    def test_score_disjoint_high(self):
        d1 = np.full((200, 1), 1.0)
        d2 = np.full((200, 1), 100.0)
        assert spinna.NND_score([d1], [d2]) > 0.9


class TestStructureMore:
    def test_empty_targets_on_init(self):
        s = spinna.Structure("s")
        assert s.targets == []
        assert s.get_all_targets_count() == 0

    def test_define_pads_z_with_zeros(self):
        s = spinna.Structure("s")
        s.define_coordinates("A", [1.0, 2.0], [0.0, 0.0])
        assert s.get_all_targets_count() == 2

    def test_unequal_lengths_raise(self):
        s = spinna.Structure("s")
        with pytest.raises(Exception):
            s.define_coordinates("A", [1.0, 2.0], [0.0])

    def test_delete_target(self):
        s = spinna.Structure("s")
        s.define_coordinates("A", [0.0], [0.0])
        s.define_coordinates("B", [5.0], [0.0])
        s.delete_target("A")
        assert "A" not in s.targets
        assert s.get_all_targets_count() == 1

    def test_get_max_nn(self):
        mono, dimer = _mono_dimer()
        # within the same target: n - 1 possible neighbors
        assert dimer.get_max_nn("R", "R") == 1
        assert mono.get_max_nn("R", "R") == 0
        # missing target: zero
        assert dimer.get_max_nn("R", "missing") == 0

    def test_restart_clears(self):
        s = spinna.Structure("s")
        s.define_coordinates("A", [0.0], [0.0])
        s.restart()
        assert s.targets == []

    def test_save_load_round_trip(self, tmp_path):
        structures = _mono_dimer()
        path = str(tmp_path / "structs.yaml")
        structures[0].save(path)  # single-structure save
        loaded, targets = spinna.load_structures(path)
        assert len(loaded) >= 1
        assert loaded[0].title == "monomer"
        assert "R" in targets


def _mono_dimer2():
    mono = spinna.Structure("monomer")
    mono.define_coordinates("T", [0.0], [0.0])
    dim = spinna.Structure("dimer")
    dim.define_coordinates("T", [0.0, 20.0], [0.0, 0.0])
    return [mono, dim]


def _het():
    a = spinna.Structure("A-only")
    a.define_coordinates("A", [0.0], [0.0])
    ab = spinna.Structure("AB")
    ab.define_coordinates("A", [0.0], [0.0])
    ab.define_coordinates("B", [15.0], [0.0])
    return [a, ab]


class TestMixerValidation:
    def _mk(self, **over):
        kw = dict(
            structures=_mono_dimer2(),
            label_unc={"ALL": 3.0},
            le={"ALL": 1.0},
            width=1000.0,
            height=1000.0,
        )
        kw.update(over)
        return spinna.StructureMixer(**kw)

    def test_label_unc_must_be_dict(self):
        with pytest.raises(ValueError, match="label_unc"):
            self._mk(label_unc=3.0)

    def test_negative_label_unc_raises(self):
        with pytest.raises(ValueError, match="non-negative"):
            self._mk(label_unc={"ALL": -1.0})

    @pytest.mark.parametrize("bad_le", [-0.1, 1.5])
    def test_le_out_of_range_raises(self, bad_le):
        with pytest.raises(ValueError, match="0, 1"):
            self._mk(le={"ALL": bad_le})

    def test_structures_non_list_raises(self):
        with pytest.raises(ValueError, match="list"):
            self._mk(structures="monomer")

    def test_no_mask_no_roi_raises(self):
        with pytest.raises(ValueError, match="mask_dict or ROI"):
            self._mk(width=None, height=None)

    def test_target_missing_from_label_unc_raises(self):
        with pytest.raises(ValueError, match="missing from"):
            self._mk(label_unc={"OTHER": 3.0})

    def test_single_structure_promoted_to_list(self):
        m = self._mk(structures=_mono_dimer2()[0])
        assert m.get_structure_names() == ["monomer"]

    def test_nn_counts_dict_missing_pair_raises(self):
        with pytest.raises(ValueError, match="nn_counts"):
            self._mk(nn_counts={"X-Y": 1})

    def test_nn_counts_invalid_type_raises(self):
        with pytest.raises(ValueError, match="auto"):
            self._mk(nn_counts=42)


class TestMixerConversions:
    def _mixer(self):
        return spinna.StructureMixer(
            _mono_dimer2(), label_unc={"ALL": 3.0}, le={"ALL": 1.0},
            width=1000.0, height=1000.0,
        )

    def test_counts_props_round_trip(self):
        m = self._mixer()
        counts = np.array([40, 30])  # 40 + 60 targets -> 40%/60%
        props = m.convert_counts_to_props(counts)
        assert props.sum() == pytest.approx(100.0)
        back = m.convert_props_to_counts(props, N_total=100)
        np.testing.assert_array_equal(back, counts)

    def test_convert_N_structures_dict_and_array(self):
        m = self._mixer()
        arr = m.convert_N_structures_to_array(
            {"monomer": [5], "dimer": [7]}
        )
        np.testing.assert_array_equal(arr, [[5, 7]])
        arr2 = m.convert_N_structures_to_array([5, 7])
        np.testing.assert_array_equal(arr2, [[5, 7]])

    def test_get_neighbor_idx_duplicate(self):
        m = spinna.StructureMixer(
            _het(), label_unc={"ALL": 3.0}, le={"ALL": 1.0},
            width=1000.0, height=1000.0,
        )
        plain = m.get_neighbor_idx(duplicate=False)
        dup = m.get_neighbor_idx(duplicate=True)
        assert len(dup) > len(plain)
        pairs = [(t1, t2) for t1, t2, n in dup]
        assert ("B", "A") in pairs

    def test_roi_size_2d_and_3d(self):
        m2 = self._mixer()
        assert m2.roi_size == pytest.approx(1e6)
        m3 = spinna.StructureMixer(
            _mono_dimer2(), label_unc={"ALL": 3.0}, le={"ALL": 1.0},
            width=100.0, height=100.0, depth=50.0,
        )
        assert m3.roi_size == pytest.approx(5e5)

    def test_neighbor_counts_auto_homo(self):
        m = self._mixer()
        # dimer has 2 T's -> same-target NN count = 1
        assert m.get_neighbor_counts("T", "T") == 1


class TestSearchSpaceContract:
    def test_hetero_balance(self):
        structures = _het()
        space = spinna.generate_N_structures(
            structures, {"A": 60, "B": 30}, granularity=10
        )
        names = [s.title for s in structures]
        counts = np.column_stack([space[n] for n in names])
        # every candidate must account for every B (only AB has B)
        np.testing.assert_array_equal(counts[:, 1], 30)
        # and totals of A must match
        np.testing.assert_array_equal(
            counts[:, 0] + counts[:, 1], 60
        )

    def test_equal_counts_single_row(self):
        structures = _het()
        space = spinna.generate_N_structures(
            structures, {"A": 50, "B": 20}, granularity=99
        )
        # n_structures == n_targets -> unique solution, one row each
        assert all(len(v) == 1 for v in space.values())
        assert space["AB"][0] == 20
        assert space["A-only"][0] == 30

    def test_save_csv(self, tmp_path):
        path = str(tmp_path / "space.csv")
        spinna.generate_N_structures(
            _mono_dimer2(), {"T": 100}, granularity=5, save=path
        )
        import os

        assert os.path.exists(path)
        import pandas as pd

        df = pd.read_csv(path)
        assert set(df.columns) >= {"monomer", "dimer"}


class TestStructureContractMore:
    def test_repr_includes_title(self):
        s = _mono_dimer2()[1]
        assert "dimer" in repr(s)

    def test_define_appends_on_repeat(self):
        s = spinna.Structure("s")
        s.define_coordinates("T", [0.0], [0.0])
        s.define_coordinates("T", [5.0], [5.0])
        assert s.targets == ["T"]
        assert len(s.x["T"]) == 2

    def test_delete_target_idempotent(self):
        s = _mono_dimer2()[0]
        s.delete_target("T")
        s.delete_target("T")  # second call is a no-op
        assert s.targets == []

    def test_get_max_nn_cross_and_missing(self):
        a, ab = _het()
        assert ab.get_max_nn("A", "B") == 1
        assert ab.get_max_nn("A", "C") == 0
        assert a.get_max_nn("A", "A") == 0  # one A -> no same-target NN

    def test_save_requires_yaml_extension(self, tmp_path):
        s = _mono_dimer2()[0]
        with pytest.raises(ValueError, match="yaml"):
            s.save(str(tmp_path / "s.txt"))

    def test_ind_target_count_order_and_zero(self):
        a, ab = _het()
        assert ab.get_ind_target_count(["B", "A", "C"]) == [1, 1, 0]


class TestMaskGeneratorContract:
    def _locs(self):
        rng = np.random.default_rng(0)
        import pandas as pd

        return pd.DataFrame({
            "frame": rng.integers(0, 100, 3000).astype(np.uint32),
            "x": rng.uniform(2, 30, 3000).astype(np.float32),
            "y": rng.uniform(2, 30, 3000).astype(np.float32),
        })

    def test_mask_normalizes_to_unit_sum(self):
        info = [{"Frames": 100, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        gen = spinna.MaskGenerator(
            self._locs(), info, binsize=260.0, sigma=260.0
        )
        mask = gen.generate_mask()
        assert mask.sum() == pytest.approx(1.0)

    def test_area_none_before_generate_positive_after(self):
        info = [{"Frames": 100, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        gen = spinna.MaskGenerator(
            self._locs(), info, binsize=260.0, sigma=260.0
        )
        assert gen.area is None
        gen.generate_mask(thresholded=True)
        assert gen.area > 0

    def test_save_before_generate_raises(self, tmp_path):
        info = [{"Frames": 100, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        gen = spinna.MaskGenerator(
            self._locs(), info, binsize=260.0, sigma=260.0
        )
        with pytest.raises(ValueError, match="Generate"):
            gen.save_mask(str(tmp_path / "m.npy"))

    def test_save_round_trip_with_info(self, tmp_path):
        info = [{"Frames": 100, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        gen = spinna.MaskGenerator(
            self._locs(), info, binsize=260.0, sigma=260.0
        )
        mask = gen.generate_mask()
        path = str(tmp_path / "m.npy")
        gen.save_mask(path)
        back = np.load(path)
        np.testing.assert_array_equal(back, mask)
        assert (tmp_path / "m.yaml").exists()


class TestSpinnaFitContract:
    def _fitter(self, seed=0):
        np.random.seed(seed)
        mixer = spinna.StructureMixer(
            _mono_dimer2(), label_unc={"ALL": 3.0}, le={"ALL": 1.0},
            width=5000.0, height=5000.0,
        )
        gt = mixer.run_simulation([60, 70])
        return spinna.SPINNA(mixer, gt, N_sim=1), mixer

    def test_requires_structure_mixer(self):
        with pytest.raises((TypeError, AttributeError,
                            AssertionError)):
            spinna.SPINNA("not a mixer", {"T": np.zeros((5, 2))})

    def test_return_scores_adds_element(self):
        fitter, mixer = self._fitter()
        space = spinna.generate_N_structures(
            _mono_dimer2(), {"T": 200}, granularity=5
        )
        out = fitter.fit(space, fitting_mode="brute-force", return_scores=True)
        assert len(out) == 3
        props, score, scores = out
        assert len(np.atleast_1d(scores)) > 1

    def test_save_csv_creates_file(self, tmp_path):
        fitter, mixer = self._fitter()
        space = spinna.generate_N_structures(
            _mono_dimer2(), {"T": 200}, granularity=5
        )
        path = str(tmp_path / "scores.csv")
        fitter.fit(space, fitting_mode="brute-force", save=path)
        import os

        assert os.path.exists(path)

    def test_bootstrap_returns_pair_of_pairs(self):
        fitter, mixer = self._fitter()
        space = spinna.generate_N_structures(
            _mono_dimer2(), {"T": 200}, granularity=4
        )
        (props, sems), (score, score_sem) = fitter.fit(
            space, fitting_mode="brute-force", bootstrap=True
        )
        assert len(np.atleast_1d(props)) == 2
        assert np.all(np.atleast_1d(sems) >= 0)

    def test_evaluate_single_finite(self):
        fitter, mixer = self._fitter()
        val = fitter._evaluate_single(np.array([60, 70]))
        assert np.isfinite(val)

    def test_farthest_point_sampling_unique(self):
        pts = np.random.default_rng(0).uniform(0, 1, (50, 2))
        idx = spinna.SPINNA._farthest_point_sampling(pts, 10)
        assert len(set(map(int, idx))) == 10


class TestLeHelpers:
    def test_check_structures_valid_true_and_false(self):
        # valid: monomer-A, monomer-B, heterodimer AB
        a = spinna.Structure("A")
        a.define_coordinates("A", [0.0], [0.0])
        b = spinna.Structure("B")
        b.define_coordinates("B", [0.0], [0.0])
        ab = spinna.Structure("AB")
        ab.define_coordinates("A", [0.0], [0.0])
        ab.define_coordinates("B", [10.0], [0.0])
        assert spinna.check_structures_valid_for_fitting(
            [a, b, ab], {"A": 50, "B": 50}
        )
        # missing target count -> invalid
        assert not spinna.check_structures_valid_for_fitting(
            [a, b, ab], {"A": 50}
        )
        # fewer structures than targets -> invalid
        assert not spinna.check_structures_valid_for_fitting(
            [ab], {"A": 50, "B": 50}
        )

    def test_get_le_from_props(self):
        a = spinna.Structure("A")
        a.define_coordinates("A", [0.0], [0.0])
        b = spinna.Structure("B")
        b.define_coordinates("B", [0.0], [0.0])
        ab = spinna.Structure("AB")
        ab.define_coordinates("A", [0.0], [0.0])
        ab.define_coordinates("B", [10.0], [0.0])
        structures = [a, b, ab]
        targets = ["A", "B"]
        # 50% of A targets and 50% of B targets in the dimer
        le = spinna.get_le_from_props(
            [25.0, 25.0, 50.0], structures, targets
        )
        assert set(le) == {"A", "B"}
        # reported in percent: 50/(25+50) of A targets in the dimer
        assert le["A"] == pytest.approx(100 * 50 / 75)
        assert le["B"] == pytest.approx(100 * 50 / 75)
