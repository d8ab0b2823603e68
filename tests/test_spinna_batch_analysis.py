"""CSV-parameterized SPINNA batch analysis (reference CLI
picasso/__main__.py:2210): standard rows, metadata-area fallback and
LE-fitting rows, end to end in tmp dirs."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import io, spinna

PIXELSIZE = 130.0


def _write_structures(path):
    mono = spinna.Structure("monomer")
    mono.define_coordinates("T", [0.0], [0.0])
    dim = spinna.Structure("dimer")
    dim.define_coordinates("T", [0.0, 20.0], [0.0, 0.0])
    io.save_info(path, [mono.get_info(), dim.get_info()])


def _write_exp_locs(path, coords_nm, extra_info=None):
    n = len(coords_nm)
    locs = pd.DataFrame({
        "frame": np.arange(n, dtype=np.uint32) % 100,
        "x": (coords_nm[:, 0] / PIXELSIZE).astype(np.float32),
        "y": (coords_nm[:, 1] / PIXELSIZE).astype(np.float32),
        "photons": np.full(n, 1000, np.float32),
        "sx": np.full(n, 1.0, np.float32),
        "sy": np.full(n, 1.0, np.float32),
        "bg": np.full(n, 10, np.float32),
        "lpx": np.full(n, 0.05, np.float32),
        "lpy": np.full(n, 0.05, np.float32),
    })
    info = [{
        "Frames": 100, "Height": 64, "Width": 64,
        "Pixelsize": PIXELSIZE,
    }]
    if extra_info:
        info = info + [extra_info]
    io.save_locs(path, locs, info)


def _simulated_ground_truth(seed=0, n_mono=60, n_dim=70,
                            side=5000.0):
    np.random.seed(seed)
    mono = spinna.Structure("monomer")
    mono.define_coordinates("T", [0.0], [0.0])
    dim = spinna.Structure("dimer")
    dim.define_coordinates("T", [0.0, 20.0], [0.0, 0.0])
    mixer = spinna.StructureMixer(
        [mono, dim], label_unc={"ALL": 3.0}, le={"ALL": 1.0},
        width=side, height=side,
    )
    return mixer.run_simulation([n_mono, n_dim])["T"]


class TestBatchAnalysis:
    def test_validation(self, tmp_path):
        with pytest.raises(TypeError):
            spinna.batch_analysis(123)
        with pytest.raises(TypeError):
            spinna.batch_analysis("params.txt")
        bad = tmp_path / "p.csv"
        pd.DataFrame({"granularity": [5]}).to_csv(bad, index=False)
        with pytest.raises(ValueError, match="save_filename"):
            spinna.batch_analysis(str(bad))

    def test_standard_rows_with_area_column(self, tmp_path):
        structures_path = str(tmp_path / "structs.yaml")
        _write_structures(structures_path)
        coords = _simulated_ground_truth()
        exp_path = str(tmp_path / "exp_T.hdf5")
        _write_exp_locs(exp_path, coords)
        params = pd.DataFrame([{
            "structures_filename": structures_path,
            "exp_data_T": exp_path,
            "le_T": 100.0,
            "label_unc_T": 3.0,
            "granularity": 6,
            "sim_repeats": 1,
            "save_filename": "run0.csv",
            "NND_bin": 4.0,
            "NND_maxdist": 200.0,
            "area": 25.0,  # (5000 nm)^2 = 25 um^2
        }])
        csv = str(tmp_path / "batch.csv")
        params.to_csv(csv, index=False)
        summary = spinna.batch_analysis(
            csv, fitting_mode="brute-force"
        )
        result_dir = str(tmp_path / "batch__fitting_results")
        assert os.path.isdir(result_dir)
        assert os.path.exists(
            os.path.join(result_dir, "summary_results.csv")
        )
        assert os.path.exists(
            os.path.join(result_dir, "run0_fit_summary.txt")
        )
        assert os.path.exists(
            os.path.join(result_dir, "run0_fit_scores.csv")
        )
        assert os.path.exists(
            os.path.join(result_dir, "run0_NND.png")
        )
        assert len(summary) == 1
        props = summary.iloc[0]
        assert props["prop_monomer"] + props["prop_dimer"] == (
            pytest.approx(100.0, abs=0.5)
        )
        # ground truth: 70 dimers x2 targets / 200 targets = 70%
        assert props["prop_dimer"] > 50.0

    def test_metadata_area_fallback(self, tmp_path):
        structures_path = str(tmp_path / "structs.yaml")
        _write_structures(structures_path)
        coords = _simulated_ground_truth(seed=1)
        exp_path = str(tmp_path / "exp_T.hdf5")
        _write_exp_locs(
            exp_path, coords, extra_info={"Area (um^2)": 25.0}
        )
        params = pd.DataFrame([{
            "structures_filename": structures_path,
            "exp_data_T": exp_path,
            "le_T": 100.0,
            "label_unc_T": 3.0,
            "granularity": 5,
            "sim_repeats": 1,
            "save_filename": "run_meta",
            "NND_bin": 4.0,
            "NND_maxdist": 200.0,
        }])
        csv = str(tmp_path / "meta.csv")
        params.to_csv(csv, index=False)
        summary = spinna.batch_analysis(
            csv, fitting_mode="brute-force"
        )
        assert len(summary) == 1
        assert np.isfinite(summary.iloc[0]["score"])

    def test_result_dir_never_overwrites(self, tmp_path):
        os.makedirs(str(tmp_path / "x__fitting_results"))
        structures_path = str(tmp_path / "structs.yaml")
        _write_structures(structures_path)
        exp_path = str(tmp_path / "exp_T.hdf5")
        _write_exp_locs(exp_path, _simulated_ground_truth(seed=2))
        params = pd.DataFrame([{
            "structures_filename": structures_path,
            "exp_data_T": exp_path,
            "le_T": 100.0,
            "label_unc_T": 3.0,
            "granularity": 4,
            "sim_repeats": 1,
            "save_filename": "r",
            "NND_bin": 4.0,
            "NND_maxdist": 200.0,
            "area": 25.0,
        }])
        csv = str(tmp_path / "x.csv")
        params.to_csv(csv, index=False)
        spinna.batch_analysis(csv, fitting_mode="brute-force")
        assert os.path.isdir(str(tmp_path / "x__fitting_results_1"))

    @pytest.mark.slow
    def test_le_fitting_row(self, tmp_path):
        np.random.seed(3)
        a = spinna.Structure("A")
        a.define_coordinates("A", [0.0], [0.0])
        b = spinna.Structure("B")
        b.define_coordinates("B", [0.0], [0.0])
        ab = spinna.Structure("AB")
        ab.define_coordinates("A", [-7.5], [0.0])
        ab.define_coordinates("B", [7.5], [0.0])
        mixer = spinna.StructureMixer(
            [a, b, ab], label_unc={"ALL": 3.0}, le={"ALL": 1.0},
            width=5000.0, height=5000.0,
        )
        gt = mixer.run_simulation([30, 30, 60])
        pa = str(tmp_path / "exp_A.hdf5")
        pb = str(tmp_path / "exp_B.hdf5")
        _write_exp_locs(pa, gt["A"])
        _write_exp_locs(pb, gt["B"])
        params = pd.DataFrame([{
            "exp_data_A": pa,
            "exp_data_B": pb,
            "label_unc_A": "3",
            "label_unc_B": "3",
            "granularity": 5,
            "sim_repeats": 1,
            "save_filename": "le_run",
            "NND_bin": 4.0,
            "NND_maxdist": 200.0,
            "area": 25.0,
            "le_fitting": 1,
            "distances": "15",
        }])
        csv = str(tmp_path / "le.csv")
        params.to_csv(csv, index=False)
        summary = spinna.batch_analysis(
            csv, fitting_mode="brute-force"
        )
        row = summary.iloc[0]
        assert row["le_fitting"] == 1
        assert row["best_distance_nm"] == 15.0
        assert 0 <= row["le_A"] <= 100
