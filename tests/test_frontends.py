"""Front-ends: CLI subcommands end-to-end, nanotron classifier,
design plates, server query layer, watcher."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _write_test_movie(tmp_path):
    from picasso_tpu import io, simulate

    movie, sites, info = simulate.simulate_movie(
        n_sites=12, imagesize=32, frames=200, taud=2000,
        photonrate=60, seed=5,
    )
    raw = str(tmp_path / "movie.raw")
    simulate.saveMovie(raw, movie, info)
    return raw


class _CLIResult:
    def __init__(self, returncode, stdout, stderr):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _run_cli(args, cwd=None):
    """Drive a CLI subcommand in-process via ``main(argv)``.

    A fresh ``python -m picasso_tpu`` per stage costs ~10 s of JAX
    import each; in-process calls share the warm runtime (one true
    subprocess smoke test remains in ``test_cli_subprocess_smoke``).
    Exceptions propagate — a failing stage surfaces its traceback
    directly instead of a captured stderr blob.
    """
    import contextlib
    import io as _io

    from picasso_tpu.__main__ import main

    out, err = _io.StringIO(), _io.StringIO()
    code = 0
    prev = os.getcwd()
    try:
        if cwd:
            os.chdir(cwd)
        with contextlib.redirect_stdout(out), \
                contextlib.redirect_stderr(err):
            try:
                main([str(a) for a in args])
            except SystemExit as exc:  # argparse --help / errors
                code = int(exc.code or 0)
    finally:
        if cwd:
            os.chdir(prev)
    return _CLIResult(code, out.getvalue(), err.getvalue())


class TestCLI:
    def test_cli_subprocess_smoke(self):
        """The one true subprocess test: import hygiene + entry point.

        Everything else calls ``main(argv)`` in-process; this verifies
        ``python -m picasso_tpu`` actually boots in a clean interpreter.
        """
        env = dict(os.environ)
        env.setdefault("JAX_PLATFORMS", "cpu")
        out = subprocess.run(
            [sys.executable, "-m", "picasso_tpu", "--help"],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert out.returncode == 0
        assert "localize" in out.stdout
        assert "spinna" in out.stdout

    def test_help(self):
        out = _run_cli(["--help"])
        assert out.returncode == 0
        assert "localize" in out.stdout
        assert "spinna" in out.stdout

    def test_localize_undrift_link_pipeline(self, tmp_path):
        raw = _write_test_movie(tmp_path)
        out = _run_cli(
            ["localize", raw, "-g", "3000", "-d", "0"]
        )
        assert out.returncode == 0, out.stderr
        locs_file = str(tmp_path / "movie_locs.hdf5")
        assert os.path.isfile(locs_file)
        assert os.path.isfile(str(tmp_path / "movie_locs.yaml"))

        out = _run_cli(["link", locs_file])
        assert out.returncode == 0, out.stderr
        assert os.path.isfile(str(tmp_path / "movie_locs_link.hdf5"))

        out = _run_cli(["hdf2csv", locs_file])
        assert out.returncode == 0, out.stderr
        assert os.path.isfile(str(tmp_path / "movie_locs.csv"))

        out = _run_cli(
            ["render", locs_file, "-o", "4", "-b", "smooth"]
        )
        assert out.returncode == 0, out.stderr
        assert os.path.isfile(str(tmp_path / "movie_locs.png"))

    def test_clusterfilter(self, tmp_path):
        from picasso_tpu import io

        rng = np.random.default_rng(0)
        n = 100
        locs = pd.DataFrame(
            {
                "frame": np.arange(n, dtype=np.uint32),
                "x": rng.uniform(0, 30, n).astype(np.float32),
                "y": rng.uniform(0, 30, n).astype(np.float32),
                "photons": rng.uniform(
                    100, 1000, n
                ).astype(np.float32),
            }
        )
        info = [{"Frames": n, "Height": 32, "Width": 32}]
        path = str(tmp_path / "f_locs.hdf5")
        io.save_locs(path, locs, info)
        out = _run_cli(
            ["clusterfilter", path, "photons", "500", "1000"]
        )
        assert out.returncode == 0, out.stderr
        filtered, _ = io.load_locs(
            str(tmp_path / "f_locs_filter.hdf5")
        )
        assert (filtered["photons"] >= 500).all()


class TestNanotron:
    def test_train_and_predict(self, tmp_path):
        """Train the flax MLP on two synthetic structure classes and
        classify held-out picks."""
        from picasso_tpu import nanotron

        rng = np.random.default_rng(0)

        def make_locs(kind, n_picks, start_group=0):
            rows = []
            for g in range(n_picks):
                cx, cy = rng.uniform(5, 27, 2)
                if kind == "spot":
                    pts = rng.normal((cx, cy), 0.05, (80, 2))
                else:  # ring
                    ang = rng.uniform(0, 2 * np.pi, 80)
                    pts = np.column_stack(
                        [
                            cx + 0.4 * np.cos(ang),
                            cy + 0.4 * np.sin(ang),
                        ]
                    ) + rng.normal(0, 0.03, (80, 2))
                for p in pts:
                    rows.append((g + start_group, p[0], p[1]))
            arr = np.array(rows)
            return pd.DataFrame(
                {
                    "frame": np.arange(len(arr), dtype=np.uint32)
                    % 100,
                    "x": arr[:, 1].astype(np.float32),
                    "y": arr[:, 2].astype(np.float32),
                    "group": arr[:, 0].astype(np.int32),
                    "lpx": np.full(len(arr), 0.03, np.float32),
                    "lpy": np.full(len(arr), 0.03, np.float32),
                }
            )

        spots = make_locs("spot", 12)
        rings = make_locs("ring", 12)
        d1, l1 = nanotron.prepare_data(
            spots, 0, pick_radius=1.0, oversampling=10
        )
        d2, l2 = nanotron.prepare_data(
            rings, 1, pick_radius=1.0, oversampling=10
        )
        model = nanotron.train_model(
            d1 + d2, l1 + l2, hidden_layer_sizes=(32,),
            max_iter=60,
        )
        acc = model.score(np.stack(d1 + d2), np.asarray(l1 + l2))
        assert acc > 0.9

        # classify a fresh pick
        test = make_locs("ring", 1)
        pred, proba = nanotron.predict_structure(
            model, test, 0, pick_radius=1.0, oversampling=10
        )
        assert pred[0] == 1
        assert proba.shape == (1, 2)

        # save/load round trip
        path = str(tmp_path / "model.sav")
        nanotron.save_model(path, model, {"classes": [0, 1]})
        loaded, minfo = nanotron.load_model(path)
        pred2, _ = nanotron.predict_structure(
            loaded, test, 0, pick_radius=1.0, oversampling=10
        )
        assert pred2[0] == pred[0]


class TestDesign:
    def test_plate_conversion_roundtrip(self, tmp_path):
        from picasso_tpu import design

        plate = [
            ["A1", "oligo_A1", "ACGT"],
            ["I5", "oligo_I5", "TTTT"],
        ]
        out = design.convertPlateIndex(plate, "myplate")
        assert out[0] == [
            "PLATE NAME", "PLATE POSITION", "OLIGO NAME", "SEQUENCE",
        ]
        assert len(out) == 1 + 16 * 12
        # A1 lands on plate _1 position A1
        assert ["myplate_1", "A1", "oligo_A1", "ACGT"] in out
        # I5 (row 9) lands on plate _2 position A5
        assert ["myplate_2", "A5", "oligo_I5", "TTTT"] in out

        path = str(tmp_path / "plate.csv")
        design.savePlate(path, [out])
        back = design.readPlate(path)
        assert back[0] == out[0]

    def test_sequences_tables(self):
        from picasso_tpu import design_sequences

        assert design_sequences.base_sequences[0] == [
            "Position", "Name", "Sequence",
        ]
        assert len(design_sequences.base_sequences) > 100
        assert (
            design_sequences.get_paint_sequence("P1")
            == "TTATACATCTA"
        )


class TestServer:
    def test_db_roundtrip(self, tmp_path, monkeypatch):
        import picasso_tpu.localize as localize
        from picasso_tpu.server import db

        monkeypatch.setattr(
            localize,
            "_db_filename",
            lambda: str(tmp_path / "test.db"),
        )
        summary = {
            "filename": "a.raw",
            "n_locs": 100,
            "nena_nm": 8.5,
            "entry_created": "2026-08-16",
        }
        localize._save_file_summary(summary)
        localize._save_file_summary(
            {**summary, "filename": "b.raw", "n_locs": 200}
        )
        status = db.db_status()
        assert status["n_entries"] == 2
        hist = db.history(sort_by="n_locs")
        assert hist.iloc[0]["n_locs"] == 200
        comp = db.compare("a.raw", "b.raw")
        assert comp.shape[1] == 2

    def test_watcher_detects_and_processes(self, tmp_path):
        from picasso_tpu.server import watcher

        raw = _write_test_movie(tmp_path)
        new, processed = watcher.check_new(str(tmp_path), {})
        assert raw in new
        out = watcher.process_file(
            raw, {"Min. Net Gradient": 3000}
        )
        assert out is not None and os.path.isfile(out)
        # now the file counts as processed
        new2, _ = watcher.check_new(str(tmp_path), {})
        assert raw not in new2


class TestCLIBreadth:
    """One small dataset driven through many subcommands — each stage
    consumes the previous stage's file, mirroring the reference's
    file-granular checkpoint/resume design."""

    @pytest.fixture(scope="class")
    def locs_file(self, tmp_path_factory):
        from picasso_tpu import io

        tmp = tmp_path_factory.mktemp("cli_breadth")
        rng = np.random.default_rng(0)
        # clustered sites with repeated localizations
        rows = []
        sites = rng.uniform(5, 27, (15, 2))
        for f in range(300):
            for s in np.nonzero(rng.random(15) < 0.3)[0]:
                rows.append(
                    (f, sites[s, 0] + rng.normal(0, 0.05),
                     sites[s, 1] + rng.normal(0, 0.05))
                )
        arr = np.array(rows)
        n = len(arr)
        locs = pd.DataFrame(
            {
                "frame": arr[:, 0].astype(np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "photons": rng.uniform(
                    500, 3000, n
                ).astype(np.float32),
                "sx": np.full(n, 1.1, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 10, np.float32),
                "lpx": np.full(n, 0.05, np.float32),
                "lpy": np.full(n, 0.05, np.float32),
            }
        ).sort_values("frame")
        path = str(tmp / "data_locs.hdf5")
        io.save_locs(
            path, locs,
            [{"Frames": 300, "Height": 32, "Width": 32,
              "Pixelsize": 130}],
        )
        return path

    def test_analysis_chain(self, locs_file):
        from picasso_tpu import io

        base = os.path.splitext(locs_file)[0]
        folder = os.path.dirname(locs_file)

        out = _run_cli(["link", locs_file, "-d", "0.3", "-t", "2"])
        assert out.returncode == 0, out.stderr
        linked = base + "_link.hdf5"
        assert os.path.isfile(linked)

        out = _run_cli(["dark", linked])
        assert out.returncode == 0, out.stderr
        dark_file = base + "_link_dark.hdf5"
        assert os.path.isfile(dark_file)
        locs, _ = io.load_locs(dark_file)
        assert "dark" in locs.columns

        out = _run_cli(["dbscan", locs_file, "0.3", "5"])
        assert out.returncode == 0, out.stderr
        clustered = base + "_dbscan.hdf5"
        assert os.path.isfile(clustered)
        locs, _ = io.load_locs(clustered)
        assert "group" in locs.columns

        out = _run_cli(["groupprops", clustered])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["density", locs_file, "1.0"])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["pc", locs_file, "-b", "0.2", "-r", "4.0"])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["aim", locs_file, "-s", "50"])
        assert out.returncode == 0, out.stderr
        assert os.path.isfile(base + "_aim.hdf5")

    def test_format_converters_chain(self, locs_file):
        base = os.path.splitext(locs_file)[0]
        out = _run_cli(["hdf2csv", locs_file])
        assert out.returncode == 0, out.stderr
        assert os.path.isfile(base + ".csv")
        out = _run_cli(["hdf2ts", locs_file])
        assert out.returncode == 0, out.stderr
        out = _run_cli(["hdf2imagej", locs_file])
        assert out.returncode == 0, out.stderr
        out = _run_cli(["hdf2nis", locs_file])
        assert out.returncode == 0, out.stderr
        # ThunderSTORM round trip back to hdf5
        ts_files = [
            f for f in os.listdir(os.path.dirname(locs_file))
            if f.endswith(".csv")
        ]
        assert ts_files


class TestSpinnaCLI:
    def test_stoichiometry_fit_via_cli(self, tmp_path):
        from picasso_tpu import io, spinna

        # structures: monomer + dimer of one target
        mono = spinna.Structure("monomer")
        mono.define_coordinates("R", [0.0], [0.0])
        dimer = spinna.Structure("dimer")
        dimer.define_coordinates("R", [0.0, 30.0], [0.0, 0.0])
        structures_path = str(tmp_path / "structures.yaml")
        # save both structures to one file
        import yaml as _yaml

        docs = []
        for s in (mono, dimer):
            s.save(str(tmp_path / f"{s.title}.yaml"))
            with open(tmp_path / f"{s.title}.yaml") as f:
                docs.extend(list(_yaml.safe_load_all(f)))
        with open(structures_path, "w") as f:
            _yaml.dump_all(docs, f)

        # experimental data: mostly dimers at 30 nm spacing
        rng = np.random.default_rng(0)
        n_dimers = 250
        centers = rng.uniform(500, 19500, (n_dimers, 2))
        ang = rng.uniform(0, 2 * np.pi, n_dimers)
        offs = 30.0 * np.stack([np.cos(ang), np.sin(ang)], axis=1)
        pts = np.concatenate([centers, centers + offs])
        pts += rng.normal(0, 4.0, pts.shape)  # label uncertainty
        locs = pd.DataFrame(
            {
                "frame": np.zeros(len(pts), np.uint32),
                "x": (pts[:, 0] / 130).astype(np.float32),
                "y": (pts[:, 1] / 130).astype(np.float32),
                "photons": np.full(len(pts), 1000, np.float32),
                "sx": np.full(len(pts), 1.0, np.float32),
                "sy": np.full(len(pts), 1.0, np.float32),
                "bg": np.full(len(pts), 5, np.float32),
                "lpx": np.full(len(pts), 0.03, np.float32),
                "lpy": np.full(len(pts), 0.03, np.float32),
            }
        )
        locs_path = str(tmp_path / "R_locs.hdf5")
        io.save_locs(
            locs_path, locs,
            [{"Frames": 1, "Height": 160, "Width": 160,
              "Pixelsize": 130}],
        )
        out = _run_cli(
            [
                "spinna", structures_path, locs_path,
                "-g", "8", "-u", "4.0", "-l", "1.0",
                "-W", "20800", "-H", "20800", "-m", "brute-force",
            ]
        )
        assert out.returncode == 0, out.stderr
        # fitted proportions reported; dimer should dominate
        assert "dimer" in out.stdout.lower()


class TestCLICoverageChain:
    """Smoke the analysis/converter subcommands the other chains do
    not reach: smlm_cluster -> g5m -> nneighbor, cluster_combine(_
    dist), join, align, hdbscan, csv2hdf, hdf2chimera/visp, toraw,
    toims, render, undrift_fiducials."""

    @pytest.fixture()
    def clustered_locs_file(self, tmp_path):
        from picasso_tpu import io

        rng = np.random.default_rng(3)
        centers = rng.uniform(4, 28, (12, 2)).astype(np.float32)
        which = rng.integers(0, 12, 900)
        n = 900
        locs = pd.DataFrame(
            {
                "frame": rng.integers(0, 300, n).astype(np.uint32),
                "x": centers[which, 0]
                + rng.normal(0, 0.04, n).astype(np.float32),
                "y": centers[which, 1]
                + rng.normal(0, 0.04, n).astype(np.float32),
                "photons": rng.uniform(500, 3000, n).astype(
                    np.float32
                ),
                "sx": np.full(n, 1.1, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 10, np.float32),
                "lpx": np.full(n, 0.04, np.float32),
                "lpy": np.full(n, 0.04, np.float32),
            }
        ).sort_values("frame")
        path = str(tmp_path / "cov_locs.hdf5")
        io.save_locs(
            path, locs,
            [{"Frames": 300, "Height": 32, "Width": 32,
              "Pixelsize": 130}],
        )
        return path

    def test_cluster_g5m_nneighbor_combine(
        self, clustered_locs_file
    ):
        from picasso_tpu import io

        base = os.path.splitext(clustered_locs_file)[0]
        out = _run_cli(
            ["smlm_cluster", clustered_locs_file, "0.25", "8"]
        )
        assert out.returncode == 0, out.stderr
        clustered = base + "_clustered.hdf5"
        assert os.path.isfile(clustered)
        assert os.path.isfile(base + "_cluster_centers.hdf5")
        locs, _ = io.load_locs(clustered)
        assert "group" in locs.columns

        out = _run_cli(["g5m", clustered])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["nneighbor", clustered])
        assert out.returncode == 0, out.stderr

        # cluster_combine wants picked+clustered locs: 'group' is
        # the pick, 'cluster' the within-pick cluster id
        # (reference picasso/postprocess.py:2174)
        locs, cinfo = io.load_locs(clustered)
        locs = locs.rename(columns={"group": "cluster"})
        locs["group"] = (locs["cluster"] % 3).astype(np.int32)
        picked = base + "_picked.hdf5"
        io.save_locs(picked, locs, cinfo)
        out = _run_cli(["cluster_combine", picked])
        assert out.returncode == 0, out.stderr
        combined = base + "_picked_comb.hdf5"
        assert os.path.isfile(combined)

        out = _run_cli(["cluster_combine_dist", combined])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["hdbscan", clustered_locs_file, "10", "8"])
        assert out.returncode == 0, out.stderr

    def test_join_align_render_converters(
        self, clustered_locs_file, tmp_path
    ):
        from picasso_tpu import io

        base = os.path.splitext(clustered_locs_file)[0]
        # second channel: same locs, small shift
        locs, info = io.load_locs(clustered_locs_file)
        locs2 = locs.copy()
        locs2["x"] = locs2["x"] + 0.4
        second = str(tmp_path / "cov2_locs.hdf5")
        io.save_locs(second, locs2, info)

        out = _run_cli(["join", clustered_locs_file, second])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["align", clustered_locs_file, second])
        assert out.returncode == 0, out.stderr

        out = _run_cli(
            ["render", clustered_locs_file, "-o", "8",
             "-b", "gaussian"]
        )
        assert out.returncode == 0, out.stderr

        # 2D data: chimera/visp exporters warn that z is required
        with pytest.warns(UserWarning, match="Chimera"):
            out = _run_cli(["hdf2chimera", clustered_locs_file])
        assert out.returncode == 0, out.stderr
        with pytest.warns(UserWarning, match="ViSP"):
            out = _run_cli(["hdf2visp", clustered_locs_file])
        assert out.returncode == 0, out.stderr

        out = _run_cli(["hdf2ts", clustered_locs_file])
        assert out.returncode == 0, out.stderr
        csvs = [
            f for f in os.listdir(os.path.dirname(base))
            if f.endswith(".csv")
        ]
        assert csvs
        out = _run_cli(
            ["csv2hdf", os.path.join(os.path.dirname(base),
                                     csvs[0]), "-p", "130"]
        )
        assert out.returncode == 0, out.stderr

    def test_toraw_toims_fiducials(self, tmp_path):
        raw = _write_test_movie(tmp_path)

        out = _run_cli(["toims", raw])
        assert out.returncode == 0, out.stderr
        ims = os.path.splitext(raw)[0] + ".ims"
        assert os.path.isfile(ims)

        # toraw consumes tiff; write one from the raw movie
        from picasso_tpu import io
        from test_io import _write_tiff

        movie, info = io.load_movie(raw)
        tif_dir = tmp_path / "tifs"
        tif_dir.mkdir()
        tif = str(tif_dir / "movie.ome.tif")
        _write_tiff(tif, np.asarray(movie[:20]))
        out = _run_cli(["toraw", tif])
        assert out.returncode == 0, out.stderr
        assert any(
            f.endswith(".raw") for f in os.listdir(tif_dir)
        )
