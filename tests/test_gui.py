"""GUI viewers on the Agg backend: construction, redraw, interaction
plumbing, pick workflow."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import gui

INFO = [{"Frames": 100, "Height": 32, "Width": 32, "Pixelsize": 130}]


def _locs(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "frame": rng.integers(0, 100, n).astype(np.uint32),
            "x": rng.uniform(2, 30, n).astype(np.float32),
            "y": rng.uniform(2, 30, n).astype(np.float32),
            "photons": rng.uniform(100, 5000, n).astype(np.float32),
            "lpx": np.full(n, 0.1, np.float32),
            "lpy": np.full(n, 0.1, np.float32),
        }
    )


class TestRenderApp:
    def test_construct_and_redraw(self):
        app = gui.RenderApp(_locs(), INFO)
        n = app.redraw()
        assert n == 2000

    def test_zoom_changes_viewport(self):
        app = gui.RenderApp(_locs(), INFO)
        app.viewport = ((10, 10), (20, 20))
        app.oversampling = 8
        n = app.redraw()
        assert 0 < n < 2000

    def test_pick_workflow(self, tmp_path):
        app = gui.RenderApp(_locs(), INFO)
        app.picks = [(16.0, 16.0)]
        app.pick_diameter = 4.0
        picked = app.picked_locs()
        assert len(picked) == 1
        assert len(picked[0]) > 0
        path = str(tmp_path / "picks.yaml")
        app.save_picks(path)
        app2 = gui.RenderApp(_locs(), INFO)
        app2.load_picks(path)
        assert app2.picks == [(16.0, 16.0)]


class TestLocalizeApp:
    def test_browse_and_identify(self, movie, movie_info):
        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        n0 = app.redraw()
        assert n0 >= 0
        # browse frames via the key handler plumbing

        class E:
            key = "right"

        app._on_key(E())
        assert app.frame_number == 1

        class E2:
            key = "down"

        app._on_key(E2())
        assert app.min_net_gradient < 5000

    def test_save_spots(self, movie, movie_info, tmp_path):
        from picasso_tpu import io

        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        path = str(tmp_path / "movie_spots.npy")
        n = app.save_spots(path)
        spots, info = io.load_spots(path)
        assert len(spots) == n > 0
        assert spots.shape[1:] == (7, 7)
        assert info[-1]["Box Size"] == 7

    def test_fit_from_identifications(
        self, movie, movie_info, tmp_path
    ):
        """File > Load locs as identifications: refit the movie at
        positions loaded from a saved identifications file."""
        from picasso_tpu import io, localize

        ids, info = localize.identify(
            movie, 5000, 7, return_info=True
        )
        ids_path = str(tmp_path / "movie_ids.hdf5")
        io.save_identifications(
            ids_path, ids, list(movie_info) + [info]
        )
        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        out = str(tmp_path / "refit_locs.hdf5")
        locs, new_info = app.fit_from_identifications(
            ids_path, out_path=out, fitting_method="gausslq"
        )
        assert len(locs) == len(ids) > 0
        back, _ = io.load_locs(out)
        assert len(back) == len(locs)


class TestFilterApp:
    def test_filter_and_save(self, tmp_path):
        app = gui.FilterApp(_locs(), INFO)
        n = app.apply_filter("photons", 1000, 3000)
        assert n < 2000
        assert (app.locs["photons"] >= 1000).all()
        app.plot_histogram("lpx")
        path = str(tmp_path / "filtered_locs.hdf5")
        app.save(path)
        from picasso_tpu import io

        back, info = io.load_locs(path)
        assert len(back) == n
        assert info[-1]["Filters"][0]["Column"] == "photons"
        app.undo_all()
        assert len(app.locs) == 2000

    def test_save_csv_thunderstorm(self, tmp_path):
        """Filter > Export as CSV writes a ThunderSTORM table."""
        import pandas as pd

        app = gui.FilterApp(_locs(), INFO)
        app.apply_filter("photons", 1000, 3000)
        path = str(tmp_path / "filtered.csv")
        app.save(path)
        table = pd.read_csv(path)
        assert len(table) == len(app.locs)
        assert any("x" in c for c in table.columns)


class TestPlugins:
    def test_drop_in_plugin_loads(self, tmp_path):
        import importlib
        import os

        from picasso_tpu.gui import plugins

        plugin_path = os.path.join(
            os.path.dirname(plugins.__file__), "tmp_test_plugin.py"
        )
        with open(plugin_path, "w") as f:
            f.write(
                "class Plugin:\n"
                "    def __init__(self, window):\n"
                "        self.name = 'filter'\n"
                "        self.window = window\n"
                "    def execute(self):\n"
                "        self.window.add_plugin_action(\n"
                "            'double photons', self.run)\n"
                "    def run(self):\n"
                "        self.window.locs = self.window.locs.assign(\n"
                "            photons=self.window.locs['photons'] * 2)\n"
            )
        try:
            importlib.invalidate_caches()
            app = gui.FilterApp(_locs(), INFO)
            assert len(app.plugins) == 1
            labels = [label for label, _ in app.plugin_actions]
            assert labels == ["double photons"]
            before = app.locs["photons"].sum()
            app.run_plugin_action("double photons")
            assert app.locs["photons"].sum() == pytest.approx(
                2 * before
            )
            # plugin scoped to 'filter' must not load into RenderApp
            render_app = gui.RenderApp(_locs(), INFO)
            assert len(render_app.plugins) == 0
        finally:
            os.remove(plugin_path)
            import sys

            sys.modules.pop(
                "picasso_tpu.gui.plugins.tmp_test_plugin", None
            )

    def test_broken_plugin_does_not_crash(self, tmp_path):
        import os

        from picasso_tpu.gui import plugins

        plugin_path = os.path.join(
            os.path.dirname(plugins.__file__), "tmp_broken_plugin.py"
        )
        with open(plugin_path, "w") as f:
            f.write("raise RuntimeError('broken on import')\n")
        errors = []
        try:
            app = gui.FilterApp(_locs(), INFO)
            # loader reports the failure but the app still works
            loaded = plugins.load_plugins(
                app, "filter", on_error=errors.append
            )
            assert loaded == []
            assert len(errors) == 1
            assert "broken on import" in errors[0]
        finally:
            os.remove(plugin_path)


class TestRenderAppPickedLocs:
    def test_save_picked_locs_with_areas(self, tmp_path):
        from picasso_tpu import io as _io

        app = gui.RenderApp(_locs(), INFO)
        app.picks = [(16.0, 16.0), (8.0, 8.0)]
        app.pick_diameter = 4.0
        path = str(tmp_path / "picked_locs.hdf5")
        n = app.save_picked_locs(path)
        locs, info = _io.load_locs(path)
        assert len(locs) == n > 0
        assert "group" in locs.columns
        block = info[-1]
        assert block["Number of picks"] == 2
        # total area = 2 * pi * r^2 in um^2
        pixelsize = INFO[0]["Pixelsize"]
        expected = 2 * np.pi * 2.0**2 * (pixelsize / 1000) ** 2
        assert block["Area (um^2)"] == pytest.approx(expected)
        assert block["Pick Areas (um^2)"][0] == pytest.approx(
            expected / 2
        )


class TestFilterApp2D:
    def test_apply_filter_2d_and_lasso(self):
        app = gui.FilterApp(_locs(), INFO)
        n0 = len(app.locs)
        n = app.apply_filter_2d("x", "y", 5, 25, 5, 25)
        assert 0 < n < n0
        v = app.locs
        assert (v["x"] >= 5).all() and (v["x"] <= 25).all()
        assert (v["y"] >= 5).all() and (v["y"] <= 25).all()
        # triangle lasso inside the rectangle
        n2 = app.apply_lasso("x", "y", [(5, 5), (25, 5), (5, 25)])
        assert 0 < n2 < n
        # inside the triangle: x + y <= 30
        v = app.locs
        assert ((v["x"] + v["y"]) <= 30 + 1e-6).all()

    def test_undo_single_step(self):
        app = gui.FilterApp(_locs(), INFO)
        app.apply_filter("photons", 1000, 4000)
        n1 = app.n_filtered
        app.apply_filter_2d("x", "y", 10, 20, 10, 20)
        assert app.n_filtered < n1
        assert app.undo() == n1
        assert len(app.history) == 1
        app.undo()
        assert app.n_filtered == 2000

    def test_table_paging_and_get_column(self):
        app = gui.FilterApp(_locs(), INFO)
        page = app.table(0, 10)
        assert len(page) == 10
        app.apply_filter("x", 10, 20)
        col = app.get_column("x")
        assert len(col) == app.n_filtered
        assert (col >= 10).all()

    def test_hist2d_figure(self):
        app = gui.FilterApp(_locs(), INFO)
        fig = app.plot_hist2d("x", "photons")
        assert fig is not None

    def test_save_records_2d_provenance(self, tmp_path):
        from picasso_tpu import io

        app = gui.FilterApp(_locs(), INFO)
        app.apply_filter("photons", 1000, 4000)
        app.apply_filter_2d("lpx", "lpy", 0.0, 1.0, 0.0, 1.0)
        path = str(tmp_path / "f2d_locs.hdf5")
        app.save(path)
        _, info = io.load_locs(path)
        assert info[-1]["Filters"][0]["Column"] == "photons"
        assert info[-1]["Filters 2D"][0]["Column X"] == "lpx"


class TestLocalizeAppWorkflow:
    def test_camera_parameters_and_roi(self, movie, movie_info):
        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        app.set_camera_parameters(Baseline=100, Sensitivity=0.5)
        assert app.camera_info["Baseline"] == 100
        with __import__("pytest").raises(KeyError):
            app.set_camera_parameters(Bogus=1)
        params = app.load_camera_config(config={})
        assert "Sensitivity" in params
        n_full = app.redraw()
        app.set_roi(0, 0, 16, 16)
        n_roi = app.redraw()
        assert n_roi <= n_full
        app.clear_roi()
        assert app.redraw() == n_full

    def test_localize_movie_3d(self, movie, movie_info, tmp_path):
        from tests.conftest import CALIB_3D

        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        out = str(tmp_path / "app_locs3d.hdf5")
        locs, new_info = app.localize_movie_3d(CALIB_3D, out)
        assert "z" in locs.columns and "d_zcalib" in locs.columns
        assert np.isfinite(locs["z"]).all()
        from picasso_tpu import io as _io

        back, _ = _io.load_locs(out)
        assert len(back) == len(locs)

    def test_calibrate_z_wiring(self, movie, movie_info, tmp_path,
                                monkeypatch):
        """calibrate_z composes localize_movie + zfit.calibrate_z;
        wire-test it with a simulated z-stack substituted for the fit
        result (the numeric arm is pinned in test_zfit)."""
        from tests.conftest import CALIB_3D

        rng = np.random.default_rng(3)
        n_frames, d = 201, 5.0
        cx = np.asarray(CALIB_3D["X Coefficients"])
        cy = np.asarray(CALIB_3D["Y Coefficients"])
        f = np.repeat(np.arange(n_frames), 10)
        z = ((n_frames - 1) / 2 - f) * d
        stack = pd.DataFrame(
            {
                "frame": f.astype(np.uint32),
                "x": rng.uniform(5, 27, len(f)).astype(np.float32),
                "y": rng.uniform(5, 27, len(f)).astype(np.float32),
                "sx": (np.polyval(cx, z)
                       + rng.normal(0, 0.01, len(f))
                       ).astype(np.float32),
                "sy": (np.polyval(cy, z)
                       + rng.normal(0, 0.01, len(f))
                       ).astype(np.float32),
            }
        )
        info = [dict(movie_info[0], Frames=n_frames)]
        app = gui.LocalizeApp(movie, movie_info)
        monkeypatch.setattr(
            app, "localize_movie", lambda: (stack, info)
        )
        path = str(tmp_path / "calib.yaml")
        calib = app.calibrate_z(d, 0.79, path=path)
        assert len(calib["X Coefficients"]) == 7
        assert (tmp_path / "calib.yaml").exists()
        assert "calibration" in app.status.last.lower()

    def test_quality_check(self, movie, movie_info):
        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        locs, new_info = app.localize_movie()
        qc = app.quality_check(locs, new_info)
        assert set(qc) == {
            "NeNA (px)",
            "Mean event length (frames)",
            "Mean drift x (px)",
            "Mean drift y (px)",
        }
        assert qc["Mean event length (frames)"] >= 1.0
        assert app.status.last.startswith("QC:")

    def test_localize_movie_saves_locs(self, movie, movie_info,
                                       tmp_path):
        from picasso_tpu import io

        app = gui.LocalizeApp(
            movie, movie_info, min_net_gradient=5000, box=7
        )
        out = str(tmp_path / "app_locs.hdf5")
        locs, new_info = app.localize_movie(out)
        assert len(locs) > 0
        back, chain = io.load_locs(out)
        assert len(back) == len(locs)
        assert any(
            "Fit method" in blk for blk in chain
        )
        assert app.status.last.startswith("Saved")
