"""Secondary GUI apps (rotation, average, simulate, design, toraw) on
the Agg backend."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import gui

INFO = [{"Frames": 100, "Height": 32, "Width": 32, "Pixelsize": 130}]


def _locs_3d(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "frame": rng.integers(0, 100, n).astype(np.uint32),
            "x": rng.uniform(4, 28, n).astype(np.float32),
            "y": rng.uniform(4, 28, n).astype(np.float32),
            "z": rng.uniform(-200, 200, n).astype(np.float32),
            "photons": rng.uniform(500, 3000, n).astype(np.float32),
            "sx": np.full(n, 1.1, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 10, np.float32),
            "lpx": np.full(n, 0.05, np.float32),
            "lpy": np.full(n, 0.05, np.float32),
        }
    )


class TestRotationApp:
    def test_rotate_changes_render(self):
        app = gui.RotationApp(_locs_3d(), INFO)
        before = app.ax.get_title()
        app.rotate(dy=np.radians(30))
        assert app.ax.get_title() != before
        # keyboard path
        class E:
            key = "right"
            inaxes = None

        app._on_key(E())
        assert "40" in app.ax.get_title()

    def test_requires_z(self):
        locs = _locs_3d().drop(columns=["z"])
        with pytest.raises(ValueError):
            gui.RotationApp(locs, INFO)


class TestAverageApp:
    def test_average_runs(self):
        rng = np.random.default_rng(1)
        rows = []
        template = np.array([[0.0, 0.0], [0.6, 0.0], [0.0, 0.6]])
        for g in range(12):
            cx, cy = rng.uniform(5, 27, 2)
            ang = rng.uniform(0, 2 * np.pi)
            R = np.array(
                [[np.cos(ang), -np.sin(ang)],
                 [np.sin(ang), np.cos(ang)]]
            )
            pts = template @ R.T
            for px, py in pts:
                for _ in range(8):
                    rows.append(
                        (g, cx + px + rng.normal(0, 0.03),
                         cy + py + rng.normal(0, 0.03))
                    )
        arr = np.array(rows)
        n = len(arr)
        locs = pd.DataFrame(
            {
                "frame": np.arange(n, dtype=np.uint32),
                "x": arr[:, 1].astype(np.float32),
                "y": arr[:, 2].astype(np.float32),
                "photons": np.full(n, 1000, np.float32),
                "sx": np.full(n, 1.0, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 5, np.float32),
                "lpx": np.full(n, 0.03, np.float32),
                "lpy": np.full(n, 0.03, np.float32),
                "group": arr[:, 0].astype(np.int32),
            }
        )
        app = gui.AverageApp(locs, INFO)
        out = app.run(iterations=2)
        assert app.iterations_done == 2
        # after averaging all particles are aligned around the origin
        assert abs(out["x"].mean()) < 0.5
        assert abs(out["y"].mean()) < 0.5


class TestSimulateApp:
    def test_run_and_save(self, tmp_path):
        app = gui.SimulateApp(frames=8, imagesize=16, n_sites=5)
        movie, info = app.run()
        assert movie.shape == (8, 16, 16)
        assert movie.dtype == np.uint16
        assert info["Frames"] == 8
        app._on_key(type("E", (), {"key": "right"})())
        assert app.frame_number == 1
        path = str(tmp_path / "sim.raw")
        app.save(path)
        from picasso_tpu import io

        back, (binfo,) = io.load_raw(path)
        assert back.shape == (8, 16, 16)


class TestDesignApp:
    def test_toggle_and_export(self, tmp_path):
        app = gui.DesignApp()
        app.current_color = 3
        app.grid[0, 0] = 3  # A1 extended with P3
        app.grid[2, 0] = 0
        app.redraw()
        plate = app.to_plate()
        a1 = [row for row in plate if row[0] == "A1"][0]
        assert "P3" in a1[1]
        from picasso_tpu import design_sequences

        handle = design_sequences.get_paint_sequence("P3")
        assert a1[2].endswith(handle)
        path = str(tmp_path / "plate.csv")
        data = app.export_plates(path, platename="test")
        assert data[0][0] == "PLATE NAME"
        # 2 plates x 8 rows x 12 cols + header
        assert len(data) == 2 * 8 * 12 + 1
        # round-trip through the plate csv reader
        from picasso_tpu import design

        read_back = design.readPlate(path)
        assert read_back[0][:2] == ["PLATE NAME", "PLATE POSITION"]

    def test_save_load_design(self, tmp_path):
        app = gui.DesignApp()
        app.grid[4, 7] = 2
        path = str(tmp_path / "design.yaml")
        app.save_design(path)
        app2 = gui.DesignApp()
        app2.load_design(path)
        assert app2.grid[4, 7] == 2

    def test_hex_lattice_matches_reference_geometry(self):
        """The canvas is the reference's RRO hexagon lattice
        (gui/design.py:171-293): 12x16 minus 16 removed sites, base
        table ordered to match, indextoHex column stagger."""
        from picasso_tpu import design_sequences as ds
        from picasso_tpu.gui.apps import (
            HEX_SIDE_HALF, IND2REMOVE, ORIGAMI_SITES,
        )

        assert len(ORIGAMI_SITES) == 176 == len(
            ds.base_sequences
        ) - 1
        assert len(IND2REMOVE) == 16
        # base-table order == ORIGAMI_SITES order via indextoStr
        app = gui.DesignApp()
        for i, (r, c) in enumerate(ORIGAMI_SITES):
            assert ds.base_sequences[1 + i][0] == (
                app.index_to_str(r, c)
            )
        # staggered columns: even col at -r*sqrt(3)*HSH, odd col
        # half a pitch lower (indextoHex :286)
        x0, y0 = app.index_to_hex(3, 2)
        x1, y1 = app.index_to_hex(3, 3)
        assert x1 - x0 == 1.5 * HEX_SIDE_HALF
        assert y0 - y1 == __import__("pytest").approx(
            0.5 * np.sqrt(3) * HEX_SIDE_HALF
        )

    def test_hex_canvas_plate_parity_with_reference(self, tmp_path):
        """A design drawn by clicking the hex canvas exports plate
        rows identical to the reference readCanvas ->
        convertPlateIndexColor path (picasso/gui/design.py:1224-1263
        semantics, transcribed here as the expected values)."""
        from copy import deepcopy

        from matplotlib.backend_bases import MouseEvent

        from picasso_tpu import design, design_sequences as ds

        app = gui.DesignApp()
        app.set_extension(1, "5xR1")
        app.set_extension(2, "P3")

        def click(r, c):
            x, y = app.index_to_hex(r, c)
            xp, yp = app.ax.transData.transform((x, y))
            ev = MouseEvent(
                "button_press_event", app.fig.canvas, xp, yp,
                button=1,
            )
            app.fig.canvas.callbacks.process(
                "button_press_event", ev
            )

        app.current_color = 1
        click(0, 0)   # A1
        click(4, 3)   # D5
        app.current_color = 2
        click(11, 15)  # P12
        assert app.canvas_colors().count(1) == 2
        assert app.canvas_colors().count(2) == 1

        # expected plate, built the reference way: ExportPlate =
        # deepcopy(BASE_SEQUENCES); seq += ' ' + long;
        # name = name[:-3] + short; color appended as int
        expected = deepcopy([
            list(r) for r in ds.base_sequences
        ])
        expected[0] = ["Position", "Name", "Sequence", "Color"]
        tablelong = {
            1: ds.get_paint_sequence("5xR1"),
            2: ds.get_paint_sequence("P3"),
        }
        tableshort = {1: "5xR1", 2: "P3"}
        colors = app.canvas_colors()
        for i, color in enumerate(colors):
            if color:
                expected[1 + i][2] += " " + tablelong[color]
                expected[1 + i][1] = (
                    expected[1 + i][1][:-3] + tableshort[color]
                )
            expected[1 + i] = expected[1 + i][:3] + [color]
        ref_plate = design.convertPlateIndexColor(
            expected, "CUSTOM"
        )

        got = design.convertPlateIndexColor(
            app.to_plate(), "CUSTOM"
        )
        assert got == ref_plate
        # removed sites export as blanks in the plate positions
        blank = [r for r in got if r[1] == "C2"]
        assert blank and blank[0][2] == " "

        # round-trip through the CSV
        path = str(tmp_path / "plate.csv")
        app.export_plates(path)
        back = design.readPlate(path)
        assert back[0][:2] == ["PLATE NAME", "PLATE POSITION"]
        assert len(back) == 2 * 8 * 12 + 1

    def test_prepare_plate_modes(self):
        app = gui.DesignApp()
        app.set_extension(3, "P5")
        app.grid[0, 0] = 3
        one = app.prepare_plate(1)
        assert len(one) == 1
        assert one[0][0][0] == "PLATE NAME"
        full = app.prepare_plate(2)
        # colors used: {0, 3} -> two full plates
        assert len(full) == 2

    def test_palette_click_and_erase(self):
        from matplotlib.backend_bases import MouseEvent

        app = gui.DesignApp()

        def click_at(x, y):
            xp, yp = app.ax.transData.transform((x, y))
            ev = MouseEvent(
                "button_press_event", app.fig.canvas, xp, yp,
                button=1,
            )
            app.fig.canvas.callbacks.process(
                "button_press_event", ev
            )

        # select color 4 from the palette column
        for k, (x, y) in app._palette_positions():
            if k == 4:
                click_at(x, y)
        assert app.current_color == 4
        x, y = app.index_to_hex(5, 5)
        click_at(x, y)
        assert app.grid[5, 5] == 4
        # clicking again with the same color erases (reference :1069)
        click_at(x, y)
        assert app.grid[5, 5] == 0

    def test_load_reference_canvas_yaml(self, tmp_path):
        """A yaml with the reference saveCanvas keys loads."""
        import yaml

        from picasso_tpu.gui.apps import ORIGAMI_SITES

        app = gui.DesignApp()
        structure = []
        for r, c in ORIGAMI_SITES:
            color = 2 if (r, c) == (3, 4) else 0
            structure.append(
                [app.index_to_str(r, c)[0], r + 1, color]
            )
        doc = {
            "Generated by": "Picasso v0.x Design",
            "Structure": structure,
            "Extensions Short": ["P1"] + ["None"] * 6,
            "Extensions Long": ["TT"] + ["None"] * 6,
            "Structure.StructureX": "",
            "Structure.StructureY": "",
            "Structure.StructureEx": "",
        }
        path = str(tmp_path / "ref_design.yaml")
        with open(path, "w") as f:
            yaml.dump(doc, f)
        app.load_design(path)
        assert app.grid[3, 4] == 2
        assert app.tableshort[0] == "P1"


class TestToRawApp:
    def test_queue_and_convert(self, tmp_path, monkeypatch):
        calls = []
        from picasso_tpu import io

        monkeypatch.setattr(io, "to_raw", lambda p: calls.append(p))
        app = gui.ToRawApp()
        app.add(str(tmp_path / "a.tif"))
        app.add(str(tmp_path / "b.tif"))
        done = []
        out = app.run(progress=done.append)
        assert len(calls) == 2
        assert done == [1, 2]
        assert app.queue == []
        assert all(p.endswith(".ome.raw") for p in out)


class TestAverage3App:
    def test_runs_and_saves(self, tmp_path):
        from tests.test_average3 import _dataset, INFO as INFO3

        app = gui.Average3App(_dataset(n_groups=6), INFO3,
                              oversampling=8)
        out = app.run(iterations=1, rot_axes=("z",))
        assert app.iterations_done == 1
        assert abs(out["x"].mean()) < 0.2
        path = str(tmp_path / "avg3_locs.hdf5")
        app.save(path)
        from picasso_tpu import io

        back, info = io.load_locs(path)
        assert info[-1]["Generated by"] == "Picasso Average3"
        assert "z" in back.columns
        # no locs silently dropped by the save-time sanity filter
        assert len(back) == len(out)


class TestRotationAppAnimation:
    def _locs3d(self, n=500, seed=0):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "frame": rng.integers(0, 50, n).astype(np.uint32),
            "x": rng.uniform(4, 28, n).astype(np.float32),
            "y": rng.uniform(4, 28, n).astype(np.float32),
            "z": rng.uniform(-300, 300, n).astype(np.float32),
            "photons": rng.uniform(500, 2000, n).astype(np.float32),
            "lpx": np.full(n, 0.05, np.float32),
            "lpy": np.full(n, 0.05, np.float32),
        })

    def test_rotated_rgb_with_axes_overlay(self, tmp_path):
        import numpy as np

        from picasso_tpu import gui

        info = [{"Frames": 50, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        app = gui.RotationApp(self._locs3d(), info)
        rgb, n = app.render_frame()
        assert rgb.ndim == 3 and rgb.shape[2] == 3
        assert n == 500
        app.rotate(dy=np.radians(30))
        path = tmp_path / "rot.png"
        app.export_view(str(path))
        assert path.exists()

    def test_keyframe_animation_gif(self, tmp_path):
        import numpy as np

        from picasso_tpu import gui

        info = [{"Frames": 50, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        app = gui.RotationApp(self._locs3d(200), info,
                              oversampling=4.0)
        app.add_keyframe()
        app.rotate(dy=np.radians(90))
        app.add_keyframe()
        gif = tmp_path / "anim.gif"
        n_frames = app.build_animation(str(gif), n_frames_between=4,
                                       fps=5)
        assert n_frames == 5
        assert gif.exists() and gif.stat().st_size > 0


class TestSpinnaAppWorkflow:
    def _app(self):
        import numpy as np

        from picasso_tpu import gui

        app = gui.SpinnaApp()
        mono = app.new_structure("monomer")
        app.set_structure_coordinates(0, "T", [0.0], [0.0])
        dim = app.new_structure("dimer")
        app.set_structure_coordinates(1, "T", [0.0, 20.0], [0.0, 0.0])
        return app

    def test_structure_editor_and_save(self, tmp_path):
        from picasso_tpu import spinna

        app = self._app()
        fig = app.plot_structure(1)
        assert fig is not None
        path = tmp_path / "structs.yaml"
        app.save_structures(str(path))
        loaded, targets = spinna.load_structures(str(path))
        assert [s.title for s in loaded] == ["monomer", "dimer"]
        assert targets == ["T"]
        app.delete_structure_target(0, "T")
        assert app.structures[0].targets == []

    def test_search_space_sim_and_nnd(self, tmp_path):
        import numpy as np

        app = self._app()
        space = app.generate_search_space({"T": 100}, granularity=5)
        assert set(space) == {"monomer", "dimer"}
        lengths = {len(v) for v in space.values()}
        assert len(lengths) == 1 and lengths.pop() > 1

        np.random.seed(3)
        app.build_mixer(
            label_unc={"ALL": 3.0}, le={"ALL": 1.0},
            width=5000.0, height=5000.0,
        )
        gt = app.mixer.run_simulation([30, 35])
        app.set_experimental_data("T", gt["T"])
        de, ds = app.run_single_simulation([30, 35], N_sim=1)
        assert len(de) == len(ds) >= 1
        fig = app.plot_nnd()
        assert fig is not None
        paths = app.save_nnd_values(str(tmp_path / "nnd"))
        assert paths and all(
            __import__("os").path.exists(p) for p in paths
        )

    def test_mask_generation(self, tmp_path):
        import numpy as np
        import pandas as pd

        app = self._app()
        rng = np.random.default_rng(0)
        locs = pd.DataFrame({
            "frame": rng.integers(0, 100, 2000).astype(np.uint32),
            "x": rng.uniform(2, 14, 2000).astype(np.float32),
            "y": rng.uniform(2, 14, 2000).astype(np.float32),
        })
        info = [{"Frames": 100, "Height": 16, "Width": 16,
                 "Pixelsize": 130}]
        mask = app.generate_mask(locs, info, binsize=260.0,
                                 sigma=260.0)
        assert mask.ndim == 2 and mask.max() > 0
        app.save_mask(str(tmp_path / "mask.npy"))
        assert (tmp_path / "mask.npy").exists()


class TestSimulateAppDesigner:
    def test_structure_builders_and_positions(self):
        import numpy as np

        from picasso_tpu import gui

        app = gui.SimulateApp(imagesize=32)
        s = app.grid_structure(3, 4, 20, 20)
        assert s.shape == (4, 12)
        # centered in px: mean ~ 0
        assert abs(s[0].mean()) < 1e-9
        s2 = app.circle_structure(8, 100.0)
        assert s2.shape == (4, 8)
        r = np.hypot(s2[0], s2[1]) * 130.0
        np.testing.assert_allclose(r, 50.0, atol=1e-6)
        fig = app.plot_structure()
        assert fig is not None
        pos = app.generate_positions(25, frame=3, arrangement=0)
        assert pos.shape == (25, 2)
        assert pos.min() >= 3 and pos.max() <= 29
        assert app.plot_positions() is not None

    def test_noise_calibration_recovers_model(self):
        import numpy as np

        from picasso_tpu import gui, simulate

        rng = np.random.default_rng(0)
        conc = rng.uniform(1, 10, 30)
        laser = rng.uniform(10, 80, 30)
        itime = rng.uniform(50, 300, 30)
        bg = simulate.fitFuncBg(
            np.array([conc, laser, itime]), 0.02, 0.005
        ) * rng.normal(1, 0.01, 30)
        bgstd = simulate.fitFuncStd(
            np.array([laser, itime, bg]), 1e-4, 0.1, 2.0
        ) * rng.normal(1, 0.01, 30)
        out = gui.SimulateApp().calibrate_noise(
            bg, bgstd, laser, itime, conc
        )
        assert abs(out["laserc"] - 0.02) < 0.005
        assert abs(out["imagerc"] - 0.005) < 0.002
        assert abs(out["equation_b"] - 0.1) < 0.05

    def test_sigmafilter(self):
        import numpy as np

        from picasso_tpu import simulate

        data = np.concatenate([np.zeros(100), [100.0]])
        out = simulate.sigmafilter(data, 2)
        assert 100.0 not in out


class TestDesignSimulateHandoff:
    def test_export_import_roundtrip(self, tmp_path):
        import numpy as np

        from picasso_tpu import gui

        d = gui.DesignApp()
        d.grid[0, 0] = 1   # A1
        d.grid[2, 1] = 2   # B3 (odd column -> half-pitch y offset)
        path = str(tmp_path / "design.yaml")
        d.export_design(path)

        xs, ys, ex = d.structure_nm()
        assert xs == [0.0, 5.0]
        assert ys[0] == 2.5            # 2.5 + 5*0
        assert ys[1] == 2.5 + 10 + 2.5  # row 2 on odd column
        assert ex == [1, 2]

        s = gui.SimulateApp()
        structure = s.import_design(path)
        assert structure.shape == (4, 2)
        # centered, px units; pairwise geometry preserved
        dx_nm = (structure[0, 1] - structure[0, 0]) * 130.0
        dy_nm = (structure[1, 1] - structure[1, 0]) * 130.0
        assert dx_nm == __import__("pytest").approx(5.0, abs=1e-6)
        assert dy_nm == __import__("pytest").approx(12.5, abs=1e-6)
        np.testing.assert_array_equal(structure[2], [1, 2])


class TestNanotronAppWorkflow:
    def _make_locs(self, kind, n_picks, rng):
        import numpy as np
        import pandas as pd

        rows = []
        for g in range(n_picks):
            cx, cy = rng.uniform(5, 27, 2)
            if kind == "spot":
                pts = rng.normal((cx, cy), 0.05, (60, 2))
            else:
                ang = rng.uniform(0, 2 * np.pi, 60)
                pts = np.column_stack([
                    cx + 0.4 * np.cos(ang), cy + 0.4 * np.sin(ang),
                ]) + rng.normal(0, 0.03, (60, 2))
            for p in pts:
                rows.append((g, p[0], p[1]))
        arr = np.array(rows)
        return pd.DataFrame({
            "frame": np.arange(len(arr), dtype=np.uint32) % 100,
            "x": arr[:, 1].astype(np.float32),
            "y": arr[:, 2].astype(np.float32),
            "group": arr[:, 0].astype(np.int32),
            "lpx": np.full(len(arr), 0.03, np.float32),
            "lpy": np.full(len(arr), 0.03, np.float32),
        })

    def test_full_training_workflow(self, tmp_path):
        import numpy as np

        from picasso_tpu import gui

        rng = np.random.default_rng(1)
        app = gui.NanotronApp()
        app.add_train_dataset(
            self._make_locs("spot", 10, rng), 0, "spots"
        )
        app.add_train_dataset(
            self._make_locs("ring", 10, rng), 1, "rings"
        )
        n = app.prepare_training_data()
        assert n > 20  # rotation augmentation multiplies picks
        stats = app.train_with_stats(
            test_fraction=0.25, max_iter=60
        )
        assert stats["test_score"] > 0.7
        cm = stats["confusion_matrix"]
        assert cm.sum() == max(1, int(n * 0.25))
        fig = app.plot_learning_stats()
        assert fig is not None
        assert len(app.model.loss_curve_) == 60

        # classify fresh picks with probability filtering
        fresh = self._make_locs("ring", 6, rng)
        out = app.predict_all(
            fresh, pick_radius=1.0, oversampling=10.0,
            min_probability=0.5,
        )
        assert set(out.columns) == {
            "group", "prediction", "probability"
        }
        assert (out["prediction"] == 1).mean() > 0.6

        # save/load round trip through the app
        path = str(tmp_path / "model.pkl")
        app.save_model(path)
        app2 = gui.NanotronApp()
        app2.load(path)
        out2 = app2.predict_all(fresh, 1.0, 10.0)
        assert len(out2) == 6


class TestRotationSaveRoundtrip:
    def test_save_and_reopen_in_render(self, tmp_path):
        import numpy as np
        import pandas as pd

        from picasso_tpu import gui, io

        rng = np.random.default_rng(1)
        n = 300
        locs = pd.DataFrame({
            "frame": rng.integers(0, 100, n).astype(np.uint32),
            "x": rng.uniform(14, 18, n).astype(np.float32),
            "y": rng.uniform(14, 18, n).astype(np.float32),
            "z": rng.uniform(-200, 200, n).astype(np.float32),
            "photons": np.full(n, 1000, np.float32),
            "sx": np.full(n, 1.0, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 10, np.float32),
            "lpx": np.full(n, 0.03, np.float32),
            "lpy": np.full(n, 0.03, np.float32),
        })
        info = [{
            "Frames": 100, "Height": 32, "Width": 32,
            "Pixelsize": 130,
        }]
        app = gui.RotationApp(locs, info)
        app.rotate(dz=np.pi / 4)
        path = str(tmp_path / "rot_locs.hdf5")
        app.save_rotated_locs(
            path, pick=(16.0, 16.0), pick_shape="Circle",
            pick_size=2.0,
        )
        back, binfo = io.load_locs(path)
        assert len(back) == n
        last = binfo[-1]
        assert last["Pick shape"] == "Circle"
        assert last["angz"] == __import__("pytest").approx(
            np.pi / 4
        )
        assert last["Pick size (nm)"] == 260.0
        assert len(last["Quaternion (x, y, z, w)"]) == 4

        render_app = gui.RenderApp(locs, info, blur_method=None)
        render_app.dynamic_oversampling = False
        render_app.open_rotated_locs(path)
        assert render_app.pick_shape == "Circle"
        assert len(render_app.picks) == 1
        import matplotlib.pyplot as plt

        plt.close("all")
