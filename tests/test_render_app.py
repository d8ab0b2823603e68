"""Scripted Agg sessions driving the full-workflow RenderApp.

The headline test drives pick -> undrift -> cluster -> RESI entirely
through the app, mirroring an interactive session in the reference
flagship viewer (picasso/gui/render.py)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import gui, io

INFO = [
    {"Frames": 200, "Height": 32, "Width": 32, "Pixelsize": 130}
]
N_FRAMES = 200
TRUE_DRIFT_X = 0.004  # px / frame
TRUE_DRIFT_Y = -0.003

SITES = np.array(
    [(y, x) for y in (10, 16, 22) for x in (10, 16, 22)], float
)


def _make_channel(seed, fiducial=(6.0, 6.0), site_shift=0.0):
    """Synthetic drifting channel: 9 binding sites + 1 fiducial."""
    rng = np.random.default_rng(seed)
    frames, xs, ys = [], [], []
    # fiducial: one loc every frame
    frames.append(np.arange(N_FRAMES))
    xs.append(np.full(N_FRAMES, fiducial[0]))
    ys.append(np.full(N_FRAMES, fiducial[1]))
    # sites: 40 locs each, sigma 0.03 px
    for sy, sx in SITES:
        f = rng.integers(0, N_FRAMES, 40)
        frames.append(f)
        xs.append(sx + site_shift + rng.normal(0, 0.03, 40))
        ys.append(sy + site_shift + rng.normal(0, 0.03, 40))
    frame = np.concatenate(frames).astype(np.uint32)
    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.float32)
    # linear stage drift
    x = x + TRUE_DRIFT_X * frame
    y = y + TRUE_DRIFT_Y * frame
    n = len(frame)
    locs = pd.DataFrame(
        {
            "frame": frame,
            "x": x.astype(np.float32),
            "y": y.astype(np.float32),
            "photons": rng.uniform(500, 3000, n).astype(np.float32),
            "sx": np.full(n, 0.9, np.float32),
            "sy": np.full(n, 0.9, np.float32),
            "bg": np.full(n, 50, np.float32),
            "lpx": np.full(n, 0.03, np.float32),
            "lpy": np.full(n, 0.03, np.float32),
        }
    )
    return locs.sort_values("frame").reset_index(drop=True)


def _locs3d(n=3000, seed=1):
    rng = np.random.default_rng(seed)
    locs = _make_channel(seed)
    locs = locs.iloc[: min(n, len(locs))].copy()
    locs["z"] = rng.uniform(-400, 400, len(locs)).astype(np.float32)
    return locs


class TestWorkflowSession:
    """pick -> undrift -> cluster -> RESI, scripted end to end."""

    def test_pick_undrift_cluster_resi(self, tmp_path):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.add_channel(_make_channel(1, site_shift=0.15), INFO)

        # -- pick the fiducial (Tools > pick) --
        app.set_pick_shape("Circle")
        app.pick_diameter = 3.0
        app.add_pick((6.0, 6.0))
        assert len(app.picks) == 1

        # -- undrift both channels from the picked fiducial --
        for ch in range(2):
            app.current_channel = ch
            drift = app.undrift_from_picked()
            # recovered drift must match the simulated linear drift
            t = np.arange(N_FRAMES)
            true_x = TRUE_DRIFT_X * t - np.mean(TRUE_DRIFT_X * t)
            got_x = drift["x"].to_numpy()
            got_x = got_x - got_x.mean()
            assert np.max(np.abs(got_x - true_x)) < 0.02
            assert app.channel.drift is not None

        # -- site spread must collapse after undrifting --
        app.current_channel = 0
        locs = app.locs
        near = (
            np.hypot(
                locs["x"] - SITES[0][1], locs["y"] - SITES[0][0]
            ) < 0.5
        )
        assert locs["x"][near].std() < 0.08

        # -- cluster the first channel in place (SMLM clusterer) --
        app.picks = []
        n_groups = app.smlm_clusterer(radius_xy=0.25, min_locs=15)
        assert n_groups == len(SITES) + 1  # 9 sites + fiducial
        app.undo()  # restore unclustered locs for RESI
        assert "group" not in app.locs.columns

        # -- RESI across the two channels --
        idx, centers = app.resi(radius_xy=0.25, min_locs=15)
        assert idx == 2  # appended as a new channel
        assert set(centers["resi_channel_id"]) == {0, 1}
        # each channel contributes its 9 sites + fiducial cluster
        assert len(centers) == 2 * (len(SITES) + 1)

        # center positions recover the true sites to < 0.03 px
        # (undrifting zero-means the drift, so the mean drift offset
        # remains on every position)
        offx = TRUE_DRIFT_X * np.mean(np.arange(N_FRAMES))
        offy = TRUE_DRIFT_Y * np.mean(np.arange(N_FRAMES))
        ch0 = centers[centers["resi_channel_id"] == 0]
        for sy, sx in SITES:
            d = np.hypot(
                ch0["x"] - (sx + offx), ch0["y"] - (sy + offy)
            )
            assert d.min() < 0.03

        # -- save the RESI channel through the app --
        out = tmp_path / "resi.hdf5"
        app.current_channel = idx
        app.save_locs(str(out))
        saved, info = io.load_locs(str(out))
        assert len(saved) == len(centers)


class TestPickShapes:
    def test_rectangle_polygon_square_roundtrip(self, tmp_path):
        app = gui.RenderApp(_make_channel(0), INFO)

        app.set_pick_shape("Rectangle")
        app.pick_width = 2.0
        app.add_pick(((9.0, 8.0), (11.0, 12.0)))
        n_rect = sum(len(p) for p in app.picked_locs())
        assert n_rect > 0
        path = tmp_path / "rect.yaml"
        app.save_picks(str(path))
        app2 = gui.RenderApp(_make_channel(0), INFO)
        app2.load_picks(str(path))
        assert app2.pick_shape == "Rectangle"
        assert app2.pick_width == pytest.approx(2.0)
        assert sum(len(p) for p in app2.picked_locs()) == n_rect

        app.set_pick_shape("Polygon")
        assert app.picks == []  # shape change clears picks
        app.add_pick([(8, 8), (12, 8), (12, 12), (8, 12)])
        picked = app.picked_locs()
        assert len(picked) == 1 and len(picked[0]) > 0
        path = tmp_path / "poly.yaml"
        app.save_picks(str(path))
        app2.load_picks(str(path))
        assert app2.pick_shape == "Polygon"
        assert len(app2.picked_locs()[0]) == len(picked[0])

        app.set_pick_shape("Square")
        app.pick_side = 2.0
        app.add_pick((10.0, 10.0))
        assert len(app.picked_locs()[0]) > 0

    def test_polygon_incremental_click_close(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.set_pick_shape("Polygon")
        assert not app.add_polygon_point(8, 8)
        assert not app.add_polygon_point(12, 8)
        assert not app.add_polygon_point(12, 12)
        # clicking near the first vertex closes the polygon
        assert app.add_polygon_point(8.05, 8.05)
        assert len(app.picks) == 1
        assert app.picks[0][0] == app.picks[0][-1]  # closed

    def test_pick_editing(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.pick_diameter = 2.0
        app.add_pick((10, 10))
        app.add_pick((20, 20))
        app.remove_closest_pick(19, 19)
        assert app.picks == [(10.0, 10.0)]
        app.clear_picks()
        assert app.picks == []

    def test_filter_picks_by_count(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.pick_diameter = 1.0
        app.add_pick((10, 10))  # dense site
        app.add_pick((28, 28))  # empty corner
        kept = app.filter_picks(min_locs=5)
        assert kept == 1
        assert app.picks == [(10.0, 10.0)]

    def test_subtract_pick_regions(self, tmp_path):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.pick_diameter = 2.0
        app.add_pick((10, 10))
        app.add_pick((22, 22))
        other = tmp_path / "other.yaml"
        io.save_picks(
            str(other), [[10.0, 10.0]], "Circle", size=4.0,
            pixelsize=130,
        )
        removed = app.subtract_pick_regions(str(other))
        assert removed == 1
        assert app.picks == [(22.0, 22.0)]

    def test_pick_fiducials_and_move_to_pick(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        n = app.pick_fiducials()
        assert n >= 1
        centers = [app._pick_center(p) for p in app.picks]
        # drifted fiducial traj is centered near (6 + drift/2)
        assert any(
            abs(cx - 6.4) < 1.0 and abs(cy - 5.7) < 1.0
            for cx, cy in centers
        )
        app.move_to_pick(0)
        (y0, x0), (y1, x1) = app.viewport
        cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
        assert abs(cx - centers[0][0]) < 1e-6
        assert abs(cy - centers[0][1]) < 1e-6


class TestDisplayAndChannels:
    def test_multichannel_rgb_composite(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.add_channel(_make_channel(1), INFO)
        app.set_channel_color(0, (1.0, 0.0, 0.0))
        app.set_channel_color(1, (0.0, 1.0, 0.0))
        app.redraw()
        assert app.last_image.ndim == 3
        # red and green channels both populated
        assert app.last_image[..., 0].max() > 0
        assert app.last_image[..., 1].max() > 0
        app.set_channel_visible(1, False)
        app.redraw()

    def test_contrast_and_blur_controls(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.set_blur("gaussian")
        app.set_contrast(0.0, 10.0)
        assert app.contrast == (0.0, 10.0)
        app.set_contrast(None, None)
        assert app.contrast is None
        app.set_min_blur_width(0.01)
        app.set_invert_colors(True)
        app.redraw()
        app.set_invert_colors(False)

    def test_fast_render_subsamples(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        n_full = app.redraw()
        app.set_fast_render(0.25, seed=1)
        n_fast = app.redraw()
        assert n_fast < n_full * 0.5
        app.set_fast_render(1.0)
        assert app.redraw() == n_full

    def test_pan_zoom_fit(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        vp0 = app.viewport
        app.zoom_in()
        assert (
            app.viewport[1][0] - app.viewport[0][0]
            < vp0[1][0] - vp0[0][0]
        )
        app.pan_right()
        assert app.viewport[0][1] > 0
        app.fit_in_view()
        assert app.viewport == vp0

    def test_export_view_and_complete(self, tmp_path):
        app = gui.RenderApp(_make_channel(0), INFO)
        view_png = tmp_path / "view.png"
        app.export_view(str(view_png))
        assert view_png.exists()
        assert (tmp_path / "view.yaml").exists()
        full_png = tmp_path / "full.png"
        app.zoom_in()
        app.export_complete(str(full_png))
        assert full_png.exists()

    def test_show_info(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        info = app.show_info()
        assert info["Locs in view"] == len(app.locs)
        assert info["Channels"] == 1
        assert "Median lpx (px)" in info

    def test_calculate_and_plot_frc(self, tmp_path):
        import matplotlib.pyplot as plt

        # no fiducial: a 200-loc fixed point drives the NeNA lp (and
        # with it the FRC render oversampling = 2/lp) to ~0
        rng = np.random.default_rng(3)
        sites = rng.uniform(4, 28, (60, 2))
        f = np.repeat(np.arange(N_FRAMES), 3)
        s = rng.integers(0, len(sites), len(f))
        locs = pd.DataFrame(
            {
                "frame": f.astype(np.uint32),
                "x": (sites[s, 1] + rng.normal(0, 0.1, len(f))
                      ).astype(np.float32),
                "y": (sites[s, 0] + rng.normal(0, 0.1, len(f))
                      ).astype(np.float32),
                "lpx": np.full(len(f), 0.1, np.float32),
                "lpy": np.full(len(f), 0.1, np.float32),
            }
        )
        app = gui.RenderApp(locs, INFO)
        result = app.calculate_frc(
            save_images=str(tmp_path / "frc.npy")
        )
        assert app.frc_result is result
        n = len(result["frc_curve"])
        assert n > 10 and len(result["frequencies"]) == n
        # sites are 0.03 px tight -> a resolution crossing must exist
        # and sit in the physically sensible range
        assert result["resolution"] is not None
        assert 1 < result["resolution"] < 500  # nm
        assert (tmp_path / "frc_half1.npy").exists()
        fig = app.plot_frc()
        try:
            assert "FRC resolution" in fig.axes[0].get_title()
        finally:
            plt.close(fig)
        plt.close(app.fig)


class TestSlicer:
    def test_slices_partition_z(self, tmp_path):
        app = gui.RenderApp(_locs3d(), INFO)
        app.start_slicer(thickness_nm=200.0)
        assert app.n_slices() == 4
        counts = []
        for i in range(app.n_slices()):
            app.set_slice(i)
            counts.append(app.redraw())
        assert sum(counts) == len(app.locs)
        app.stop_slicer()
        assert app.redraw() == len(app.locs)

    def test_requires_z(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        with pytest.raises(ValueError):
            app.start_slicer()


class TestMaskAndTraces:
    def test_mask_image_split(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        mask, locs_in, locs_out = app.mask_image(
            "otsu", disp_px_size=260.0, blur=520.0
        )
        assert mask.dtype == bool
        assert len(locs_in) + len(locs_out) == len(app.locs)
        assert len(locs_in) > 0

    def test_apply_mask_undo(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        n0 = len(app.locs)
        # every loc sits on a bright site, so keeping the OUTSIDE of
        # the otsu mask must drop most of them
        app.apply_mask("otsu", keep="out", disp_px_size=260.0,
                       blur=520.0)
        assert len(app.locs) < n0
        app.undo()
        assert len(app.locs) == n0

    def test_show_trace_and_kmeans(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.pick_diameter = 3.0
        app.add_pick((6.0, 6.0))  # fiducial: present every frame
        trace = app.show_trace(0)
        assert (trace["photons"] > 0).mean() > 0.9
        fig = app.plot_trace(0)
        assert fig is not None
        scatter = app.pick_scatter(0)
        assert scatter.shape[1] == 2
        labeled = app.cluster_in_pick_kmeans(0, n_clusters=2)
        assert set(labeled["group"]) == {0, 1}


class TestPostprocessActions:
    def test_link_reduces_locs(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        n0 = len(app.locs)
        app.link(r_max=0.2, max_dark_time=2)
        assert len(app.locs) < n0
        assert "len" in app.locs.columns
        app.undo()
        assert len(app.locs) == n0

    def test_dbscan_and_remove_columns(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        n_clusters = app.dbscan(radius=0.3, min_density=10)
        assert n_clusters >= len(SITES)
        app.remove_columns(["bg"])
        assert "bg" not in app.locs.columns

    def test_save_pick_properties(self, tmp_path):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.pick_diameter = 1.5
        for sy, sx in SITES[:3]:
            app.add_pick((sx, sy), redraw=False)
        path = tmp_path / "props.hdf5"
        props = app.save_pick_properties(str(path))
        assert len(props) == 3
        assert "n_units" in props.columns
        assert path.exists()

    def test_nearest_neighbor(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        app.add_channel(_make_channel(1), INFO)
        nn = app.nearest_neighbor(0, 1, nn_count=2)
        assert nn.shape == (len(app.channels[0].locs), 2)
        assert np.all(nn >= 0)

    def test_apply_drift_file(self, tmp_path):
        app = gui.RenderApp(_make_channel(0), INFO)
        drift = pd.DataFrame({
            "x": np.linspace(0, 1, N_FRAMES),
            "y": np.zeros(N_FRAMES),
        })
        path = tmp_path / "drift.txt"
        io.save_drift(str(path), drift)
        x0 = app.locs["x"].to_numpy().copy()
        app.apply_drift_file(str(path))
        assert not np.allclose(app.locs["x"].to_numpy(), x0)
        assert app.channel.drift is not None
        app.save_drift(str(tmp_path / "drift_out.txt"))
        fig = app.show_drift()
        assert fig is not None


class TestStatusAndPlugins:
    def test_status_log_records(self):
        messages = []
        app = gui.RenderApp(
            _make_channel(0), INFO, status_callback=messages.append
        )
        app.pick_diameter = 3.0
        app.add_pick((6.0, 6.0))
        app.pick_similar()
        assert any("picks" in m for m in messages)


class TestAppBridges:
    def test_open_rotation_window_from_pick(self):
        app = gui.RenderApp(_locs3d(), INFO)
        app.pick_diameter = 6.0
        app.add_pick((16.0, 16.0))
        rot = app.open_rotation_window(0)
        assert rot.locs is not None and len(rot.locs) > 0
        n = rot.redraw()
        assert n == len(rot.locs)

    def test_rotation_window_requires_z(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        with pytest.raises(ValueError):
            app.open_rotation_window()

    def test_open_filter_window(self):
        app = gui.RenderApp(_make_channel(0), INFO)
        f = app.open_filter_window()
        n0 = f.n_filtered
        f.apply_filter("photons", 0, 1e9)
        assert f.n_filtered == n0


class TestApplyExpression:
    """View > Apply expression (reference gui/render.py:275
    ApplyDialog + :12710 open_apply_dialog semantics)."""

    def _app(self):
        locs = _make_channel(seed=4)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        return app

    def test_generic_shift(self):
        app = self._app()
        x0 = app.locs["x"].to_numpy().copy()
        app.apply_expression("x += 2")
        # ensure_sanity clips to the movie extent afterwards
        expect = np.minimum(x0 + 2, INFO[0]["Width"])
        kept = app.locs["x"].to_numpy()
        assert len(kept) <= len(x0)
        assert kept.max() <= INFO[0]["Width"]
        assert np.isclose(
            np.median(kept) - np.median(x0), 2.0, atol=0.2
        )
        app.undo()
        np.testing.assert_allclose(app.locs["x"].to_numpy(), x0)

    def test_flip_xy(self):
        app = self._app()
        x0 = app.locs["x"].to_numpy().copy()
        y0 = app.locs["y"].to_numpy().copy()
        app.apply_expression("flip x y")
        np.testing.assert_allclose(app.locs["x"].to_numpy(), y0)
        np.testing.assert_allclose(app.locs["y"].to_numpy(), x0)

    def test_flip_xz(self):
        locs = _make_channel(seed=4)
        locs["z"] = np.linspace(
            -200, 200, len(locs)
        ).astype(np.float32)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        x0 = app.locs["x"].to_numpy().copy()
        z0 = app.locs["z"].to_numpy().copy()
        app.apply_expression("flip x z")
        pixelsize = INFO[0]["Pixelsize"]
        width = INFO[0]["Width"]
        np.testing.assert_allclose(
            app.locs["x"].to_numpy(),
            np.clip(z0 / pixelsize + width / 2, 0, width),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            app.locs["z"].to_numpy(), x0 * pixelsize, rtol=1e-5
        )

    def test_spiral_and_uspiral(self):
        app = self._app()
        x0 = app.locs["x"].to_numpy().copy()
        y0 = app.locs["y"].to_numpy().copy()
        app.apply_expression("spiral 2 3")
        moved = app.locs["x"].to_numpy()
        assert not np.allclose(moved, x0)
        app.apply_expression("uspiral")
        np.testing.assert_allclose(app.locs["x"].to_numpy(), x0)
        np.testing.assert_allclose(app.locs["y"].to_numpy(), y0)

    def test_uspiral_before_spiral_is_noop(self):
        app = self._app()
        msgs = []
        app.status.callback = msgs.append
        x0 = app.locs["x"].to_numpy().copy()
        app.apply_expression("uspiral")
        np.testing.assert_allclose(app.locs["x"].to_numpy(), x0)
        assert any("spiraled" in m for m in msgs)


class TestPickProfileAndExports:
    def _app_with_rect_pick(self):
        locs = _make_channel(seed=5)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        app.set_pick_shape("Rectangle")
        app.pick_width = 4.0
        app.add_pick(((16.0, 8.0), (16.0, 24.0)))  # vertical axis
        return app

    def test_plot_pick_profile(self, tmp_path):
        app = self._app_with_rect_pick()
        res = app.plot_pick_profile(bin_width_nm=130.0)
        assert len(res["profiles"]) == 1
        prof = res["profiles"][0]
        assert len(prof) > 100
        # positions along the 16-px axis, in nm
        assert prof.min() >= -1e-6
        assert prof.max() <= 16.5 * 130
        assert sum(res["counts"][0]) == len(prof)
        path = str(tmp_path / "profile.csv")
        app.export_profile(path)
        import csv

        with open(path) as f:
            rows = list(csv.reader(f))
        assert len(rows) == len(prof) + 1

    def test_profile_requires_rectangle(self):
        locs = _make_channel(seed=5)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        with pytest.raises(AssertionError, match="rectangular"):
            app.plot_pick_profile()

    def test_picked_locs_rect_has_rot_columns(self):
        app = self._app_with_rect_pick()
        picked = app.picked_locs()[0]
        assert "x_pick_rot" in picked.columns
        assert "y_pick_rot" in picked.columns
        # the axis is vertical: y_pick_rot spans the axis length
        span = picked["y_pick_rot"].max() - picked["y_pick_rot"].min()
        assert span > 10

    def test_keep_picks(self):
        locs = _make_channel(seed=5)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        for p in [(6.0, 6.0), (16.0, 16.0), (22.0, 22.0)]:
            app.add_pick(p)
        app.keep_picks([0, 2])
        assert len(app.picks) == 2
        assert app.picks[1] == (22.0, 22.0)

    def test_export_roi_imaris_roundtrip(self, tmp_path):
        from picasso_tpu import io

        locs = _make_channel(seed=5)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        app.oversampling = 4.0
        path = str(tmp_path / "fov.ims")
        stack = app.export_roi_imaris(path)
        assert stack.shape[0] == 1
        movie, info = io.load_movie(path) if False else (None, None)
        ims = io.IMSMovie(path)
        frame = np.asarray(ims[0])
        assert frame.shape == stack.shape[1:]
        ims.close()

    def test_open_rotated_locs_restores_pick(self, tmp_path):
        from picasso_tpu import io

        locs = _make_channel(seed=5)
        info = list(INFO) + [{
            "Generated by": "Picasso Render : Rotate",
            "Pick": (16.0, 16.0),
            "Pick shape": "Circle",
            "Pick size (nm)": 2.0,
        }]
        path = str(tmp_path / "rot_locs.hdf5")
        io.save_locs(path, locs, info)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        i = app.open_rotated_locs(path)
        assert app.pick_shape == "Circle"
        assert app.pick_diameter == 2.0
        assert len(app.picks) == 1

    def test_annotate_picks_draws_labels(self):
        locs = _make_channel(seed=5)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        app.add_pick((6.0, 6.0))
        app.annotate_picks = True
        app.redraw()
        texts = [t.get_text() for t in app.ax.texts]
        assert "0" in texts


class TestOverlaysAndPickInspection:
    def _app(self, n_channels=1):
        locs = _make_channel(seed=6)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        for k in range(1, n_channels):
            app.add_channel(
                _make_channel(seed=6 + k), list(INFO),
                path=f"/tmp/ch{k}_locs.hdf5",
            )
        return app

    def test_scalebar_optimal_and_fixed(self):
        app = self._app()
        app.show_scalebar = True
        app.redraw()
        # a white 3-pt bar drawn over the scene
        bars = [
            ln for ln in app.ax.lines if ln.get_linewidth() == 3
        ]
        assert len(bars) == 1
        x0, x1 = bars[0].get_xdata()
        from picasso_tpu import render as r

        expect_nm = r.optimal_scalebar_length(130, 32)
        assert abs(x1 - x0) == pytest.approx(
            expect_nm / 130, rel=1e-6
        )
        app.scalebar_length_nm = 1300.0
        app.redraw()
        bars = [
            ln for ln in app.ax.lines if ln.get_linewidth() == 3
        ]
        assert abs(
            bars[0].get_xdata()[1] - bars[0].get_xdata()[0]
        ) == pytest.approx(10.0, rel=1e-6)

    def test_legend_multichannel(self):
        app = self._app(n_channels=2)
        app.show_legend = True
        app.redraw()
        texts = [t.get_text() for t in app.ax.texts]
        assert any("ch1" in t for t in texts)

    def test_minimap_shows_viewport(self):
        app = self._app()
        app.show_minimap = True
        app.zoom(0.5, center=(16.0, 16.0))
        assert hasattr(app, "_minimap_ax")
        assert app._minimap_ax.get_xlim() == (0, 32)

    def test_show_pick_scatter_figures(self):
        import matplotlib.pyplot as plt

        app = self._app()
        app.pick_diameter = 2.0
        app.add_pick((16.0, 16.0))
        fig = app.show_pick(0)
        assert len(fig.axes) == 1
        plt.close(fig)
        fig = app.select_traces()
        assert len(fig.axes) == 1
        plt.close(fig)
        # 3D requires z
        with pytest.raises(AssertionError, match="z column"):
            app.show_pick_3d(0)
        app.locs = app.locs.assign(
            z=np.zeros(len(app.locs), np.float32)
        )
        fig = app.show_pick_3d(0)
        plt.close(fig)
        plt.close(app.fig)


class TestExportLocsFormats:
    def test_all_formats(self, tmp_path):
        locs = _make_channel(seed=7)
        # chimera/visp exports need z (they warn + skip without)
        locs["z"] = np.zeros(len(locs), np.float32)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        for fmt, ext in [
            ("imagej", ".txt"), ("nis", ".txt"),
            ("chimera", ".xyz"), ("visp", ".3d"),
            ("thunderstorm", ".csv"),
        ]:
            path = str(tmp_path / f"out_{fmt}{ext}")
            app.export_locs(path, fmt)
            import os as _os

            assert _os.path.getsize(path) > 0
        with pytest.raises(AssertionError, match="Unknown export"):
            app.export_locs(str(tmp_path / "x.bin"), "bin")


class TestQPaintCalibration:
    def test_pick_info_influx_units(self):
        locs = _make_channel(seed=8)
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        app.pick_diameter = 1.5
        for sy, sx in [(10, 10), (16, 16), (22, 22)]:
            app.add_pick((float(sx), float(sy)))
        stats = app.calculate_pick_info()
        assert stats["n_picks"] == 3
        assert stats["locs_per_pick_mean"] > 5
        assert stats["rmsd_mean"] < 1.0
        assert np.isfinite(stats["pooled dark"])
        influx = app.calibrate_influx(units_per_pick=1.0)
        assert influx == pytest.approx(
            1.0 / stats["pooled dark"]
        )
        n = app.n_units()
        # single binding site per pick at the calibration point:
        # pooled dark ~ mean dark -> ~1 unit
        assert 0.3 < n < 3.0
        import matplotlib.pyplot as plt

        plt.close(app.fig)


class TestRenderByProperty:
    def test_frame_coloring_round_trip(self):
        app = gui.RenderApp(
            _make_channel(seed=9), list(INFO), blur_method=None
        )
        app.dynamic_oversampling = False
        plain = app.render_scene()[0].copy()
        app.set_render_property("frame", n_colors=8)
        colored, n = app.render_scene()
        assert colored.shape == plain.shape
        assert n > 0
        # property rendering actually colors: the composite is no
        # longer a grayscale-equal-channels image
        assert not np.array_equal(colored, plain)
        app.clear_render_property()
        back = app.render_scene()[0]
        np.testing.assert_array_equal(back, plain)

    def test_unknown_property_raises(self):
        app = gui.RenderApp(
            _make_channel(seed=9), list(INFO), blur_method=None
        )
        with pytest.raises(AssertionError):
            app.set_render_property("nope")


class TestRotationWindowHandoff:
    def test_open_rotation_window_on_pick(self):
        import matplotlib.pyplot as plt

        locs = _locs3d()
        app = gui.RenderApp(locs, list(INFO), blur_method=None)
        app.dynamic_oversampling = False
        app.pick_diameter = 20.0
        app.add_pick((16.0, 16.0))
        rot = app.open_rotation_window(0)
        assert rot.locs["z"].notna().all()
        rot.rotate(dz=0.5)
        plt.close("all")
