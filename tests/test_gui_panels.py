"""Interactive widget panels (gui/panels.py) driven headlessly under
Agg — the matplotlib counterpart of the reference's
DisplaySettingsDialog (gui/render.py:6030), DatasetDialog (:378) and
InfoDialog (:4295). Widgets must drive the live RenderApp through its
public setters, and sync() must reflect scripted state back without
firing callbacks."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import gui, lib

INFO = [{"Frames": 100, "Height": 32, "Width": 32, "Pixelsize": 130}]


def _locs(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "frame": rng.integers(0, 100, n).astype(np.uint32),
            "x": rng.uniform(4, 28, n).astype(np.float32),
            "y": rng.uniform(4, 28, n).astype(np.float32),
            "photons": rng.uniform(500, 3000, n).astype(np.float32),
            "sx": np.full(n, 1.1, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 10, np.float32),
            "lpx": np.full(n, 0.05, np.float32),
            "lpy": np.full(n, 0.05, np.float32),
            "net_gradient": rng.uniform(
                5e3, 5e4, n
            ).astype(np.float32),
        }
    )


@pytest.fixture
def app():
    a = gui.RenderApp(_locs(), [dict(d) for d in INFO])
    yield a
    a.close()


class TestDisplaySettingsPanel:
    def test_blur_radio_drives_app(self, app):
        panel = app.open_display_settings()
        panel.blur.set_active(2)  # "gaussian"
        assert app.blur_method == "gaussian"
        panel.blur.set_active(0)  # "none"
        assert app.blur_method is None

    def test_colormap_radio(self, app):
        panel = app.open_display_settings()
        labels = [t.get_text() for t in panel.colormap.labels]
        panel.colormap.set_active(labels.index("viridis"))
        assert app.colormap == "viridis"

    def test_contrast_textboxes(self, app):
        panel = app.open_display_settings()
        panel.min_density.set_val("0.5")
        panel.max_density.set_val("12")
        assert app.contrast == (0.5, 12.0)
        # blank both -> autoscale
        panel.min_density.set_val("")
        panel.max_density.set_val("")
        assert app.contrast is None

    def test_oversampling_slider_log2(self, app):
        panel = app.open_display_settings()
        panel.oversampling.set_val(4.0)  # log2 -> 16x
        assert app.oversampling == pytest.approx(16.0)

    def test_general_checks(self, app):
        panel = app.open_display_settings()
        # index 2 = invert colors
        panel.general_checks.set_active(2)
        assert app.invert_colors is True
        # index 1 = minimap
        panel.general_checks.set_active(1)
        assert app.show_minimap is True

    def test_scalebar_group(self, app):
        panel = app.open_display_settings()
        panel.scalebar_length.set_val("500")
        assert app.scalebar_length_nm == 500.0
        panel.scalebar_checks.set_active(0)  # show
        assert app.show_scalebar is True
        panel.scalebar_checks.set_active(2)  # automatic length
        assert app.scalebar_length_nm is None

    def test_pixelsize_textbox(self, app):
        panel = app.open_display_settings()
        panel.pixelsize.set_val("108")
        assert lib.get_from_metadata(app.info, "Pixelsize") == 108.0

    def test_min_blur_textbox(self, app):
        panel = app.open_display_settings()
        panel.min_blur.set_val("0.8")
        assert app.min_blur_width == pytest.approx(0.8)

    def test_render_property_apply_and_clear(self, app):
        panel = app.open_display_settings()
        panel.prop_parameter.set_val("photons")
        panel.prop_colors.set_val("8")
        panel.apply_render_property()
        assert app.render_property is not None
        assert app.render_property["parameter"] == "photons"
        assert app.render_property["n_colors"] == 8
        panel._clear_render_property()
        assert app.render_property is None

    def test_sync_reflects_scripted_state(self, app):
        panel = app.open_display_settings()
        app.set_blur("convolve")
        app.set_colormap("gray")
        app.set_contrast(1.0, 9.0)
        app.set_scalebar(show=True, length_nm=250.0)
        panel.sync()
        labels = [t.get_text() for t in panel.colormap.labels]
        assert labels[
            [t.get_text() for t in panel.colormap.labels].index(
                panel.colormap.value_selected
            )
        ] == "gray"
        assert panel.blur.value_selected == "convolve"
        assert panel.min_density.text == "1.0"
        assert panel.max_density.text == "9.0"
        assert panel.scalebar_length.text == "250.0"
        # sync must not have fired callbacks that clobber app state
        assert app.blur_method == "convolve"
        assert app.contrast == (1.0, 9.0)


class TestChannelsPanel:
    def test_visibility_and_intensity(self, app):
        app.add_channel(_locs(seed=1), [dict(d) for d in INFO])
        panel = app.open_channels_panel()
        assert len(panel.intensity_sliders) == 2
        panel.visible_checks.set_active(1)  # hide 2nd channel
        assert app.channels[1].visible is False
        panel.intensity_sliders[0].set_val(1.5)
        assert app.channels[0].relative_intensity == pytest.approx(
            1.5
        )

    def test_color_cycle(self, app):
        panel = app.open_channels_panel()
        panel.cycle_color(0)
        first = app.channels[0].color
        assert first in [
            (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
            (0, 1, 1), (1, 0, 1), (1, 1, 1),
        ]
        panel.cycle_color(0)
        assert app.channels[0].color != first

    def test_legend_toggle_and_rebuild(self, app):
        panel = app.open_channels_panel()
        panel.legend_check.set_active(0)
        assert app.show_legend is True
        app.add_channel(_locs(seed=2), [dict(d) for d in INFO])
        panel.rebuild()
        assert len(panel.intensity_sliders) == 2


class TestInfoPanel:
    def test_refresh_shows_counts(self, app):
        panel = app.open_info_panel()
        info = panel.refresh()
        assert info  # dict of display/movie/locs stats
        assert panel._text.get_text()

    def test_nena_action(self, app):
        panel = app.open_info_panel()
        result = panel.run_nena()
        assert "lp" in result
        assert "NeNA" in panel._text.get_text()

    def test_frc_action(self, app):
        panel = app.open_info_panel()
        result = panel.run_frc()
        assert "resolution" in result
        assert "FRC" in panel._text.get_text()


class TestToolsSettingsPanel:
    def test_shape_radio_and_size_field(self, app):
        panel = app.open_tools_settings()
        panel.shape.set_active(1)  # Rectangle
        assert app.pick_shape == "Rectangle"
        panel.size.set_val("2.5")
        assert app.pick_width == pytest.approx(2.5)
        panel.shape.set_active(0)  # Circle
        assert app.pick_shape == "Circle"
        panel.size.set_val("3.0")
        assert app.pick_diameter == pytest.approx(3.0)
        # changing shape must refresh the size field from app state
        panel.shape.set_active(3)  # Square
        assert panel.size.text == str(app.pick_side)

    def test_annotate_checkbox(self, app):
        panel = app.open_tools_settings()
        panel.annotate.set_active(0)
        assert app.annotate_picks is True

    def test_invalid_size_ignored(self, app):
        panel = app.open_tools_settings()
        before = app.pick_diameter
        panel.size.set_val("-1")
        assert app.pick_diameter == before
        panel.size.set_val("junk")
        assert app.pick_diameter == before

    def test_pick_similar_and_clear(self, app):
        # several seed picks: with one pick both stds are 0 and the
        # match window degenerates to exact equality (same as the
        # reference, picasso/postprocess.py:553-556)
        app.pick_diameter = 3.0
        for p in [(10.0, 10.0), (16.0, 16.0), (22.0, 22.0)]:
            app.add_pick(p)
        panel = app.open_tools_settings()
        panel.std_range.set_val("3.0")
        n = panel.run_pick_similar()
        assert n >= 1
        assert n == len(app.picks)
        panel.clear_button.on_clicked  # exists
        app.clear_picks()
        panel.sync()
        assert panel.shape.value_selected == app.pick_shape


def _locs_3d(n=3000, seed=3):
    locs = _locs(n, seed)
    rng = np.random.default_rng(seed + 1)
    locs["z"] = rng.uniform(-200, 200, n).astype(np.float32)
    return locs


class TestSlicerPanel:
    @pytest.fixture
    def app3d(self):
        a = gui.RenderApp(_locs_3d(), [dict(d) for d in INFO])
        yield a
        a.close()

    def test_requires_z(self, app):
        with pytest.raises(ValueError, match="z"):
            app.open_slicer_panel()

    def test_slider_moves_slab(self, app3d):
        panel = app3d.open_slicer_panel(thickness_nm=100.0)
        assert app3d.slicer_on
        n = app3d.n_slices()
        assert n == panel.position.valmax + 1 or n >= 2
        panel.position.set_val(1)
        assert app3d.slice_position == 1
        lo, hi = app3d.slice_range()
        assert hi - lo == pytest.approx(100.0)

    def test_prev_next_and_stop(self, app3d):
        panel = app3d.open_slicer_panel(thickness_nm=100.0)
        panel._set_slice(0)
        panel.next_button.on_clicked  # widget exists
        panel._set_slice(app3d.slice_position + 1)
        assert app3d.slice_position == 1
        panel._set_slice(app3d.slice_position - 1)
        assert app3d.slice_position == 0
        app3d.stop_slicer()
        assert not app3d.slicer_on

    def test_thickness_resizes_slider(self, app3d):
        panel = app3d.open_slicer_panel(thickness_nm=100.0)
        n_before = app3d.n_slices()
        panel.thickness.set_val("50")
        assert app3d.slice_thickness == 50.0
        assert app3d.n_slices() >= n_before
        assert panel.position.valmax == max(
            app3d.n_slices() - 1, 1
        )

    def test_export_stack(self, app3d, tmp_path):
        panel = app3d.open_slicer_panel(thickness_nm=200.0)
        paths = panel.export_stack(str(tmp_path / "stack"))
        assert len(paths) == app3d.n_slices()
        import os

        assert all(os.path.exists(p) for p in paths)


class TestUndriftPanel:
    def test_rcc_runs_and_plots(self, app):
        panel = app.open_undrift_panel()
        panel.segmentation.set_val("20")
        drift = panel.run_rcc()
        assert app.channel.drift is not None
        assert len(drift) == 100  # one row per frame
        # drift curve got drawn
        assert panel.drift_ax.lines
        assert "RCC" in panel._status.get_text()

    def test_undo_clears_drift(self, app):
        panel = app.open_undrift_panel()
        panel.segmentation.set_val("20")
        panel.run_rcc()
        panel._undo()
        assert app.channel.drift is None
        assert not panel.drift_ax.lines

    def test_no_drift_placeholder(self, app):
        panel = app.open_undrift_panel()
        assert not panel.drift_ax.lines  # placeholder text only


class TestClusterPanel:
    def test_smlm_run(self, app):
        panel = app.open_cluster_panel()
        panel.radius_xy.set_val("0.5")
        panel.min_locs.set_val("2")
        n = panel.run()
        assert n >= 1
        assert "group" in app.locs.columns
        assert "smlm" in panel._status.get_text()

    def test_dbscan_and_undo(self, app):
        panel = app.open_cluster_panel()
        panel.algo.set_active(1)  # dbscan
        panel.radius.set_val("0.5")
        panel.min_density.set_val("2")
        before = len(app.locs)
        n = panel.run()
        assert n >= 1
        panel._undo()
        assert len(app.locs) == before
        assert "group" not in app.locs.columns

    def test_hdbscan_run(self, app):
        panel = app.open_cluster_panel()
        panel.algo.set_active(2)  # hdbscan
        panel.min_cluster.set_val("3")
        panel.min_samples.set_val("3")
        n = panel.run()
        assert n >= 1
        assert "group" in app.locs.columns


class TestMaskPanel:
    def test_preview(self, app):
        panel = app.open_mask_panel()
        mask = panel.preview()
        assert mask.dtype == bool or set(
            np.unique(mask)
        ) <= {0, 1}
        assert panel.last_mask is not None
        assert "in /" in panel._status.get_text()

    def test_apply_splits_channel(self, app):
        panel = app.open_mask_panel()
        before = len(app.locs)
        panel.apply("in")
        kept_in = len(app.locs)
        assert 0 < kept_in <= before
        app.undo()
        assert len(app.locs) == before
        panel.apply("out")
        assert len(app.locs) == before - kept_in

    def test_method_radio(self, app):
        panel = app.open_mask_panel()
        labels = [t.get_text() for t in panel.method.labels]
        panel.method.set_active(labels.index("mean"))
        assert panel._kwargs()["method"] == "mean"
        mask = panel.preview()
        assert mask is not None


class TestApplyPanel:
    def test_expression_and_history(self, app):
        panel = app.open_apply_panel()
        x0 = app.locs["x"].to_numpy().copy()
        panel.expression.set_val("x += 1")
        assert np.allclose(app.locs["x"].to_numpy(), x0 + 1)
        assert panel.history == ["x += 1"]
        panel._undo()
        assert np.allclose(app.locs["x"].to_numpy(), x0)
        assert panel.history == []

    def test_blank_ignored(self, app):
        panel = app.open_apply_panel()
        panel.expression.set_val("   ")
        assert panel.history == []


class TestLinkPanel:
    def test_link_reduces_locs(self, app):
        # stack repeated detections so linking has something to merge
        locs = app.locs.copy()
        locs2 = locs.copy()
        locs2["frame"] = locs2["frame"] + 1
        app.channel.locs = (
            pd.concat([locs, locs2], ignore_index=True)
        )
        app.channel.rebuild_index()
        panel = app.open_link_panel()
        panel.r_max.set_val("0.1")
        before = len(app.locs)
        n = panel.run()
        assert n < before
        assert "->" in panel._status.get_text()


class TestChangeFOVPanel:
    def test_set_and_full(self, app):
        panel = app.open_fov_panel()
        panel.x.set_val("4")
        panel.y.set_val("6")
        panel.w.set_val("10")
        panel.h.set_val("8")
        panel.apply()
        assert app.viewport == ((6.0, 4.0), (14.0, 14.0))
        panel._full()
        (y0, x0), (y1, x1) = app.viewport
        assert (y0, x0) == (0.0, 0.0)
        assert y1 >= 14 and x1 >= 14
        assert panel.w.text == f"{x1 - x0:g}"

    def test_invalid_ignored(self, app):
        panel = app.open_fov_panel()
        vp = app.viewport
        panel.w.set_val("-5")
        panel.apply()
        assert app.viewport == vp


class TestFastRenderPanel:
    def test_fraction_slider(self, app):
        panel = app.open_fast_render_panel()
        panel.fraction.set_val(0.25)
        assert app.fast_render_fraction == pytest.approx(0.25)
        assert len(app._fast_render_masks) == len(app.channels)
        shown = app._visible_locs()
        assert 0 < len(shown) < len(app.locs)

    def test_show_all_resets(self, app):
        panel = app.open_fast_render_panel()
        panel.fraction.set_val(0.25)
        panel._reset()
        assert app.fast_render_fraction == 1.0
        assert len(app._visible_locs()) == len(app.locs)
        panel.sync()
        assert panel.fraction.val == pytest.approx(1.0)


class TestCustomColormap:
    def test_register_and_render(self, app):
        cmap = app.register_colormap(
            "myfire", ["black", "red", "yellow", "white"]
        )
        assert app.colormap == "myfire"
        import matplotlib.pyplot as plt

        # matplotlib registers a copy; compare by value
        got = plt.get_cmap("myfire")
        assert got.name == "myfire"
        assert np.allclose(got(0.5), cmap(0.5))
        img, _ = app.render_scene()
        assert img is not None
        # panel radio shows the custom map first when active
        panel = app.open_display_settings()
        labels = [t.get_text() for t in panel.colormap.labels]
        assert "myfire" in labels

    def test_register_without_activating(self, app):
        before = app.colormap
        app.register_colormap(
            "mycool", [(0, 0, 0), (0, 1, 1)], set_active=False
        )
        assert app.colormap == before


class TestPicksPanel:
    def _picked_app(self, app):
        app.pick_diameter = 3.0
        for p in [(8.0, 8.0), (16.0, 16.0), (24.0, 24.0)]:
            app.add_pick(p)
        return app

    def test_step_centers_viewport(self, app):
        self._picked_app(app)
        panel = app.open_picks_panel()
        assert "1/3" in panel._label.get_text()
        panel.step(1)
        assert panel.current == 1
        (y0, x0), (y1, x1) = app.viewport
        assert (x0 + x1) / 2 == pytest.approx(16.0, abs=0.01)
        panel.step(-1)
        assert panel.current == 0
        panel.step(-1)  # wraps
        assert panel.current == 2

    def test_filter_by_count(self, app):
        self._picked_app(app)
        panel = app.open_picks_panel()
        n = panel.apply_filter()  # min 0, no max: keeps all
        assert n == 3
        panel.min_locs.set_val("100000")
        n = panel.apply_filter()
        assert n == 0
        assert "no picks" in panel._label.get_text()

    def test_trace_and_scatter_buttons(self, app):
        self._picked_app(app)
        panel = app.open_picks_panel()
        app.plot_trace(panel.current)  # same calls the buttons make
        app.show_pick(panel.current)
        panel._clear()
        assert app.picks == []

    def test_ctrl_p_accelerator(self, app):
        from matplotlib.backend_bases import KeyEvent

        ev = KeyEvent("key_press_event", app.fig.canvas, "ctrl+p")
        app.fig.canvas.callbacks.process("key_press_event", ev)
        from picasso_tpu.gui.panels import PicksPanel

        assert isinstance(app.picks_panel, PicksPanel)
