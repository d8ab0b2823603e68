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
