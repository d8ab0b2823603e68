"""Matplotlib-based interactive viewers (capability analogues of the
reference PyQt6 apps gui/render.py, gui/localize.py, gui/filter.py).

Each app wraps the headless API: rendering goes through
picasso_tpu.render with the multi-level spatial index for O(viewport)
redraws, identification through picasso_tpu.localize. The apps are
constructible and drawable on the Agg backend (tests, screenshots) and
interactive on any GUI backend.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from picasso_tpu import io, lib, localize, render, spatial_index
from picasso_tpu.gui import plugins as _plugins


class _PluginHost:
    """Plugin surface shared by the apps (reference: plugin menu in each
    PyQt6 window, picasso/gui/plugins). Plugins register actions with
    ``add_plugin_action``; actions are invoked by name or by pressing
    F1..F12 in the figure."""

    def _init_plugins(self, app_name: str):
        self.plugin_actions: list[tuple[str, object]] = []
        self.plugins = _plugins.load_plugins(self, app_name)
        canvas = getattr(getattr(self, "fig", None), "canvas", None)
        if canvas is not None:
            canvas.mpl_connect("key_press_event", self._on_plugin_key)

    def add_plugin_action(self, label: str, callback) -> None:
        self.plugin_actions.append((label, callback))

    def run_plugin_action(self, label: str):
        for name, callback in self.plugin_actions:
            if name == label:
                return callback()
        raise KeyError(f"no plugin action {label!r}")

    def _on_plugin_key(self, event):
        if event.key and event.key.startswith("f") and event.key[1:].isdigit():
            idx = int(event.key[1:]) - 1
            if 0 <= idx < len(self.plugin_actions):
                self.plugin_actions[idx][1]()


class RenderApp(_PluginHost):
    """Super-resolution viewer: pan/zoom (matplotlib navigation),
    scroll-wheel zoom, blur/colormap/contrast controls, circular
    picking with the right mouse button, pick save/load.

    Analogue of the reference flagship viewer (picasso/gui/render.py,
    View :6883) built over the same render core.
    """

    def __init__(
        self,
        locs: pd.DataFrame,
        info: list[dict],
        blur_method: str | None = "smooth",
        colormap: str = "hot",
        oversampling: float = 8.0,
        fig=None,
    ):
        import matplotlib.pyplot as plt

        self.locs = locs
        self.info = info
        self.blur_method = blur_method
        self.colormap = colormap
        self.oversampling = oversampling
        self.min_blur_width = 0.0
        self.picks: list[tuple[float, float]] = []
        self.pick_diameter = 1.0
        self.index = spatial_index.build_render_index(locs, info)
        height = lib.get_from_metadata(info, "Height")
        width = lib.get_from_metadata(info, "Width")
        self.viewport = ((0.0, 0.0), (float(height), float(width)))
        self.fig = fig or plt.figure(figsize=(8, 8))
        self.ax = self.fig.add_subplot(111)
        self._im = None
        self.fig.canvas.mpl_connect(
            "scroll_event", self._on_scroll
        )
        self.fig.canvas.mpl_connect(
            "button_press_event", self._on_click
        )
        self._init_plugins("render")
        self.redraw()

    # -- rendering --
    def _visible_locs(self) -> pd.DataFrame:
        idx = spatial_index.query_viewport(self.index, self.viewport)
        if idx is None:
            return self.locs
        return self.locs.iloc[idx]

    def redraw(self):
        locs = self._visible_locs()
        n, image = render.render(
            locs,
            self.info,
            oversampling=self.oversampling,
            viewport=self.viewport,
            blur_method=self.blur_method,
            min_blur_width=self.min_blur_width,
        )
        image = render.scale_contrast(image, autoscale=True)
        (y_min, x_min), (y_max, x_max) = self.viewport
        self.ax.clear()
        self._im = self.ax.imshow(
            image,
            cmap=self.colormap,
            extent=(x_min, x_max, y_max, y_min),
            interpolation="nearest",
        )
        for px, py in self.picks:
            circle = __import__("matplotlib.patches", fromlist=["Circle"]).Circle(
                (px, py),
                self.pick_diameter / 2,
                fill=False,
                edgecolor="yellow",
            )
            self.ax.add_patch(circle)
        self.ax.set_title(f"{n} localizations")
        self.fig.canvas.draw_idle()
        return n

    # -- interaction --
    def _on_scroll(self, event):
        if event.inaxes != self.ax or event.xdata is None:
            return
        factor = 0.8 if event.button == "up" else 1.25
        self.viewport = render.zoom_viewport(
            self.viewport, factor, (event.ydata, event.xdata)
        )
        # finer display pixels as we zoom in
        h = render.viewport_height(self.viewport)
        full_h = lib.get_from_metadata(self.info, "Height")
        self.oversampling = max(1.0, 8.0 * full_h / max(h, 1e-6))
        self.redraw()

    def _on_click(self, event):
        if event.inaxes != self.ax or event.button != 3:
            return
        self.picks.append((event.xdata, event.ydata))
        self.redraw()

    # -- pick workflow --
    def picked_locs(self) -> list[pd.DataFrame]:
        from picasso_tpu import postprocess

        return postprocess.picked_locs(
            self.locs,
            self.info,
            self.picks,
            "Circle",
            pick_size=self.pick_diameter / 2,
        )

    def save_picks(self, path: str):
        pixelsize = lib.get_from_metadata(
            self.info, "Pixelsize", 130
        )
        io.save_picks(
            path, [list(p) for p in self.picks], "Circle",
            size=self.pick_diameter, pixelsize=pixelsize,
        )

    def load_picks(self, path: str):
        pixelsize = lib.get_from_metadata(
            self.info, "Pixelsize", 130
        )
        picks, shape, size = io.load_picks(path, pixelsize)
        assert shape == "Circle", "viewer supports circular picks"
        self.picks = [tuple(p) for p in picks]
        if size:
            self.pick_diameter = size
        self.redraw()

    def pick_info(self) -> dict:
        """Info block describing the current picks, with per-pick and
        total areas in um^2 (reference gui/render.py:10570; the total
        'Area (um^2)' for circle/square picks was fixed in v0.10.3)."""
        pixelsize = lib.get_from_metadata(self.info, "Pixelsize", 130)
        areas_px = lib.pick_areas_circle(
            self.picks, self.pick_diameter / 2
        )
        areas_um2 = areas_px * (pixelsize / 1000) ** 2
        return {
            "Generated by": "picasso-tpu Render : Pick",
            "Pick Shape": "Circle",
            # one value — identical for every circular pick
            "Pick Areas (um^2)": [float(areas_um2[0])]
            if len(areas_um2)
            else [],
            "Area (um^2)": float(np.sum(areas_um2)),
            "Number of picks": len(self.picks),
        }

    def save_picked_locs(self, path: str):
        """Save the locs inside the current picks with the pick info
        appended to the yaml chain (reference gui/render.py:10588)."""
        picked = self.picked_locs()
        if not picked:
            raise ValueError("No picks to save.")
        out = pd.concat(picked, ignore_index=True)
        io.save_locs(path, out, list(self.info) + [self.pick_info()])
        return len(out)


class LocalizeApp(_PluginHost):
    """Movie browser with live identification overlay — the parameter
    tuning loop of the reference Localize app
    (picasso/gui/localize.py)."""

    def __init__(
        self,
        movie,
        info: list[dict],
        min_net_gradient: float = 5000,
        box: int = 7,
        fig=None,
    ):
        import matplotlib.pyplot as plt

        self.movie = movie
        self.info = info
        self.min_net_gradient = min_net_gradient
        self.box = box
        self.frame_number = 0
        self.fig = fig or plt.figure(figsize=(7, 7))
        self.ax = self.fig.add_subplot(111)
        self.fig.canvas.mpl_connect(
            "key_press_event", self._on_key
        )
        self._init_plugins("localize")
        self.redraw()

    def identify_current(self):
        frame = np.asarray(self.movie[self.frame_number])
        y, x, ng = localize.identify_in_image(
            frame.astype(np.float32),
            self.min_net_gradient,
            self.box,
        )
        return frame, x, y, ng

    def redraw(self):
        frame, x, y, ng = self.identify_current()
        self.ax.clear()
        self.ax.imshow(frame, cmap="gray", interpolation="nearest")
        half = self.box // 2
        for xi, yi in zip(x, y):
            rect = __import__(
                "matplotlib.patches", fromlist=["Rectangle"]
            ).Rectangle(
                (xi - half - 0.5, yi - half - 0.5),
                self.box,
                self.box,
                fill=False,
                edgecolor="red",
            )
            self.ax.add_patch(rect)
        self.ax.set_title(
            f"frame {self.frame_number + 1}/{len(self.movie)} — "
            f"{len(x)} spots (min_ng={self.min_net_gradient:g})"
        )
        self.fig.canvas.draw_idle()
        return len(x)

    def _on_key(self, event):
        if event.key == "right":
            self.frame_number = min(
                self.frame_number + 1, len(self.movie) - 1
            )
        elif event.key == "left":
            self.frame_number = max(self.frame_number - 1, 0)
        elif event.key == "up":
            self.min_net_gradient *= 1.25
        elif event.key == "down":
            self.min_net_gradient /= 1.25
        else:
            return
        self.redraw()

    def save_spots(self, path: str, camera_info: dict | None = None):
        """Identify the whole movie at the current parameters and save
        the cut ROIs (.npy/.tif + yaml), like the reference Localize
        app's 'Save spots' (picasso/gui/localize.py:2762)."""
        ids = localize.identify(
            self.movie, self.min_net_gradient, self.box,
            return_info=False,
        )
        camera_info = camera_info or {
            "Baseline": 0, "Sensitivity": 1, "Gain": 1,
        }
        spots = localize.get_spots(
            self.movie, ids, self.box, camera_info
        )
        info = list(self.info) + [{
            "Generated by": "picasso-tpu Localize spots",
            "Min. Net Gradient": self.min_net_gradient,
            "Box Size": self.box,
        }]
        io.save_spots(path, np.asarray(spots), info)
        return len(ids)


class FilterApp(_PluginHost):
    """Histogram-based filtering of locs tables — the reference Filter
    app (picasso/gui/filter.py): inspect a column's histogram, select
    a range, apply/undo, save."""

    def __init__(self, locs: pd.DataFrame, info: list[dict], fig=None):
        import matplotlib.pyplot as plt

        self.original = locs
        self.locs = locs
        self.info = info
        self.history: list[tuple[str, float, float]] = []
        self.fig = fig or plt.figure(figsize=(7, 5))
        self.ax = self.fig.add_subplot(111)
        self.current_column = "photons" if "photons" in locs else (
            locs.columns[0]
        )
        self._init_plugins("filter")
        self.plot_histogram(self.current_column)

    def plot_histogram(self, column: str):
        self.current_column = column
        data = self.locs[column].to_numpy()
        bins = lib.calculate_optimal_bins(data, max_n_bins=200)
        self.ax.clear()
        self.ax.hist(data, bins=bins)
        self.ax.set_xlabel(column)
        self.ax.set_ylabel("count")
        self.ax.set_title(f"{len(self.locs)} locs")
        self.fig.canvas.draw_idle()

    def apply_filter(self, column: str, lo: float, hi: float):
        vals = self.locs[column]
        self.locs = self.locs[(vals >= lo) & (vals <= hi)]
        self.history.append((column, lo, hi))
        self.plot_histogram(self.current_column)
        return len(self.locs)

    def undo_all(self):
        self.locs = self.original
        self.history = []
        self.plot_histogram(self.current_column)

    def save(self, path: str):
        new_info = self.info + [
            {
                "Generated by": "Picasso Filter",
                "Filters": [
                    {"Column": c, "Min": lo, "Max": hi}
                    for c, lo, hi in self.history
                ],
            }
        ]
        io.save_locs(path, self.locs, new_info)
