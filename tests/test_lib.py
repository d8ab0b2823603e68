"""lib utilities: metadata access, geometry, shift solver, kinetics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import lib


def test_get_from_metadata():
    info = [{"Width": 32, "Pixelsize": 130}, {"Pixelsize": 108}]
    assert lib.get_from_metadata(info, "Pixelsize") == 108  # newest wins
    assert lib.get_from_metadata(info, "Width") == 32
    assert lib.get_from_metadata(info, "Missing", default=7) == 7
    with pytest.raises(KeyError):
        lib.get_from_metadata(info, "Missing", raise_error=True)
    assert lib.get_from_metadata({"a": 1}, "a") == 1


def test_minimize_shifts_recovers_linear_drift():
    """All-pairs shifts from a linear drift must be solved back exactly."""
    n = 6
    true_x = np.arange(n, dtype=float) * 0.5
    true_y = np.arange(n, dtype=float) * -0.25
    shifts_x = np.zeros((n, n))
    shifts_y = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            shifts_x[i, j] = true_x[j] - true_x[i]
            shifts_y[i, j] = true_y[j] - true_y[i]
    sy, sx = lib.minimize_shifts(shifts_x, shifts_y)
    np.testing.assert_allclose(sx, true_x, atol=1e-10)
    np.testing.assert_allclose(sy, true_y, atol=1e-10)


def test_minimize_shifts_3d():
    n = 4
    true = np.arange(n, dtype=float)
    pair = true[None, :] - true[:, None]
    sy, sx, sz = lib.minimize_shifts(pair, 2 * pair, 3 * pair)
    np.testing.assert_allclose(sx, pair[0], atol=1e-10)
    np.testing.assert_allclose(sz, 3 * pair[0], atol=1e-10)


def test_check_if_in_polygon():
    X = np.array([0.0, 4.0, 4.0, 0.0])
    Y = np.array([0.0, 0.0, 4.0, 4.0])
    x = np.array([2.0, 5.0, -1.0, 3.9])
    y = np.array([2.0, 2.0, 2.0, 0.1])
    inside = lib.check_if_in_polygon(x, y, X, Y)
    np.testing.assert_array_equal(inside, [True, False, False, True])


def test_polygon_area():
    X = np.array([0.0, 2.0, 2.0, 0.0])
    Y = np.array([0.0, 0.0, 3.0, 3.0])
    assert lib.polygon_area(X, Y) == pytest.approx(6.0)


def test_locs_at():
    locs = pd.DataFrame(
        {"x": np.array([0.0, 1.0, 5.0]), "y": np.array([0.0, 1.0, 5.0])}
    )
    picked = lib.locs_at(0.0, 0.0, locs, 2.0)
    assert len(picked) == 2


def test_fit_cum_exp_recovers_rate():
    rng = np.random.default_rng(0)
    data = rng.exponential(10.0, 5000)
    rate = lib.estimate_kinetic_rate(data)
    assert rate == pytest.approx(10.0, rel=0.1)


def test_hist2d_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 10, 1000)
    y = rng.uniform(0, 5, 1000)
    ours = lib.hist2d(x, y, 0, 10, 0, 5, 20, 10)
    ref, _, _ = np.histogram2d(
        x, y, bins=(20, 10), range=((0, 10), (0, 5))
    )
    np.testing.assert_array_equal(ours, ref.astype(int))


def test_calculate_optimal_bins():
    rng = np.random.default_rng(4)
    data = rng.normal(0, 1, 10000)
    bins = lib.calculate_optimal_bins(data)
    assert len(bins) > 10
    assert bins[0] < data.min()
    bins_capped = lib.calculate_optimal_bins(data, max_n_bins=10)
    assert len(bins_capped) == 10


def test_merge_locs_increment_frames():
    a = pd.DataFrame({"frame": np.array([0, 1, 2]), "x": np.zeros(3)})
    b = pd.DataFrame({"frame": np.array([0, 1]), "x": np.ones(2)})
    merged = lib.merge_locs([a, b], increment_frames=True)
    assert list(merged["frame"]) == [0, 1, 2, 3, 4]


def test_append_to_rec():
    locs = pd.DataFrame({"x": np.zeros(3)})
    out = lib.append_to_rec(locs, np.arange(3), "z")
    assert "z" in out.columns
    assert "z" not in locs.columns


class TestProfiling:
    def test_trace_noop_without_dir(self, monkeypatch):
        from picasso_tpu import profiling

        monkeypatch.delenv("PICASSO_TPU_PROFILE", raising=False)
        with profiling.trace(None) as d:
            assert d is None

    def test_trace_captures(self, tmp_path):
        import jax.numpy as jnp

        from picasso_tpu import profiling

        log_dir = str(tmp_path / "trace")
        with profiling.trace(log_dir) as d:
            assert d == log_dir
            float(jnp.sum(jnp.ones((64, 64))))
        import os

        found = []
        for root, _, files in os.walk(log_dir):
            found.extend(files)
        assert found  # trace artifacts were written

    def test_annotate_and_stage_timer(self):
        from picasso_tpu import profiling

        @profiling.annotate("test-span")
        def f(a, b):
            return a + b

        assert f(2, 3) == 5
        timer = profiling.StageTimer()
        with timer.stage("one"):
            pass
        with timer.stage("two"):
            pass
        report = timer.report()
        assert "one" in report and "total" in report


class TestGetFromMetadata:
    def test_dict_input(self):
        assert lib.get_from_metadata({"a": 3}, "a") == 3
        assert lib.get_from_metadata({"a": 3}, "b", 7) == 7

    def test_list_searches_from_last(self):
        info = [{"k": 1}, {"k": 2}]
        assert lib.get_from_metadata(info, "k") == 2

    def test_raise_error_on_missing(self):
        with pytest.raises(KeyError):
            lib.get_from_metadata([{"a": 1}], "b", raise_error=True)

    def test_invalid_input_raises(self):
        with pytest.raises(ValueError):
            lib.get_from_metadata("not-info", "k")

    def test_overwrite_metadata(self):
        info = [{"Frames": 10}, {"other": 1}]
        out = lib.overwrite_metadata(info, "Frames", 99)
        assert lib.get_from_metadata(out, "Frames") == 99


class TestEnsureSanity:
    def _locs(self):
        return pd.DataFrame(
            {
                "frame": np.arange(4, dtype=np.uint32),
                "x": np.array([1.0, 70.0, 2.0, 3.0], np.float32),
                "y": np.array([1.0, 2.0, np.nan, 3.0], np.float32),
                "photons": np.array(
                    [100.0, 100.0, 100.0, -5.0], np.float32
                ),
                "lpx": np.full(4, 0.1, np.float32),
                "lpy": np.full(4, 0.1, np.float32),
            }
        )

    def test_drops_outside_nan_negative(self):
        info = [{"Frames": 10, "Height": 64, "Width": 64}]
        out = lib.ensure_sanity(self._locs(), info)
        # row 1 outside width, row 2 NaN, row 3 negative photons
        assert len(out) == 1
        assert out.iloc[0]["frame"] == 0

    def test_missing_metadata_key_raises(self):
        with pytest.raises(KeyError):
            lib.ensure_sanity(self._locs(), [{"Frames": 10}])


class TestKinetics:
    def test_fit_cum_exp_recovers_tau(self):
        rng = np.random.default_rng(0)
        data = rng.exponential(50.0, 3000)
        result = lib.fit_cum_exp(data)
        assert result["best_values"]["t"] == pytest.approx(
            50.0, rel=0.15
        )

    def test_estimate_kinetic_rate_long(self):
        rng = np.random.default_rng(1)
        data = rng.exponential(20.0, 2000)
        rate = lib.estimate_kinetic_rate(data)
        assert rate == pytest.approx(20.0, rel=0.2)

    def test_estimate_kinetic_rate_short_falls_back(self):
        data = np.array([3.0, 5.0])
        assert lib.estimate_kinetic_rate(data) == pytest.approx(4.0)


class TestFindLocalMinima:
    def test_simple(self):
        arr = np.array([3.0, 1.0, 2.0, 0.5, 2.0])
        minima = lib.find_local_minima(arr)
        assert 1 in minima and 3 in minima

    def test_monotonic_has_no_interior_minima(self):
        arr = np.arange(10.0)
        minima = lib.find_local_minima(arr)
        assert all(m in (0,) for m in np.atleast_1d(minima))


class TestOptimalBins:
    def test_caps_at_max(self):
        rng = np.random.default_rng(0)
        data = rng.normal(0, 1, 10000)
        bins = lib.calculate_optimal_bins(data, max_n_bins=50)
        assert len(bins) <= 51

    def test_handles_constant(self):
        data = np.full(100, 3.0)
        bins = lib.calculate_optimal_bins(data)
        assert len(bins) >= 2


class TestRecOps:
    def test_append_and_merge(self):
        locs = pd.DataFrame(
            {
                "frame": np.arange(3, dtype=np.uint32),
                "x": np.ones(3, np.float32),
                "y": np.ones(3, np.float32),
            }
        )
        out = lib.append_to_rec(locs, np.arange(3), "extra")
        assert "extra" in out.columns
        merged = lib.merge_locs([locs, locs.copy()])
        assert len(merged) == 6

    def test_merge_increments_frames(self):
        a = pd.DataFrame(
            {
                "frame": np.array([0, 1], np.uint32),
                "x": np.ones(2, np.float32),
                "y": np.ones(2, np.float32),
            }
        )
        b = a.copy()
        merged = lib.merge_locs([a, b], increment_frames=True)
        assert merged["frame"].max() == 3


class TestGeometryHelpers:
    def test_locs_at_radius(self):
        locs = pd.DataFrame(
            {
                "x": np.array([0.0, 1.0, 5.0], np.float32),
                "y": np.array([0.0, 0.0, 0.0], np.float32),
            }
        )
        near = lib.locs_at(0.0, 0.0, locs, 2.0)
        assert len(near) == 2

    def test_polygon_unit_square(self):
        X = np.array([0.0, 1.0, 1.0, 0.0])
        Y = np.array([0.0, 0.0, 1.0, 1.0])
        x = np.array([0.5, 1.5])
        y = np.array([0.5, 0.5])
        inside = lib.check_if_in_polygon(x, y, X, Y)
        assert list(inside) == [True, False]

    def test_polygon_area(self):
        X = np.array([0.0, 2.0, 2.0, 0.0])
        Y = np.array([0.0, 0.0, 3.0, 3.0])
        assert lib.polygon_area(X, Y) == pytest.approx(6.0)


class TestProgressDialogShim:
    """Headless ProgressDialog with the reference's Qt interface
    (picasso/lib.py:307) and the Qt-only attribute gate."""

    def test_progress_dialog_interface(self):
        p = lib.ProgressDialog("work", 0, 10, None)
        p.set_value(4)
        assert p.value() == 4
        assert p.maximum() == 10
        assert list(p.get_iterator()) == list(range(4, 10))
        p.zero_progress("next phase")
        assert p.value() == 0
        assert p.description_base == "next phase"
        p.close()

    def test_progress_dialog_context_manager(self):
        with lib.ProgressDialog("ctx", 0, 3, None) as p:
            p.set_value(3)

    def test_progress_type_union(self):
        assert lib.MockProgress in lib.ProgressType.__args__
        assert lib.ProgressDialog in lib.ProgressType.__args__

    def test_qt_only_names_raise_attribute_error(self):
        # AttributeError subclass so hasattr() feature probing works
        with pytest.raises(lib.QtOnlyAttributeError, match="headless"):
            lib.Dialog
        with pytest.raises(AttributeError, match="PyQt6"):
            lib.install_excepthook
        assert not hasattr(lib, "StatusDialog")
        assert getattr(lib, "cancel_dialogs", None) is None
        with pytest.raises(AttributeError):
            lib.definitely_not_a_symbol


class TestRectangleGeometry:
    def test_corners_horizontal_rectangle(self):
        X, Y = lib.get_pick_rectangle_corners(0.0, 0.0, 10.0, 0.0, 2.0)
        assert len(X) == len(Y) == 4
        # axis along x, width 2 => corners at y = +-1
        assert sorted(set(np.round(Y, 6))) == [-1.0, 1.0]
        assert min(X) == pytest.approx(0.0)
        assert max(X) == pytest.approx(10.0)

    def test_check_if_in_rectangle_axis_aligned(self):
        X, Y = lib.get_pick_rectangle_corners(0.0, 0.0, 10.0, 0.0, 2.0)
        xs = np.array([5.0, 5.0, -1.0, 11.0])
        ys = np.array([0.0, 1.5, 0.0, 0.0])
        inside = lib.check_if_in_rectangle(
            xs, ys, np.asarray(X), np.asarray(Y)
        )
        assert inside.tolist() == [True, False, False, False]

    def test_locs_in_rectangle(self):
        locs = pd.DataFrame({
            "x": np.array([5.0, 20.0], np.float32),
            "y": np.array([0.0, 0.0], np.float32),
        })
        X, Y = lib.get_pick_rectangle_corners(0.0, 0.0, 10.0, 0.0, 4.0)
        out = lib.locs_in_rectangle(locs, X, Y)
        assert len(out) == 1

    def test_pick_areas_rectangle(self):
        picks = [((0.0, 0.0), (10.0, 0.0))]
        areas = lib.pick_areas_rectangle(picks, 2.0)
        assert areas[0] == pytest.approx(20.0)


class TestPolygonCorners:
    def test_closed_polygon(self):
        X, Y = lib.get_pick_polygon_corners(
            [(0, 0), (1, 0), (1, 1), (0, 0)]
        )
        assert X is not None and len(X) == 4

    def test_open_polygon_returns_none(self):
        X, Y = lib.get_pick_polygon_corners(
            [(0, 0), (1, 0), (1, 1)]
        )
        assert X is None and Y is None

    def test_pick_areas_unknown_shape_raises(self):
        with pytest.raises(ValueError):
            lib.pick_areas("Blob", [(0, 0)], pick_size=1.0)

    def test_pick_areas_square_and_circle(self):
        sq = lib.pick_areas("Square", [(0, 0), (5, 5)], pick_size=2.0)
        np.testing.assert_allclose(sq, 4.0)
        ci = lib.pick_areas("Circle", [(0, 0)], pick_size=2.0)
        np.testing.assert_allclose(ci, np.pi, rtol=1e-6)


class TestEnsureSanity:
    def _locs(self):
        return pd.DataFrame({
            "frame": np.array([0, 1, 2, 3], np.uint32),
            "x": np.array([5.0, -1.0, 70.0, 6.0], np.float32),
            "y": np.array([5.0, 5.0, 5.0, 6.0], np.float32),
            "photons": np.array(
                [100.0, 100.0, 100.0, -5.0], np.float32
            ),
            "sx": np.ones(4, np.float32),
            "sy": np.ones(4, np.float32),
            "bg": np.zeros(4, np.float32),
            "lpx": np.full(4, 0.1, np.float32),
            "lpy": np.full(4, 0.1, np.float32),
        })

    def test_drops_outside_fov_and_negative(self):
        info = [{"Frames": 10, "Height": 64, "Width": 64}]
        out = lib.ensure_sanity(self._locs(), info)
        # -1 x, 70 x (out of 64-wide FOV) and negative photons dropped
        assert len(out) == 1
        assert out["x"].iloc[0] == pytest.approx(5.0)


class TestRecArrayHelpers:
    def test_remove_from_rec_drops_column(self):
        rec = np.zeros(
            3, dtype=[("a", "f4"), ("b", "f4"), ("c", "i4")]
        )
        out = lib.remove_from_rec(rec, "b")
        assert "b" not in out.dtype.names
        assert set(out.dtype.names) == {"a", "c"}


class TestFuturesHelpers:
    def test_n_futures_done(self):
        class F:
            def __init__(self, d):
                self._d = d

            def done(self):
                return self._d

        assert lib.n_futures_done([F(True), F(False), F(True)]) == 2


class TestCumulativeExponential:
    def test_zero_at_zero_and_saturation(self):
        t = np.array([0.0, 1e9])
        vals = lib.cumulative_exponential(t, 3.0, 10.0, 0.0)
        assert vals[0] == pytest.approx(0.0)
        assert vals[1] == pytest.approx(3.0, rel=1e-6)  # amplitude a

    def test_constant_offset_shifts(self):
        t = np.array([0.0])
        v0 = lib.cumulative_exponential(t, 10.0, 3.0, 0.0)[0]
        v1 = lib.cumulative_exponential(t, 10.0, 3.0, 2.0)[0]
        assert v1 - v0 == pytest.approx(2.0)
