"""Drift-correction workloads on synthetic drifted datasets (mirrors
the reference's dedicated test_undrift.py): RCC, picked/fiducial
paths, drift file round-trips and apply_drift."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import io, postprocess

INFO = [{"Frames": 600, "Height": 64, "Width": 64, "Pixelsize": 130}]


def _drifted_dataset(
    n_sites=120,
    n_frames=600,
    drift_fn=None,
    p_on=0.12,
    loc_noise=0.03,
    seed=5,
    fiducials=(),
):
    """Blinking sites + optional always-on fiducials under a common
    drift trajectory."""
    rng = np.random.default_rng(seed)
    sites = rng.uniform(6, 58, (n_sites, 2))
    if drift_fn is None:
        drift_fn = lambda f: (2.0 * f / n_frames, -1.5 * f / n_frames)
    rows = []
    for f in range(n_frames):
        dx, dy = drift_fn(f)
        on = rng.random(n_sites) < p_on
        for s in np.nonzero(on)[0]:
            rows.append(
                (
                    f,
                    sites[s, 0] + dx + rng.normal(0, loc_noise),
                    sites[s, 1] + dy + rng.normal(0, loc_noise),
                )
            )
        for fx, fy in fiducials:
            for _ in range(3):
                rows.append(
                    (
                        f,
                        fx + dx + rng.normal(0, loc_noise),
                        fy + dy + rng.normal(0, loc_noise),
                    )
                )
    arr = np.array(rows)
    n = len(arr)
    locs = pd.DataFrame(
        {
            "frame": arr[:, 0].astype(np.uint32),
            "x": arr[:, 1].astype(np.float32),
            "y": arr[:, 2].astype(np.float32),
            "photons": np.full(n, 2000, np.float32),
            "sx": np.full(n, 1.0, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 10, np.float32),
            "lpx": np.full(n, loc_noise, np.float32),
            "lpy": np.full(n, loc_noise, np.float32),
        }
    )
    true = np.array([drift_fn(f) for f in range(n_frames)])
    return locs.sort_values("frame").reset_index(drop=True), true


def _rms_after_offset(recovered, true):
    err = (recovered - recovered[0]) - (true - true[0])
    return float(np.sqrt(np.mean(err**2)))


class TestRCC:
    def test_nonlinear_drift(self):
        n_frames = 600
        drift_fn = lambda f: (
            1.5 * np.sin(2 * np.pi * f / n_frames),
            2.0 * (f / n_frames) ** 2,
        )
        locs, true = _drifted_dataset(drift_fn=drift_fn)
        drift, undrifted = postprocess.undrift(
            locs, INFO, segmentation=60, display=False
        )
        assert _rms_after_offset(drift["x"].to_numpy(), true[:, 0]) < 0.12
        assert _rms_after_offset(drift["y"].to_numpy(), true[:, 1]) < 0.12

    def test_too_few_segments_raises(self):
        locs, _ = _drifted_dataset(n_frames=600)
        with pytest.raises(ValueError):
            postprocess.undrift(
                locs, INFO, segmentation=600, display=False
            )


class TestPickedAndFiducials:
    def test_undrift_from_picked(self):
        fids = [(15.0, 15.0), (45.0, 20.0), (30.0, 50.0)]
        locs, true = _drifted_dataset(n_sites=40, fiducials=fids)
        # pick radius must cover the full drift trajectory (~2 px)
        picked = postprocess.picked_locs(
            locs, INFO, fids, "Circle", pick_size=3.0
        )
        drift = postprocess.undrift_from_picked(picked, INFO)
        assert _rms_after_offset(
            np.asarray(drift["x"]), true[:, 0]
        ) < 0.05
        assert _rms_after_offset(
            np.asarray(drift["y"]), true[:, 1]
        ) < 0.05

    def test_undrift_from_fiducials_auto(self):
        fids = [(15.0, 15.0), (45.0, 20.0), (30.0, 50.0)]
        locs, true = _drifted_dataset(
            n_sites=30, p_on=0.05, fiducials=fids
        )
        undrifted, new_info, drift = (
            postprocess.undrift_from_fiducials(locs, INFO)
        )
        assert _rms_after_offset(
            np.asarray(drift["x"]), true[:, 0]
        ) < 0.08
        assert _rms_after_offset(
            np.asarray(drift["y"]), true[:, 1]
        ) < 0.08


class TestApplyAndRoundtrip:
    def test_apply_drift_inverts(self):
        locs, true = _drifted_dataset(n_sites=50, n_frames=200)
        info = [dict(INFO[0], Frames=200)]
        drift = pd.DataFrame(
            {"x": true[:200, 0], "y": true[:200, 1]}
        )
        corrected = postprocess.apply_drift(
            locs, info, drift=drift
        )
        # after subtracting the exact drift only loc noise remains
        by_round = corrected.groupby(
            np.round(corrected["x"] * 2).astype(int) * 1000
            + np.round(corrected["y"] * 2).astype(int)
        )
        assert corrected["x"].std() < locs["x"].std()

    def test_drift_txt_roundtrip(self, tmp_path):
        n = 300
        drift = pd.DataFrame(
            {
                "x": np.linspace(0, 2, n).astype(np.float32),
                "y": np.linspace(0, -1, n).astype(np.float32),
            }
        )
        path = str(tmp_path / "locs_drift.txt")
        io.save_drift(path, drift)
        back = io.load_drift(path)
        np.testing.assert_allclose(
            np.asarray(back["x"]), drift["x"], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(back["y"]), drift["y"], atol=1e-5
        )


class TestSegmentsContract:
    @pytest.mark.parametrize(
        "n_frames,segmentation,expected",
        [(1000, 100, 10), (1000, 400, 2), (999, 100, 10),
         (1000, 300, 3)],
    )
    def test_n_segments_rounding(self, n_frames, segmentation,
                                 expected):
        info = [{"Frames": n_frames, "Height": 8, "Width": 8}]
        assert postprocess.n_segments(info, segmentation) == expected

    def test_n_segments_uses_latest_info_entry(self):
        info = [
            {"Frames": 100, "Height": 8, "Width": 8},
            {"Frames": 1000},
        ]
        assert postprocess.n_segments(info, 100) == 10

    def test_segment_callback_invocations(self):
        locs, _ = _drifted_dataset(n_sites=40, n_frames=100)
        info = [{"Frames": 100, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        calls = []
        postprocess.segment(
            locs, info, 50, {"blur_method": None}, calls.append
        )
        assert calls and calls[-1] == 2

    def test_segment_total_count_matches_locs(self):
        locs, _ = _drifted_dataset(n_sites=40, n_frames=100)
        info = [{"Frames": 100, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        bounds, segments = postprocess.segment(
            locs, info, 50, {"blur_method": None},
            lambda v: None,
        )
        assert segments.shape[0] == 2
        # histogram mass = number of in-FOV locs per segment
        assert segments.sum() == pytest.approx(len(locs), rel=0.01)


class TestFiducialPaths:
    def test_recovers_injected_drift_3d(self):
        rng = np.random.default_rng(8)
        n_frames = 300
        frame = np.arange(n_frames)
        drift_x = 1.2 * frame / n_frames
        drift_z = 40.0 * frame / n_frames  # nm
        rows = []
        for fx, fy in [(10.0, 10.0), (40.0, 50.0)]:
            rows.append(pd.DataFrame({
                "frame": frame.astype(np.uint32),
                "x": (fx + drift_x
                      + rng.normal(0, 0.01, n_frames)
                      ).astype(np.float32),
                "y": np.full(n_frames, fy, np.float32),
                "z": (drift_z + rng.normal(0, 2, n_frames)
                      ).astype(np.float32),
                "photons": np.full(n_frames, 4000, np.float32),
                "sx": np.full(n_frames, 1.0, np.float32),
                "sy": np.full(n_frames, 1.0, np.float32),
                "bg": np.full(n_frames, 10, np.float32),
                "lpx": np.full(n_frames, 0.01, np.float32),
                "lpy": np.full(n_frames, 0.01, np.float32),
            }))
        locs = pd.concat(rows, ignore_index=True)
        info = [{"Frames": n_frames, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        out, new_info, drift = postprocess.undrift_from_fiducials(
            locs, info, picks=[(10.2, 10.0), (40.2, 50.0)],
            pick_size=1.5,
        )
        assert "z" in drift.columns
        got = drift["x"].to_numpy()
        exp = drift_x - drift_x.mean()
        assert np.abs((got - got.mean()) - exp).max() < 0.02
        gz = drift["z"].to_numpy()
        ez = drift_z - drift_z.mean()
        assert np.abs((gz - gz.mean()) - ez).max() < 6.0  # 2 nm/frame z noise, 2 fiducials

    def test_undrift_z_false_drops_z(self):
        rng = np.random.default_rng(9)
        n_frames = 100
        frame = np.arange(n_frames)
        locs = pd.DataFrame({
            "frame": frame.astype(np.uint32),
            "x": (8 + 0.002 * frame
                  + rng.normal(0, 0.01, n_frames)).astype(np.float32),
            "y": np.full(n_frames, 8, np.float32),
            "z": rng.normal(0, 10, n_frames).astype(np.float32),
            "photons": np.full(n_frames, 4000, np.float32),
            "sx": np.full(n_frames, 1.0, np.float32),
            "sy": np.full(n_frames, 1.0, np.float32),
            "bg": np.full(n_frames, 10, np.float32),
            "lpx": np.full(n_frames, 0.01, np.float32),
            "lpy": np.full(n_frames, 0.01, np.float32),
        })
        info = [{"Frames": n_frames, "Height": 16, "Width": 16,
                 "Pixelsize": 130}]
        z0 = locs["z"].to_numpy().copy()
        out, _, drift = postprocess.undrift_from_fiducials(
            locs, info, picks=[(8.1, 8.0)], pick_size=1.0,
            undrift_z=False,
        )
        assert "z" not in drift.columns
        np.testing.assert_array_equal(out["z"].to_numpy(), z0)

    def test_empty_picks_raises(self):
        locs, _ = _drifted_dataset(n_sites=20, n_frames=50)
        info = [{"Frames": 50, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        with pytest.raises(ValueError):
            postprocess.undrift_from_fiducials(
                locs, info, picks=[], pick_size=1.0
            )

    def test_undrift_from_picked_interpolates_missing_frames(self):
        """Frames where the fiducial is dark get interpolated drift."""
        rng = np.random.default_rng(10)
        n_frames = 120
        frame = np.arange(n_frames)
        keep = (frame % 3) != 0  # fiducial dark every 3rd frame
        drift_x = 0.01 * frame
        fid = pd.DataFrame({
            "frame": frame[keep].astype(np.uint32),
            "x": (8 + drift_x[keep]
                  + rng.normal(0, 0.005, keep.sum())
                  ).astype(np.float32),
            "y": np.full(keep.sum(), 8, np.float32),
        })
        info = [{"Frames": n_frames, "Height": 16, "Width": 16,
                 "Pixelsize": 130}]
        drift = postprocess.undrift_from_picked([fid], info)
        assert len(drift) == n_frames
        assert np.isfinite(drift["x"]).all()
        got = drift["x"].to_numpy()
        exp = drift_x - drift_x.mean()
        assert np.abs((got - got.mean()) - exp).max() < 0.05


class TestPlotDrift:
    def test_2d_and_3d_figures(self):
        import matplotlib

        matplotlib.use("Agg")
        drift2 = pd.DataFrame({
            "x": np.linspace(0, 1, 50), "y": np.zeros(50),
        })
        fig = postprocess.plot_drift(drift2, pixelsize=130)
        assert fig is not None
        drift3 = drift2.assign(z=np.linspace(0, 40, 50))
        fig3 = postprocess.plot_drift(drift3, pixelsize=130)
        assert fig3 is not None

    def test_reuses_passed_figure(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        drift = pd.DataFrame({
            "x": np.zeros(10), "y": np.zeros(10),
        })
        out = postprocess.plot_drift(drift, fig=fig)
        assert out is fig


class TestApplyDriftMore:
    def test_ndarray_matches_dataframe(self):
        locs, _ = _drifted_dataset(n_sites=10, n_frames=50)
        info = [{"Frames": 50, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        arr = np.column_stack([
            np.linspace(0, 1, 50), np.linspace(0, -1, 50)
        ])
        df = pd.DataFrame({"x": arr[:, 0], "y": arr[:, 1]})
        a = postprocess.apply_drift(locs, info, drift=arr)
        b = postprocess.apply_drift(locs, info, drift=df)
        np.testing.assert_allclose(
            a["x"].to_numpy(), b["x"].to_numpy()
        )

    def test_does_not_mutate_drift(self):
        locs, _ = _drifted_dataset(n_sites=10, n_frames=50)
        info = [{"Frames": 50, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        drift = pd.DataFrame({
            "x": np.linspace(0, 1, 50), "y": np.zeros(50),
        })
        before = drift.copy()
        postprocess.apply_drift(locs, info, drift=drift)
        pd.testing.assert_frame_equal(drift, before)

    def test_wrong_type_raises(self):
        locs, _ = _drifted_dataset(n_sites=10, n_frames=50)
        info = [{"Frames": 50, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        with pytest.raises((TypeError, ValueError)):
            postprocess.apply_drift(
                locs, info, drift="not a drift"
            )
