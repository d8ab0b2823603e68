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
