"""Particle averaging: autocorrelation peak, alignment of rotated
copies."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import average

INFO = [{"Frames": 100, "Height": 64, "Width": 64, "Pixelsize": 130}]


def test_autocorrelation_peak_at_center():
    """Autocorrelation of an image peaks at the fftshift center
    (reference test_average.py:17-25)."""
    rng = np.random.default_rng(0)
    image = rng.random((32, 32)).astype(np.float32)
    CF = np.conj(np.fft.fft2(image))
    xcorr = average.compute_xcorr(CF, image)
    peak = np.unravel_index(np.argmax(xcorr), xcorr.shape)
    assert peak == (16, 16)


def _l_shape_locs(n_groups=8, n_per_site=30, sigma=0.02, seed=0):
    """Groups of locs sampled from an L-shaped structure, randomly
    rotated and shifted per group."""
    rng = np.random.default_rng(seed)
    template = np.array(
        [[0.0, 0.0], [0.4, 0.0], [0.8, 0.0], [0.0, 0.4], [0.0, 0.8]]
    )
    template -= template.mean(axis=0)
    rows = []
    for g in range(n_groups):
        ang = rng.uniform(0, 2 * np.pi)
        R = np.array(
            [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        )
        shift = rng.uniform(-0.2, 0.2, 2)
        pts = template @ R.T + shift
        for p in pts:
            for _ in range(n_per_site):
                rows.append(
                    (g, p[0] + rng.normal(0, sigma),
                     p[1] + rng.normal(0, sigma))
                )
    arr = np.array(rows)
    return pd.DataFrame(
        {
            "frame": np.arange(len(arr), dtype=np.uint32) % 100,
            "x": (arr[:, 1] + 32).astype(np.float32),
            "y": (arr[:, 2] + 32).astype(np.float32),
            "group": arr[:, 0].astype(np.int32),
            "lpx": np.full(len(arr), sigma, np.float32),
            "lpy": np.full(len(arr), sigma, np.float32),
        }
    )


def test_average_aligns_rotated_groups():
    locs = _l_shape_locs()
    out = average.average(
        locs, INFO, display_pixel_size=5.0, iterations=3
    )
    assert out is not None
    # After averaging, the combined point cloud must be much tighter
    # than before: compare the mean distance of each loc to its nearest
    # of 5 cluster modes via a simple KMeans-free check — the aligned
    # structure should have 5 tight site clusters.
    from scipy.spatial import cKDTree

    xy = np.column_stack([out["x"], out["y"]])
    # find the 5 strongest modes by simple histogram peaking
    from picasso_tpu import postprocess

    clustered = None
    try:
        from picasso_tpu import clusterer

        cl = clusterer.cluster(
            out.assign(
                photons=1.0, sx=1.0, sy=1.0, bg=0.0,
                net_gradient=1.0,
            ),
            radius_xy=0.12,
            min_locs=50,
            frame_analysis=False,
        )
        clustered = cl
    except Exception:
        pass
    assert clustered is not None
    n_found = len(np.unique(clustered["group"]))
    assert n_found == 5, f"expected 5 aligned sites, got {n_found}"


def test_com_align_centers_groups():
    locs = _l_shape_locs(n_groups=3)
    gi = average.build_group_index(locs)
    out = average.com_align(locs, gi)
    for g in range(3):
        sub = out[out["group"] == g]
        assert abs(sub["x"].mean()) < 1e-5
        assert abs(sub["y"].mean()) < 1e-5


def test_com_align_does_not_mutate_input():
    locs = _l_shape_locs(n_groups=3)
    x_before = locs["x"].copy()
    gi = average.build_group_index(locs)
    average.com_align(locs, gi)
    np.testing.assert_array_equal(locs["x"], x_before)


def test_build_group_index_maps_groups():
    locs = _l_shape_locs(n_groups=4)
    gi = average.build_group_index(locs)
    assert gi.shape[0] == 4
    assert gi.shape[1] == len(locs)
    # each loc belongs to exactly one group
    assert gi.sum() == len(locs)


def test_xcorr_recovers_translation():
    rng = np.random.default_rng(0)
    img = np.zeros((32, 32), np.float32)
    img[10:14, 8:12] = rng.random((4, 4))
    shifted = np.roll(np.roll(img, 3, axis=0), -2, axis=1)
    CF = np.conj(np.fft.fft2(img))
    xc = average.compute_xcorr(CF, shifted)
    peak = np.unravel_index(np.argmax(xc), xc.shape)
    assert (peak[0] - 16, peak[1] - 16) == (3, -2)


def test_prepare_locs_for_save_shifts_into_fov():
    locs = _l_shape_locs(n_groups=3)
    gi = average.build_group_index(locs)
    centered = average.com_align(locs, gi)
    INFO = [{"Frames": 100, "Height": 32, "Width": 32,
             "Pixelsize": 130}]
    out, info = average.prepare_locs_for_save(
        centered, INFO, {"it": 5}
    )
    assert (out["x"] > 0).all() and (out["y"] > 0).all()
    assert info[-1]["Iterations"] == 5


def test_average_missing_group_raises():
    locs = _l_shape_locs(n_groups=2).drop(columns=["group"])
    INFO = [{"Frames": 100, "Height": 32, "Width": 32,
             "Pixelsize": 130}]
    with pytest.raises(AssertionError):
        average.average(locs, INFO)


def test_average_progress_callback_invoked():
    locs = _l_shape_locs(n_groups=3)
    INFO = [{"Frames": 100, "Height": 32, "Width": 32,
             "Pixelsize": 130}]
    calls = []
    average.average(
        locs, INFO, iterations=1,
        progress_callback=lambda *a: calls.append(a),
    )
    assert calls


class TestDeviceAveraging:
    """Batched device group alignment vs the host per-group path."""

    def test_device_matches_host_alignment(self, monkeypatch):
        locs = _l_shape_locs(n_groups=12, seed=3)
        monkeypatch.setenv("PICASSO_TPU_AVERAGE", "host")
        out_h = average.average(
            locs, INFO, display_pixel_size=10.0, iterations=2
        )
        monkeypatch.setenv("PICASSO_TPU_AVERAGE", "device")
        out_d = average.average(
            locs, INFO, display_pixel_size=10.0, iterations=2
        )
        # identical deterministic pipeline (same average image, same
        # angle grid, same argmax rule) up to FFT rounding
        np.testing.assert_allclose(
            out_d["x"].to_numpy(), out_h["x"].to_numpy(), atol=1e-3
        )
        np.testing.assert_allclose(
            out_d["y"].to_numpy(), out_h["y"].to_numpy(), atol=1e-3
        )

    def test_device_average_converges(self, monkeypatch):
        """Quality gate on the device path: after averaging, the
        ensemble image is sharper than before (alignment worked)."""
        monkeypatch.setenv("PICASSO_TPU_AVERAGE", "device")
        locs = _l_shape_locs(n_groups=20, seed=4)
        out = average.average(
            locs, INFO, display_pixel_size=10.0, iterations=3
        )
        r_before = np.hypot(
            locs["x"] - locs["x"].mean(), locs["y"] - locs["y"].mean()
        )

        def sharpness(df):
            _, img = average._render_hist_square(
                df["x"].to_numpy() - df["x"].mean(),
                df["y"].to_numpy() - df["y"].mean(),
                13.0, -2 * r_before.mean(), 2 * r_before.mean(),
            )
            return (img**2).sum() / max(img.sum(), 1) ** 2

        assert sharpness(out) > 1.5 * sharpness(locs)


class TestXcorrShapes:
    @pytest.mark.parametrize("shape", [(16, 16), (32, 16), (17, 23)])
    def test_xcorr_shape(self, shape):
        rng = np.random.default_rng(0)
        a = rng.random(shape).astype(np.float32)
        CF = np.conj(np.fft.fft2(a))
        out = average.compute_xcorr(CF, a)
        assert out.shape == shape


class TestAlignGroupCore:
    def test_no_shift_when_group_equals_average(self):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.3, 200).astype(np.float32)
        y = rng.normal(0, 0.3, 200).astype(np.float32)
        oversampling, r = 10.0, 1.2
        _, img = average._render_hist_square(
            x, y, oversampling, -r, r
        )
        CF = np.conj(np.fft.fft2(img))
        angles = np.array([0.0])
        xa, ya = average.align_group_core(
            np.arange(200), x, y, angles, oversampling, -r, r,
            CF, img.shape[0] / 2,
        )
        # aligning a group against ITS OWN average must not move it
        np.testing.assert_allclose(xa, x, atol=0.15)
        np.testing.assert_allclose(ya, y, atol=0.15)


class TestPrepareLocsForSave:
    def _grouped(self):
        rng = np.random.default_rng(2)
        n = 200
        return pd.DataFrame({
            "frame": rng.integers(0, 50, n).astype(np.uint32),
            "x": rng.normal(0, 0.4, n).astype(np.float32),
            "y": rng.normal(0, 0.4, n).astype(np.float32),
            "group": rng.integers(0, 5, n).astype(np.int32),
        })

    def test_params_in_metadata_and_partial(self):
        info = [{"Frames": 50, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        out, new_info = average.prepare_locs_for_save(
            self._grouped(), info, {"it": 7, "bogus": 1}
        )
        assert new_info[-1]["Iterations"] == 7  # unknown keys ignored
        assert "bogus" not in new_info[-1]
        assert len(new_info) == len(info) + 1

    def test_shifts_to_positive_coords(self):
        info = [{"Frames": 50, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        locs = self._grouped()
        locs["x"] -= 10  # push negative
        out, _ = average.prepare_locs_for_save(locs, info, {})
        assert (out["x"] > 0).all()
        assert (out["y"] > 0).all()


class TestComAlign:
    def test_single_group(self):
        locs = pd.DataFrame({
            "x": np.array([1.0, 3.0], np.float32),
            "y": np.array([2.0, 4.0], np.float32),
            "group": np.array([0, 0], np.int32),
        })
        gi = average.build_group_index(locs)
        out = average.com_align(locs, gi)
        assert out["x"].mean() == pytest.approx(0.0)
        assert out["y"].mean() == pytest.approx(0.0)
