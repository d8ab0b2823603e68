"""FFT correlation primitives (mirrors the reference's
test_imageprocess.py): xcorr peak location, sub-pixel shift recovery,
RCC consistency, radial sums."""

from __future__ import annotations

import numpy as np
import pytest

from picasso_tpu import imageprocess


def _blob_image(shape=(64, 64), centers=((20, 30), (45, 12)), sigma=1.5):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    img = np.zeros(shape)
    for cy, cx in centers:
        img += np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)
        )
    return img.astype(np.float32)


class TestXcorr:
    def test_autocorrelation_peak_at_center(self):
        img = _blob_image()
        xc = imageprocess.xcorr(img, img)
        peak = np.unravel_index(np.argmax(xc), xc.shape)
        assert peak == (img.shape[0] // 2, img.shape[1] // 2)

    def test_get_image_shift_integer(self):
        img = _blob_image()
        shifted = np.roll(np.roll(img, 3, axis=0), -5, axis=1)
        dy, dx = imageprocess.get_image_shift(img, shifted, box=5)
        assert dy == pytest.approx(3, abs=0.05)
        assert dx == pytest.approx(-5, abs=0.05)

    def test_get_image_shift_subpixel(self):
        shape = (64, 64)
        img = _blob_image(shape)
        img_s = _blob_image(
            shape, centers=((20 + 0.4, 30 - 0.3), (45 + 0.4, 12 - 0.3))
        )
        dy, dx = imageprocess.get_image_shift(
            img, img_s, box=5
        )
        assert dy == pytest.approx(0.4, abs=0.1)
        assert dx == pytest.approx(-0.3, abs=0.1)

    def test_max_shift_roi_limits_search(self):
        img = _blob_image()
        shifted = np.roll(img, 10, axis=0)
        dy, dx = imageprocess.get_image_shift(
            img, shifted, box=5, roi=4
        )
        # true shift outside the ROI: result stays bounded by it
        assert abs(dy) <= 4.5


class TestRCC:
    def test_pairwise_shifts_consistent(self):
        rng = np.random.default_rng(0)
        base = rng.random((48, 48)).astype(np.float32)
        base[10:38, 10:38] += _blob_image((28, 28))[:, :]
        shifts_true = [(0, 0), (2, -1), (4, -2), (6, -3)]
        stack = np.stack(
            [
                np.roll(np.roll(base, sy, axis=0), sx, axis=1)
                for sy, sx in shifts_true
            ]
        )
        sy, sx = imageprocess.rcc(stack)
        rel_y = sy - sy[0]
        rel_x = sx - sx[0]
        np.testing.assert_allclose(
            rel_y, [s[0] for s in shifts_true], atol=0.2
        )
        np.testing.assert_allclose(
            rel_x, [s[1] for s in shifts_true], atol=0.2
        )


class TestRadialSum:
    def test_ring_mass_lands_in_ring_bins(self):
        shape = (65, 65)
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        r = np.hypot(yy - 32, xx - 32)
        ring = ((r > 9.5) & (r < 10.5)).astype(np.float32)
        rs = imageprocess.radial_sum(ring)
        assert rs[10] == rs.max()
        assert rs[:8].sum() == 0

    def test_complex_input(self):
        img = _blob_image((33, 33), centers=((16, 16),))
        z = img + 1j * img
        rs = imageprocess.radial_sum(z)
        assert np.iscomplexobj(rs)
        np.testing.assert_allclose(rs.real, rs.imag, rtol=1e-6)


def test_rcc_sharded_path_matches_host(monkeypatch):
    """Force the mesh-sharded pair-correlation path (taken for large
    segmentations on multi-device meshes) and check it reproduces the
    host result."""
    from picasso_tpu import imageprocess

    rng = np.random.default_rng(7)
    base = rng.random((32, 32)).astype(np.float32)
    segments = [
        np.roll(np.roll(base, dy, axis=0), dx, axis=1)
        for dy, dx in [(0, 0), (1, 2), (2, 4), (3, 6)]
    ]
    host_drift = imageprocess.rcc(segments, max_shift=10)
    monkeypatch.setattr(imageprocess, "DEVICE_PAIR_PIXELS", 0)
    sharded_drift = imageprocess.rcc(segments, max_shift=10)
    np.testing.assert_allclose(
        sharded_drift[0], host_drift[0], atol=1e-3
    )
    np.testing.assert_allclose(
        sharded_drift[1], host_drift[1], atol=1e-3
    )


class TestXcorrContract:
    def test_zero_input_no_nan(self):
        a = np.zeros((32, 32), np.float32)
        out = imageprocess.xcorr(a, a)
        assert np.isfinite(out).all()

    def test_no_shift_returns_zero(self):
        rng = np.random.default_rng(0)
        img = rng.random((48, 48)).astype(np.float32)
        dy, dx = imageprocess.get_image_shift(img, img, box=5)
        assert abs(dy) < 0.05 and abs(dx) < 0.05

    def test_zero_image_short_circuits(self):
        img = np.zeros((32, 32), np.float32)
        other = np.random.default_rng(1).random(
            (32, 32)
        ).astype(np.float32)
        dy, dx = imageprocess.get_image_shift(img, other, box=5)
        assert (dy, dx) == (0, 0)


class TestFindFiducials:
    def _locs(self):
        import pandas as pd

        rng = np.random.default_rng(2)
        n_frames = 200
        rows = []
        for fx, fy in [(8.0, 8.0), (24.0, 20.0)]:
            rows.append(pd.DataFrame({
                "frame": np.arange(n_frames, dtype=np.uint32),
                "x": (fx + rng.normal(0, 0.02, n_frames)
                      ).astype(np.float32),
                "y": (fy + rng.normal(0, 0.02, n_frames)
                      ).astype(np.float32),
                "photons": np.full(n_frames, 4000, np.float32),
                "lpx": np.full(n_frames, 0.02, np.float32),
                "lpy": np.full(n_frames, 0.02, np.float32),
            }))
        # sparse background
        rows.append(pd.DataFrame({
            "frame": rng.integers(
                0, n_frames, 100
            ).astype(np.uint32),
            "x": rng.uniform(0, 32, 100).astype(np.float32),
            "y": rng.uniform(0, 32, 100).astype(np.float32),
            "photons": np.full(100, 1000, np.float32),
            "lpx": np.full(100, 0.05, np.float32),
            "lpy": np.full(100, 0.05, np.float32),
        }))
        import pandas as pd

        return pd.concat(rows, ignore_index=True)

    def test_returns_picks_near_fiducials(self):
        info = [{"Frames": 200, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        picks, box = imageprocess.find_fiducials(
            self._locs(), info
        )
        assert box > 0
        assert len(picks) >= 2
        found = np.array(picks, float)
        for fx, fy in [(8.0, 8.0), (24.0, 20.0)]:
            d = np.hypot(found[:, 0] - fx, found[:, 1] - fy)
            assert d.min() < 1.5

    def test_picks_within_bounds(self):
        info = [{"Frames": 200, "Height": 32, "Width": 32,
                 "Pixelsize": 130}]
        picks, _ = imageprocess.find_fiducials(self._locs(), info)
        for x, y in picks:
            assert 0 <= x <= 32 and 0 <= y <= 32


class TestRadialSum:
    def test_delta_at_center(self):
        img = np.zeros((33, 33), np.float32)
        img[16, 16] = 5.0
        rs = imageprocess.radial_sum(img)
        assert rs[0] == pytest.approx(5.0)
        assert rs[1:].sum() == pytest.approx(0.0)

    def test_total_mass_within_disk(self):
        rng = np.random.default_rng(3)
        img = rng.random((33, 33)).astype(np.float32)
        rs = imageprocess.radial_sum(img)
        # all mass within the inscribed disk is accounted for
        yy, xx = np.mgrid[:33, :33]
        r = np.hypot(yy - 16, xx - 16)
        inside = img[r < 16].sum()
        assert rs[:16].sum() == pytest.approx(inside, rel=0.1)
