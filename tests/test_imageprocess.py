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
