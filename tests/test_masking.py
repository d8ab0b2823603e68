"""Masking: threshold algorithms, binary masks, loc partitioning,
Tukey window, LOESS smoothing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import masking

INFO = [{"Frames": 100, "Height": 32, "Width": 32, "Pixelsize": 130}]


def _bimodal_image(seed=0):
    """Dark background with a bright square — every global threshold
    method must separate the two modes."""
    rng = np.random.default_rng(seed)
    img = rng.normal(0.1, 0.02, (64, 64))
    img[20:44, 20:44] = rng.normal(0.9, 0.02, (24, 24))
    return np.clip(img, 0, 1)


GLOBAL_METHODS = (
    "isodata", "li", "mean", "minimum", "otsu", "triangle", "yen",
)


class TestGlobalThresholds:
    @pytest.mark.parametrize("method", GLOBAL_METHODS)
    def test_separates_bimodal(self, method):
        img = _bimodal_image()
        t = getattr(masking, f"threshold_{method}")(img)
        assert 0.12 < t < 0.88
        mask = masking.binary_mask(img, t)
        # the bright square is 24x24 = 576 px; yen admits some noise
        assert 450 < mask.sum() < 1200

    @pytest.mark.parametrize("method", masking.THRESHOLD_METHODS)
    def test_mask_image_all_methods(self, method):
        img = _bimodal_image()
        mask = masking.mask_image(img, method=method)
        assert mask.dtype == bool
        assert mask.shape == img.shape
        assert 0 < mask.sum() < mask.size

    def test_otsu_known_split(self):
        # two delta-like populations: threshold falls between them
        img = np.concatenate(
            [np.full(500, 0.2), np.full(500, 0.8)]
        ).reshape(25, 40)
        t = masking.threshold_otsu(img)
        assert 0.2 < t < 0.8


class TestLocalThresholds:
    def test_local_methods_highlight_edges(self):
        img = _bimodal_image()
        for m in ("local_gaussian", "local_mean", "local_median"):
            mask = getattr(masking, f"threshold_{m}")(img)
            assert mask.dtype == bool
            assert mask.any()


class TestBinaryMask:
    def test_scalar_and_array_thresholds(self):
        img = np.linspace(0, 1, 16).reshape(4, 4)
        assert masking.binary_mask(img, 0.5).sum() == 8
        arr_t = np.full((4, 4), 0.5)
        assert masking.binary_mask(img, arr_t).sum() == 8

    def test_wrong_shape_array_raises(self):
        img = np.zeros((4, 4))
        with pytest.raises(ValueError):
            masking.binary_mask(img, np.zeros((2, 2)))


class TestMaskLocs:
    def test_partition_inside_outside(self):
        rng = np.random.default_rng(1)
        n = 1000
        locs = pd.DataFrame(
            {
                "frame": rng.integers(0, 100, n).astype(np.uint32),
                "x": rng.uniform(0, 32, n).astype(np.float32),
                "y": rng.uniform(0, 32, n).astype(np.float32),
            }
        )
        mask = np.zeros((64, 64), bool)
        mask[:, :32] = True  # left half of the FOV (x < 16)
        inside, outside = masking.mask_locs(locs, mask, info=INFO)
        assert len(inside) + len(outside) == n
        assert (inside["x"] < 16).all()
        assert (outside["x"] >= 16).all()

    def test_requires_info_or_dims(self):
        locs = pd.DataFrame(
            {"frame": [0], "x": [1.0], "y": [1.0]}
        )
        with pytest.raises(ValueError):
            masking.mask_locs(locs, np.ones((4, 4), bool))


class TestTukeyAndLoess:
    def test_tukey_window_properties(self):
        img = np.ones((64, 64))
        w = masking.threshold_tukey(img)
        assert w.shape == img.shape
        assert w.max() == pytest.approx(1.0)
        # center is flat 1, edges taper toward 0
        assert w[32, 32] == pytest.approx(1.0)
        assert w[0, 32] < 0.5

    def test_tukey_requires_square(self):
        with pytest.raises(AssertionError):
            masking.threshold_tukey(np.ones((32, 64)))

    def test_loess_smooths_noise(self):
        rng = np.random.default_rng(0)
        x = np.linspace(0, 4 * np.pi, 200)
        clean = np.sin(x)
        noisy = clean + rng.normal(0, 0.3, 200)
        smooth = masking.loess_smooth(noisy, span=15)
        assert np.mean((smooth - clean) ** 2) < np.mean(
            (noisy - clean) ** 2
        ) / 2

    def test_loess_preserves_linear_trend(self):
        arr = np.arange(50, dtype=float)
        out = masking.loess_smooth(arr, span=7)
        np.testing.assert_allclose(out, arr, atol=1e-8)


class TestGenerateImage:
    def test_normalized_blurred_histogram(self):
        rng = np.random.default_rng(2)
        n = 2000
        locs = pd.DataFrame(
            {
                "frame": rng.integers(0, 100, n).astype(np.uint32),
                "x": rng.uniform(10, 22, n).astype(np.float32),
                "y": rng.uniform(10, 22, n).astype(np.float32),
                "lpx": np.full(n, 0.1, np.float32),
                "lpy": np.full(n, 0.1, np.float32),
            }
        )
        img = masking.generate_image(
            locs, INFO, disp_px_size=130.0, blur=260.0
        )
        assert img.max() == pytest.approx(1.0)
        assert img.min() >= 0
