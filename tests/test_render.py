"""Rendering: mass preservation, host/device parity, rotation,
contrast, spatial index correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import render, spatial_index

INFO = [{"Frames": 100, "Height": 32, "Width": 32, "Pixelsize": 130}]
LINEAR_BLUR_METHODS = [None, "gaussian", "gaussian_iso", "convolve",
                       "smooth"]


def _locs(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "frame": rng.integers(0, 100, n).astype(np.uint32),
            "x": rng.uniform(2, 30, n).astype(np.float32),
            "y": rng.uniform(2, 30, n).astype(np.float32),
            "photons": rng.uniform(500, 5000, n).astype(np.float32),
            "sx": rng.uniform(0.8, 1.5, n).astype(np.float32),
            "sy": rng.uniform(0.8, 1.5, n).astype(np.float32),
            "bg": rng.uniform(0, 20, n).astype(np.float32),
            "lpx": rng.uniform(0.05, 0.3, n).astype(np.float32),
            "lpy": rng.uniform(0.05, 0.3, n).astype(np.float32),
        }
    )


class TestRender:
    @pytest.mark.parametrize("blur", LINEAR_BLUR_METHODS)
    def test_mass_preservation(self, blur):
        """Each rendered loc contributes ~unit mass for all linear
        blur methods (reference test_render.py:24)."""
        locs = _locs()
        n, image = render.render(
            locs, INFO, oversampling=4, blur_method=blur
        )
        assert n == len(locs)
        assert image.shape == (128, 128)
        assert image.sum() == pytest.approx(n, rel=0.05)

    def test_hist_counts_exact(self):
        locs = _locs()
        n, image = render.render(locs, INFO, oversampling=2)
        assert image.sum() == n
        assert image.dtype == np.float32

    def test_viewport_crop(self):
        locs = _locs()
        viewport = ((8, 8), (16, 24))
        n, image = render.render(
            locs, INFO, oversampling=1, viewport=viewport
        )
        assert image.shape == (8, 16)
        in_view = (
            (locs["x"] > 8) & (locs["x"] < 24)
            & (locs["y"] > 8) & (locs["y"] < 16)
        )
        assert n == in_view.sum()

    def test_disp_px_size_supersedes_oversampling(self):
        locs = _locs()
        _, img_a = render.render(locs, INFO, disp_px_size=65.0)
        _, img_b = render.render(locs, INFO, oversampling=2.0)
        np.testing.assert_array_equal(img_a, img_b)

    def test_gaussian_peak_at_loc(self):
        locs = pd.DataFrame(
            {
                "x": [16.0],
                "y": [8.0],
                "lpx": [0.2],
                "lpy": [0.2],
            }
        )
        n, image = render.render(
            locs, INFO, oversampling=4, blur_method="gaussian"
        )
        yx = np.unravel_index(np.argmax(image), image.shape)
        # the loc sits exactly on a pixel boundary; either neighbor
        # (pixel centers at +0.5) is a valid argmax
        assert yx[0] in (31, 32)
        assert yx[1] in (63, 64)

    def test_rotation_identity(self):
        locs = _locs()
        locs["z"] = 0.0
        n0, img0 = render.render(locs, INFO, oversampling=2)
        n1, img1 = render.render(
            locs, INFO, oversampling=2, ang=(0.0, 0.0, 0.0)
        )
        assert n0 == n1
        np.testing.assert_allclose(img0, img1, atol=1e-5)

    def test_rotation_z90(self):
        """90-degree in-plane rotation permutes the histogram."""
        locs = _locs()
        locs["z"] = 0.0
        _, img0 = render.render(locs, INFO, oversampling=1)
        _, img_rot = render.render(
            locs, INFO, oversampling=1, ang=(0.0, 0.0, np.pi / 2)
        )
        assert img_rot.sum() == pytest.approx(img0.sum(), rel=0.05)

    def test_device_host_splat_parity(self):
        """The device bucketed splat must match the host loop."""
        from picasso_tpu.ops.render_ops import (
            _splat_bucket_device,
            _splat_bucket_host,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        n = 256
        x = rng.uniform(3, 60, n).astype(np.float32)
        y = rng.uniform(3, 60, n).astype(np.float32)
        sx = rng.uniform(0.3, 1.0, n).astype(np.float32)
        sy = rng.uniform(0.3, 1.0, n).astype(np.float32)
        host = _splat_bucket_host(x, y, sx, sy, 64, 64)
        dev = np.asarray(
            _splat_bucket_device(
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(sx),
                jnp.asarray(sy), 8, 64, 64,
            )
        )
        np.testing.assert_allclose(dev, host, atol=1e-4)


class TestHist3D:
    def test_basic(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(2, 30, 500)
        y = rng.uniform(2, 30, 500)
        z = rng.uniform(-200, 200, 500)  # nm
        n, image = render.render_hist3d(
            x, y, z, 1.0, 0, 0, 32, 32, -300, 300, 130
        )
        assert image.ndim == 3
        assert image.sum() == n


class TestContrastColors:
    def test_scale_contrast(self):
        img = np.array([[0.0, 5.0], [10.0, 20.0]], np.float32)
        scaled = render.scale_contrast(img)
        assert scaled.min() == 0.0
        assert scaled.max() == 1.0
        scaled2, limits = render.scale_contrast(
            img, autoscale=True, return_contrast_limits=True
        )
        assert limits == (0.0, 10.0)
        assert scaled2.max() == 1.0  # clipped

    def test_apply_colormap(self):
        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        rgb = render.apply_colormap(img, "magma")
        assert rgb.shape == (16, 16, 3)
        assert rgb.dtype == np.uint8

    def test_luts(self):
        lut = render.solid_to_lut((1.0, 0.0, 0.0))
        assert lut.shape == (256, 3)
        np.testing.assert_allclose(lut[-1], [1, 0, 0])
        lut2 = render.stops_to_lut(
            [(0.0, 0, 0, 0), (0.5, 1, 0, 0), (1.0, 1, 1, 0)]
        )
        np.testing.assert_allclose(lut2[128], [1, 0, 0], atol=0.01)

    def test_render_scene_single(self):
        locs = _locs()
        rgb, n = render.render_scene(
            locs, INFO, disp_px_size=65.0
        )
        assert rgb.shape == (64, 64, 3)
        assert rgb.dtype == np.uint8
        assert n == len(locs)

    def test_render_scene_multi(self):
        locs = [_locs(seed=0), _locs(seed=1)]
        rgb, n = render.render_scene(
            locs, [INFO, INFO], disp_px_size=65.0,
            colors=[(1, 0, 0), (0, 1, 0)],
        )
        assert rgb.shape == (64, 64, 3)
        assert n == 2 * 2000

    def test_split_by_property(self):
        locs = _locs()
        groups = render.split_locs_by_property(
            locs, property_name="photons", n_colors=4
        )
        assert len(groups) == 4
        assert sum(len(g) for g in groups) == len(locs)

    def test_split_by_group(self):
        locs = _locs()
        locs["group"] = np.arange(len(locs)) % 3
        groups = render.split_locs_by_group(locs)
        assert len(groups) == 3


class TestSpatialIndex:
    def test_query_matches_bruteforce(self):
        locs = _locs(5000)
        info = [{"Width": 32, "Height": 32}]
        pyr = spatial_index.build_render_index(locs, info)
        viewport = ((10.0, 5.0), (12.0, 7.0))
        idx = spatial_index.query_viewport(pyr, viewport)
        assert idx is not None
        got = set(idx.tolist())
        x = locs["x"].to_numpy()
        y = locs["y"].to_numpy()
        in_vp = np.nonzero(
            (x >= 5) & (x <= 7) & (y >= 10) & (y <= 12)
        )[0]
        # every loc in the viewport must be returned (superset allowed:
        # block granularity)
        assert set(in_vp.tolist()).issubset(got)

    def test_full_fov_bypass(self):
        locs = _locs(100)
        info = [{"Width": 32, "Height": 32}]
        pyr = spatial_index.build_render_index(locs, info)
        assert (
            spatial_index.query_viewport(pyr, ((0, 0), (32, 32)))
            is None
        )

    def test_empty(self):
        locs = _locs(0)
        info = [{"Width": 32, "Height": 32}]
        pyr = spatial_index.build_render_index(locs, info)
        out = spatial_index.query_viewport(pyr, ((1, 1), (2, 2)))
        assert len(out) == 0
