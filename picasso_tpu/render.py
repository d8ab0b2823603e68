"""picasso_tpu.render — super-resolution rendering.

Same public surface as picasso/render.py (render :37, render_hist
:776, render_hist3d :857, viewport algebra :1807-2038, scale_contrast
:3082, apply_colormap :3181, render_scene :2728, split_locs_* :3206),
with the per-loc numba fill loops replaced by device scatter-add /
Gaussian-splat programs (picasso_tpu.ops.render_ops). Scene output is
a plain numpy RGB array — no Qt dependency in the core (the reference
pulls PyQt6 in at render.py:27).
"""

from __future__ import annotations

import functools
from typing import Literal

import numpy as np
import pandas as pd
from scipy import ndimage
from scipy.spatial.transform import Rotation

from picasso_tpu import lib
from picasso_tpu.ops import render_ops

N_GROUP_COLORS = 8
_DRAW_MAX_SIGMA = render_ops.DRAW_MAX_SIGMA

# Default group colors used by the GUI convention (index = group % 8).
GROUP_COLORS = np.array(
    [
        (1.0, 0.0, 0.0),
        (0.0, 1.0, 0.0),
        (0.0, 0.4, 1.0),
        (1.0, 1.0, 0.0),
        (1.0, 0.0, 1.0),
        (0.0, 1.0, 1.0),
        (1.0, 0.5, 0.0),
        (0.6, 0.2, 1.0),
    ],
    dtype=np.float32,
)


# ---------------------------------------------------------------------------
# Main dispatch
# ---------------------------------------------------------------------------


def render(
    locs: pd.DataFrame,
    info: list[dict] | None,
    oversampling: float = 1.0,
    viewport=None,
    blur_method: (
        Literal["gaussian", "gaussian_iso", "smooth", "convolve"] | None
    ) = None,
    min_blur_width: float = 0.0,
    ang=None,
    disp_px_size: float | None = None,
) -> tuple[int, np.ndarray]:
    """Render locs into a float image. Returns (n_rendered, image).
    Mirrors picasso/render.py:37: ``disp_px_size`` (nm) supersedes
    ``oversampling``; viewport is ((y_min, x_min), (y_max, x_max)) in
    camera px."""
    if disp_px_size is not None:
        pixelsize = lib.get_from_metadata(
            info, "Pixelsize", raise_error=True
        )
        oversampling = pixelsize / disp_px_size
    if viewport is None:
        try:
            viewport = [(0, 0), (info[0]["Height"], info[0]["Width"])]
        except TypeError:
            raise ValueError("Need info if no viewport is provided.")
    (y_min, x_min), (y_max, x_max) = viewport
    args = (locs, oversampling, y_min, x_min, y_max, x_max)
    if blur_method is None:
        return _render_hist(*args, ang=ang)
    elif blur_method == "gaussian":
        return _render_gaussian(*args, min_blur_width, ang=ang)
    elif blur_method == "gaussian_iso":
        return _render_gaussian_iso(*args, min_blur_width, ang=ang)
    elif blur_method == "smooth":
        return _render_smooth(*args, ang=ang)
    elif blur_method == "convolve":
        return _render_convolve(*args, min_blur_width, ang=ang)
    raise Exception("blur_method not understood.")


def _render_setup(x, y, oversampling, y_min, x_min, y_max, x_max):
    """In-view mask + display-pixel transform
    (picasso/render.py:178)."""
    n_pixel_y = int(np.ceil(oversampling * (y_max - y_min)))
    n_pixel_x = int(np.ceil(oversampling * (x_max - x_min)))
    in_view = (x > x_min) & (y > y_min) & (x < x_max) & (y < y_max)
    x = oversampling * (x[in_view] - x_min)
    y = oversampling * (y[in_view] - y_min)
    return n_pixel_y, n_pixel_x, x, y, in_view


def _coords(locs, oversampling, y_min, x_min, y_max, x_max, ang):
    x_all = locs["x"].to_numpy()
    y_all = locs["y"].to_numpy()
    if ang is None:
        return _render_setup(
            x_all, y_all, oversampling, y_min, x_min, y_max, x_max
        ) + (None,)
    n_pixel_y = int(np.ceil(oversampling * (y_max - y_min)))
    n_pixel_x = int(np.ceil(oversampling * (x_max - x_min)))
    x, y, in_view, z = locs_rotation(
        locs, oversampling, x_min, x_max, y_min, y_max, ang
    )
    return n_pixel_y, n_pixel_x, x, y, in_view, z


def _render_hist(
    locs, oversampling, y_min, x_min, y_max, x_max, ang=None
):
    """Histogram rendering (picasso/render.py:798)."""
    ny, nx, x, y, in_view, _ = _coords(
        locs, oversampling, y_min, x_min, y_max, x_max, ang
    )
    image = render_ops.hist2d(x, y, ny, nx)
    return len(x), image


def render_hist(
    locs, oversampling, y_min, x_min, y_max, x_max
):
    """Public alias (picasso/render.py:776)."""
    return _render_hist(locs, oversampling, y_min, x_min, y_max, x_max)


def render_hist3d(
    x, y, z, oversampling, y_min, x_min, y_max, x_max, z_min, z_max,
    pixelsize,
):
    """3D histogram rendering (picasso/render.py:857). z in nm."""
    z_min = z_min / pixelsize
    z_max = z_max / pixelsize
    ny = int(np.ceil(oversampling * (y_max - y_min)))
    nx = int(np.ceil(oversampling * (x_max - x_min)))
    nz = int(np.ceil(oversampling * (z_max - z_min)))
    z_px = np.asarray(z) / pixelsize
    in_view = (
        (x > x_min) & (y > y_min) & (x < x_max) & (y < y_max)
        & (z_px > z_min) & (z_px < z_max)
    )
    xs = oversampling * (np.asarray(x)[in_view] - x_min)
    ys = oversampling * (np.asarray(y)[in_view] - y_min)
    zs = oversampling * (z_px[in_view] - z_min)
    image = render_ops.hist3d(xs, ys, zs, ny, nx, nz)
    return len(xs), image


def _render_gaussian(
    locs, oversampling, y_min, x_min, y_max, x_max, min_blur_width,
    ang=None,
):
    """Per-loc anisotropic Gaussian blur by localization precision
    (picasso/render.py:1020)."""
    ny, nx, x, y, in_view, z = _coords(
        locs, oversampling, y_min, x_min, y_max, x_max, ang
    )
    blur_width = oversampling * np.maximum(
        locs["lpx"].to_numpy(), min_blur_width
    )
    blur_height = oversampling * np.maximum(
        locs["lpy"].to_numpy(), min_blur_width
    )
    sx = blur_width[in_view]
    sy = blur_height[in_view]
    if ang is not None:
        # rotated view: per-loc 3D covariance diag(sx², sy², sz²)
        # rotated by R and projected to 2D (picasso/render.py:579-680)
        if "lpz" in locs.columns:
            lpz = locs["lpz"].to_numpy()
        else:
            lpz = 2 * locs[["lpx", "lpy"]].to_numpy().mean(axis=1)
        blur_depth = oversampling * np.maximum(lpz, min_blur_width)
        sz = blur_depth[in_view]
        R = to_rotation(ang).as_matrix()
        n = len(x)
        covs3 = np.zeros((n, 3, 3))
        covs3[:, 0, 0] = sx**2
        covs3[:, 1, 1] = sy**2
        covs3[:, 2, 2] = sz**2
        rotated = np.einsum("ab,nbc,dc->nad", R, covs3, R)
        image = render_ops.gaussian_splat_cov(
            x, y, rotated[:, :2, :2], ny, nx
        )
        return len(x), image
    image = render_ops.gaussian_splat(x, y, sx, sy, ny, nx)
    return len(x), image


def _render_gaussian_iso(
    locs, oversampling, y_min, x_min, y_max, x_max, min_blur_width,
    ang=None,
):
    """Isotropic per-loc Gaussian blur: min_blur clamps each axis
    BEFORE averaging, and the rotated view keeps the (larger) z blur
    via the rotated-covariance splat (picasso/render.py:1148-1214)."""
    ny, nx, x, y, in_view, _ = _coords(
        locs, oversampling, y_min, x_min, y_max, x_max, ang
    )
    blur_width = oversampling * np.maximum(
        locs["lpx"].to_numpy(), min_blur_width
    )
    blur_height = oversampling * np.maximum(
        locs["lpy"].to_numpy(), min_blur_width
    )
    s = (blur_width[in_view] + blur_height[in_view]) / 2
    if ang is not None:
        if "lpz" in locs.columns:
            lpz = locs["lpz"].to_numpy()
        else:
            lpz = 2 * locs[["lpx", "lpy"]].to_numpy().mean(axis=1)
        sz = (oversampling * np.maximum(lpz, min_blur_width))[in_view]
        R = to_rotation(ang).as_matrix()
        n = len(x)
        covs3 = np.zeros((n, 3, 3))
        covs3[:, 0, 0] = s**2
        covs3[:, 1, 1] = s**2
        covs3[:, 2, 2] = sz**2
        rotated = np.einsum("ab,nbc,dc->nad", R, covs3, R)
        image = render_ops.gaussian_splat_cov(
            x, y, rotated[:, :2, :2], ny, nx
        )
        return len(x), image
    image = render_ops.gaussian_splat(x, y, s, s, ny, nx)
    return len(x), image


def _render_smooth(
    locs, oversampling, y_min, x_min, y_max, x_max, ang=None
):
    """Histogram + one-display-pixel blur (picasso/render.py:1349)."""
    ny, nx, x, y, in_view, _ = _coords(
        locs, oversampling, y_min, x_min, y_max, x_max, ang
    )
    if len(x) == 0:
        return 0, np.zeros((ny, nx), np.float32)
    image = render_ops.hist2d(x, y, ny, nx)
    return len(x), _fftconvolve(image, 1, 1)


def _render_convolve(
    locs, oversampling, y_min, x_min, y_max, x_max, min_blur_width,
    ang=None,
):
    """Histogram + global median-precision blur
    (picasso/render.py:1249)."""
    ny, nx, x, y, in_view, _ = _coords(
        locs, oversampling, y_min, x_min, y_max, x_max, ang
    )
    if len(x) == 0:
        return 0, np.zeros((ny, nx), np.float32)
    image = render_ops.hist2d(x, y, ny, nx)
    blur_width = oversampling * max(
        np.median(locs["lpx"].to_numpy()[in_view]), min_blur_width
    )
    blur_height = oversampling * max(
        np.median(locs["lpy"].to_numpy()[in_view]), min_blur_width
    )
    return len(x), _fftconvolve(image, blur_width, blur_height)


def _fftconvolve(image, blur_width, blur_height):
    """Gaussian blur of the whole image; separable spatial filter for
    the small kernels typical of SMLM (picasso/render.py:1413)."""
    out = np.empty_like(image, dtype=np.float32)
    ndimage.gaussian_filter(
        image,
        sigma=(blur_height, blur_width),
        output=out,
        mode="constant",
        cval=0.0,
        truncate=5.0,
    )
    return out


def render_hist_anisotropic(
    x, y, oversampling_x, oversampling_y, y_min, x_min, y_max, x_max
):
    """Histogram rendering with different pixel sizes in x and y (used
    by particle averaging; picasso/render.py:235-like)."""
    ny = int(np.ceil(oversampling_y * (y_max - y_min)))
    nx = int(np.ceil(oversampling_x * (x_max - x_min)))
    in_view = (x > x_min) & (y > y_min) & (x < x_max) & (y < y_max)
    xs = oversampling_x * (np.asarray(x)[in_view] - x_min)
    ys = oversampling_y * (np.asarray(y)[in_view] - y_min)
    image = render_ops.hist2d(xs, ys, ny, nx)
    return int(in_view.sum()), image


def render_hist3d_anisotropic(
    x, y, z, oversampling_xy, oversampling_z,
    y_min, x_min, y_max, x_max, z_min, z_max, pixelsize,
):
    """3D histogram with independent lateral/axial oversampling
    (picasso/render.py:920)."""
    z_px = np.asarray(z) / pixelsize
    z_min_px = z_min / pixelsize
    z_max_px = z_max / pixelsize
    ny = int(np.ceil(oversampling_xy * (y_max - y_min)))
    nx = int(np.ceil(oversampling_xy * (x_max - x_min)))
    nz = int(np.ceil(oversampling_z * (z_max_px - z_min_px)))
    in_view = (
        (x > x_min) & (y > y_min) & (x < x_max) & (y < y_max)
        & (z_px > z_min_px) & (z_px < z_max_px)
    )
    xs = oversampling_xy * (np.asarray(x)[in_view] - x_min)
    ys = oversampling_xy * (np.asarray(y)[in_view] - y_min)
    zs = oversampling_z * (z_px[in_view] - z_min_px)
    image = render_ops.hist3d(xs, ys, zs, ny, nx, nz)
    return int(in_view.sum()), image


def draw_scalebar(
    rgb: np.ndarray,
    pixelsize: float,
    disp_px_size: float,
    length_nm: float | None = None,
    margin: int = 10,
    height_px: int = 5,
) -> np.ndarray:
    """Burn a white scalebar into the bottom-right of an RGB image
    (numpy analogue of the reference QImage painter,
    picasso/render.py:2428)."""
    rgb = rgb.copy()
    h, w = rgb.shape[:2]
    if length_nm is None:
        length_nm = optimal_scalebar_length(disp_px_size, w)
    length_px = int(round(length_nm / disp_px_size))
    length_px = min(length_px, w - 2 * margin)
    y1 = h - margin
    y0 = y1 - height_px
    x1 = w - margin
    x0 = x1 - length_px
    rgb[max(y0, 0):y1, max(x0, 0):x1] = 255
    return rgb


def build_animation(
    path: str, frames: list[np.ndarray], fps: int = 30
) -> None:
    """Write rendered RGB frames to a movie file
    (picasso/render.py:3411; uses imageio — gif always works, mp4
    requires an ffmpeg backend)."""
    import imageio

    if path.lower().endswith(".gif"):
        # imageio v3 deprecated fps= for GIF in favor of duration (ms)
        imageio.mimsave(
            path, frames, duration=1000.0 / fps, loop=0
        )
    else:
        imageio.mimsave(path, frames, fps=fps)


# ---------------------------------------------------------------------------
# Rotation
# ---------------------------------------------------------------------------


def rotation_matrix(angx: float, angy: float, angz: float) -> Rotation:
    """Legacy Euler rotation convention (picasso/render.py:1463)."""
    cx, sx = np.cos(angx), np.sin(angx)
    cy, sy = np.cos(angy), np.sin(angy)
    cz, sz = np.cos(angz), np.sin(angz)
    rx = np.array([[1, 0, 0], [0, cx, sx], [0, -sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rotation.from_matrix(rx @ ry @ rz)


def to_rotation(ang) -> Rotation | None:
    """Normalize tuple-of-Euler-angles / Rotation / None
    (picasso/render.py:1501)."""
    if ang is None:
        return None
    if isinstance(ang, Rotation):
        return ang
    return rotation_matrix(*ang)


def locs_rotation(
    locs, oversampling, x_min, x_max, y_min, y_max, ang
):
    """Rotate locs about the viewport center; returns display-scaled
    (x, y, in_view, z) (picasso/render.py:1571)."""
    coords = np.zeros((len(locs), 3))
    coords[:, 0] = locs["x"].to_numpy()
    coords[:, 1] = locs["y"].to_numpy()
    if "z" in locs.columns:
        coords[:, 2] = locs["z"].to_numpy()
    cx = x_min + (x_max - x_min) / 2
    cy = y_min + (y_max - y_min) / 2
    coords[:, 0] -= cx
    coords[:, 1] -= cy
    coords = to_rotation(ang).apply(coords)
    coords[:, 0] += cx
    coords[:, 1] += cy
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    in_view = (x > x_min) & (y > y_min) & (x < x_max) & (y < y_max)
    x = oversampling * (x[in_view] - x_min)
    y = oversampling * (y[in_view] - y_min)
    z = z[in_view] * oversampling
    return x, y, in_view, z


# ---------------------------------------------------------------------------
# Viewport algebra (picasso/render.py:1807-2038)
# ---------------------------------------------------------------------------


def viewport_height(viewport) -> float:
    return viewport[1][0] - viewport[0][0]


def viewport_width(viewport) -> float:
    return viewport[1][1] - viewport[0][1]


def viewport_size(viewport) -> tuple[float, float]:
    return viewport_height(viewport), viewport_width(viewport)


def viewport_center(viewport) -> tuple[float, float]:
    return (
        (viewport[0][0] + viewport[1][0]) / 2,
        (viewport[0][1] + viewport[1][1]) / 2,
    )


def shift_viewport(viewport, dy: float, dx: float):
    (y_min, x_min), (y_max, x_max) = viewport
    return ((y_min + dy, x_min + dx), (y_max + dy, x_max + dx))


def zoom_viewport(viewport, factor: float, center=None):
    if center is None:
        center = viewport_center(viewport)
    cy, cx = center
    h = viewport_height(viewport) * factor
    w = viewport_width(viewport) * factor
    return ((cy - h / 2, cx - w / 2), (cy + h / 2, cx + w / 2))


def adjust_viewport_to_aspect_ratio(viewport, aspect: float):
    """Grow the smaller dimension so height/width == aspect."""
    h, w = viewport_size(viewport)
    cy, cx = viewport_center(viewport)
    if h / w < aspect:
        h = w * aspect
    else:
        w = h / aspect
    return ((cy - h / 2, cx - w / 2), (cy + h / 2, cx + w / 2))


def optimal_scalebar_length(pixelsize, width) -> int:
    """Scalebar length (nm) ≈ 1/5 of the image width, rounded to a
    nice value (picasso/render.py:3297-like)."""
    candidates = [
        1, 2, 5, 10, 20, 50, 100, 200, 500,
        1000, 2000, 5000, 10000, 20000, 50000,
    ]
    target = pixelsize * width / 5
    return min(candidates, key=lambda c: abs(c - target))


# ---------------------------------------------------------------------------
# Contrast / colors
# ---------------------------------------------------------------------------


def scale_contrast(
    image,
    vmin=None,
    vmax=None,
    autoscale: bool = False,
    return_contrast_limits: bool = False,
):
    """Scale image(s) into [0, 1] (picasso/render.py:3082)."""
    image = np.asarray(image, np.float32)
    if autoscale:
        if image.ndim == 2:
            max_ = image.max()
        else:
            maxes = [ch.max() for ch in image if ch.max() > 0]
            max_ = min(maxes) if maxes else 1.0
        vmax = 0.5 * max_
        vmin = 0.0
    vmin = vmin if vmin is not None else image.min()
    vmax = vmax if vmax is not None else image.max()
    if vmin == vmax:
        vmax = vmin + 1e-6
    scaled = (image - vmin) / (vmax - vmin)
    scaled[~np.isfinite(scaled)] = 0.0
    scaled = np.clip(scaled, 0.0, 1.0)
    if return_contrast_limits:
        return scaled, (vmin, vmax)
    return scaled


def scale_intensities(images, relative_intensities=None):
    """Per-channel intensity scaling (picasso/render.py:3144)."""
    if relative_intensities is not None:
        assert len(relative_intensities) == images.shape[0]
        for i in range(images.shape[0]):
            images[i] *= relative_intensities[i]
    return images


def to_8bit(image):
    """[0, 1] float image to uint8 (picasso/render.py:3170)."""
    image = np.asarray(image, np.float32)
    image = image / (image.max() if image.max() > 0 else 1.0)
    return np.round(image * 255).astype(np.uint8)


def apply_colormap(image, colormap):
    """Apply a pyplot colormap name or (256, 3/4) LUT to an 8-bit image
    (picasso/render.py:3181)."""
    if isinstance(colormap, str):
        import matplotlib.pyplot as plt

        cmap = np.uint8(
            np.round(255 * plt.get_cmap(colormap)(np.arange(256)))
        )
    else:
        cmap = np.uint8(np.round(255 * np.asarray(colormap)))
    return cmap[image][:, :, :3]


def solid_to_lut(rgb) -> np.ndarray:
    """(256, 3) LUT ramping black -> rgb (picasso/render.py:1671)."""
    rgb_arr = np.asarray(rgb, dtype=np.float32).reshape(3)
    return np.linspace(
        np.zeros(3, np.float32), rgb_arr, 256, dtype=np.float32
    )


def stops_to_lut(stops) -> np.ndarray:
    """(256, 3) LUT from interpolated color stops
    (picasso/render.py:1712)."""
    arr = np.asarray(stops, dtype=np.float32)
    positions = arr[:, 0]
    rgb = arr[:, 1:4]
    xs = np.linspace(0.0, 1.0, 256, dtype=np.float32)
    lut = np.empty((256, 3), np.float32)
    for c in range(3):
        lut[:, c] = np.interp(xs, positions, rgb[:, c])
    return lut


def get_colors_from_colormap(n_channels: int, cmap: str = "gist_rainbow"):
    """Evenly spaced RGB colors from a colormap
    (picasso/render.py:1745)."""
    import matplotlib.pyplot as plt

    base = plt.get_cmap(cmap)(np.arange(256))[:, :3]
    idx = np.linspace(0, 255, n_channels).astype(int)
    return base[idx]


def get_group_color(locs: pd.DataFrame, shuffle: bool = False):
    """Integer color index per loc from the group column
    (picasso/render.py:1777)."""
    groups = locs["group"].to_numpy().astype(int)
    if shuffle:
        lookup = np.arange(groups.max() + 1)
        np.random.shuffle(lookup)
        lookup %= N_GROUP_COLORS
        return lookup[groups]
    return groups % N_GROUP_COLORS


def split_locs_by_property(
    locs, *, property_name, n_colors: int = 32,
    min_value=None, max_value=None,
):
    """Split locs into value bins of a property
    (picasso/render.py:3206)."""
    assert property_name in locs.columns
    values = locs[property_name]
    if min_value is None:
        min_value = values.min()
    if max_value is None:
        max_value = values.max()
    step = (max_value - min_value) / n_colors
    color = np.floor((values - min_value) / step).astype(int)
    color = np.clip(color, 0, n_colors - 1)
    return [locs[color == i] for i in range(n_colors)]


def split_locs_by_group(
    locs, n_colors: int = N_GROUP_COLORS, group_color=None
):
    """Split locs by group id (picasso/render.py:3257)."""
    if group_color is not None:
        assert len(group_color) == len(locs)
        return [locs[group_color == i] for i in range(n_colors)]
    if "group" in locs.columns:
        return [
            locs[locs["group"] == g] for g in locs["group"].unique()
        ]
    return [locs]


# ---------------------------------------------------------------------------
# Scene rendering (numpy RGB; reference returns QImage,
# picasso/render.py:2728-3047)
# ---------------------------------------------------------------------------


def _render_single_channel(
    locs, info, *, disp_px_size, viewport=None, blur_method=None,
    min_blur_width=0.0, ang=None, contrast=None, invert_colors=False,
    single_channel_colormap="magma", raw_image_cache=None,
):
    if raw_image_cache is not None:
        raw_image = raw_image_cache
        n_locs = 0
    else:
        n_locs, raw_image = render(
            locs, info, disp_px_size=disp_px_size, viewport=viewport,
            blur_method=blur_method, min_blur_width=min_blur_width,
            ang=ang,
        )
    vmin, vmax = contrast if contrast is not None else (None, None)
    autoscale = contrast is None
    image, limits = scale_contrast(
        raw_image, vmin, vmax, autoscale=autoscale,
        return_contrast_limits=True,
    )
    rgb = apply_colormap(to_8bit(image), single_channel_colormap)
    if invert_colors:
        rgb = 255 - rgb
    return n_locs, rgb, limits, raw_image


def _render_multi_channel(
    locs, info, *, disp_px_size, colors, viewport=None,
    blur_method=None, min_blur_width=0.0, ang=None, contrast=None,
    relative_intensities=None, invert_colors=False,
    raw_image_cache=None,
):
    if raw_image_cache is not None:
        raw_image = raw_image_cache
        n_locs = 0
    else:
        renderings = [
            render(
                locs[i], info[i], disp_px_size=disp_px_size,
                viewport=viewport, blur_method=blur_method,
                min_blur_width=min_blur_width, ang=ang,
            )
            for i in range(len(locs))
        ]
        n_locs = sum(r[0] for r in renderings)
        raw_image = np.array([r[1] for r in renderings])
    vmin, vmax = contrast if contrast is not None else (None, None)
    autoscale = contrast is None
    images, limits = scale_contrast(
        raw_image, vmin, vmax, autoscale=autoscale,
        return_contrast_limits=True,
    )
    images = scale_intensities(images, relative_intensities)
    if colors is None:
        colors = get_colors_from_colormap(len(images))
    colors_arr = np.asarray(colors, dtype=np.float32)
    images_f32 = np.ascontiguousarray(images, dtype=np.float32)
    if colors_arr.ndim == 2:
        rgb = np.tensordot(images_f32, colors_arr, axes=([0], [0]))
    else:
        idx = np.clip((images_f32 * 255.0).astype(np.int32), 0, 255)
        rgb = np.zeros(
            (images_f32.shape[1], images_f32.shape[2], 3), np.float32
        )
        for c in range(images_f32.shape[0]):
            rgb += colors_arr[c][idx[c]]
    np.minimum(rgb, 1.0, out=rgb)
    rgb = to_8bit(rgb)
    if invert_colors:
        rgb = 255 - rgb
    return n_locs, rgb, limits, raw_image


def render_scene(
    locs,
    info,
    *,
    disp_px_size: float = 100.0,
    viewport=None,
    blur_method=None,
    min_blur_width: float = 0.0,
    ang=None,
    contrast=None,
    invert_colors: bool = False,
    single_channel_colormap="magma",
    colors=None,
    relative_intensities=None,
    raw_image_cache=None,
    return_contrast_limits: bool = False,
    return_raw_image: bool = False,
):
    """Render (multi-channel) locs into an RGB uint8 numpy image
    (picasso/render.py:2728; no Qt — callers convert to their UI
    image type)."""
    multi = isinstance(locs, (list, tuple))
    if multi:
        n_locs, rgb, limits, raw = _render_multi_channel(
            locs, info, disp_px_size=disp_px_size, colors=colors,
            viewport=viewport, blur_method=blur_method,
            min_blur_width=min_blur_width, ang=ang, contrast=contrast,
            relative_intensities=relative_intensities,
            invert_colors=invert_colors,
            raw_image_cache=raw_image_cache,
        )
    else:
        n_locs, rgb, limits, raw = _render_single_channel(
            locs, info, disp_px_size=disp_px_size, viewport=viewport,
            blur_method=blur_method, min_blur_width=min_blur_width,
            ang=ang, contrast=contrast, invert_colors=invert_colors,
            single_channel_colormap=single_channel_colormap,
            raw_image_cache=raw_image_cache,
        )
    out = [rgb, n_locs]
    if return_contrast_limits:
        out.append(limits)
    if return_raw_image:
        out.append(raw)
    return tuple(out)


# ---------------------------------------------------------------------------
# API-compatibility aliases + geometry helpers
# ---------------------------------------------------------------------------

render_gaussian = _render_gaussian
render_gaussian_iso = _render_gaussian_iso
render_smooth = _render_smooth
render_convolve = _render_convolve


def render_hist_numba(x, y, oversampling, t_min, t_max):
    """Square-workspace histogram used by particle averaging (name
    kept for API parity with picasso/render.py:740; implementation is
    the vectorized host/device path)."""
    from picasso_tpu.average import _render_hist_square

    return _render_hist_square(
        np.asarray(x), np.asarray(y), oversampling, t_min, t_max
    )


def determinant_3x3(a) -> float:
    a = np.asarray(a, np.float64)
    return float(np.linalg.det(a))


def inverse_3x3(a):
    a = np.asarray(a, np.float64)
    return np.linalg.inv(a)


def map_to_view(
    x: float, y: float, viewport, width: int, height: int
) -> tuple[int, int]:
    """Camera-pixel coordinates -> display-pixel coordinates for a
    rendered viewport image (picasso/render.py:2040)."""
    (y_min, x_min), (y_max, x_max) = viewport
    cx = int((x - x_min) / (x_max - x_min) * width)
    cy = int((y - y_min) / (y_max - y_min) * height)
    return cx, cy


def get_rectangle_pick_polygon(
    start_x, start_y, end_x, end_y, width, return_most_right=False
):
    """Corner polygon of a rectangular pick
    (picasso/render.py:2054)."""
    X, Y = lib.get_pick_rectangle_corners(
        start_x, start_y, end_x, end_y, width
    )
    if return_most_right:
        i = int(np.argmax(X))
        return X[i], Y[i]
    return list(zip(X + [X[0]], Y + [Y[0]]))


def closest_rotvec(rotation, reference):
    """Rotation vector representation of ``rotation`` closest to
    ``reference`` — unwraps full turns for continuous rotation
    tracking (picasso/render.py:1528)."""
    reference = np.asarray(reference, dtype=float)
    base = rotation.as_rotvec()
    theta = np.linalg.norm(base)
    if theta < 1e-9:
        ref_norm = np.linalg.norm(reference)
        if ref_norm < 1e-9:
            return base
        axis = reference / ref_norm
        turns = np.round(ref_norm / (2 * np.pi))
        return axis * 2 * np.pi * turns
    axis = base / theta
    # candidate representations: +-axis with added full turns
    candidates = []
    for sign in (1.0, -1.0):
        t = sign * theta if sign > 0 else 2 * np.pi - theta
        ax = axis if sign > 0 else -axis
        k = np.round(
            (np.dot(reference, ax) - t) / (2 * np.pi)
        )
        for kk in (k - 1, k, k + 1):
            candidates.append(ax * (t + 2 * np.pi * kk))
    d = [np.linalg.norm(c - reference) for c in candidates]
    return candidates[int(np.argmin(d))]


def draw_points(
    rgb: np.ndarray, points, viewport, color=(255, 255, 0)
) -> np.ndarray:
    """Burn point markers into a rendered RGB image (numpy analogue
    of the QImage painter, picasso/render.py:2550-like)."""
    rgb = rgb.copy()
    h, w = rgb.shape[:2]
    for x, y in points:
        cx, cy = map_to_view(x, y, viewport, w, h)
        if 1 <= cx < w - 1 and 1 <= cy < h - 1:
            rgb[cy - 1:cy + 2, cx - 1:cx + 2] = color
    return rgb


def draw_picks(
    rgb: np.ndarray,
    picks,
    pick_diameter: float,
    viewport,
    color=(255, 255, 0),
) -> np.ndarray:
    """Burn circular pick outlines into a rendered RGB image
    (picasso/render.py:2230-like)."""
    rgb = rgb.copy()
    h, w = rgb.shape[:2]
    (y_min, x_min), (y_max, x_max) = viewport
    px_per_cam_x = w / (x_max - x_min)
    for x, y in picks:
        cx, cy = map_to_view(x, y, viewport, w, h)
        r = pick_diameter / 2 * px_per_cam_x
        theta = np.linspace(0, 2 * np.pi, max(16, int(4 * r)))
        xs = (cx + r * np.cos(theta)).astype(int)
        ys = (cy + r * np.sin(theta)).astype(int)
        ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        rgb[ys[ok], xs[ok]] = color
    return rgb


# ---------------------------------------------------------------------------
# Scene annotations: legend, minimap, rotation axes
# (numpy/PIL analogues of the reference's QImage painters,
# picasso/render.py:2480-2727). All take and return uint8 RGB arrays.
# ---------------------------------------------------------------------------

POLYGON_POINTER_SIZE = 16  # must be even (picasso/render.py:34)


def _draw_text(rgb, text, xy, color, fontsize=16, bg=None):
    """Rasterize text into an RGB array with PIL (the headless
    stand-in for QPainter.drawText)."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.fromarray(rgb)
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.load_default(size=fontsize)
    except TypeError:  # older Pillow: fixed-size bitmap font
        font = ImageFont.load_default()
    if bg is not None:
        bbox = draw.textbbox(xy, text, font=font)
        pad = 4
        draw.rectangle(
            (bbox[0] - pad, bbox[1] - pad, bbox[2] + pad, bbox[3] + pad),
            fill=tuple(bg),
        )
    draw.text(xy, text, fill=tuple(color), font=font)
    return np.asarray(img)


def _draw_line(rgb, p0, p1, color):
    """Burn a 1-px line into an RGB array."""
    h, w = rgb.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
    xs = np.linspace(p0[0], p1[0], n).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n).round().astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    rgb[ys[ok], xs[ok]] = color
    return rgb


def _draw_rect(rgb, x, y, width, height, color):
    """Burn a 1-px rectangle outline into an RGB array."""
    _draw_line(rgb, (x, y), (x + width, y), color)
    _draw_line(rgb, (x, y + height), (x + width, y + height), color)
    _draw_line(rgb, (x, y), (x, y + height), color)
    _draw_line(rgb, (x + width, y), (x + width, y + height), color)
    return rgb


def adjust_viewport_decorator(func):
    """Adjust the viewport to the image's aspect ratio before calling
    the wrapped painter — image and viewport must be its first two
    arguments (picasso/render.py:2014)."""

    def wrapper(image, viewport, *args, **kwargs):
        h, w = np.asarray(image).shape[:2]
        adjusted = adjust_viewport_to_aspect_ratio(viewport, h / w)
        return func(image, adjusted, *args, **kwargs)

    return wrapper


def draw_legend(
    rgb: np.ndarray,
    channel_names: list[str],
    channel_colors: list[tuple[int, int, int]],
    init_pos: tuple[int, int] = (12, 26),
    dy: int = 24,
    padding: int = 4,
    text_fontsize: int = 16,
) -> np.ndarray:
    """Multichannel legend in the top-left corner: each channel name in
    its color on a black box (picasso/render.py:2480)."""
    assert len(channel_names) == len(channel_colors), (
        "Length of channel_names must match number of channels in "
        "dataset."
    )
    rgb = np.ascontiguousarray(rgb).copy()
    x, y = init_pos
    for name, color in zip(channel_names, channel_colors):
        rgb = _draw_text(
            rgb, name, (x, y - text_fontsize), color,
            fontsize=text_fontsize, bg=(0, 0, 0),
        )
        y += dy
    return rgb


@adjust_viewport_decorator
def draw_minimap(
    rgb: np.ndarray,
    viewport,
    max_viewport_size: tuple[float, float],
    color_main=(255, 255, 0),
    color_frame=(255, 255, 255),
    length_minimap: int = 100,
    margin: tuple[int, int] = (20, 20),
) -> np.ndarray:
    """Minimap in the top-right corner showing where the current
    viewport sits within the full FOV (picasso/render.py:2550)."""
    rgb = rgb.copy()
    movie_height, movie_width = max_viewport_size
    height_minimap = int(movie_height / movie_width * length_minimap)
    x = rgb.shape[1] - length_minimap - margin[0]
    y = margin[1]
    _draw_rect(rgb, x, y, length_minimap, height_minimap, color_frame)
    length = max(
        5, int(viewport_width(viewport) / movie_width * length_minimap)
    )
    height = max(
        5,
        int(viewport_height(viewport) / movie_height * height_minimap),
    )
    x_vp = int(viewport[0][1] / movie_width * length_minimap)
    y_vp = int(viewport[0][0] / movie_height * height_minimap)
    _draw_rect(rgb, x + x_vp, y + y_vp, length, height, color_main)
    return rgb


def draw_rotation(
    rgb: np.ndarray,
    ang,
    axis_length: int = 30,
    axis_center: tuple[int, int] = (50, -50),
) -> np.ndarray:
    """Rotated x/y/z axis tripod icon (red/cyan/green), by default in
    the bottom-left corner (picasso/render.py:2604)."""
    rgb = rgb.copy()
    h, w = rgb.shape[:2]
    x = axis_center[0] if axis_center[0] >= 0 else w + axis_center[0]
    y = axis_center[1] if axis_center[1] >= 0 else h + axis_center[1]
    axes = np.eye(3) * axis_length
    rotated = to_rotation(ang).apply(axes).astype(int)
    colors = [(255, 0, 0), (0, 255, 255), (0, 255, 0)]
    for (ex, ey, _), color in zip(rotated, colors):
        _draw_line(rgb, (x, y), (x + ex, y + ey), color)
    return rgb


def draw_rotation_angles(
    rgb: np.ndarray, ang, color=(255, 255, 255)
) -> np.ndarray:
    """Rotation angles in degrees as text in the bottom-right corner
    (picasso/render.py:2693)."""
    h, w = rgb.shape[:2]
    angx, angy, angz = [int(np.round(a * 180 / np.pi)) for a in ang]
    text = f"{angx} {angy} {angz}"
    x = w - len(text) * 8 - 10
    y = h - 20
    return _draw_text(
        np.ascontiguousarray(rgb).copy(), text, (x, y - 12), color,
        fontsize=12,
    )


def rgb_to_qimage(rgb: np.ndarray):
    """Convert a uint8 RGB array to a QImage (picasso/render.py:3047).
    Qt-only — raises ImportError when PyQt6 is unavailable."""
    try:
        from PyQt6 import QtGui
    except ImportError as e:
        raise ImportError(
            "rgb_to_qimage requires PyQt6, which is not installed. Use "
            "the numpy RGB image directly, or PIL for file export."
        ) from e
    rgb = np.ascontiguousarray(rgb)
    h, w = rgb.shape[:2]
    image = QtGui.QImage(
        rgb.data, w, h, 3 * w, QtGui.QImage.Format.Format_RGB888
    )
    return image.copy()


def _export_image(image, path) -> None:
    """Write an RGB array (or QImage, when Qt is present) to a vector
    or raster file via matplotlib — the headless replacement for the
    reference's QPdfWriter/QSvgGenerator painters
    (picasso/render.py:1640/1666)."""
    import matplotlib.pyplot as plt

    if not isinstance(image, np.ndarray):  # QImage duck-typing
        ptr = image.constBits()
        ptr.setsize(image.sizeInBytes())
        h, w = image.height(), image.width()
        bpp = image.depth() // 8  # 3 for RGB888, 4 for (A)RGB32
        rows = np.frombuffer(ptr, np.uint8).reshape(
            h, image.bytesPerLine()
        )
        arr = rows[:, : w * bpp].reshape(h, w, bpp)
        if bpp == 4:
            # (A)RGB32 is BGRA in little-endian memory
            image = arr[..., 2::-1]
        else:
            image = arr[..., :3]
    h, w = image.shape[:2]
    fig = plt.figure(figsize=(w / 100, h / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.imshow(image, interpolation="nearest")
    ax.axis("off")
    fig.savefig(path, dpi=100)
    plt.close(fig)


def export_qimage_to_pdf(image, path: str) -> None:
    """Export a rendered image (numpy RGB or QImage) to PDF
    (picasso/render.py:1640)."""
    _export_image(image, path)


def export_qimage_to_svg(image, path: str) -> None:
    """Export a rendered image (numpy RGB or QImage) to SVG
    (picasso/render.py:1666)."""
    _export_image(image, path)
