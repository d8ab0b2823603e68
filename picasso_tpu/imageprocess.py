"""picasso_tpu.imageprocess — FFT image-correlation primitives for
drift correction and channel alignment.

Same surface as picasso/imageprocess.py (xcorr :27, get_image_shift
:53, rcc :160, find_fiducials :220, radial_sum :283). The reference
loops over all n(n-1)/2 segment pairs serially; here each segment is
FFT'd once and the pairwise cross-power spectra evaluate as one batched
device program per pair chunk.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.optimize import curve_fit

from picasso_tpu import lib

# Below ~32M pair-correlation pixels the dispatch/compile overhead
# beats the device FFT win; rcc() falls back to the host batch.
DEVICE_PAIR_PIXELS = 32e6


def xcorr(imageA: np.ndarray, imageB: np.ndarray) -> np.ndarray:
    """FFT cross-correlation: fftshift(Re(ifft2(FA * conj(FB)))) /
    sqrt(size) (picasso/imageprocess.py:27)."""
    FA = np.fft.fft2(imageA)
    CFB = np.conj(np.fft.fft2(imageB))
    return np.fft.fftshift(
        np.real(np.fft.ifft2(FA * CFB))
    ) / np.sqrt(imageA.size)


def _fit_peak(XCorr: np.ndarray, box: int, X_: int, Y_: int,
              shape: tuple[int, int]) -> tuple[float, float]:
    """5x5 (box x box) Gaussian sub-pixel fit of the correlation peak
    (picasso/imageprocess.py:119-135). Returns (yc, xc) relative to
    the image center."""
    Y, X = shape
    fit_X = int(box / 2)
    y, x = np.mgrid[-fit_X:fit_X + 1, -fit_X:fit_X + 1]
    y_max_, x_max_ = np.unravel_index(XCorr.argmax(), XCorr.shape)
    FitROI = XCorr[
        y_max_ - fit_X:y_max_ + fit_X + 1,
        x_max_ - fit_X:x_max_ + fit_X + 1,
    ]
    dims = FitROI.shape
    if 0 in dims or dims[0] != dims[1]:
        return 0.0, 0.0

    def flat_2d_gaussian(coords, a, xc, yc, s, b):
        xg, yg = coords
        A = a * np.exp(
            -0.5 * ((xg - xc) ** 2 + (yg - yc) ** 2) / s**2
        ) + b
        return A.flatten()

    p0 = [FitROI.max(), 0, 0, 1, FitROI.min()]
    bounds = (
        [0, -np.inf, -np.inf, 0, 0],
        [np.inf, np.inf, np.inf, np.inf, np.inf],
    )
    try:
        popt, _ = curve_fit(
            flat_2d_gaussian, (x, y), FitROI.flatten(), p0=p0,
            bounds=bounds,
        )
    except RuntimeError:
        return 0.0, 0.0
    xc = popt[1] + X_ + x_max_ - np.floor(X / 2)
    yc = popt[2] + Y_ + y_max_ - np.floor(Y / 2)
    return yc, xc


def _crop_center(XCorr: np.ndarray, roi: int | None):
    Y, X = XCorr.shape
    Y_ = X_ = 0
    if roi is not None:
        Y_ = int((Y - roi) / 2)
        X_ = int((X - roi) / 2)
        if Y_ > 0:
            XCorr = XCorr[Y_:-Y_, :]
        else:
            Y_ = 0
        if X_ > 0:
            XCorr = XCorr[:, X_:-X_]
        else:
            X_ = 0
    return XCorr, Y_, X_


def get_image_shift(
    imageA: np.ndarray,
    imageB: np.ndarray,
    box: int,
    roi: int | None = None,
    display: bool = False,
) -> tuple[float, float]:
    """Shift from imageA to imageB via correlation peak fitting
    (picasso/imageprocess.py:53). Returns (-yc, -xc)."""
    if np.sum(imageA) == 0 or np.sum(imageB) == 0:
        return 0, 0
    XCorr = xcorr(imageA, imageB)
    shape = imageA.shape
    XCorr, Y_, X_ = _crop_center(XCorr, roi)
    yc, xc = _fit_peak(XCorr, box, X_, Y_, shape)
    return -yc, -xc


@functools.partial(jax.jit, static_argnames=())
def _pair_xcorrs_device(F: jnp.ndarray, idx_i: jnp.ndarray,
                        idx_j: jnp.ndarray) -> jnp.ndarray:
    """Batched fftshifted cross-correlations of segment pairs from
    precomputed FFTs F (n_segments, Y, X) complex."""
    FA = F[idx_i]
    FB = jnp.conj(F[idx_j])
    size = F.shape[1] * F.shape[2]
    res = jnp.real(jnp.fft.ifft2(FA * FB)) / jnp.sqrt(
        jnp.asarray(size, jnp.float32)
    )
    return jnp.fft.fftshift(res, axes=(1, 2))


def rcc(
    segments: list[np.ndarray],
    max_shift: float | None = None,
    callback: Callable[[int], None] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Redundant cross-correlation (Wang, Schnitzbauer et al., Opt.
    Express 2014; picasso/imageprocess.py:160): all segment-pair
    shifts, solved to per-segment drift by least squares.

    Each segment is FFT'd once; pair correlations run as batched
    device FFTs (chunked to bound memory); only the 5x5 peak fits run
    on host."""
    n_segments = len(segments)
    shifts_x = np.zeros((n_segments, n_segments))
    shifts_y = np.zeros((n_segments, n_segments))
    pairs = [
        (i, j)
        for i in range(n_segments - 1)
        for j in range(i + 1, n_segments)
    ]
    if callback is not None:
        callback(0)
    seg_arr = np.stack(segments).astype(np.float32)
    seg_sums = seg_arr.sum(axis=(1, 2))
    Y, X = seg_arr.shape[1:]
    shape = (Y, X)
    # Below ~32M correlation pixels the dispatch/compile overhead beats
    # the device FFT win; use the host batch.
    use_device = len(pairs) * Y * X > DEVICE_PAIR_PIXELS
    use_sharded = use_device and jax.device_count() > 1
    if use_sharded:
        from picasso_tpu.parallel import mesh as _pmesh
    elif use_device:
        F = jnp.fft.fft2(jnp.asarray(seg_arr))
    else:
        F_h = np.fft.fft2(seg_arr)
    chunk = max(1, int(256e6 / (Y * X * 4)))
    done = 0
    for start in range(0, len(pairs), chunk):
        batch = pairs[start:start + chunk]
        ii = np.asarray([p[0] for p in batch])
        jj = np.asarray([p[1] for p in batch])
        if use_sharded:
            # pair products sharded over the device mesh
            xc_batch = _pmesh.pair_xcorrs_sharded(seg_arr, ii, jj)
        elif use_device:
            xc_batch = np.asarray(
                _pair_xcorrs_device(F, jnp.asarray(ii), jnp.asarray(jj))
            )
        else:
            prod = F_h[ii] * np.conj(F_h[jj])
            xc_batch = np.fft.fftshift(
                np.real(np.fft.ifft2(prod)), axes=(1, 2)
            ) / np.sqrt(Y * X)
        for (i, j), XCorr in zip(batch, xc_batch):
            if seg_sums[i] == 0 or seg_sums[j] == 0:
                yc = xc = 0.0
            else:
                XCorr_c, Y_, X_ = _crop_center(XCorr, max_shift)
                yc, xc = _fit_peak(XCorr_c, 5, X_, Y_, shape)
            shifts_y[i, j] = -yc
            shifts_x[i, j] = -xc
            done += 1
            if callback is not None:
                callback(done)
    return lib.minimize_shifts(shifts_x, shifts_y)


def find_fiducials(
    locs: pd.DataFrame, info: list[dict]
) -> tuple[list[tuple[int, int]], int]:
    """Find fiducial-marker positions: render smooth, threshold at the
    99th percentile, identify local maxima, keep picks with >0.8 *
    n_frames locs (picasso/imageprocess.py:220)."""
    from picasso_tpu import localize, postprocess, render

    image = render.render(
        locs=locs, info=info, oversampling=1, viewport=None,
        blur_method="smooth",
    )[1]
    threshold = np.percentile(image.flatten(), 99)
    pixelsize = lib.get_from_metadata(info, "Pixelsize", default=130)
    box = int(np.round(900 / pixelsize))
    box = box + 1 if box % 2 == 0 else box
    y, x, _ = localize.identify_in_image(image, threshold, box=box)
    picks = [(int(xi), int(yi)) for xi, yi in zip(x, y)]
    n_frames = lib.get_from_metadata(info, "Frames", default=0)
    min_n = 0.8 * n_frames
    picked_locs = postprocess.picked_locs(
        locs, info, picks, "Circle", pick_size=box / 2, add_group=False
    )
    picks = [
        pick
        for i, pick in enumerate(picks)
        if len(picked_locs[i]) > min_n
    ]
    return picks, box


def radial_sum(image: np.ndarray) -> np.ndarray:
    """Radial projection of pixel-value sums
    (picasso/imageprocess.py:283); vectorized with bincount."""
    assert image.ndim == 2, "Input image must be 2D."
    assert image.shape[0] == image.shape[1], "Input image must be square."
    assert image.shape[0] % 2 == 1, "Input image size must be odd."
    size = image.shape[0]
    center = size // 2
    y, x = np.ogrid[:size, :size]
    dist = np.sqrt((x - center) ** 2 + (y - center) ** 2)
    r_idx = np.floor(dist).astype(int)
    n_r = center + 1
    keep = np.broadcast_to(r_idx < n_r, image.shape)
    idx = np.broadcast_to(r_idx, image.shape)[keep].ravel()
    vals = image[keep].ravel()
    if np.iscomplexobj(image):
        out = np.bincount(
            idx, weights=vals.real, minlength=n_r
        ) + 1j * np.bincount(idx, weights=vals.imag, minlength=n_r)
    else:
        out = np.bincount(idx, weights=vals, minlength=n_r)
    return out.astype(image.dtype)
