"""picasso_tpu.masking — binary masks from rendered localizations.

Capability parity with picasso/masking.py: mask_locs :26,
generate_image :79, binary_mask :110, mask_image :143, global threshold
algorithms (isodata/li/mean/minimum/otsu/triangle/yen, :208-558), local
thresholds (:559-648), Tukey FFT window (:649) and LOESS smoothing
(:674). Threshold algorithms are independent implementations of the
standard methods (Ridler–Calvard, Li–Lee, Otsu, Zack triangle, Yen).
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
from scipy import ndimage as ndi

from picasso_tpu import lib


def mask_locs(
    locs: pd.DataFrame,
    mask: np.ndarray,
    width: float | None = None,
    height: float | None = None,
    info: list[dict] | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split locs into (inside, outside) by a binary mask scaled to the
    FOV (picasso/masking.py:26)."""
    if width is None or height is None:
        if info is None:
            raise ValueError("`mask_locs` requires `info` parameter.")
        width = lib.get_from_metadata(info, "Width")
        height = lib.get_from_metadata(info, "Height")
    x_ind = np.int32(np.floor(locs["x"] / width * mask.shape[1]))
    y_ind = np.int32(np.floor(locs["y"] / height * mask.shape[0]))
    x_ind = np.clip(x_ind, 0, mask.shape[1] - 1)
    y_ind = np.clip(y_ind, 0, mask.shape[0] - 1)
    index = mask[y_ind, x_ind].astype(bool)
    locs_in = locs.iloc[index].sort_values(by="frame", kind="quicksort")
    locs_out = locs.iloc[~index].sort_values(
        by="frame", kind="quicksort"
    )
    return locs_in, locs_out


def generate_image(
    locs: pd.DataFrame, info: list[dict], disp_px_size: float,
    blur: float,
) -> np.ndarray:
    """Normalized blurred histogram image for mask generation
    (picasso/masking.py:79)."""
    from picasso_tpu import render

    _, image = render.render(
        locs=locs, info=info, disp_px_size=disp_px_size,
        blur_method=None,
    )
    blur_px = blur / disp_px_size
    image_blur = ndi.gaussian_filter(image, blur_px)
    image_blur /= image_blur.max()
    return image_blur


def binary_mask(image: np.ndarray, threshold) -> np.ndarray:
    """Binary mask from a global or pixel-wise threshold
    (picasso/masking.py:110)."""
    if not np.isscalar(threshold):
        threshold = np.asarray(threshold)
        if threshold.shape != image.shape:
            raise ValueError(
                "Threshold array must have the same shape as the image"
            )
    return image > threshold


THRESHOLD_METHODS = (
    "isodata", "li", "mean", "minimum", "otsu", "triangle", "yen",
    "local_gaussian", "local_mean", "local_median",
)


def mask_image(
    image: np.ndarray,
    method: str = "otsu",
) -> np.ndarray:
    """Threshold an image with the named method and return the binary
    mask (picasso/masking.py:143)."""
    if method.startswith("local_"):
        fn = globals()[f"threshold_{method}"]
        return fn(image)
    fn = globals()[f"threshold_{method}"]
    return binary_mask(image, fn(image))


def _histogram(image, bins=256):
    counts, bin_edges = np.histogram(image.ravel(), bins=bins)
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    return counts.astype(np.float64), centers


def threshold_isodata(image: np.ndarray) -> float:
    """Ridler–Calvard iterative selection threshold."""
    counts, centers = _histogram(image)
    if len(centers) == 1:
        return centers[0]
    csuml = np.cumsum(counts)
    csumh = csuml[-1] - csuml
    csum_i = np.cumsum(counts * centers)
    with np.errstate(invalid="ignore", divide="ignore"):
        lower = csum_i[:-1] / csuml[:-1]
        higher = (csum_i[-1] - csum_i[:-1]) / csumh[:-1]
    all_mean = (lower + higher) / 2.0
    bin_width = centers[1] - centers[0]
    distances = all_mean - centers[:-1]
    candidates = centers[:-1][(distances >= 0) & (distances < bin_width)]
    return float(candidates[0]) if len(candidates) else float(centers[0])


def threshold_li(image: np.ndarray) -> float:
    """Li's minimum cross-entropy threshold (iterative fixed point)."""
    image = np.asarray(image, np.float64)
    offset = image.min()
    shifted = image - offset + 1e-9  # log needs positive values
    t = shifted.mean()
    for _ in range(100):
        fg = shifted[shifted > t]
        bg = shifted[shifted <= t]
        if len(fg) == 0 or len(bg) == 0:
            break
        mf = fg.mean()
        mb = bg.mean()
        denom = np.log(mf) - np.log(mb)
        if denom == 0:
            break
        t_new = (mf - mb) / denom
        if abs(t_new - t) < 1e-6:
            t = t_new
            break
        t = t_new
    return float(t + offset - 1e-9)


def threshold_mean(image: np.ndarray) -> float:
    """Mean of all pixel values."""
    return float(np.mean(image))


def threshold_minimum(image: np.ndarray) -> float:
    """Minimum method: smooth the histogram until bimodal, threshold at
    the valley between the two maxima (Prewitt & Mendelsohn)."""
    counts, centers = _histogram(image)
    smooth = counts.copy()
    for _ in range(10000):
        maxima = np.nonzero(
            (smooth[1:-1] > smooth[:-2]) & (smooth[1:-1] > smooth[2:])
        )[0]
        if len(maxima) < 3:
            break
        smooth = np.convolve(
            smooth, np.ones(3) / 3.0, mode="same"
        )
    maxima = np.nonzero(
        (smooth[1:-1] > smooth[:-2]) & (smooth[1:-1] > smooth[2:])
    )[0] + 1
    if len(maxima) < 2:
        return float(centers[len(centers) // 2])
    lo, hi = maxima[0], maxima[-1]
    valley = lo + int(np.argmin(smooth[lo:hi + 1]))
    return float(centers[valley])


def threshold_otsu(image: np.ndarray) -> float:
    """Otsu's between-class variance maximization."""
    counts, centers = _histogram(image)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / np.maximum(w1, 1e-12)
    m2 = (
        np.cumsum((counts * centers)[::-1]) / np.maximum(w2[::-1], 1e-12)
    )[::-1]
    var_between = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return float(centers[np.argmax(var_between)])


def threshold_triangle(image: np.ndarray) -> float:
    """Zack's triangle method (Zack 1977; the standard ImageJ/skimage
    formulation, as used by picasso/masking.py:449): flip so the longer
    tail is examined, then maximize h_peak*x - width*y along the tail,
    with x ascending from the tail end toward the peak."""
    counts, centers = _histogram(image)
    nbins = len(counts)
    peak = int(np.argmax(counts))
    peak_height = counts[peak]
    nonzero = np.nonzero(counts)[0]
    left, right = nonzero[0], nonzero[-1]
    if left == right:
        return float(image.ravel()[0])
    flip = peak - left < right - peak
    if flip:
        counts = counts[::-1]
        left = nbins - right - 1
        peak = nbins - peak - 1
    # width >= 1 here: a single-bin histogram returned above, and the
    # flip puts the longer (non-empty) tail on the left of the peak
    width = peak - left
    x1 = np.arange(width)
    y1 = counts[x1 + left]
    norm = np.sqrt(peak_height**2 + width**2)
    length = (peak_height / norm) * x1 - (width / norm) * y1
    arg_level = int(np.argmax(length)) + left
    if flip:
        arg_level = nbins - arg_level - 1
    return float(centers[arg_level])


def threshold_yen(image: np.ndarray) -> float:
    """Yen's maximum correlation threshold."""
    counts, centers = _histogram(image)
    p = counts / counts.sum()
    p1 = np.cumsum(p)
    p1_sq = np.cumsum(p**2)
    p2_sq = np.cumsum(p[::-1] ** 2)[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        crit = np.log(
            np.maximum(p1_sq[:-1] * p2_sq[1:], 1e-30)
        ) * -1 + 2 * np.log(
            np.maximum(p1[:-1] * (1.0 - p1[:-1]), 1e-30)
        )
    return float(centers[np.argmax(crit)])


def threshold_local_gaussian(image: np.ndarray) -> np.ndarray:
    """Local Gaussian-mean threshold mask
    (picasso/masking.py:559)."""
    block_size = (3, 3)
    sigma = tuple((b - 1) / 6.0 for b in block_size)
    thresh = ndi.gaussian_filter(image, sigma=sigma, mode="reflect")
    return image > thresh


def threshold_local_mean(image: np.ndarray) -> np.ndarray:
    """Local mean threshold mask (picasso/masking.py:593)."""
    thresh = ndi.uniform_filter(image, (3, 3), mode="reflect")
    return image > thresh


def threshold_local_median(image: np.ndarray) -> np.ndarray:
    """Local median threshold mask (picasso/masking.py:620)."""
    thresh = ndi.median_filter(image, (3, 3), mode="reflect")
    return image > thresh


def threshold_tukey(image: np.ndarray) -> np.ndarray:
    """Tukey window mask suppressing FFT edge artifacts
    (picasso/masking.py:649)."""
    assert image.shape[0] == image.shape[1], "Image must be square"
    nfac = 8
    height, width = image.shape
    x = np.arange(width)
    x_im = (x - (width / 2)) / width
    x_im = np.tile(x_im, (height, 1))
    mask = 0.5 - 0.5 * np.cos(np.pi * nfac * x_im)
    mask[np.abs(x_im) < ((nfac - 2) / (nfac * 2))] = 1
    return mask * np.rot90(mask)


def loess_smooth(arr: np.ndarray, span: int = 5) -> np.ndarray:
    """LOESS (locally weighted linear regression with tricube weights)
    smoothing of a 1D array (picasso/masking.py:674)."""
    arr = np.asarray(arr, np.float64)
    n = len(arr)
    span += 1 - (span % 2)
    half = span // 2
    x = np.arange(n, dtype=np.float64)
    out = np.empty(n)
    for i in range(n):
        lo = max(0, i - half)
        hi = min(n, i + half + 1)
        xs = x[lo:hi]
        ys = arr[lo:hi]
        d = np.abs(xs - i)
        dmax = d.max() if d.max() > 0 else 1.0
        w = (1 - (d / dmax) ** 3) ** 3
        W = np.sum(w)
        xm = np.sum(w * xs) / W
        ym = np.sum(w * ys) / W
        cov = np.sum(w * (xs - xm) * (ys - ym))
        var = np.sum(w * (xs - xm) ** 2)
        slope = cov / var if var > 0 else 0.0
        out[i] = ym + slope * (i - xm)
    return out
