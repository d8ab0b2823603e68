"""Device rendering primitives: histogram scatter-add and per-loc
Gaussian splatting.

TPU-native replacement for the reference's per-loc numba fill loops
(picasso/render.py:_fill :452, _fill3d :471, _draw_gaussian_loc :495,
_fill_gaussian :544). Localizations are binned with one scatter-add
over flattened pixel indices; Gaussian blur splats fixed-size
(sigma-bucketed) windows per localization so shapes stay static under
jit — the reference's data-dependent ±3σ windows become masked
fixed windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Max sigma (in display px) from the mean to render, matching the
# reference's window (picasso/render.py:32).
DRAW_MAX_SIGMA = 3.0

# Below this many locs the device dispatch overhead dominates; use the
# host path.
_DEVICE_MIN_LOCS = 50_000


@functools.partial(jax.jit, static_argnames=("ny", "nx"))
def _hist2d_device(x, y, ny: int, nx: int):
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    ok = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
    flat = jnp.where(ok, yi * nx + xi, ny * nx)
    img = jnp.zeros(ny * nx + 1, jnp.float32).at[flat].add(1.0)
    return img[: ny * nx].reshape(ny, nx)


def hist2d(x: np.ndarray, y: np.ndarray, ny: int, nx: int) -> np.ndarray:
    """Histogram of pre-scaled display coordinates into (ny, nx)."""
    if len(x) < _DEVICE_MIN_LOCS:
        img = np.zeros((ny, nx), np.float32)
        xi = x.astype(np.int32)
        yi = y.astype(np.int32)
        ok = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
        np.add.at(img, (yi[ok], xi[ok]), 1.0)
        return img
    return np.asarray(
        _hist2d_device(jnp.asarray(x), jnp.asarray(y), ny, nx)
    )


@functools.partial(jax.jit, static_argnames=("ny", "nx", "nz"))
def _hist3d_device(x, y, z, ny: int, nx: int, nz: int):
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    zi = z.astype(jnp.int32)
    # reference quirk reproduced: z += min(z) (render.py:490 — the
    # setup already made z non-negative, so this shifts up by min)
    zi = zi + jnp.min(zi)
    ok = (
        (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
        & (zi >= 0) & (zi < nz)
    )
    flat = jnp.where(
        ok, (yi * nx + xi) * nz + zi, ny * nx * nz
    )
    img = jnp.zeros(ny * nx * nz + 1, jnp.float32).at[flat].add(1.0)
    return img[: ny * nx * nz].reshape(ny, nx, nz)


def hist3d(x, y, z, ny: int, nx: int, nz: int) -> np.ndarray:
    """3D histogram; z may be negative and is shifted like the
    reference (picasso/render.py:471-494)."""
    if len(x) >= _DEVICE_MIN_LOCS:
        return np.asarray(
            _hist3d_device(
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                ny, nx, nz,
            )
        )
    img = np.zeros((ny, nx, nz), np.float32)
    xi = x.astype(np.int32)
    yi = y.astype(np.int32)
    zi = z.astype(np.int32)
    zi = zi + zi.min() if len(zi) else zi
    ok = (
        (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
        & (zi >= 0) & (zi < nz)
    )
    np.add.at(img, (yi[ok], xi[ok], zi[ok]), 1.0)
    return img


@functools.partial(jax.jit, static_argnames=("W", "ny", "nx"))
def _splat_bucket_device(x, y, sx, sy, W: int, ny: int, nx: int):
    """Splat one sigma-bucket of locs with a fixed (W, W) window.

    Window semantics match _draw_gaussian_loc (picasso/render.py:495):
    rows [int(y - 3sy), int(y + 3sy + 1)) clamped to the image, pixel
    centers at +0.5, weight gy*gx with norm 1/(2 pi sx sy)."""
    n = x.shape[0]
    # Cap the ±3σ offset to what the fixed window can hold (only the
    # largest bucket can truncate, and symmetrically).
    off_y = jnp.minimum(DRAW_MAX_SIGMA * sy, (W - 2) / 2.0)
    off_x = jnp.minimum(DRAW_MAX_SIGMA * sx, (W - 2) / 2.0)
    i_min = jnp.maximum(jnp.floor(y - off_y), 0.0).astype(jnp.int32)
    i_max = jnp.minimum((y + off_y + 1).astype(jnp.int32), ny)
    j_min = jnp.maximum(jnp.floor(x - off_x), 0.0).astype(jnp.int32)
    j_max = jnp.minimum((x + off_x).astype(jnp.int32) + 1, nx)
    k = jnp.arange(W)
    rows = i_min[:, None] + k[None, :]  # (n, W)
    cols = j_min[:, None] + k[None, :]
    dy = rows.astype(jnp.float32) + 0.5 - y[:, None]
    dx = cols.astype(jnp.float32) + 0.5 - x[:, None]
    norm = 1.0 / (2.0 * jnp.pi * sx * sy)
    gy = norm[:, None] * jnp.exp(
        -dy * dy / (2.0 * sy[:, None] ** 2)
    )
    gx = jnp.exp(-dx * dx / (2.0 * sx[:, None] ** 2))
    row_ok = rows < i_max[:, None]
    col_ok = cols < j_max[:, None]
    gy = jnp.where(row_ok, gy, 0.0)
    gx = jnp.where(col_ok, gx, 0.0)
    vals = gy[:, :, None] * gx[:, None, :]  # (n, W, W)
    flat = rows[:, :, None] * nx + cols[:, None, :]
    ok = row_ok[:, :, None] & col_ok[:, None, :]
    flat = jnp.where(ok, flat, ny * nx)
    img = (
        jnp.zeros(ny * nx + 1, jnp.float32)
        .at[flat.reshape(-1)]
        .add(vals.reshape(-1))
    )
    return img[: ny * nx].reshape(ny, nx)


def _splat_bucket_host(x, y, sx, sy, ny, nx):
    img = np.zeros((ny, nx), np.float32)
    for xi, yi, sxi, syi in zip(x, y, sx, sy):
        i_min = max(int(yi - DRAW_MAX_SIGMA * syi), 0)
        i_max = min(int(yi + DRAW_MAX_SIGMA * syi + 1), ny)
        j_min = max(int(xi - DRAW_MAX_SIGMA * sxi), 0)
        j_max = min(int(xi + DRAW_MAX_SIGMA * sxi) + 1, nx)
        if i_max <= i_min or j_max <= j_min:
            continue
        ii = np.arange(i_min, i_max)
        jj = np.arange(j_min, j_max)
        norm = 1.0 / (2.0 * np.pi * sxi * syi)
        gy = norm * np.exp(-((ii + 0.5 - yi) ** 2) / (2 * syi**2))
        gx = np.exp(-((jj + 0.5 - xi) ** 2) / (2 * sxi**2))
        img[i_min:i_max, j_min:j_max] += np.outer(gy, gx)
    return img


@functools.partial(jax.jit, static_argnames=("W", "ny", "nx"))
def _splat_cov_bucket_device(
    x, y, inv00, inv01, inv11, norm, ext_x, ext_y, W: int,
    ny: int, nx: int,
):
    """Splat one extent-bucket of general-covariance Gaussians with a
    fixed (W, W) window — the device rotated-view path
    (cf. picasso/render.py:633 _fill_gaussian_rot). Window semantics
    match the host loop: rows [int(y-ext_y), int(y+ext_y+1)) and cols
    [int(x-ext_x), int(x+ext_x)+1), clamped; pixel centers at +0.5."""
    ext_y = jnp.minimum(ext_y, (W - 2) / 2.0)
    ext_x = jnp.minimum(ext_x, (W - 2) / 2.0)
    i_min = jnp.maximum(
        jnp.floor(y - ext_y), 0.0
    ).astype(jnp.int32)
    i_max = jnp.minimum((y + ext_y + 1).astype(jnp.int32), ny)
    j_min = jnp.maximum(
        jnp.floor(x - ext_x), 0.0
    ).astype(jnp.int32)
    j_max = jnp.minimum((x + ext_x).astype(jnp.int32) + 1, nx)
    k = jnp.arange(W)
    rows = i_min[:, None] + k[None, :]  # (n, W)
    cols = j_min[:, None] + k[None, :]
    dy = rows.astype(jnp.float32) + 0.5 - y[:, None]  # (n, W)
    dx = cols.astype(jnp.float32) + 0.5 - x[:, None]
    q = (
        inv00[:, None, None] * (dx * dx)[:, None, :]
        + 2.0 * inv01[:, None, None] * dy[:, :, None] * dx[:, None, :]
        + inv11[:, None, None] * (dy * dy)[:, :, None]
    )  # (n, W, W)
    vals = norm[:, None, None] * jnp.exp(-0.5 * q)
    row_ok = rows < i_max[:, None]
    col_ok = cols < j_max[:, None]
    ok = row_ok[:, :, None] & col_ok[:, None, :]
    vals = jnp.where(ok, vals, 0.0)
    flat = jnp.where(
        ok, rows[:, :, None] * nx + cols[:, None, :], ny * nx
    )
    img = (
        jnp.zeros(ny * nx + 1, jnp.float32)
        .at[flat.reshape(-1)]
        .add(vals.reshape(-1))
    )
    return img[: ny * nx].reshape(ny, nx)


def _splat_cov_host(x, y, inv, norms, ext_x, ext_y, ok, ny, nx):
    img = np.zeros((ny, nx), np.float32)
    for k in range(len(x)):
        if not ok[k]:
            continue
        i_min = max(int(y[k] - ext_y[k]), 0)
        i_max = min(int(y[k] + ext_y[k] + 1), ny)
        j_min = max(int(x[k] - ext_x[k]), 0)
        j_max = min(int(x[k] + ext_x[k]) + 1, nx)
        if i_max <= i_min or j_max <= j_min:
            continue
        jj, ii = np.meshgrid(
            np.arange(j_min, j_max), np.arange(i_min, i_max)
        )
        dx = jj + 0.5 - x[k]
        dy = ii + 0.5 - y[k]
        q = (
            inv[k, 0, 0] * dx * dx
            + 2 * inv[k, 0, 1] * dx * dy
            + inv[k, 1, 1] * dy * dy
        )
        img[i_min:i_max, j_min:j_max] += norms[k] * np.exp(-0.5 * q)
    return img


def gaussian_splat_cov(
    x: np.ndarray,
    y: np.ndarray,
    covs: np.ndarray,
    ny: int,
    nx: int,
) -> np.ndarray:
    """Render each loc as a general-covariance 2D Gaussian (the
    rotated-view path: per-loc 3D covariance diag(sx^2, sy^2, sz^2)
    rotated and projected to 2D; cf. picasso/render.py:579-680).

    covs is (n, 2, 2). Large batches run as extent-bucketed fixed-
    window device splats (like gaussian_splat); small ones use the
    host loop."""
    n = len(x)
    dets = covs[:, 0, 0] * covs[:, 1, 1] - covs[:, 0, 1] ** 2
    ok = dets > 0
    inv = np.zeros_like(covs)
    inv[ok, 0, 0] = covs[ok, 1, 1] / dets[ok]
    inv[ok, 1, 1] = covs[ok, 0, 0] / dets[ok]
    inv[ok, 0, 1] = -covs[ok, 0, 1] / dets[ok]
    inv[ok, 1, 0] = -covs[ok, 1, 0] / dets[ok]
    norms = np.where(
        ok, 1.0 / (2 * np.pi * np.sqrt(np.maximum(dets, 1e-30))), 0.0
    )
    ext_x = DRAW_MAX_SIGMA * np.sqrt(np.maximum(covs[:, 0, 0], 0))
    ext_y = DRAW_MAX_SIGMA * np.sqrt(np.maximum(covs[:, 1, 1], 0))
    if n < _DEVICE_MIN_LOCS:
        return _splat_cov_host(
            x, y, inv, norms, ext_x, ext_y, ok, ny, nx
        )
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    need = 2 * np.maximum(ext_x, ext_y) + 2
    img = np.zeros((ny, nx), np.float32)
    buckets = [8, 16, 32, 64, 128]
    assigned = ~ok  # degenerate covariances render nothing
    for W in buckets:
        sel = ~assigned & (need <= W)
        if W == buckets[-1]:
            sel = ~assigned
        assigned |= sel
        if not sel.any():
            continue
        img += np.asarray(
            _splat_cov_bucket_device(
                jnp.asarray(x[sel]),
                jnp.asarray(y[sel]),
                jnp.asarray(inv[sel, 0, 0], jnp.float32),
                jnp.asarray(inv[sel, 0, 1], jnp.float32),
                jnp.asarray(inv[sel, 1, 1], jnp.float32),
                jnp.asarray(norms[sel], jnp.float32),
                jnp.asarray(ext_x[sel], jnp.float32),
                jnp.asarray(ext_y[sel], jnp.float32),
                W,
                ny,
                nx,
            )
        )
    return img


def gaussian_splat(
    x: np.ndarray,
    y: np.ndarray,
    sx: np.ndarray,
    sy: np.ndarray,
    ny: int,
    nx: int,
) -> np.ndarray:
    """Render each loc as a separable 2D Gaussian with per-loc sigmas.
    Locs are bucketed by max sigma into fixed window sizes so the
    device kernels have static shapes."""
    n = len(x)
    if n == 0:
        return np.zeros((ny, nx), np.float32)
    if n < _DEVICE_MIN_LOCS:
        return _splat_bucket_host(x, y, sx, sy, ny, nx)
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    sx = np.asarray(sx, np.float32)
    sy = np.asarray(sy, np.float32)
    smax = np.maximum(sx, sy)
    # window must cover 2*3*sigma + 2 pixels
    need = 2 * DRAW_MAX_SIGMA * smax + 2
    img = np.zeros((ny, nx), np.float32)
    buckets = [8, 16, 32, 64, 128]
    assigned = np.zeros(n, bool)
    for W in buckets:
        sel = ~assigned & (need <= W)
        if W == buckets[-1]:
            sel = ~assigned
        assigned |= sel
        if not sel.any():
            continue
        img += np.asarray(
            _splat_bucket_device(
                jnp.asarray(x[sel]),
                jnp.asarray(y[sel]),
                jnp.asarray(sx[sel]),
                jnp.asarray(sy[sel]),
                W,
                ny,
                nx,
            )
        )
    return img
