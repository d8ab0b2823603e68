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
    # fast path: scatter-free tile matmuls; leftovers (very wide
    # windows, overdense tiles) go through the bucketed scatter
    img, leftover = _splat_tiles_device(x, y, sx, sy, ny, nx)
    if len(leftover) == 0:
        return img
    x, y, sx, sy = (
        a[leftover] for a in (x, y, sx, sy)
    )
    n = len(x)
    smax = np.maximum(sx, sy)
    # window must cover 2*3*sigma + 2 pixels
    need = 2 * DRAW_MAX_SIGMA * smax + 2
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


# ---------------------------------------------------------------------------
# Tile-matmul Gaussian splat: the scatter-free fast path.
#
# The per-loc separable splat over an image tile is a sum of outer
# products: img_tile[p, q] = sum_k gy[k, p] * gx[k, q] — i.e. one
# (TILE, K) x (K, TILE) matmul per tile, which runs on the MXU
# instead of the (sort-based, ~90M updates/s) TPU scatter-add. Locs
# are binned to the tiles their +-3-sigma windows overlap (<= 4 tiles
# per loc for windows up to one tile wide); per-tile candidate lists
# are padded to a power-of-two K. Tiles denser than the K cap and
# locs with windows wider than a tile fall back to the bucketed
# scatter kernel. Window semantics match _splat_bucket_host exactly
# (reference picasso/render.py:495 _draw_gaussian_loc).
# ---------------------------------------------------------------------------

_SPLAT_TILE = 128
_SPLAT_K_CAP = 4096


def _round_k(max_count: int) -> int:
    """Candidate-table width: round up to a HALF-octave step (…, 512,
    768, 1024, 1536, 2048, 3072, 4096) instead of a full power of
    two. Every padded slot still pays the (TC, K, TILE) factor
    evaluation (the splat body is exp-bound), so a pow2 round-up
    wastes up to ~2× body work; half-octaves cap the waste at ~33 %
    while keeping the distinct-K compile count at two per octave."""
    k = max(int(max_count), 16)
    p = 1 << max(int(np.ceil(np.log2(k))), 4)
    if k <= (p * 3) // 4:
        return (p * 3) // 4
    return p


@functools.partial(
    jax.jit,
    static_argnames=("ny", "nx", "TILE"),
)
def _splat_tile_entries(x, y, sx, sy, ny, nx, TILE):
    """Entry building shared by the count pass and the splat kernel:
    each loc contributes up to 4 (tile, loc) entries covering the
    tiles its reference window overlaps. Returns (tid, loc_idx,
    window bounds); invalid entries carry the sentinel tile id T."""
    n = x.shape[0]
    ntx = -(-nx // TILE)
    nty = -(-ny // TILE)
    T = nty * ntx
    i_min = jnp.maximum(
        (y - DRAW_MAX_SIGMA * sy).astype(jnp.int32), 0
    )
    i_max = jnp.minimum(
        (y + DRAW_MAX_SIGMA * sy + 1).astype(jnp.int32), ny
    )
    j_min = jnp.maximum(
        (x - DRAW_MAX_SIGMA * sx).astype(jnp.int32), 0
    )
    j_max = jnp.minimum(
        (x + DRAW_MAX_SIGMA * sx).astype(jnp.int32) + 1, nx
    )
    alive = (i_max > i_min) & (j_max > j_min)
    wide = ((i_max - i_min) > TILE) | ((j_max - j_min) > TILE)
    use = alive & ~wide
    ti0 = i_min // TILE
    ti1 = (i_max - 1) // TILE
    tj0 = j_min // TILE
    tj1 = (j_max - 1) // TILE
    ti = jnp.concatenate([ti0, ti1, ti0, ti1])
    tj = jnp.concatenate([tj0, tj0, tj1, tj1])
    em = jnp.concatenate([
        use,
        use & (ti1 > ti0),
        use & (tj1 > tj0),
        use & (ti1 > ti0) & (tj1 > tj0),
    ])
    locs4 = jnp.tile(jnp.arange(n, dtype=jnp.int32), 4)
    tid = jnp.where(em, ti * ntx + tj, T)
    return tid, locs4, wide, (i_min, i_max, j_min, j_max)


@functools.partial(
    jax.jit, static_argnames=("ny", "nx", "TILE")
)
def _splat_tile_max_count(x, y, sx, sy, ny, nx, TILE):
    tid, _, _, _ = _splat_tile_entries(x, y, sx, sy, ny, nx, TILE)
    ntx = -(-nx // TILE)
    nty = -(-ny // TILE)
    counts = jnp.bincount(tid, length=nty * ntx + 1)
    return jnp.max(counts[:-1])


@functools.partial(
    jax.jit,
    static_argnames=("ny", "nx", "K", "TILE", "TC"),
)
def _splat_tiles_kernel(x, y, sx, sy, ny, nx, K, TILE, TC):
    """Scatter-free Gaussian splat: device-side tile binning (sort +
    positional scatter into a (T, K) candidate table) followed by one
    (TILE, K) x (K, TILE) MXU matmul per tile. Returns the padded
    image and a per-loc leftover mask (wide windows or tiles denser
    than K) for the caller's fallback."""
    n = x.shape[0]
    ntx = -(-nx // TILE)
    nty = -(-ny // TILE)
    T = nty * ntx
    tid, locs4, wide, (i_min, i_max, j_min, j_max) = (
        _splat_tile_entries(x, y, sx, sy, ny, nx, TILE)
    )
    # Round-5 measured rewrite of the binning (one-session A/B,
    # docs/performance.md): carrying locs4 THROUGH the stable sort
    # replaces the argsort + two 4n-row permutation gathers (~40 ms
    # each at the ~10 ns/gather-row cost model) at no extra sort cost
    # (argsort is itself a two-operand sort), and searchsorted on the
    # sorted tids replaces the bincount dense-accumulation scatter +
    # cumsum (125 -> ~10 ms for the whole binning).
    tid_s, locs_s = jax.lax.sort((tid, locs4), num_keys=1)
    starts = jnp.searchsorted(
        tid_s, jnp.arange(T + 1, dtype=tid_s.dtype)
    )
    pos = jnp.arange(4 * n) - starts[tid_s]
    in_tile = tid_s < T
    # a loc with ANY overflowed entry leaves the tile path entirely
    # (its other entries must not double-render)
    overflow_entry = in_tile & (pos >= K)
    loc_overflow = (
        jnp.zeros(n, jnp.bool_)
        .at[locs_s]
        .max(overflow_entry)
    )
    ok = in_tile & (pos < K) & ~loc_overflow[locs_s]
    slot = jnp.where(
        ok, tid_s * K + pos, T * K
    ).astype(jnp.int32)
    lut = (
        jnp.zeros(T * K + 1, jnp.int32)
        .at[slot]
        .set(locs_s, mode="drop")[: T * K]
        .reshape(T, K)
    )
    vmask = (
        jnp.zeros(T * K + 1, jnp.bool_)
        .at[slot]
        .set(True, mode="drop")[: T * K]
        .reshape(T, K)
    )

    # pad tiles to a multiple of the chunk
    Tp = -(-T // TC) * TC
    row0 = (jnp.arange(Tp, dtype=jnp.int32) // ntx) * TILE
    col0 = (jnp.arange(Tp, dtype=jnp.int32) % ntx) * TILE
    lut = jnp.concatenate(
        [lut, jnp.zeros((Tp - T, K), jnp.int32)]
    )
    vmask = jnp.concatenate(
        [vmask, jnp.zeros((Tp - T, K), jnp.bool_)]
    )

    def body(c, canvas):
        s = c * TC
        lut_c = jax.lax.dynamic_slice(lut, (s, 0), (TC, K))
        val_c = jax.lax.dynamic_slice(vmask, (s, 0), (TC, K))
        r0 = jax.lax.dynamic_slice(row0, (s,), (TC,))
        c0 = jax.lax.dynamic_slice(col0, (s,), (TC,))
        xk = x[lut_c]
        yk = y[lut_c]
        sxk = jnp.where(val_c, sx[lut_c], 1.0)
        syk = jnp.where(val_c, sy[lut_c], 1.0)
        r = r0[:, None, None] + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, TILE), 2
        )
        cc = c0[:, None, None] + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, TILE), 2
        )
        dy = r.astype(jnp.float32) + 0.5 - yk[:, :, None]
        dx = cc.astype(jnp.float32) + 0.5 - xk[:, :, None]
        norm = jnp.where(
            val_c, 1.0 / (2.0 * jnp.pi * sxk * syk), 0.0
        )
        row_ok = (
            (r >= i_min[lut_c][:, :, None])
            & (r < i_max[lut_c][:, :, None])
        )
        col_ok = (
            (cc >= j_min[lut_c][:, :, None])
            & (cc < j_max[lut_c][:, :, None])
        )
        gy = jnp.where(
            row_ok,
            norm[:, :, None]
            * jnp.exp(-dy * dy / (2.0 * syk[:, :, None] ** 2)),
            0.0,
        )
        gx = jnp.where(
            col_ok,
            jnp.exp(-dx * dx / (2.0 * sxk[:, :, None] ** 2)),
            0.0,
        )
        tiles = jax.lax.dot_general(
            gy, gx, (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.dynamic_update_slice(
            canvas, tiles, (s, 0, 0)
        )

    canvas = jnp.zeros((Tp, TILE, TILE), jnp.float32)
    canvas = jax.lax.fori_loop(0, Tp // TC, body, canvas)
    img = (
        canvas[:T]
        .reshape(nty, ntx, TILE, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(nty * TILE, ntx * TILE)[:ny, :nx]
    )
    leftover = wide | loc_overflow
    return img, leftover


def _splat_tiles_device(x, y, sx, sy, ny, nx):
    """Tile-matmul splat. Returns (image ndarray, leftover index
    array) — leftover locs must be rendered by the caller."""
    TILE = _SPLAT_TILE
    xd = jnp.asarray(x, jnp.float32)
    yd = jnp.asarray(y, jnp.float32)
    sxd = jnp.asarray(sx, jnp.float32)
    syd = jnp.asarray(sy, jnp.float32)
    max_count = int(
        _splat_tile_max_count(xd, yd, sxd, syd, ny, nx, TILE)
    )
    K = min(_round_k(max_count), _SPLAT_K_CAP)
    # chunk size bounds the (TC, K, TILE) factor tensors to ~32M f32
    TC = max(8, 1 << int(np.log2(max(32e6 / (K * TILE), 8))))
    img, leftover = _splat_tiles_kernel(
        xd, yd, sxd, syd, ny, nx, K, TILE, TC
    )
    return (
        np.array(img),
        np.nonzero(np.asarray(leftover))[0],
    )


