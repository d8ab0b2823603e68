"""picasso_tpu.average — 2D particle averaging: iterative
rotate+translate alignment of picked groups against the sum image by
FFT cross-correlation.

Capability parity with picasso/average.py (compute_xcorr :27,
align_group_core :49, build_group_index :196, com_align :223, average
:354). The reference scans rotation angles serially per group inside a
process pool with shared ctypes arrays; here each group's full angle
stack renders at once and correlates with one batched FFT.
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np
import pandas as pd
import scipy.sparse

from picasso_tpu import __version__, lib


def _render_hist_square(x, y, oversampling, t_min, t_max):
    """Square histogram of coordinates in [t_min, t_max)^2 (the
    averaging workspace; cf. render_hist_numba usage in
    picasso/average.py:101)."""
    n_pixel = int(np.ceil(oversampling * (t_max - t_min)))
    in_view = (x > t_min) & (y > t_min) & (x < t_max) & (y < t_max)
    xi = (oversampling * (x[in_view] - t_min)).astype(np.int32)
    yi = (oversampling * (y[in_view] - t_min)).astype(np.int32)
    image = np.zeros((n_pixel, n_pixel), np.float32)
    np.add.at(image, (yi, xi), 1.0)
    return int(in_view.sum()), image


def compute_xcorr(CF_image_avg, image):
    """fftshifted cross-correlation with a precomputed conjugate
    spectrum (picasso/average.py:27)."""
    F_image = np.fft.fft2(image)
    return np.fft.fftshift(
        np.real(np.fft.ifft2(F_image * CF_image_avg))
    )


def align_group_core(
    index, x, y, angles, oversampling, t_min, t_max, CF_image_avg,
    image_half,
):
    """Align one group: render the histogram at EVERY rotation angle,
    correlate all of them against the average image in one batched FFT,
    pick the (angle, shift) with the highest peak
    (picasso/average.py:49, de-serialized over angles)."""
    x0 = x[index]
    y0 = y[index]
    n_pixel = int(np.ceil(oversampling * (t_max - t_min)))
    A = len(angles)
    cos_a = np.cos(angles)
    sin_a = np.sin(angles)
    # rotated coords for all angles: (A, n_locs)
    xr = cos_a[:, None] * x0[None, :] - sin_a[:, None] * y0[None, :]
    yr = sin_a[:, None] * x0[None, :] + cos_a[:, None] * y0[None, :]
    in_view = (
        (xr > t_min) & (yr > t_min) & (xr < t_max) & (yr < t_max)
    )
    xi = (oversampling * (xr - t_min)).astype(np.int32)
    yi = (oversampling * (yr - t_min)).astype(np.int32)
    xi = np.clip(xi, 0, n_pixel - 1)
    yi = np.clip(yi, 0, n_pixel - 1)
    images = np.zeros((A, n_pixel, n_pixel), np.float32)
    a_idx = np.broadcast_to(np.arange(A)[:, None], xi.shape)
    np.add.at(
        images,
        (a_idx[in_view], yi[in_view], xi[in_view]),
        1.0,
    )
    F = np.fft.fft2(images)
    xcorr = np.fft.fftshift(
        np.real(np.fft.ifft2(F * CF_image_avg[None])), axes=(1, 2)
    )
    flat = xcorr.reshape(A, -1)
    best_per_angle = flat.max(axis=1)
    a_best = int(np.argmax(best_per_angle))
    if best_per_angle[a_best] <= 0.0:
        # empty/zero correlation (e.g. all locs outside the window):
        # keep the group untouched, like the reference's
        # xcorr_max > 0 gate (picasso/average.py:96-107)
        return x0, y0
    y_max, x_max = np.unravel_index(
        int(np.argmax(flat[a_best])), (n_pixel, n_pixel)
    )
    rot = angles[a_best]
    dy = np.ceil(y_max - image_half) / oversampling
    dx = np.ceil(x_max - image_half) / oversampling
    x_aligned = np.cos(rot) * x0 - np.sin(rot) * y0 - dx
    y_aligned = np.sin(rot) * x0 + np.cos(rot) * y0 - dy
    return x_aligned, y_aligned


def _align_groups_device(
    x, y, group_rows, angles, oversampling, t_min, t_max,
    image_avg, image_half,
):
    """Align MANY groups at once on device: rotate every group by
    every angle, histogram all (group, angle) images with one
    scatter-add, correlate them against the average image with one
    batched FFT, and gather each group's best (angle, shift) —
    the multi-group de-serialization of align_group_core
    (cf. the reference's process pool, picasso/average.py:121-194).

    Returns updated (x, y) numpy arrays.
    """
    import jax
    import jax.numpy as jnp

    P = image_avg.shape[0]
    A = len(angles)
    # passed as jit ARGUMENTS, not closure captures (captured device
    # arrays embed as MLIR constants via a device->host readback).
    # The REAL average image uploads and is conj-FFT'd on device:
    # complex64 host->device transfers are UNIMPLEMENTED on the
    # tunneled TPU backend.
    cos_a = jnp.asarray(np.cos(angles), jnp.float32)
    sin_a = jnp.asarray(np.sin(angles), jnp.float32)
    avg_dev = jnp.asarray(np.asarray(image_avg, np.float32))

    sizes = np.array([len(r) for r in group_rows])
    L = max(1, 1 << int(np.ceil(np.log2(max(sizes.max(), 1)))))
    # chunk groups so the (Gb, A, P, P) correlation stack stays small
    budget = 64_000_000  # complex64 elements ~ 512 MB
    Gb = int(np.clip(budget // max(A * P * P, 1), 1, 256))

    @jax.jit
    def align_chunk(xs, ys, mask, cos_a, sin_a, avg_img):
        CF = jnp.conj(jnp.fft.fft2(avg_img))
        G = xs.shape[0]
        xr = (
            cos_a[None, :, None] * xs[:, None, :]
            - sin_a[None, :, None] * ys[:, None, :]
        )  # (G, A, L)
        yr = (
            sin_a[None, :, None] * xs[:, None, :]
            + cos_a[None, :, None] * ys[:, None, :]
        )
        ok = (
            (xr > t_min) & (yr > t_min)
            & (xr < t_max) & (yr < t_max)
            & (mask[:, None, :] != 0)  # mask arrives as u8
        )
        xi = jnp.clip(
            (oversampling * (xr - t_min)).astype(jnp.int32), 0, P - 1
        )
        yi = jnp.clip(
            (oversampling * (yr - t_min)).astype(jnp.int32), 0, P - 1
        )
        g_idx = jax.lax.broadcasted_iota(jnp.int32, (G, A, 1), 0)
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (G, A, 1), 1)
        flat = ((g_idx * A + a_idx) * P + yi) * P + xi
        flat = jnp.where(ok, flat, G * A * P * P)
        images = (
            jnp.zeros(G * A * P * P + 1, jnp.float32)
            .at[flat.reshape(-1)]
            .add(1.0)[:-1]
            .reshape(G, A, P, P)
        )
        F = jnp.fft.fft2(images)
        xcorr = jnp.fft.fftshift(
            jnp.real(jnp.fft.ifft2(F * CF[None, None])), axes=(2, 3)
        )
        flat2 = xcorr.reshape(G, A * P * P)
        best = jnp.argmax(flat2, axis=1)
        val = jnp.take_along_axis(flat2, best[:, None], 1)[:, 0]
        a_best = best // (P * P)
        rem = best % (P * P)
        y_max = rem // P
        x_max = rem % P
        dy = jnp.ceil(
            y_max.astype(jnp.float32) - image_half
        ) / oversampling
        dx = jnp.ceil(
            x_max.astype(jnp.float32) - image_half
        ) / oversampling
        c = cos_a[a_best][:, None]
        s = sin_a[a_best][:, None]
        x_al = c * xs - s * ys - dx[:, None]
        y_al = s * xs + c * ys - dy[:, None]
        keep = (val > 0.0)[:, None]
        return (
            jnp.where(keep, x_al, xs), jnp.where(keep, y_al, ys),
        )

    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    n_groups = len(group_rows)
    for start in range(0, n_groups, Gb):
        rows = group_rows[start : start + Gb]
        G = len(rows)
        xs = np.zeros((Gb, L), np.float32)
        ys = np.zeros((Gb, L), np.float32)
        mask = np.zeros((Gb, L), bool)
        for gi, r in enumerate(rows):
            xs[gi, : len(r)] = x[r]
            ys[gi, : len(r)] = y[r]
            mask[gi, : len(r)] = True
        # upload the mask as u8: the tunneled TPU backend rejects
        # bool-array device_put (UNIMPLEMENTED)
        xa, ya = align_chunk(
            jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(mask.astype(np.uint8)),
            cos_a, sin_a, avg_dev,
        )
        xa = np.asarray(xa)
        ya = np.asarray(ya)
        for gi, r in enumerate(rows):
            x[r] = xa[gi, : len(r)]
            y[r] = ya[gi, : len(r)]
    return x, y


def build_group_index(locs: pd.DataFrame) -> scipy.sparse.lil_matrix:
    """Sparse (n_groups, n_locs) boolean membership matrix
    (picasso/average.py:196)."""
    groups = np.unique(locs["group"])
    group_index = scipy.sparse.lil_matrix(
        (len(groups), len(locs)), dtype=bool
    )
    for i, group in enumerate(groups):
        index = np.where(locs["group"] == group)[0]
        group_index[i, index] = True
    return group_index


def com_align(
    locs: pd.DataFrame, group_index: scipy.sparse.lil_matrix
) -> pd.DataFrame:
    """Center each group at the origin (picasso/average.py:223).
    Vectorized with groupby transforms."""
    locs = locs.copy().reset_index(drop=True)
    g = locs.groupby("group")
    locs["x"] = locs["x"] - g["x"].transform("mean")
    locs["y"] = locs["y"] - g["y"].transform("mean")
    return locs


def prepare_locs_for_save(
    locs: pd.DataFrame, info: list[dict], params: dict = {}
) -> tuple[pd.DataFrame, list[dict]]:
    """Shift averaged locs back into the FOV + provenance block
    (picasso/average.py:280)."""
    cx = lib.get_from_metadata(info, "Width") / 2
    cy = lib.get_from_metadata(info, "Height") / 2
    locs = locs.copy()
    locs["x"] += cx
    locs["y"] += cy
    avg_info = {"Generated by": f"Picasso {__version__} Average"}
    if "disp_px_size" in params:
        avg_info["Display pixel size (nm)"] = params["disp_px_size"]
    if "it" in params:
        avg_info["Iterations"] = params["it"]
    return locs, info + [avg_info]


def average(
    locs: pd.DataFrame,
    info: list[dict],
    *,
    display_pixel_size: float = 5.0,
    iterations: int = 3,
    return_shifted_locs: bool = False,
    progress_callback: (
        Callable | Literal["console"] | None
    ) = None,
    abort_callback: Callable[[], bool] | None = None,
):
    """Iterative rotational/translational particle averaging
    (picasso/average.py:354)."""
    assert "group" in locs.columns, (
        "Localizations DataFrame must have a 'group' column."
    )
    group_index = build_group_index(locs)
    locs = com_align(locs, group_index)
    n_groups = group_index.shape[0]
    r = 2 * np.sqrt((locs["x"] ** 2 + locs["y"] ** 2).mean())
    camera_pixelsize = lib.get_from_metadata(
        info, "Pixelsize", raise_error=True
    )
    oversampling = camera_pixelsize / display_pixel_size
    # Round the correlation workspace up to a power-of-two pixel count
    # (symmetric zero margin). TPU FFT compilation of non-pow2 sizes
    # goes through Bluestein and takes MINUTES (measured: 534 s for
    # 24x24 vs 4.7 s for 32x32); the extra empty border does not
    # change the xcorr peak for centered particles. Host and device
    # paths share the workspace, so their parity is unaffected.
    n_raw = int(np.ceil(oversampling * 2 * r))
    n_pow2 = 1 << max(int(np.ceil(np.log2(max(n_raw, 2)))), 1)
    pad = (n_pow2 / oversampling - 2 * r) / 2
    t_min, t_max = -r - pad, r + pad
    a_step = np.arcsin(1 / (oversampling * r))
    angles = np.arange(0, 2 * np.pi, a_step)

    x = locs["x"].to_numpy().astype(np.float32)
    y = locs["y"].to_numpy().astype(np.float32)
    group_rows = [
        np.asarray(group_index[i, :].nonzero()[1])
        for i in range(n_groups)
    ]
    rep = lib.progress_reporter(
        progress_callback, iterations * n_groups, "Averaging"
    )
    import os as _os

    mode = _os.environ.get("PICASSO_TPU_AVERAGE", "auto")
    use_device = mode != "host" and (
        mode == "device" or n_groups >= 64
    )
    aborted = False
    for it in range(iterations):
        if callable(abort_callback) and abort_callback():
            aborted = True
            break
        _, image_avg = _render_hist_square(
            x, y, oversampling, t_min, t_max
        )
        n_pixel = image_avg.shape[0]
        image_half = n_pixel / 2
        CF_image_avg = np.conj(np.fft.fft2(image_avg))
        if use_device:
            # batched over ALL groups: one scatter-add + one FFT
            # stack per chunk (the groups are independent within an
            # iteration — the average image is fixed)
            x, y = _align_groups_device(
                x, y, group_rows, angles, oversampling, t_min,
                t_max, image_avg, image_half,
            )
            rep.set_value((it + 1) * n_groups)
        else:
            for gi, index in enumerate(group_rows):
                xa, ya = align_group_core(
                    index, x, y, angles, oversampling, t_min, t_max,
                    CF_image_avg, image_half,
                )
                x[index] = xa
                y[index] = ya
                rep.set_value(it * n_groups + gi + 1)
        # global recentring each iteration so the ensemble cannot
        # drift out of the fixed histogram window
        # (picasso/average.py:500-503)
        x -= np.mean(x)
        y -= np.mean(y)
        if callable(progress_callback):
            locs_current = locs.copy()
            locs_current["x"] = x
            locs_current["y"] = y
            try:
                progress_callback(
                    it + 1, iterations, locs_current, n_groups,
                    n_groups,
                )
            except TypeError:
                pass
    rep.close()
    if aborted:
        return None
    locs = locs.copy()
    locs["x"] = x
    locs["y"] = y
    if return_shifted_locs:
        params = {
            "disp_px_size": display_pixel_size, "it": iterations,
        }
        locs, info = prepare_locs_for_save(locs, info, params)
        return locs, info
    return locs
