"""Fused Pallas TPU kernel for spot identification.

One VMEM pass per frame ROW BAND computes everything the compaction
needs — local maxima, the rank-3 separable net-gradient correlation,
the threshold, and the (T, T)-tile reduction — and writes only the
1/T²-resolution tile arrays back to HBM. The XLA path
(ops/identify.identify_maps) materializes the full-resolution
net-gradient and mask maps plus several windowed-max intermediates in
HBM and runs the banded correlation as dense (S, S+2h) MXU matmuls
(S+2h MACs per output for a true bandwidth of 2h+1); in VMEM the VPU
does the true 84-FMA/px separable correlation and the 48-slice window
maxima for (almost) free, so the kernel's HBM traffic is one f32
frame read + three tile-grid writes.

Bands keep the working set inside the ~16 MB VMEM at any frame width:
the caller materializes halo-overlapped band views in XLA (the halo
is 2h+2 rows per band — ~3% overhead at the default band height) and
the kernel masks eligibility against the GLOBAL row coordinate, so
band boundaries are invisible in the output. A (256, 256²) chunk runs
as one band per frame; (32, 2048²) runs 8 bands per frame.

Mosaic survival notes (CLAUDE.md rulebook):
- every window/gradient access is a STATIC in-bounds slice of the
  band (no pads, no -inf borders inside the kernel); the caller
  wrap-pads the frame by 1 px, reproducing the reference's numba
  negative-index quirk at row/col 0, and zero-pads band overhang
  (only ineligible centers ever read those rows);
- the SVD factors of the unit-vector masks enter as python float
  immediates (kernels may not capture constant ARRAYS);
- iotas are 2D broadcasted_iota; no reshapes or middle-axis squeezes
  (the tile reduction is two selection MATMULS per quantity, which
  also puts the only heavy contraction on the MXU);
- the threshold and the band's global row offset ride in SMEM.

Semantics are identical to identify_maps + the tile reduction in
ops/identify._identify_compact (pinned by tests/test_identify_pallas
in interpret mode and by the device parity check in bench.py).

Reference behavior matched: picasso/localize.py:98 (_local_maxima
first-argmax tie-break), :203 (_net_gradient), :122 (the extra -1 on
the high eligibility border).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from picasso_tpu.ops.identify import _svd_factors


def _identify_band_kernel(
    band_ref, scal_ref, mask_out, loc_out, ng_out,
    *, box, X, band_px, Yg, cols, rows, T, TyB, TxG,
):
    """One halo'd row band: ``band_ref`` is (1, R, X+2) f32 with
    R = band_px + 2h + 2; local row k holds global frame row
    off + k - h - 1 (off = scal_ref[0, 1], a multiple of T), where
    rows beyond the frame are the caller's zero padding and row
    off - h - 1 == -1 is the wrap row when off == 0. Centers are the
    band_px global rows [off, off + band_px); eligibility is masked
    against the GLOBAL coordinate."""
    h = box // 2
    Ix = X - 2 * h - 1  # eligible center cols: x in [h, X-h-2]
    band = band_ref[0]  # (R, X+2)
    # offsets ride as f32 (multiples of T < 2^24: exact) — one SMEM
    # operand instead of two
    off = scal_ref[0, 1].astype(jnp.int32)

    # center value at window offset (dy, dx) for all band centers:
    # global row off+yl+dy -> band row yl + dy + h + 1
    def win(dy, dx):
        return jax.lax.slice(
            band,
            (h + 1 + dy, 1 + h + dx),
            (h + 1 + dy + band_px, 1 + h + dx + Ix),
        )

    center = win(0, 0)

    # --- first-argmax local maxima: strictly greater than everything
    # EARLIER in row-major window order, >= everything later ---
    neg = jnp.float32(-jnp.inf)
    above = jnp.full((band_px, Ix), neg)
    left = jnp.full((band_px, Ix), neg)
    right = jnp.full((band_px, Ix), neg)
    below = jnp.full((band_px, Ix), neg)
    for dy in range(-h, h + 1):
        for dx in range(-h, h + 1):
            if dy == 0 and dx == 0:
                continue
            w = win(dy, dx)
            if dy < 0:
                above = jnp.maximum(above, w)
            elif dy > 0:
                below = jnp.maximum(below, w)
            elif dx < 0:
                left = jnp.maximum(left, w)
            else:
                right = jnp.maximum(right, w)
    is_max = (
        (center > above)
        & (center > left)
        & (center >= right)
        & (center >= below)
    )

    # --- net gradient: rank-3 separable correlation on the VPU ---
    # gradient row k covers global row off+k-h (k in [0, band_px+2h));
    # gy = f[r+1] - f[r-1] with the wrap row in the band's margin.
    G = band_px + 2 * h  # gradient rows covering all windows
    gy = (
        jax.lax.slice(band, (2, 1), (2 + G, X + 1))
        - jax.lax.slice(band, (0, 1), (G, X + 1))
    )
    gx = (
        jax.lax.slice(band, (1, 2), (1 + G, X + 2))
        - jax.lax.slice(band, (1, 0), (1 + G, X))
    )
    # ng(y, x) = sum_ij uy[i,j] gy[y+i-h, x+j-h] + ux[i,j] gx[...];
    # uy = sum_r cols_r (x) rows_r and ux = uy^T swaps the factor
    # roles. Row pass first (j over x), then column pass (i over y):
    # center yl's window gradient rows are band gradient rows yl+i.
    ng = jnp.zeros((band_px, Ix), jnp.float32)
    for r in range(len(cols)):
        tmp_y = jnp.zeros((G, Ix), jnp.float32)
        tmp_x = jnp.zeros((G, Ix), jnp.float32)
        for j in range(box):
            gy_j = jax.lax.slice(gy, (0, j), (G, j + Ix))
            gx_j = jax.lax.slice(gx, (0, j), (G, j + Ix))
            tmp_y = tmp_y + jnp.float32(rows[r][j]) * gy_j
            tmp_x = tmp_x + jnp.float32(cols[r][j]) * gx_j
        for i in range(box):
            ty_i = jax.lax.slice(tmp_y, (i, 0), (i + band_px, Ix))
            tx_i = jax.lax.slice(tmp_x, (i, 0), (i + band_px, Ix))
            ng = ng + jnp.float32(cols[r][i]) * ty_i
            ng = ng + jnp.float32(rows[r][i]) * tx_i

    # global-row eligibility (the x interior is eligibility-exact
    # already): h <= g < Yg - h - 1 — masks band overhang into the
    # zero padding and the reference's high-border exclusion
    gyy = (
        jax.lax.broadcasted_iota(jnp.int32, (band_px, Ix), 0) + off
    )
    elig = (gyy >= h) & (gyy < Yg - h - 1)
    mask = (
        is_max & elig & (ng > scal_ref[0, 0])
    ).astype(jnp.float32)

    # --- (T, T) tile reduction as two selection matmuls per quantity
    # (no reshapes; the <=1-hit-per-tile invariant makes plain sums
    # exact: each output element has at most one nonzero term).
    # off is a multiple of T, so band-local tiles ARE global tiles. ---
    yi = jax.lax.broadcasted_iota(jnp.int32, (band_px, TyB), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (band_px, TyB), 1)
    Py = (yi // T == ti).astype(jnp.float32)  # (band_px, TyB)
    xi = jax.lax.broadcasted_iota(jnp.int32, (Ix, TxG), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (Ix, TxG), 1)
    Px = ((xi + h) // T == tj).astype(jnp.float32)  # (Ix, TxG)

    gxx = jax.lax.broadcasted_iota(jnp.int32, (band_px, Ix), 1) + h
    locval = ((gyy % T) * T + gxx % T).astype(jnp.float32)

    hp = jax.lax.Precision.HIGHEST

    def tile_reduce(a):
        left_ = jax.lax.dot_general(
            Py, a, (((0,), (0,)), ((), ())), precision=hp,
            preferred_element_type=jnp.float32,
        )  # (TyB, Ix)
        return jax.lax.dot_general(
            left_, Px, (((1,), (0,)), ((), ())), precision=hp,
            preferred_element_type=jnp.float32,
        )  # (TyB, TxG)

    mask_out[0, :, :] = tile_reduce(mask)
    loc_out[0, :, :] = tile_reduce(mask * locval)
    ng_out[0, :, :] = tile_reduce(mask * ng)


def _band_plan(Y: int, X: int, T: int) -> int:
    """Centers per band, a multiple of T: whole frame when the band
    working set (~6 live (R, X) f32 arrays) fits comfortably in the
    ~16 MB VMEM, else capped so it does."""
    whole = -(-Y // T) * T
    cap = max(T, 262144 // max(X, 1))
    cap = max(T, cap // T * T)
    return min(whole, cap)


def identify_tiles_pallas(
    frames: jnp.ndarray,
    minimum_ng,
    box: int,
    interpret: bool = False,
    band_px: int | None = None,
):
    """Per-tile (mask, loc, ng) arrays for a frame batch, each
    (B, ceil(Y/T), ceil(X/T)) f32 — drop-in for the tile-reduction
    stage of ops/identify._identify_compact."""
    B, Y, X = frames.shape
    h = box // 2
    T = h + 1
    TyG, TxG = -(-Y // T), -(-X // T)
    if band_px is None:
        band_px = _band_plan(Y, X, T)
    band_px = max(T, band_px // T * T)
    nb = -(-TyG * T // band_px)
    TyB = band_px // T
    R = band_px + 2 * h + 2

    fw = jnp.pad(
        frames.astype(jnp.float32), ((0, 0), (1, 1), (1, 1)),
        mode="wrap",
    )  # fw[:, 1+y, 1+x] == frames[:, y, x]
    # band t needs fw rows [t*band_px - h, t*band_px + band_px + h+2)
    # (fw row = frame row + 1): pad h rows on top and whatever the
    # last band overhangs on the bottom — only ineligible centers
    # read padding
    bottom = (nb - 1) * band_px + R - h - (Y + 2)
    fwp = jnp.pad(fw, ((0, 0), (h, max(bottom, 0)), (0, 0)))
    bands = jnp.stack(
        [
            jax.lax.slice_in_dim(fwp, t * band_px, t * band_px + R, axis=1)
            for t in range(nb)
        ],
        axis=1,
    ).reshape(B * nb, R, X + 2)
    # per-band scalars: [threshold, global row offset]
    scal = jnp.stack(
        [
            jnp.full((B * nb,), minimum_ng, jnp.float32),
            jnp.tile(
                jnp.arange(nb, dtype=jnp.float32) * band_px, B
            ),
        ],
        axis=1,
    ).astype(jnp.float32)
    # offsets ride as f32 and convert exactly (multiples of T < 2^24)
    scal = scal.astype(jnp.float32)

    cols, rows = _svd_factors(box)
    kernel = functools.partial(
        _identify_band_kernel,
        box=box, X=X, band_px=band_px, Yg=Y,
        cols=tuple(map(tuple, cols.astype(np.float64).tolist())),
        rows=tuple(map(tuple, rows.astype(np.float64).tolist())),
        T=T, TyB=TyB, TxG=TxG,
    )
    out_spec = pl.BlockSpec(
        (1, TyB, TxG), lambda g: (g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tm, tl, tn = pl.pallas_call(
        kernel,
        grid=(B * nb,),
        in_specs=[
            pl.BlockSpec(
                (1, R, X + 2), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2), lambda g: (g, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B * nb, TyB, TxG), jnp.float32),
            jax.ShapeDtypeStruct((B * nb, TyB, TxG), jnp.float32),
            jax.ShapeDtypeStruct((B * nb, TyB, TxG), jnp.float32),
        ),
        interpret=interpret,
    )(bands, scal)
    if nb * TyB != TyG:
        tm = tm.reshape(B, nb * TyB, TxG)[:, :TyG]
        tl = tl.reshape(B, nb * TyB, TxG)[:, :TyG]
        tn = tn.reshape(B, nb * TyB, TxG)[:, :TyG]
    else:
        tm = tm.reshape(B, TyG, TxG)
        tl = tl.reshape(B, TyG, TxG)
        tn = tn.reshape(B, TyG, TxG)
    return tm, tl, tn


_SUPPORTED: dict[tuple[int, int, int], bool] = {}


def pallas_supported(shape: tuple[int, int, int], box: int) -> bool:
    """Compile-probe per (Y, X, box): the band plus the correlation
    intermediates must fit VMEM, which the 7x7 probe cannot vouch for
    at other sizes."""
    key = (shape[1], shape[2], box)
    if key not in _SUPPORTED:
        try:
            # the only caller sits inside the jitted _identify_compact:
            # without compile-time eval the probe would stage into the
            # enclosing trace and np.asarray would raise on a tracer,
            # permanently caching False
            with jax.ensure_compile_time_eval():
                probe = jnp.ones(
                    (1, shape[1], shape[2]), jnp.float32
                )
                out = identify_tiles_pallas(probe, 1.0, box)
                np.asarray(out[0])
            _SUPPORTED[key] = True
        except Exception as exc:
            from picasso_tpu.ops import _probe

            if _probe.probe_failure_permanent(
                exc, _probe.current_platform()
            ):
                _SUPPORTED[key] = False
            else:
                # transient backend weather: report, do NOT cache
                _probe.note_transient("identify", exc)
                return False
    return _SUPPORTED[key]


def identify_mode() -> str | None:
    """Routing for the fused identify kernel: ``None`` keeps the XLA
    maps (current default pending on-chip measurement);
    PICASSO_TPU_IDENTIFY=pallas forces Mosaic, =interpret the
    interpreter (CPU tests). Read at trace time."""
    env = os.environ.get("PICASSO_TPU_IDENTIFY", "auto")
    if env == "pallas":
        return "mosaic"
    if env == "interpret":
        return "interpret"
    return None
