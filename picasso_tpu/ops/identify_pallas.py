"""Fused Pallas TPU kernel for spot identification.

One VMEM pass per frame computes everything the compaction needs —
local maxima, the rank-3 separable net-gradient correlation, the
threshold, and the (T, T)-tile reduction — and writes only the
1/T²-resolution tile arrays back to HBM. The XLA path
(ops/identify.identify_maps) materializes the full-resolution
net-gradient and mask maps plus several windowed-max intermediates in
HBM and runs the banded correlation as dense (S, S+2h) MXU matmuls
(S+2h MACs per output for a true bandwidth of 2h+1); in VMEM the VPU
does the true 84-FMA/px separable correlation and the 48-slice window
maxima for (almost) free, so the kernel's HBM traffic is one f32
frame read + three tile-grid writes.

Mosaic survival notes (CLAUDE.md rulebook):
- everything is interior-only: eligible centers are h <= y < Y-h-1
  exactly, so every window/gradient slice is a STATIC in-bounds slice
  — no pads, no -inf borders, no wraparound logic (the caller
  wrap-pads the frame by 1 px, reproducing the reference's numba
  negative-index quirk at row/col 0);
- the SVD factors of the unit-vector masks enter as python float
  immediates (kernels may not capture constant ARRAYS);
- iotas are 2D broadcasted_iota; no reshapes or middle-axis squeezes
  (the tile reduction is two selection MATMULS per quantity, which
  also puts the only heavy contraction on the MXU);
- the threshold rides in SMEM.

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


def _identify_tile_kernel(
    fw_ref, thresh_ref, mask_out, loc_out, ng_out,
    *, box, Y, X, cols, rows, T, TyG, TxG,
):
    h = box // 2
    Iy = Y - 2 * h - 1  # eligible center rows: y in [h, Y-h-2]
    Ix = X - 2 * h - 1
    fw = fw_ref[0]  # (Y+2, X+2); fw[1+y, 1+x] == frames[y, x]

    # window slice of CENTER values at offset (dy, dx): centers
    # y in [h, Y-h-2] -> frame rows y+dy in [h+dy, Y-h-2+dy], i.e.
    # fw rows [1+h+dy, 1+h+dy+Iy)
    def win(dy, dx):
        return jax.lax.slice(
            fw,
            (1 + h + dy, 1 + h + dx),
            (1 + h + dy + Iy, 1 + h + dx + Ix),
        )

    center = win(0, 0)

    # --- first-argmax local maxima: strictly greater than everything
    # EARLIER in row-major window order, >= everything later ---
    neg = jnp.float32(-jnp.inf)
    above = jnp.full((Iy, Ix), neg)
    left = jnp.full((Iy, Ix), neg)
    right = jnp.full((Iy, Ix), neg)
    below = jnp.full((Iy, Ix), neg)
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
    # gy[y, x] = f[y+1, x] - f[y-1, x] for frame rows 0..Y-1 (row 0
    # reads the wrap row, the reference's numba quirk); gx likewise.
    gy = (
        jax.lax.slice(fw, (2, 1), (Y + 2, X + 1))
        - jax.lax.slice(fw, (0, 1), (Y, X + 1))
    )
    gx = (
        jax.lax.slice(fw, (1, 2), (Y + 1, X + 2))
        - jax.lax.slice(fw, (1, 0), (Y + 1, X))
    )
    # ng(y, x) = sum_ij uy[i,j] gy[y+i-h, x+j-h] + ux[i,j] gx[...];
    # uy = sum_r cols_r (x) rows_r and ux = uy^T swaps the factor
    # roles. Row pass first (j over x), then column pass (i over y).
    ng = jnp.zeros((Iy, Ix), jnp.float32)
    for r in range(len(cols)):
        tmp_y = jnp.zeros((Y, Ix), jnp.float32)
        tmp_x = jnp.zeros((Y, Ix), jnp.float32)
        for j in range(box):
            gy_j = jax.lax.slice(gy, (0, j), (Y, j + Ix))
            gx_j = jax.lax.slice(gx, (0, j), (Y, j + Ix))
            tmp_y = tmp_y + jnp.float32(rows[r][j]) * gy_j
            tmp_x = tmp_x + jnp.float32(cols[r][j]) * gx_j
        for i in range(box):
            ty_i = jax.lax.slice(tmp_y, (i, 0), (i + Iy, Ix))
            tx_i = jax.lax.slice(tmp_x, (i, 0), (i + Iy, Ix))
            ng = ng + jnp.float32(cols[r][i]) * ty_i
            ng = ng + jnp.float32(rows[r][i]) * tx_i

    mask = (is_max & (ng > thresh_ref[0, 0])).astype(jnp.float32)

    # --- (T, T) tile reduction as two selection matmuls per quantity
    # (no reshapes; the <=1-hit-per-tile invariant makes plain sums
    # exact: each output element has at most one nonzero term) ---
    yi = jax.lax.broadcasted_iota(jnp.int32, (Iy, TyG), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (Iy, TyG), 1)
    Py = ((yi + h) // T == ti).astype(jnp.float32)  # (Iy, TyG)
    xi = jax.lax.broadcasted_iota(jnp.int32, (Ix, TxG), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (Ix, TxG), 1)
    Px = ((xi + h) // T == tj).astype(jnp.float32)  # (Ix, TxG)

    gyy = jax.lax.broadcasted_iota(jnp.int32, (Iy, Ix), 0) + h
    gxx = jax.lax.broadcasted_iota(jnp.int32, (Iy, Ix), 1) + h
    locval = ((gyy % T) * T + gxx % T).astype(jnp.float32)

    hp = jax.lax.Precision.HIGHEST

    def tile_reduce(a):
        left_ = jax.lax.dot_general(
            Py, a, (((0,), (0,)), ((), ())), precision=hp,
            preferred_element_type=jnp.float32,
        )  # (TyG, Ix)
        return jax.lax.dot_general(
            left_, Px, (((1,), (0,)), ((), ())), precision=hp,
            preferred_element_type=jnp.float32,
        )  # (TyG, TxG)

    mask_out[0, :, :] = tile_reduce(mask)
    loc_out[0, :, :] = tile_reduce(mask * locval)
    ng_out[0, :, :] = tile_reduce(mask * ng)


def identify_tiles_pallas(
    frames: jnp.ndarray,
    minimum_ng,
    box: int,
    interpret: bool = False,
):
    """Per-tile (mask, loc, ng) arrays for a frame batch, each
    (B, ceil(Y/T), ceil(X/T)) f32 — drop-in for the tile-reduction
    stage of ops/identify._identify_compact."""
    B, Y, X = frames.shape
    h = box // 2
    T = h + 1
    TyG, TxG = -(-Y // T), -(-X // T)
    fw = jnp.pad(
        frames.astype(jnp.float32), ((0, 0), (1, 1), (1, 1)),
        mode="wrap",
    )
    cols, rows = _svd_factors(box)
    kernel = functools.partial(
        _identify_tile_kernel,
        box=box, Y=Y, X=X,
        cols=tuple(map(tuple, cols.astype(np.float64).tolist())),
        rows=tuple(map(tuple, rows.astype(np.float64).tolist())),
        T=T, TyG=TyG, TxG=TxG,
    )
    thresh = jnp.asarray(minimum_ng, jnp.float32).reshape(1, 1)
    out_spec = pl.BlockSpec(
        (1, TyG, TxG), lambda b: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, Y + 2, X + 2), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, TyG, TxG), jnp.float32),
            jax.ShapeDtypeStruct((B, TyG, TxG), jnp.float32),
            jax.ShapeDtypeStruct((B, TyG, TxG), jnp.float32),
        ),
        interpret=interpret,
    )(fw, thresh)


_SUPPORTED: dict[tuple[int, int, int], bool] = {}


def pallas_supported(shape: tuple[int, int, int], box: int) -> bool:
    """Compile-probe per (Y, X, box): the whole padded frame plus the
    correlation intermediates must fit VMEM, which the 7x7 probe
    cannot vouch for at other sizes."""
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
        except Exception:
            _SUPPORTED[key] = False
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
