"""Fused device-resident localize: identify → ROI cut → photon
conversion → Gaussian fit as ONE XLA program per frame chunk.

The reference pipeline is identify (threads) → cut spots on host
(numba) → fit (threads/GPU) with the movie decoded twice
(picasso/localize.py:639/:917/:1344).  Round 2's streamed path already
fused identify+cut into one decode pass, but the ROIs still
round-tripped: device identify → host readback → host cut → re-upload
to the fitter.  On the tunneled TPU backend (host↔device ≈ 25–40 MB/s)
that readback+re-upload is ~3× the frame bytes and dominates the
end-to-end wall time (VERDICT r2 weak #1).

Here the frames upload ONCE in their native dtype (u16 = half the f32
bytes) and everything else stays in HBM:

  frames (B, Y, X) u16 ──▶ identify maps ──▶ compact hit list (size,)
        │                                         │
        └────────── gather (box, box, size) ROIs ◀┘
                        │  (one XLA gather, lanes-last fit layout)
                        ▼
         (raw − baseline)·factor  →  Newton/LM fit core
                        ▼
        readback: hit list + thetas/CRLBs — ~60 B/spot instead of
        box²·(2 + 4·2) ≈ 500 B/spot of ROI traffic.

The per-chunk hit list is compacted to a power-of-two bucket
(``size``) exactly like ops/identify.py; fill rows (frame == -1) cut a
clamped patch from frame 0 and fit garbage that is trimmed on host —
with power-of-two buckets that wastes <2× fit FLOPs, and one padded
bucket beats many sizes on TPU (one compiled program, CLAUDE.md perf
rules).  Spots are frozen in the fit cores once converged, so results
are bit-identical to the unfused spot-batch path regardless of chunk
grouping (tests/test_fused.py pins this).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from picasso_tpu.ops import lq as _lq
from picasso_tpu.ops import mle as _mle
from picasso_tpu.ops.identify import _identify_compact

__all__ = [
    "identify_cut_fit",
    "cut_rois_t",
    "cut_rois_t_blocks",
    "cut_rois_t_shift",
    "cut_rois_t_slab",
    "cut_rois_t_wincols",
    "cut_rois_t_winrows",
    "cut_rois_t_span",
    "cut_rois_t_spanblocks",
    "localize_fused",
]

#: speculative hit-bucket per frame-chunk shape (see ops/identify.py)
_BUCKET_HINT: dict[tuple[int, ...], int] = {}
_DEFAULT_BUCKET = 4096


#: column-block width for the windowed row gather on wide frames;
#: 2·_BLOCK must be ≥ box and _BLOCK must divide the frame width
_BLOCK = 64
#: frame width above which the block-windowed gather wins (measured
#: on TPU v5e, 131k spots: full-width 12.7 ms vs block 22.7 ms at
#: X=256, but 33.1 ms vs 22.7 ms at X=1024 — the block gather's cost
#: is X-independent while full rows + one-hot scale with X)
_BLOCK_MIN_X = 1024


def cut_rois_t(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Gather (box, box, N) ROIs from device-resident frames — the
    lanes-last layout the fit cores consume directly.  Eligible hits
    are ≥ half from every border (ops/identify.py bounds), so real
    windows never leave the frame; fill rows (f == -1) clamp to frame
    0's corner and are trimmed by the caller."""
    r = box // 2
    fc = jnp.maximum(f, 0)
    yc = jnp.maximum(y, r)
    xc = jnp.maximum(x, r)
    N = fc.shape[0]
    B, Y, X = frames.shape
    offs = jnp.arange(-r, r + 1)

    # out[i, j, n] = frames[f[n], y[n]+i-r, x[n]+j-r], in two stages
    # measured on TPU v5e (131k spots from (256, 256²) frames):
    # 1. ROWS via advanced indexing — (N, box) gathers of
    #    X-contiguous lines, DMA-friendly (vs 90 ms for the one-shot
    #    elementwise gather and 310 ms for a vmapped dynamic_slice:
    #    XLA lowers both to slow scalar gathers);
    # 2. the column window via an exact f32 one-hot einsum — the MXU
    #    performs the per-spot column gather.
    # On wide frames (X ≥ _BLOCK_MIN_X) stage 1 instead gathers only
    # the two aligned 64-px column blocks containing each window
    # (frames viewed as (B, Y, X/64, 64)), capping the gather traffic
    # and the one-hot contraction at 128 regardless of X. A manual
    # bf16-split einsum (2 DEFAULT passes, exact for u16 data) was
    # measured SLOWER than the HIGHEST f32 einsum at every width —
    # the extra bf16 intermediates cost more than the saved passes.
    if X >= _BLOCK_MIN_X and X % _BLOCK == 0 and box <= _BLOCK:
        nb = X // _BLOCK
        fr = frames.reshape(B, Y, nb, _BLOCK)
        bx = jnp.clip((xc - r) // _BLOCK, 0, nb - 2)  # (N,)
        bsel = bx[:, None, None] + jnp.arange(2)[None, None, :]
        rows = fr[
            fc[:, None, None],
            (yc[:, None] + offs[None, :])[:, :, None],
            bsel,
        ]  # (N, box, 2, _BLOCK)
        rows = rows.reshape(N, box, 2 * _BLOCK).astype(jnp.float32)
        cols = (xc - bx * _BLOCK)[:, None] + offs[None, :]
        W = 2 * _BLOCK
    else:
        rows = frames[
            fc[:, None], yc[:, None] + offs[None, :], :
        ].astype(jnp.float32)  # (N, box, X)
        cols = xc[:, None] + offs[None, :]  # (N, box)
        W = X
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (N, W, box), 1)
        == cols[:, None, :]
    ).astype(jnp.float32)
    patches = jnp.einsum(
        "nix,nxj->nij", rows, onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.transpose(patches, (1, 2, 0))


def cut_rois_t_blocks(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Tile-block formulation of :func:`cut_rois_t` (same contract:
    (box, box, N) lanes-last ROIs).

    The row-gather form moves box rows x full frame width per spot
    (box=7, X=256: ~7 KB of f32 per 196-byte window — 97% waste).
    Here the frame is viewed as aligned (T, T) blocks (T = box//2+1,
    the compaction tile), and each window is covered by the 3x3 block
    patch that contains it: one (N, 9) gather of T*T-element
    contiguous rows in the movie's NATIVE dtype (~300 B/spot for u16),
    then the (box, box) window is sliced out of the assembled
    (3T, 3T) superpatch with two per-spot one-hot contractions of
    static shape (3T -> box on each axis, MXU work).

    Eligible hits satisfy r <= y < Y-r-1 (ops/identify bounds), so a
    window never leaves the frame; the block-row index only needs the
    usual fill-row clamps. Padding Y/X up to block multiples is
    gather-only (padded blocks are never addressed by real hits)."""
    r = box // 2
    T = r + 1
    S = 3 * T  # superpatch side; box <= 2T+1 <= S always holds
    B, Y, X = frames.shape
    if Y < 3 * T or X < 3 * T:
        # fewer than 3 tile-blocks on an axis: the 3x3 patch cannot
        # exist — the row cut handles tiny frames correctly
        return cut_rois_t(frames, f, y, x, box)
    fc = jnp.maximum(f, 0)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    N = fc.shape[0]
    Yp, Xp = -(-Y // T) * T, -(-X // T) * T
    if (Yp, Xp) != (Y, X):
        frames = jnp.pad(frames, ((0, 0), (0, Yp - Y), (0, Xp - X)))
    nby, nbx = Yp // T, Xp // T
    blocks = (
        frames.reshape(B, nby, T, nbx, T)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * nby * nbx, T * T)
    )
    b0y = jnp.clip((yc - r) // T, 0, nby - 3)
    b0x = jnp.clip((xc - r) // T, 0, nbx - 3)
    base = (fc * nby + b0y) * nbx + b0x
    offs = (
        jnp.arange(3, dtype=base.dtype)[:, None] * nbx
        + jnp.arange(3, dtype=base.dtype)[None, :]
    ).ravel()
    gathered = blocks[base[:, None] + offs[None, :]]  # (N, 9, T*T)
    sup = (
        gathered.reshape(N, 3, 3, T, T)
        .transpose(0, 1, 3, 2, 4)
        .reshape(N, S, S)
        .astype(jnp.float32)
    )
    dy = (yc - r - b0y * T)[:, None]  # in [0, 2T-2]
    dx = (xc - r - b0x * T)[:, None]
    hp = jax.lax.Precision.HIGHEST
    oh_y = (
        jax.lax.broadcasted_iota(jnp.int32, (N, S, box), 1)
        == dy[:, :, None] + jnp.arange(box)[None, None, :]
    ).astype(jnp.float32)
    oh_x = (
        jax.lax.broadcasted_iota(jnp.int32, (N, S, box), 1)
        == dx[:, :, None] + jnp.arange(box)[None, None, :]
    ).astype(jnp.float32)
    rows7 = jnp.einsum("nyi,nyx->nix", oh_y, sup, precision=hp)
    patches = jnp.einsum("nix,nxj->nij", rows7, oh_x, precision=hp)
    return jnp.transpose(patches, (1, 2, 0))


def _span_gather(flat, fc, start, length):
    """Gather N contiguous *length*-element slices from a (G, L)
    operand at (group fc[n], offset start[n]).  One gather of N long
    rows — the round-4 measurement that motivated it: gather cost on
    this workload is dominated by ROW COUNT (~10 ns/row), not bytes,
    so N slices of box·X beat the advanced-indexing form's N·box
    slices of X by ~the row ratio.  Callers guarantee
    start + length <= L (hit eligibility bounds), so the lowering can
    skip clamping."""
    starts = jnp.stack(
        [fc.astype(jnp.int32), start.astype(jnp.int32)], axis=1
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        flat, starts, dn, slice_sizes=(1, length),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def cut_rois_t_span(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Row-span formulation of :func:`cut_rois_t` (same contract:
    (box, box, N) lanes-last ROIs).

    A window's box rows are CONTIGUOUS in frame memory: rows
    y−r … y+r of frame f are one (box·X)-element slice of the
    flattened (B, Y·X) movie.  One native-dtype gather of N such
    slices replaces the row form's N·box separate X-element rows —
    7× fewer gather rows for box=7 — and feeds the same exact-f32
    one-hot column contraction (the MXU performs the per-spot column
    gather)."""
    r = box // 2
    B, Y, X = frames.shape
    # _span_gather promises in-bounds starts: clamp f on both sides
    fc = jnp.clip(f, 0, B - 1)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    N = fc.shape[0]
    flat = frames.reshape(B, Y * X)
    span = _span_gather(flat, fc, (yc - r) * X, box * X)
    rows = span.reshape(N, box, X).astype(jnp.float32)
    cols = xc[:, None] + jnp.arange(-r, r + 1)[None, :]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (N, X, box), 1)
        == cols[:, None, :]
    ).astype(jnp.float32)
    patches = jnp.einsum(
        "nix,nxj->nij", rows, onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.transpose(patches, (1, 2, 0))


def cut_rois_t_spanblocks(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Span gather in a column-blocked movie view — the wide-frame
    variant of :func:`cut_rois_t_span`.

    The movie is first transposed to (B, X/64, Y, 64) — a one-time
    bandwidth-cheap reshuffle per chunk — after which the box rows of
    one 64-px column block are a contiguous (box·64)-element slice.
    Each window lives in two adjacent blocks: 2N span rows replace
    the windowed row form's N·box·2 gather rows, and the one-hot
    contraction stays capped at K = 128 regardless of X."""
    r = box // 2
    B, Y, X = frames.shape
    if X % _BLOCK or X < 2 * _BLOCK or box > _BLOCK:
        return cut_rois_t_span(frames, f, y, x, box)
    nb = X // _BLOCK
    fr = (
        frames.reshape(B, Y, nb, _BLOCK)
        .transpose(0, 2, 1, 3)
        .reshape(B * nb, Y * _BLOCK)
    )
    # _span_gather promises in-bounds starts: clamp f on both sides
    fc = jnp.clip(f, 0, B - 1)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    N = fc.shape[0]
    bx = jnp.clip((xc - r) // _BLOCK, 0, nb - 2)
    grp = (fc * nb + bx)[:, None] + jnp.arange(2)[None, :]  # (N, 2)
    row0 = jnp.broadcast_to(((yc - r) * _BLOCK)[:, None], grp.shape)
    span = _span_gather(
        fr, grp.ravel(), row0.ravel(), box * _BLOCK
    )  # (2N, box*_BLOCK)
    rows = (
        span.reshape(N, 2, box, _BLOCK)
        .transpose(0, 2, 1, 3)
        .reshape(N, box, 2 * _BLOCK)
        .astype(jnp.float32)
    )
    cols = (xc - bx * _BLOCK)[:, None] + jnp.arange(-r, r + 1)[None, :]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (N, 2 * _BLOCK, box), 1)
        == cols[:, None, :]
    ).astype(jnp.float32)
    patches = jnp.einsum(
        "nix,nxj->nij", rows, onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.transpose(patches, (1, 2, 0))


def _barrel_extract(arr, start, axis, out: int, batch_axis: int = 0):
    """Extract ``out`` consecutive elements along ``axis`` at a
    per-spot dynamic offset ``start`` (axis 0 is the spot batch) via a
    coarse-to-fine barrel shifter: one conditional static-slice select
    per bit of the offset range, each over a strictly NARROWING array.

    Motivation (round 4, measured cost model of the ROI cut): the
    one-hot einsum column gather lowers to an N-batched tiny matmul
    whose cost is per-batch-element overhead, not FLOPs (~33 ns/spot
    regardless of contraction width K — the K=12 blocks einsums cost
    the same as the K=256 rows one).  The barrel form is pure
    elementwise selects, HBM-bound at ~2× the operand bytes summed
    over the narrowing widths (geometric-ish: Σ widths ≈ out·log₂R +
    2R), and runs in the movie's NATIVE dtype — no f32 blow-up of the
    intermediates.

    Invariants: ``0 <= start <= shape[axis] - out`` (callers clamp).
    Exact for every dtype (selects never do arithmetic).

    ``batch_axis`` picks where the spot batch lives: 0 (batch-major
    gathers) or -1 (lanes-last layouts — there the narrowing widths
    live on a SUBLANE axis and pad to multiples of 8 instead of the
    128-lane quantum, which is what makes the ``wincols`` cut's
    select traffic match the arithmetic model).
    """
    w = arr.shape[axis]
    r = w - out
    if r <= 0:
        return arr
    s = start.astype(jnp.int32)
    if batch_axis in (0,):
        bshape = [arr.shape[0]] + [1] * (arr.ndim - 1)
    else:
        bshape = [1] * (arr.ndim - 1) + [arr.shape[-1]]
    d = 1 << (r.bit_length() - 1)
    while d >= 1:
        # both branches must hold a window wherever it can now sit:
        # after this step the offset is < d, so width out+d-1 always
        # suffices (and the first step has r < 2d by construction)
        w2 = max(w - d, out + d - 1)
        pad = d + w2 - w
        hi = arr
        if pad > 0:
            cfg = [(0, 0)] * arr.ndim
            cfg[axis] = (0, pad)
            hi = jnp.pad(arr, cfg)
        hi = jax.lax.slice_in_dim(hi, d, d + w2, axis=axis)
        lo = jax.lax.slice_in_dim(arr, 0, w2, axis=axis)
        take = s >= d
        arr = jnp.where(take.reshape(bshape), hi, lo)
        s = s - d * take.astype(jnp.int32)
        w = w2
        d >>= 1
    return arr


def cut_rois_t_shift(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Barrel-shift formulation of :func:`cut_rois_t` (same contract:
    (box, box, N) lanes-last f32 ROIs).

    Stage 1 is the same fast-path row gather (box whole trailing-axis
    rows per spot) but kept in the movie's NATIVE dtype; stage 2
    replaces the one-hot MXU einsum with :func:`_barrel_extract` over
    the column axis — log₂X conditional selects over narrowing u16
    intermediates instead of an N-batched (box, X)·(X, box) matmul.
    """
    r = box // 2
    fc = jnp.maximum(f, 0)
    B, Y, X = frames.shape
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    offs = jnp.arange(-r, r + 1)
    rows = frames[fc[:, None], yc[:, None] + offs[None, :], :]
    win = _barrel_extract(rows, xc - r, 2, box)  # (N, box, box)
    return jnp.transpose(win, (1, 2, 0)).astype(jnp.float32)


#: row-slab height for cut_rois_t_slab — windows of box <= _SLAB + 1
#: rows always fit two vertically adjacent slabs
_SLAB = 8


def cut_rois_t_slab(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Row-slab formulation of :func:`cut_rois_t` (same contract:
    (box, box, N) lanes-last f32 ROIs).

    The movie is viewed as (B, Y/8, 8·X) — an 8-row slab is ONE
    trailing-axis row, so it rides XLA:TPU's fast whole-row gather
    path (the span lesson: partial trailing slices lower to the slow
    generic path, but a reshape makes the wanted granularity the whole
    row).  Any box ≤ 9 window lives in two vertically adjacent slabs:
    the gather moves 2 rows/spot instead of the row form's box — at
    the measured ~10 ns/row overhead that is the dominant cut cost.
    The (16, X) slab pair then yields the window via two barrel
    extractions (columns first — that axis narrows 36×, the row axis
    only 2×), all in the native dtype.
    """
    r = box // 2
    B, Y, X = frames.shape
    if Y % _SLAB or Y < 2 * _SLAB or box > _SLAB + 1:
        return cut_rois_t_shift(frames, f, y, x, box)
    fc = jnp.maximum(f, 0)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    n_slab = Y // _SLAB
    fr = frames.reshape(B, n_slab, _SLAB * X)
    s0 = jnp.clip((yc - r) // _SLAB, 0, n_slab - 2)
    pair = fr[
        fc[:, None], s0[:, None] + jnp.arange(2)[None, :]
    ]  # (N, 2, 8X)
    pair = pair.reshape(pair.shape[0], 2 * _SLAB, X)
    cols = _barrel_extract(pair, xc - r, 2, box)  # (N, 16, box)
    win = _barrel_extract(
        cols, (yc - r) - s0 * _SLAB, 1, box
    )  # (N, box, box)
    return jnp.transpose(win, (1, 2, 0)).astype(jnp.float32)


#: HBM budget for the winrows overlapped-window materialization —
#: box× the chunk bytes must stay a small fraction of the 16 GB HBM
_WINROWS_MAX_BYTES = 3 << 30


def cut_rois_t_winrows(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Overlapped-window formulation of :func:`cut_rois_t` (same
    contract: (box, box, N) lanes-last f32 ROIs).

    Gather cost on this workload is ~10 ns per gather ROW, so the row
    form's box rows/spot dominate the cut.  Here the movie is first
    expanded to OVERLAPPING box-row windows — ``win[b, i] = rows
    i..i+box of frame b``, built as one fused stack of box shifted
    views, (B, Y-box+1, box·X) — after which a spot's entire ROI rows
    are ONE trailing-axis gather row: N gather rows total, box× fewer
    than the row form, at the cost of a transient box× copy of the
    chunk (u16-native; ~235 MB for a (256, 256²) chunk — guarded by
    ``_WINROWS_MAX_BYTES``).  The column window then comes from the
    same native-dtype barrel extraction as ``shift``.
    """
    r = box // 2
    B, Y, X = frames.shape
    nwin = Y - box + 1
    if (
        nwin < 1
        or B * nwin * box * X * frames.dtype.itemsize
        > _WINROWS_MAX_BYTES
    ):
        # over the window-build budget (or degenerate): the einsum
        # rows cut is the measured next-best at narrow widths
        return cut_rois_t(frames, f, y, x, box)
    fc = jnp.maximum(f, 0)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    win = jnp.stack(
        [frames[:, i:i + nwin, :] for i in range(box)], axis=2
    ).reshape(B, nwin, box * X)
    rows = win[fc, yc - r].reshape(fc.shape[0], box, X)
    out = _barrel_extract(rows, xc - r, 2, box)
    return jnp.transpose(out, (1, 2, 0)).astype(jnp.float32)


def cut_rois_t_wincols(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
) -> jnp.ndarray:
    """Lanes-last variant of :func:`cut_rois_t_winrows`.

    Same overlapped-window build and one-gather-row-per-spot pattern,
    but the gather emits the TRANSPOSED (box·X, N) layout directly
    (``offset_dims=(0,)`` puts the slice axis before the batch axis),
    so (a) the barrel extraction narrows along a SUBLANE axis — the
    intermediate widths (134, 70, 38, …) pad to multiples of 8
    instead of the 128-lane quantum that quadruples the batch-major
    barrel's HBM traffic — and (b) the result is already the
    (box, box, N) lanes-last layout the fit cores consume, removing
    the final transpose pass.
    """
    cols, xoff = gather_wincols(frames, f, y, x, box)
    if cols is None:
        return cut_rois_t(frames, f, y, x, box)
    X = frames.shape[-1]
    rows = cols.reshape(box, X, f.shape[0])
    out = _barrel_extract(rows, xoff, 1, box, batch_axis=-1)
    return out.astype(jnp.float32)


def cut_rois_t_winblocks(
    frames: jnp.ndarray,
    f: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    box: int,
    blk: int | None = None,
) -> jnp.ndarray:
    """Column-blocked overlapped-window ROI cut (round 5).

    The round-5 decomposition (tools/measure_r5c.py, docs) pinned the
    winrows cut's cost on its ROW GATHER: one whole (box·X)-wide row
    per spot is 36× overfetch at X=256 (3.6 KB fetched for a 98-byte
    ROI) and XLA's gather streams those bytes at ~1/5 of HBM BW
    (4.9 of the 8.15 ms cut). This variant blocks the columns BEFORE
    windowing: the window stack is built per PAIR of adjacent blk-px
    column blocks, so each spot's ROI rows are still ONE whole
    trailing-axis gather row (the only gather form XLA:TPU lowers
    fast — the round-4 span lesson) but of box·2·blk elements instead
    of box·X.  Costs: the window build materializes
    ~2·box·(frame bytes) once (vs box× for winrows), the gather moves
    X/(2·blk)× fewer bytes, and the barrel starts at width 2·blk
    instead of X.
    """
    import os

    if blk is None:
        # measured sweep (tools/measure_r5d.py, (256, 256²)/118k):
        # blk 8: 33.7 ms (sub-128-byte rows hit a slow gather path),
        # 16: 4.34, 32: 3.48 (best), 64: 5.69
        blk = int(os.environ.get("PICASSO_TPU_WINBLK", "32"))
    r = box // 2
    B, Y, X = frames.shape
    nwin = Y - box + 1
    nb = X // blk
    if (
        nwin < 1
        or X % blk
        or nb < 2
        or blk < box
        or B * nwin * (nb - 1) * box * 2 * blk * frames.dtype.itemsize
        > 2 * _WINROWS_MAX_BYTES
    ):
        # width-aware fallback: the blocks gather is the measured
        # next-best at wide frames, winrows at narrow ones
        if X >= _BLOCK_MIN_X:
            return cut_rois_t_blocks(frames, f, y, x, box)
        return cut_rois_t_winrows(frames, f, y, x, box)
    fc = jnp.clip(f, 0, B - 1)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    N = fc.shape[0]
    win = jnp.stack(
        [frames[:, i:i + nwin, :] for i in range(box)], axis=2
    )  # (B, nwin, box, X)
    win2 = jnp.stack(
        [win[..., b * blk:(b + 2) * blk] for b in range(nb - 1)],
        axis=2,
    ).reshape(B * nwin * (nb - 1), box * 2 * blk)
    bx = jnp.clip((xc - r) // blk, 0, nb - 2)
    rows = win2[
        (fc * nwin + (yc - r)) * (nb - 1) + bx
    ].reshape(N, box, 2 * blk)
    out = _barrel_extract(rows, xc - r - bx * blk, 2, box)
    return jnp.transpose(out, (1, 2, 0)).astype(jnp.float32)


def gather_wincols(frames, f, y, x, box):
    """The wincols overlapped-window TRANSPOSED row gather without the
    column extraction: returns (cols (box·X, N) in the movie's native
    dtype, xoff (N,) i32 in-row column offsets), or (None, None) when
    the window build exceeds the HBM budget.  Shared by
    :func:`cut_rois_t_wincols` (XLA barrel) and the fused cut+fit
    Pallas kernel (ops/winfit_pallas — barrel runs in VMEM)."""
    r = box // 2
    B, Y, X = frames.shape
    nwin = Y - box + 1
    if (
        nwin < 1
        or B * nwin * box * X * frames.dtype.itemsize
        > _WINROWS_MAX_BYTES
    ):
        return None, None
    # full clamp: the gather below PROMISES in-bounds starts, so an
    # f >= B from a caller must degrade like the sibling variants
    # (clamp to the last frame), not read undefined memory
    fc = jnp.clip(f, 0, B - 1)
    yc = jnp.clip(y, r, Y - r - 1)
    xc = jnp.clip(x, r, X - r - 1)
    win = jnp.stack(
        [frames[:, i:i + nwin, :] for i in range(box)], axis=2
    ).reshape(B * nwin, box * X)
    starts = (fc * nwin + (yc - r)).astype(jnp.int32)[:, None]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
    )
    cols = jax.lax.gather(
        win, starts, dn, slice_sizes=(1, box * X),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # (box·X, N)
    return cols, (xc - r).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "size", "eps", "max_it", "method", "use_pallas",
        "pallas_interpret",
    ),
)
def identify_cut_fit(
    frames: jnp.ndarray,
    ng_thresh: jnp.ndarray,
    baseline: jnp.ndarray,
    factor: jnp.ndarray,
    *,
    box: int,
    size: int,
    eps: float,
    max_it: int,
    method: str,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> tuple:
    """One fused device program over a frame chunk.

    ``method`` selects the fitter: ``"lq"`` (Levenberg–Marquardt,
    reference gausslq/Gpufit semantics) or the MLE Newton methods
    ``"sigmaxy"``/``"sigma"`` (reference gaussmle.py:533/:745).

    Returns (count, f, y, x, ng, thetas (6, size), crlb (6, size),
    ll (size,), iters (size,)); for ``"lq"`` crlb/ll/iters are zeros
    (the LQ path derives precision from Mortensen's formula on host,
    picasso/gausslq.py:547).
    """
    count, f, y, x, ng = _identify_compact(
        frames, ng_thresh, box, size
    )
    if use_pallas and _winfit_wanted(frames.shape[-1]):
        out = _winfit_branch(
            frames, count, f, y, x, ng, baseline, factor,
            box=box, eps=eps, max_it=max_it, method=method,
            interpret=pallas_interpret,
        )
        if out is not None:
            return out
    spots_t = _select_cut(frames.shape[-1])(frames, f, y, x, box)
    photons = (spots_t.astype(jnp.float32) - baseline) * factor
    # use_pallas routes the fit through the tiled Mosaic kernels
    # (per-512-lane-tile early exit; certified against the XLA path
    # by bench.py's on-device selftest). Requires size % TILE == 0 —
    # callers round buckets up. Measured 20.5 -> ~5 ms on the 131k-
    # spot e2e chain where the whole-bucket XLA while_loop pays
    # max-over-batch iterations.
    if method == "lq":
        if use_pallas:
            from picasso_tpu.ops import lq_pallas

            fit_lq = (
                lq_pallas.fit_pallas_boundary_t
                if _boundaries_wanted("lq")
                else lq_pallas.fit_pallas_t
            )
            theta = fit_lq(
                photons, max_it, 1e-6, interpret=pallas_interpret,
                n_valid=count,
            )
        else:
            theta = _lq._lm_core(
                photons, max_it, 1e-6, n_valid=count
            )  # (6, N)
        zeros6 = jnp.zeros_like(theta)
        zeros1 = jnp.zeros(theta.shape[1], jnp.float32)
        return (
            count, f, y, x, ng, theta, zeros6, zeros1,
            zeros1.astype(jnp.int32),
        )
    # padding lanes (>= count) start converged: the bucket's clamped
    # garbage tail must not drag tiles (or the XLA whole-batch loop)
    # to max_it — measured 100 executed iterations in every tail tile
    if use_pallas:
        from picasso_tpu.ops import mle_pallas

        fit_mle = (
            mle_pallas.fit_pallas_boundary_t
            if _boundaries_wanted(method)
            else mle_pallas.fit_pallas_t
        )
        thetas6, crlb6, ll, iters = fit_mle(
            photons, eps, max_it, method=method,
            interpret=pallas_interpret, n_valid=count,
        )
    else:
        thetas6, crlb6, ll, iters = _mle._fit_core(
            photons, eps, max_it, method=method, n_valid=count
        )
    return count, f, y, x, ng, thetas6, crlb6, ll, iters


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "size", "eps", "max_it", "method", "use_pallas",
        "pallas_interpret",
    ),
)
def identify_cut_fit_packed(
    frames: jnp.ndarray,
    ng_thresh: jnp.ndarray,
    baseline: jnp.ndarray,
    factor: jnp.ndarray,
    *,
    box: int,
    size: int,
    eps: float,
    max_it: int,
    method: str,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> tuple:
    """:func:`identify_cut_fit` with the eight per-spot result arrays
    stacked into ONE (18, size) f32 payload.

    The streamed pipeline reads back ``count`` plus a single array per
    chunk instead of eight separate device->host transfers — each of
    which is a full round-trip on a high-latency link (the r4 bench
    measured the streamed stage at 60% of the pure-upload ceiling;
    readback round-trips were the unaccounted cost). f/y/x/iters are
    integers far below 2^24, so the f32 stacking is exact.

    Payload row layout: [f, y, x, ng, theta(6), crlb(6), ll, iters]
    (18 rows); the LQ path stops after theta (10 rows) — its crlb/ll/
    iters are zeros by contract (precision comes from Mortensen's
    formula on host, picasso/gausslq.py:547), so shipping them would
    waste 44 % of the readback.
    """
    count, f, y, x, ng, theta, crlb, ll, iters = identify_cut_fit(
        frames, ng_thresh, baseline, factor, box=box, size=size,
        eps=eps, max_it=max_it, method=method, use_pallas=use_pallas,
        pallas_interpret=pallas_interpret,
    )
    rows = [
        f[None].astype(jnp.float32),
        y[None].astype(jnp.float32),
        x[None].astype(jnp.float32),
        ng[None].astype(jnp.float32),
        theta.astype(jnp.float32),
    ]
    if method != "lq":
        rows += [
            crlb.astype(jnp.float32),
            ll[None].astype(jnp.float32),
            iters[None].astype(jnp.float32),
        ]
    return count, jnp.concatenate(rows, axis=0)


#: flips to True when the on-chip A/B shows the fused cut+fit kernel
#: beating the winrows default on narrow frames (measured, not
#: inferred — tools/measure_chain.py chain:winfit row)
_WINFIT_AUTO = False


def _boundaries_wanted(method: str = "sigmaxy") -> bool:
    """Phase-boundary straggler compaction in the Pallas fit
    (ops/mle_pallas.fit_pallas_boundary_t): PICASSO_TPU_FIT_BOUNDARY
    = "1"/"0" to force; "auto" (default) enables it for the MLE
    methods only. Measured on chip (tools/measure_r5g/h, one
    session): MLE chain 28.2 → 21.7 ms (+30%), but LQ 17.2 → 17.9 —
    each boundary costs ~1.4 ms of XLA glue, more than the LM fit's
    straggler tail at max_it 30."""
    import os

    env = os.environ.get("PICASSO_TPU_FIT_BOUNDARY", "auto")
    if env in ("0", "1"):
        return env == "1"
    return method != "lq"


def _winfit_wanted(width: int) -> bool:
    """Route the Pallas chain through the fused cut+fit kernel
    (ops/winfit_pallas) — explicitly via PICASSO_TPU_ROI_CUT=winfit,
    or by default on narrow frames once measured on (_WINFIT_AUTO)."""
    import os

    mode = os.environ.get("PICASSO_TPU_ROI_CUT", "auto")
    if mode == "winfit":
        return True
    return mode == "auto" and _WINFIT_AUTO and width < _BLOCK_MIN_X


def _winfit_branch(frames, count, f, y, x, ng, baseline, factor, *,
                   box, eps, max_it, method, interpret):
    """Fused ROI-extract + photon-convert + fit as ONE Pallas kernel
    over the wincols row gather; None when the window build is over
    budget or the kernel does not lower here (callers fall back to the
    split cut→convert→fit path)."""
    from picasso_tpu.ops import winfit_pallas

    cols, xoff = gather_wincols(frames, f, y, x, box)
    if cols is None:
        return None
    if interpret:
        ec = False
    else:
        ec = winfit_pallas.probe(
            box, frames.shape[-1], method, np.dtype(frames.dtype)
        )
        if ec is None:
            return None
    xoff2 = xoff[None, :]
    if method == "lq":
        theta = winfit_pallas.fit_lq_t(
            cols, xoff2, baseline, factor, box=box, max_it=max_it,
            ftol=1e-6, early_cast=ec, interpret=interpret,
            n_valid=count,
        )
        zeros6 = jnp.zeros_like(theta)
        zeros1 = jnp.zeros(theta.shape[1], jnp.float32)
        return (
            count, f, y, x, ng, theta, zeros6, zeros1,
            zeros1.astype(jnp.int32),
        )
    thetas6, crlb6, ll, iters = winfit_pallas.fit_mle_t(
        cols, xoff2, baseline, factor, box=box, eps=eps,
        max_it=max_it, method=method, early_cast=ec,
        interpret=interpret, n_valid=count,
    )
    return count, f, y, x, ng, thetas6, crlb6, ll, iters


def _select_cut(width: int):
    """ROI-cut formulation for the fused chain (all measured on TPU
    v5e; decision tables in docs/performance.md). Round-5 default:
    ``winblocks`` (column-blocked overlapped windows, blk=32) wins at
    every width — the round-4 ``winrows`` row gather was 36×
    overfetch at X=256 and XLA gathers stream at ~1/5 HBM BW, so
    shrinking the gather row to box·2·blk bytes cut the stage 8.38 →
    3.48 ms (chains: lq 23.0 → 17.35 ms, mle 34.6 → 29.3, wide lq
    53.1/66.3 → 40.4).  Measured negatives kept for the record/
    regression A/B: ``span`` (15–40× slower — XLA:TPU's fast gather
    path only covers ENTIRE trailing-axis rows), ``shift``/``slab``
    (the batch-major barrel's narrowing widths pad to the 128-lane
    quantum), ``wincols`` (the transposed lanes-last gather costs
    what the sublane barrel saves), ``winfit`` (fused cut+fit kernel
    — the monolithic tile DMA serializes against each tile's fit).
    Read at trace time: set PICASSO_TPU_ROI_CUT before the first
    fused call to override."""
    import os

    mode = os.environ.get("PICASSO_TPU_ROI_CUT", "auto")
    if mode == "auto":
        # round-5 measured default (tools/measure_r5d/e.py, one
        # session): winblocks blk=32 wins BOTH widths — narrow cut
        # 8.38 -> 3.48 ms (lq chain 23.0 -> 17.35, mle 34.6 -> 29.3),
        # wide chain 53.1 (blocks) / 66.3 (winrows) -> 40.4. Its own
        # budget guard falls back width-aware.
        mode = "winblocks"
    return {
        "blocks": cut_rois_t_blocks,
        "shift": cut_rois_t_shift,
        "slab": cut_rois_t_slab,
        "winrows": cut_rois_t_winrows,
        "winblocks": cut_rois_t_winblocks,
        "wincols": cut_rois_t_wincols,
        "span": cut_rois_t_span,
        "spanblocks": cut_rois_t_spanblocks,
    }.get(mode, cut_rois_t)


def _pallas_mode(box: int, method: str) -> str | None:
    """Pallas routing for the fused fit cores: ``"mosaic"`` on
    accelerator backends when the compile probe passes, ``None`` on
    CPU (only interpret mode exists there — far slower than the XLA
    cores). ``PICASSO_TPU_PALLAS=interpret`` forces interpret mode
    (how the CPU dryrun/tests certify the sharded Pallas chain) and
    ``=off`` disables the kernels entirely."""
    import os

    env = os.environ.get("PICASSO_TPU_PALLAS", "auto")
    if env == "off":
        return None
    if env == "interpret":
        return "interpret"
    if jax.default_backend() == "cpu":
        return None
    try:
        if method == "lq":
            from picasso_tpu.ops import lq_pallas

            ok = lq_pallas.pallas_supported(box)
        else:
            from picasso_tpu.ops import mle_pallas

            ok = mle_pallas.pallas_supported(box, method)
    except Exception:
        ok = False
    return "mosaic" if ok else None


def _round_bucket(size: int, use_pallas: bool) -> int:
    if use_pallas:
        # Pallas tiles are 512 lanes; power-of-two buckets >= 512
        # are automatically tile multiples
        return max(512, size)
    return size


def _mesh_or_none():
    """Production mesh routing: shard the streamed fused chain over
    all devices of the default backend when there is more than one
    (the flagship multi-chip path; disable with
    PICASSO_TPU_FUSED_MESH=off)."""
    import os

    if jax.device_count() > 1 and os.environ.get(
        "PICASSO_TPU_FUSED_MESH", "auto"
    ) != "off":
        from picasso_tpu.parallel.mesh import default_mesh

        return default_mesh()
    return None


def _dispatch_chunk(
    dev_frames: jnp.ndarray,
    ng_thresh,
    baseline,
    factor,
    box: int,
    eps: float,
    max_it: int,
    method: str,
    mesh=None,
):
    # the Mosaic kernels run under shard_map too (each device fits its
    # local bucket; zero collectives), so the mesh path no longer
    # forces the XLA fallback — dryrun_multichip certifies the sharded
    # Pallas chain in interpret mode on the virtual CPU mesh
    mode = _pallas_mode(box, method)
    use_pallas = mode is not None
    size = _round_bucket(
        _BUCKET_HINT.get(dev_frames.shape, _DEFAULT_BUCKET),
        use_pallas,
    )
    result = _run_chain(
        dev_frames, ng_thresh, baseline, factor, box, eps, max_it,
        method, size, mode, mesh,
    )
    return (dev_frames, ng_thresh, baseline, factor, box, eps,
            max_it, method, size, result, mode, mesh)


def _run_chain(
    dev, ng_thresh, baseline, factor, box, eps, max_it, method,
    size, pallas_mode, mesh,
):
    use_pallas = pallas_mode is not None
    interpret = pallas_mode == "interpret"
    if mesh is None:
        return identify_cut_fit_packed(
            dev, ng_thresh, baseline, factor,
            box=box, size=size, eps=eps, max_it=max_it,
            method=method, use_pallas=use_pallas,
            pallas_interpret=interpret,
        )
    from picasso_tpu.parallel.mesh import fused_chain_program

    per_dev = dev.shape[0] // mesh.devices.size
    prog = fused_chain_program(
        mesh, per_dev, box, size, eps, max_it, method,
        use_pallas=use_pallas, pallas_interpret=interpret,
    )
    return prog(dev, ng_thresh, baseline, factor)


def _EMPTY_CHUNK():
    return (
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.float32),
        np.zeros((0, 6), np.float32), np.zeros((0, 6), np.float32),
        np.zeros(0, np.float32), np.zeros(0, np.int32),
    )


def _finalize_chunk(handle):
    (dev, ng_thresh, baseline, factor, box, eps, max_it, method,
     size, result, pallas_mode, mesh) = handle
    while True:
        count = int(np.max(np.asarray(result[0])))
        if count <= size:
            break
        size = _round_bucket(
            1 << (count - 1).bit_length(), pallas_mode is not None
        )
        result = _run_chain(
            dev, ng_thresh, baseline, factor, box, eps, max_it,
            method, size, pallas_mode, mesh,
        )
    _BUCKET_HINT[dev.shape] = max(
        _BUCKET_HINT.get(dev.shape, 0), size
    )
    if mesh is None:
        # packed single-device result: one payload transfer, trimmed
        # ON DEVICE to the next 512-multiple above the hit count so
        # the empty bucket tail never crosses the link (at most
        # log2(size/512) distinct slice programs ever compile)
        _, payload = result
        n = count
        if n == 0:
            return _EMPTY_CHUNK()
        m = 512
        while m < n:
            m <<= 1
        m = min(m, payload.shape[1])
        block = np.asarray(payload[:, :m])
        if block.shape[0] == 10:  # lq: crlb/ll/iters are zeros
            crlb = np.zeros((n, 6), np.float32)
            ll = np.zeros(n, np.float32)
            iters = np.zeros(n, np.int32)
        else:
            crlb = block[10:16, :n].T.copy()
            ll = block[16, :n]
            iters = block[17, :n].astype(np.int32)
        return (
            block[0, :n].astype(np.int64),
            block[1, :n].astype(np.int64),
            block[2, :n].astype(np.int64),
            block[3, :n],
            block[4:10, :n].T.copy(),
            crlb,
            ll,
            iters,
        )
    _, f, y, x, ng, theta, crlb, ll, iters = result
    # sharded: per-device buckets; shards hold contiguous frame
    # blocks, so device-major concatenation stays frame-sorted
    counts = np.asarray(result[0])
    f, y, x, ng, theta, crlb, ll, iters = map(
        np.asarray, (f, y, x, ng, theta, crlb, ll, iters)
    )
    parts: list[list] = [[] for _ in range(8)]
    for d in range(len(counts)):
        n = int(counts[d])
        if n == 0:
            continue
        parts[0].append(f[d, :n].astype(np.int64))
        parts[1].append(y[d, :n].astype(np.int64))
        parts[2].append(x[d, :n].astype(np.int64))
        parts[3].append(ng[d, :n].astype(np.float32))
        parts[4].append(theta[d, :, :n].T)
        parts[5].append(crlb[d, :, :n].T)
        parts[6].append(ll[d, :n])
        parts[7].append(iters[d, :n])
    if not parts[0]:
        return _EMPTY_CHUNK()
    return tuple(np.concatenate(p) for p in parts)


def localize_fused(
    movie,
    minimum_ng: float,
    box: int,
    camera_info: dict,
    *,
    fitting_method: Literal[
        "gausslq", "gausslq-gpu", "gaussmle"
    ] = "gaussmle",
    eps: float = 0.001,
    max_it: int = 100,
    mle_method: Literal["sigma", "sigmaxy"] = "sigmaxy",
    roi: tuple[tuple[int, int], tuple[int, int]] | None = None,
    frame_bounds: tuple[int, int] | None = None,
    frame_chunk: int | None = None,
    prefetch_depth: int = 2,
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
    abort_callback: Callable[[], bool] | None = None,
    perf: dict | None = None,
) -> tuple[pd.DataFrame, tuple] | tuple[None, None]:
    """Streamed fused localize over a (possibly lazy) movie.

    Pipeline per chunk: background-thread decode → async native-dtype
    upload → fused identify+cut+fit program → small-result readback,
    with chunk k+1 dispatched before chunk k reads back so device
    compute and the host→device link overlap (dispatch-ahead,
    CLAUDE.md perf rules).

    Returns ``(identifications, (theta, crlb, ll, iters))`` with the
    arrays row-aligned to the identifications; fit columns follow the
    reference order [y, x, photons, bg, sy, sx] offsets as produced by
    the fit cores.  Aborts return ``(None, None)``.

    ``perf``: pass a dict to receive a wall-clock breakdown of the
    run (decode wait / upload+chain dispatch / blocking drain, chunk
    geometry) — how bench.py pins where a streamed run's time goes
    instead of inferring "link-bound".
    """
    from picasso_tpu import lib
    from picasso_tpu.localize import _id_frame_chunk
    from picasso_tpu.stream import ChunkPrefetcher

    method = "lq" if fitting_method in (
        "gausslq", "gausslq-gpu"
    ) else mle_method
    baseline = jnp.float32(float(camera_info["Baseline"]))
    factor = jnp.float32(
        float(camera_info["Sensitivity"]) / float(camera_info["Gain"])
    )
    ng_thresh = jnp.float32(minimum_ng)

    n_frames = len(movie)
    lo_b, hi_b = 0, n_frames
    if frame_bounds is not None:
        # reference upper bound is inclusive (localize.py:394-401)
        if frame_bounds[0] is not None:
            lo_b = max(frame_bounds[0], 0)
        if frame_bounds[1] is not None:
            hi_b = min(frame_bounds[1], n_frames)
    frames_idx = [f for f in range(n_frames) if lo_b <= f <= hi_b]

    def _empty():
        ids = pd.DataFrame(
            {
                "frame": np.empty(0, int),
                "x": np.empty(0, int),
                "y": np.empty(0, int),
                "net_gradient": np.empty(0, np.float32),
            }
        )
        z6 = np.zeros((0, 6), np.float32)
        return ids, (
            z6, z6, np.zeros(0, np.float32), np.zeros(0, np.int32)
        )

    if not frames_idx:
        return _empty()

    first = np.asarray(movie[0])
    height, width = first.shape[-2:]
    if roi is not None:
        (y0, x0), (y1, x1) = roi
        height, width = y1 - y0, x1 - x0
    mesh = _mesh_or_none()
    n_dev = mesh.devices.size if mesh is not None else 1
    if frame_chunk is None:
        base = _id_frame_chunk(height, width)
        n_chunks = max(1, -(-len(frames_idx) // base))
        frame_chunk = -(-len(frames_idx) // n_chunks)
        if n_chunks > 1:
            frame_chunk = -(-frame_chunk // 32) * 32
    if mesh is not None:
        # every chunk (including a lone short one) pads to a device
        # multiple so shards stay equal-sized
        frame_chunk = -(-frame_chunk // n_dev) * n_dev
    bounds = [
        (frames_idx[s], frames_idx[
            min(s + frame_chunk, len(frames_idx)) - 1
        ] + 1)
        for s in range(0, len(frames_idx), frame_chunk)
    ]

    out_f, out_y, out_x, out_ng = [], [], [], []
    out_theta, out_crlb, out_ll, out_it = [], [], [], []
    t_decode = t_upload = t_dispatch = t_drain = 0.0
    t_run0 = time.perf_counter()
    prefetcher = ChunkPrefetcher(movie, bounds, depth=prefetch_depth)
    try:
        with lib.progress_reporter(
            progress_callback, len(frames_idx), "Localizing (fused)"
        ) as rep:
            done = 0
            first_chunk = True
            in_flight: list = []

            def _drain():
                nonlocal done, t_drain
                offset, n_real, padded_tail, handle = in_flight.pop(0)
                t0 = time.perf_counter()
                f, y, x, ng, theta, crlb, ll, iters = (
                    _finalize_chunk(handle)
                )
                t_drain += time.perf_counter() - t0
                if padded_tail:
                    keep = f < n_real
                    f, y, x, ng = f[keep], y[keep], x[keep], ng[keep]
                    theta, crlb = theta[keep], crlb[keep]
                    ll, iters = ll[keep], iters[keep]
                out_f.append(f + offset)
                out_y.append(y)
                out_x.append(x)
                out_ng.append(ng)
                out_theta.append(theta)
                out_crlb.append(crlb)
                out_ll.append(ll)
                out_it.append(iters)
                done += n_real
                rep.set_value(done)
                if callable(progress_callback):
                    progress_callback(done)

            chunk_iter = iter(prefetcher)
            while True:
                t0 = time.perf_counter()
                try:
                    offset, batch = next(chunk_iter)
                except StopIteration:
                    break
                t_decode += time.perf_counter() - t0
                if abort_callback is not None and abort_callback():
                    return None, None
                if roi is not None:
                    (y0, x0), (y1, x1) = roi
                    batch = batch[:, y0:y1, x0:x1]
                n_real = len(batch)
                pad = frame_chunk - n_real
                if mesh is not None and first_chunk and pad:
                    # a lone short chunk still pads to a device
                    # multiple (zero frames produce no hits)
                    pad = (-n_real) % n_dev
                    padded_tail = pad > 0
                else:
                    padded_tail = pad > 0 and not first_chunk
                if padded_tail:
                    # zero frames produce no hits; one chunk shape
                    # ever compiles
                    batch = np.concatenate([
                        batch,
                        np.zeros(
                            (pad, *batch.shape[1:]), batch.dtype
                        ),
                    ])
                t0 = time.perf_counter()
                if mesh is not None:
                    from jax.sharding import (
                        NamedSharding, PartitionSpec,
                    )

                    dev = jax.device_put(
                        batch,
                        NamedSharding(
                            mesh, PartitionSpec("spots", None, None)
                        ),
                    )
                else:
                    dev = jnp.asarray(batch)
                t_upload += time.perf_counter() - t0
                t0 = time.perf_counter()
                in_flight.append((
                    offset, n_real, padded_tail,
                    _dispatch_chunk(
                        dev, ng_thresh, baseline, factor, box,
                        eps, max_it, method, mesh,
                    ),
                ))
                t_dispatch += time.perf_counter() - t0
                first_chunk = False
                while len(in_flight) > 1:
                    _drain()
            while in_flight:
                _drain()
    finally:
        prefetcher.close()
    if perf is not None:
        total = time.perf_counter() - t_run0
        perf.update({
            "n_chunks": len(bounds),
            "frame_chunk": frame_chunk,
            "decode_wait_s": round(t_decode, 3),
            "upload_dispatch_s": round(t_upload, 3),
            "chain_dispatch_s": round(t_dispatch, 3),
            "drain_s": round(t_drain, 3),
            "other_s": round(
                total - t_decode - t_upload - t_dispatch - t_drain, 3
            ),
            "total_s": round(total, 3),
        })

    f = np.concatenate(out_f)
    y = np.concatenate(out_y)
    x = np.concatenate(out_x)
    if roi is not None:
        y = y + roi[0][0]
        x = x + roi[0][1]
    ids = pd.DataFrame(
        {
            "frame": f.astype(int),
            "x": x.astype(int),
            "y": y.astype(int),
            "net_gradient": np.concatenate(out_ng),
        }
    )
    fits = (
        np.concatenate(out_theta),
        np.concatenate(out_crlb),
        np.concatenate(out_ll),
        np.concatenate(out_it),
    )
    return ids, fits
