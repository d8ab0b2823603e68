"""Spot identification on TPU: box local-maxima + net-gradient maps
evaluated for whole frame batches in one XLA program.

Replaces the reference's per-frame numba loops driven by a ≤60-thread
work-stealing pool (picasso/localize.py:_local_maxima :98,
_net_gradient :203, identify_in_image :248, identify_async :482).

Semantics matched to the reference:
- a pixel is a local maximum iff it is the FIRST argmax (row-major) of
  its (box, box) window — i.e. strictly greater than every earlier
  pixel in the window and >= every later pixel;
- only pixels with box_half <= i < Y - box_half - 1 (note the
  reference's extra -1 on the high side) are eligible
  (localize.py:122-123);
- the net gradient is the sum over the box window (center excluded) of
  the central-difference gradient dotted with unit vectors pointing at
  the center (localize.py:203-292).

The maps are computed densely on device; the variable-length extraction
of (y, x, ng) happens on host per frame chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unit_vector_masks(box: int) -> tuple[np.ndarray, np.ndarray]:
    """(uy, ux) of shape (box, box): unit vectors from each window
    position toward the center; center row/col entries handled like the
    reference meshgrid (localize.py:278-287)."""
    half = box // 2
    val = half - np.arange(box, dtype=np.float32)
    ux = np.tile(val, (box, 1))
    uy = ux.T.copy()
    norm = np.sqrt(ux**2 + uy**2)
    with np.errstate(invalid="ignore", divide="ignore"):
        ux = ux / norm
        uy = uy / norm
    ux[half, half] = 0.0  # center excluded from the sum
    uy[half, half] = 0.0
    return uy, ux


@functools.partial(jax.jit, static_argnames=("box",))
def identify_maps(
    frames: jnp.ndarray, box: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (is_maximum, net_gradient) maps for a batch of frames.

    Parameters
    ----------
    frames : (B, Y, X) float32
    box : odd int

    Returns
    -------
    maxima : (B, Y, X) bool
    ng : (B, Y, X) float32 — net gradient at every pixel.
    """
    raw = frames  # maxima compare in the movie's NATIVE dtype: the
    # comparisons are value-exact in u16 or f32 (u16 → f32 is exact),
    # and integer frames halve the windowed-max HBM traffic
    frames = frames.astype(jnp.float32)
    B, Y, X = frames.shape
    half = box // 2

    # --- local maxima with first-argmax tie-breaking ---------------------
    # Pad with the dtype minimum (padding never beats a real center;
    # eligible centers never read padding — their windows stay ≥ half
    # inside the frame); the border exclusion itself is enforced ONLY
    # by the eligible mask below — do not relax those bounds without
    # adjusting the padding.
    #
    # First-argmax-in-row-major-order semantics decompose into four
    # rectangular neighbor regions: the center must be STRICTLY
    # greater than everything EARLIER in window order — the rows
    # above (any dx) and the left half of its own row — and >=
    # everything later — the right half of its row and the rows
    # below. Each region max is a separable windowed max
    # (log-doubling shifted maxima), ~11 elementwise passes instead
    # of the box²-1 = 48 per-neighbor compare passes of the naive
    # form (which were HBM-bound on TPU).
    if jnp.issubdtype(raw.dtype, jnp.integer):
        neg = jnp.iinfo(raw.dtype).min
    else:
        raw = frames
        neg = jnp.float32(-jnp.inf)
    padded = jnp.pad(
        raw, ((0, 0), (half, half), (half, half)),
        constant_values=neg,
    )
    center = raw

    def windowed_max_1d(arr, axis, lo, hi):
        """out[i] = max over arr[i+lo .. i+hi] along ``axis``, via
        log-doubling shifted maxima. jnp.roll wraps across the array
        edge, but every consumer below slices back to the interior
        [half:-half] band, whose window reads stay inside the padded
        extent for offsets |k| <= half — wrapped lanes never reach a
        kept pixel."""
        span = hi - lo
        acc = arr  # acc[i] covers arr[i .. i+covered]
        covered = 0
        while covered < span:
            step = min(covered + 1, span - covered)
            acc = jnp.maximum(
                acc, jnp.roll(acc, -step, axis=axis)
            )
            covered += step
        return jnp.roll(acc, -lo, axis=axis)

    hmax = windowed_max_1d(padded, 2, -half, half)
    above = windowed_max_1d(hmax, 1, -half, -1)[
        :, half:-half, half:-half
    ]
    below = windowed_max_1d(hmax, 1, 1, half)[
        :, half:-half, half:-half
    ]
    left = windowed_max_1d(padded, 2, -half, -1)[
        :, half:-half, half:-half
    ]
    right = windowed_max_1d(padded, 2, 1, half)[
        :, half:-half, half:-half
    ]
    is_max = (
        (center > above)
        & (center > left)
        & (center >= right)
        & (center >= below)
    )

    # eligible interior (reference bounds localize.py:122-123)
    yy = jnp.arange(Y)[None, :, None]
    xx = jnp.arange(X)[None, None, :]
    eligible = (
        (yy >= half)
        & (yy < Y - half - 1)
        & (xx >= half)
        & (xx < X - half - 1)
    )
    maxima = is_max & eligible

    # --- net gradient ----------------------------------------------------
    # gy(i,j) = f[i+1,j] - f[i-1,j]; gx(i,j) = f[i,j+1] - f[i,j-1].
    # The reference's numba kernel uses numpy negative-index wrapping at
    # i-1 = -1 (localize.py:179-180), which jnp.roll reproduces; the
    # +1 side never leaves the frame for eligible maxima.
    gy = jnp.roll(frames, -1, axis=1) - jnp.roll(frames, 1, axis=1)
    gx = jnp.roll(frames, -1, axis=2) - jnp.roll(frames, 1, axis=2)

    # ng[p] = sum_w gy[p + w] * uy[w] + gx[p + w] * ux[w] — a zero-padded
    # cross-correlation of the gradient maps with the unit-vector masks.
    # On accelerators the rank-3 banded-matmul form is 2.7-10x faster
    # than the single-channel conv (no MXU contraction there); on CPU
    # the matmul form does ~15x the FLOPs for nothing — Eigen's conv
    # wins (1024^2 chunk: 1.8 s matmul vs ~0.2 s conv), so the host
    # path keeps the conv. Both are exact to f32 eps of each other
    # (pinned by test_localize's equivalence test).
    if jax.default_backend() == "cpu":
        ng = _net_gradient_conv(gy, gx, box)
    else:
        import os

        # round-5 A/B (one session, (256, 256²)): mxu 6.5-7.1 ms,
        # halo-elided mxu and the rank-5 folded kernel both WITHIN
        # NOISE of it — the stage is not MAC-bound (17-33% MAC cuts
        # moved nothing); kept env-gated as pinned washes
        ng_mode = os.environ.get("PICASSO_TPU_NG", "mxu")
        if ng_mode == "folded":
            # rank-5 folded kernel on the frames directly (gy/gx
            # above are dead code the compiler removes)
            ng = _net_gradient_folded(frames, box)
        else:
            ng = {
                "sep": _net_gradient_sep,
                "conv": _net_gradient_conv,
            }.get(ng_mode, _net_gradient_mxu)(gy, gx, box)
    return maxima, ng


def _net_gradient_conv(gy, gx, box: int):
    """Reference formulation: two single-channel zero-padded 2D convs
    at HIGHEST precision (the TPU default lowers convs to bf16 MXU
    passes, which shifts net gradients by ~0.4% on u16-scale frames
    and flips spots near the minimum_ng threshold vs the f32
    reference)."""
    half = box // 2
    uy, ux = _unit_vector_masks(box)

    def corr(img, kernel):
        return jax.lax.conv_general_dilated(
            img[:, None, :, :],
            jnp.asarray(kernel)[None, None, :, :],
            window_strides=(1, 1),
            padding=((half, half), (half, half)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0]

    return corr(gy, uy) + corr(gx, ux)


@functools.lru_cache(maxsize=None)
def _folded_factors(box: int) -> tuple[np.ndarray, np.ndarray]:
    """Low-rank factorization of the FOLDED net-gradient kernel.

    The ±1-pixel gradient shifts are absorbed into the correlation
    masks: ng[p] = Σ_d W[d]·f[p+d] over a (box+2)² kernel
    W = shift(uy, +e_y) − shift(uy, −e_y) + shift(ux, +e_x) −
    shift(ux, −e_x), so the correlation runs on the FRAMES directly —
    no gy/gx gradient maps — and W has exact rank 5 at box=7
    (vs 3+3 rank terms of the two-mask form: one full rank term AND
    two frame-sized intermediates saved).

    Exact for all ELIGIBLE centers except the reference's numba
    wraparound quirk at the first eligible row/column (gy row 0 reads
    f[-1] = f[Y-1], localize.py:179-180), which
    :func:`_net_gradient_folded` restores with two rank-1 border
    corrections.
    """
    uy, ux = _unit_vector_masks(box)
    S = box + 2
    W = np.zeros((S, S), np.float64)
    W[2:, 1:-1] += uy
    W[:-2, 1:-1] -= uy
    W[1:-1, 2:] += ux
    W[1:-1, :-2] -= ux
    U, s, Vt = np.linalg.svd(W)
    r = int((s > 1e-9 * s[0]).sum())
    cols = (U[:, :r] * s[:r]).T  # (r, box+2)
    rows = Vt[:r]
    return cols, rows


@functools.lru_cache(maxsize=None)
def _folded_tile_matrices(box: int, S: int) -> tuple[np.ndarray, np.ndarray]:
    """Banded tile matrices for the folded kernel (halo box//2 + 1)."""
    half2 = box // 2 + 1
    cols, rows = _folded_factors(box)

    def banded(vec):
        M = np.zeros((S, S + 2 * half2), np.float64)
        for a, v in enumerate(vec):
            for i in range(S):
                M[i, i + a] = v
        return M

    A = np.stack([banded(c) for c in cols])[None].astype(np.float32)
    Bm = np.stack([banded(c) for c in rows])[None].astype(np.float32)
    return A, Bm


@functools.lru_cache(maxsize=None)
def _svd_factors(box: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact low-rank factorization of the unit-vector masks.

    ``uy`` has exact rank 3 at box=7 (singular values 4.872, 0.511,
    0.048, rest 0 to f64 eps); ``ux = uy.T`` shares the factors with
    the roles of the y/x directions swapped. Factored in f64, cast to
    f32 — reconstruction error ~1e-7 relative, the same order as the
    f32 HIGHEST conv it replaces.
    """
    uy, _ = _unit_vector_masks(box)
    U, s, Vt = np.linalg.svd(uy.astype(np.float64))
    r = int((s > 1e-9 * s[0]).sum())
    cols = (U[:, :r] * s[:r]).T  # (r, box) y-direction factors of uy
    rows = Vt[:r]  # (r, box) x-direction factors of uy
    return cols, rows


@functools.lru_cache(maxsize=None)
def _tile_matrices(box: int, S: int) -> tuple[np.ndarray, np.ndarray]:
    """Banded tile matrices for the separable net-gradient correlation.

    Returns (Ay, Bx), each (2, r, S, S + 2*half) f32: out tile row i =
    sum_a vec[a] * in[i + a] over a halo-extended input tile. k=0 is
    the gy·uy term, k=1 the gx·ux term (ux = uy.T swaps the factors).
    """
    half = box // 2
    cols, rows = _svd_factors(box)

    def banded(vec):
        M = np.zeros((S, S + 2 * half), np.float64)
        for a, v in enumerate(vec):
            for i in range(S):
                M[i, i + a] = v
        return M

    Ay = np.stack(
        [np.stack([banded(c) for c in cols]),
         np.stack([banded(c) for c in rows])]
    ).astype(np.float32)
    Bx = np.stack(
        [np.stack([banded(c) for c in rows]),
         np.stack([banded(c) for c in cols])]
    ).astype(np.float32)
    return Ay, Bx


def _net_gradient_sep(gy, gx, box: int):
    """Net-gradient correlation as rank-separable shifted FMAs on the
    VPU (round-4 candidate, PICASSO_TPU_NG=sep).

    The banded-MXU form (below) pays S+2h MACs per output element for
    a true bandwidth of 2h+1 — ~53 GFLOP per (256, 256²) chunk for a
    correlation whose separable form is 2 terms × rank 3 × 2 axes ×
    box FMAs ≈ 1.4 GFLOP. Here each rank runs as box shifted
    static-slice FMAs per axis over the zero-padded gradient maps —
    pure elementwise chains that XLA fuses into ~a dozen HBM passes,
    making the stage bandwidth-bound instead of MXU-shape-bound.
    Same SVD factors as the banded form (exact rank 3), so the two
    agree to f32 rounding of the identical factorization.
    """
    half = box // 2
    cols, rows = _svd_factors(box)
    B, Y, X = gy.shape
    g = jnp.stack([gy, gx])  # (2, B, Y, X)
    gp = jnp.pad(
        g, ((0, 0), (0, 0), (half, half), (half, half))
    )  # zero-padded: border windows read zeros, like the conv

    def corr_sep(img, cvec, rvec):
        # Σ_a cvec[a] · img[y+a, :] then Σ_b rvec[b] · s1[:, x+b]:
        # static in-bounds slices of the padded maps (no wraparound)
        s1 = sum(
            float(cvec[a])
            * jax.lax.slice_in_dim(img, a, a + Y, axis=1)
            for a in range(box)
        )
        return sum(
            float(rvec[b])
            * jax.lax.slice_in_dim(s1, b, b + X, axis=2)
            for b in range(box)
        )

    out = jnp.zeros((B, Y, X), jnp.float32)
    for r in range(cols.shape[0]):
        # uy = Σ_r cols_r ⊗ rows_r acts on gy; ux = uy.T swaps roles
        out = out + corr_sep(gp[0], cols[r], rows[r])
        out = out + corr_sep(gp[1], rows[r], cols[r])
    return out


def _net_gradient_mxu(gy, gx, box: int):
    """Net-gradient correlation as banded MXU matmuls.

    The single-channel 2D conv this replaces has no channel
    contraction for the MXU to tile and ran at ~140 GFLOP/s effective
    on TPU v5e (22-25 ms per (256, 256²) chunk, the dominant identify
    cost). Expressing the rank-3-separable correlation as banded
    (S, S+2*half) matmuls over halo-extended tiles runs on the MXU at
    HIGHEST (f32-equivalent) precision: measured 8.8 ms on (256, 256²)
    and 19.4 ms on (32, 1024²) vs 173 ms for the conv — 3-9x, exact to
    f32 eps (max rel 1.6e-7).

    Zero-padding ``gy``/``gx`` up to tile multiples is exact: the
    correlation zero-pads its borders anyway, so extra zero rows/cols
    only add output rows that are cropped off. The frame-wraparound
    quirk of the reference's gradient (numba negative indexing,
    localize.py:179-180) lives in the roll-diff that builds gy/gx
    BEFORE padding, so it is preserved bit-for-bit.
    """
    half = box // 2
    B, Y, X = gy.shape

    def tile_plan(n):
        # Band width trades MXU-contraction depth against dense-band
        # waste: a (S, S+2h) band does S+2h MACs per output element
        # for a true bandwidth of 2h+1. PICASSO_TPU_NG_TILE caps S
        # for on-chip A/B (read at trace time).
        import os

        cap = int(os.environ.get("PICASSO_TPU_NG_TILE", "256"))
        npad = -(-n // 64) * 64
        S = npad if npad <= cap else max(64, (cap // 64) * 64)
        # S must divide npad: round npad up to a multiple of S
        npad = -(-npad // S) * S
        return npad, S

    Yp, Sy = tile_plan(Y)
    Xp, Sx = tile_plan(X)
    Ty = Yp // Sy
    Tx = Xp // Sx
    Ay, _ = _tile_matrices(box, Sy)
    _, Bx = _tile_matrices(box, Sx)
    # single-tile axes drop the halo EXACTLY: the halo there is the
    # correlation's own zero padding, so the banded matrix's first/
    # last `half` columns only ever multiply zeros — slicing them off
    # shrinks the MXU contraction depth from S+2h (3 depth tiles at
    # S=256) to S (2 tiles): 1/3 fewer MACs on the round-5 narrow
    # workload where both axes are single-tile
    # (PICASSO_TPU_NG_HALO=keep disables for A/B)
    import os as _os

    _elide = _os.environ.get("PICASSO_TPU_NG_HALO", "elide") != "keep"
    elide_y = Ty == 1 and _elide
    elide_x = Tx == 1 and _elide
    if elide_y:
        Ay = Ay[..., :, half:half + Sy]
    if elide_x:
        Bx = Bx[..., :, half:half + Sx]
    Ay = jnp.asarray(Ay)
    Bx = jnp.asarray(Bx)
    g = jnp.stack([gy, gx])  # (2, B, Y, X)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, Yp - Y), (0, Xp - X)))
    if elide_y:
        gp, ylen = g, Sy
    else:
        gp = jnp.pad(g, ((0, 0), (0, 0), (half, half), (0, 0)))
        ylen = Sy + 2 * half
    hp = jax.lax.Precision.HIGHEST

    # One y row-band at a time (lax.map) so the 6x (k, r) rank
    # intermediates stay tile-sized: peak extra memory is ~13 copies
    # of ONE (B, Sy, Xp) band, not of the whole chunk (the all-tiles
    # einsum formulation grew a 1024^2 streamed pass by 6x the chunk
    # and blew the RSS budget in tests/test_stream.py).
    def band(t):
        tile = jax.lax.dynamic_slice_in_dim(
            gp, t * Sy, ylen, axis=2)  # (2, B, ylen, Xp)
        t1 = jnp.einsum("kriy,kbyx->krbix", Ay, tile, precision=hp)
        if elide_x:
            xt = t1[:, :, :, :, None, :]  # (k, r, B, Sy, 1, Sx)
        else:
            tp = jnp.pad(t1, ((0, 0),) * 4 + ((half, half),))
            xt = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(
                    tp, u * Sx, Sx + 2 * half, axis=4)
                 for u in range(Tx)], axis=4
            )  # (k, r, B, Sy, Tx, Sx+2h)
        return jnp.einsum("krjx,krbytx->bytj", Bx, xt, precision=hp
                          ).reshape(B, Sy, Xp)

    out = jax.lax.map(band, jnp.arange(Ty))  # (Ty, B, Sy, Xp)
    out = jnp.moveaxis(out, 0, 1).reshape(B, Yp, Xp)
    return out[:, :Y, :X]


def _net_gradient_folded(frames, box: int):
    """Net gradient as ONE rank-5 banded-MXU correlation of the
    frames (round 5; see :func:`_folded_factors`): vs the two-mask
    gradient form, one less rank term (5 vs 6 → 17 % fewer MACs) and
    the two frame-sized gy/gx intermediates never exist.

    The reference's numba wraparound (gy row 0 reads f[Y-1]; gx col 0
    reads f[:, X-1] — localize.py:179-180) reaches eligible centers
    only on the FIRST eligible row/column; two rank-1 shifted dot
    products of the last frame row/column restore it exactly there.
    Non-eligible border values differ from the gradient form — they
    are masked off by every consumer (the maxima map is
    eligible-masked before the NG threshold).
    """
    half = box // 2
    half2 = half + 1
    B, Y, X = frames.shape

    def tile_plan(n):
        import os

        cap = int(os.environ.get("PICASSO_TPU_NG_TILE", "256"))
        npad = -(-n // 64) * 64
        S = npad if npad <= cap else max(64, (cap // 64) * 64)
        npad = -(-npad // S) * S
        return npad, S

    Yp, Sy = tile_plan(Y)
    Xp, Sx = tile_plan(X)
    Ty = Yp // Sy
    Tx = Xp // Sx
    A, _ = _folded_tile_matrices(box, Sy)
    _, Bm = _folded_tile_matrices(box, Sx)
    if Ty == 1:  # halo is the correlation's own zero pad: elide
        A = A[..., :, half2:half2 + Sy]
    if Tx == 1:
        Bm = Bm[..., :, half2:half2 + Sx]
    A = jnp.asarray(A)
    Bm = jnp.asarray(Bm)
    g = frames[None]  # (1, B, Y, X)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, Yp - Y), (0, Xp - X)))
    if Ty == 1:
        gp, ylen = g, Sy
    else:
        gp = jnp.pad(g, ((0, 0), (0, 0), (half2, half2), (0, 0)))
        ylen = Sy + 2 * half2
    hp = jax.lax.Precision.HIGHEST

    def band(t):
        tile = jax.lax.dynamic_slice_in_dim(
            gp, t * Sy, ylen, axis=2)  # (1, B, ylen, Xp)
        t1 = jnp.einsum("kriy,kbyx->krbix", A, tile, precision=hp)
        if Tx == 1:
            xt = t1[:, :, :, :, None, :]
        else:
            tp = jnp.pad(t1, ((0, 0),) * 4 + ((half2, half2),))
            xt = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(
                    tp, u * Sx, Sx + 2 * half2, axis=4)
                 for u in range(Tx)], axis=4)
        return jnp.einsum("krjx,krbytx->bytj", Bm, xt, precision=hp
                          ).reshape(B, Sy, Xp)

    out = jax.lax.map(band, jnp.arange(Ty))
    out = jnp.moveaxis(out, 0, 1).reshape(B, Yp, Xp)[:, :Y, :X]

    # wraparound corrections at the first eligible row/column
    uy, ux = _unit_vector_masks(box)
    rowp = jnp.pad(frames[:, Y - 1, :], ((0, 0), (half, half)))
    corr_r = sum(
        float(uy[0, j]) * rowp[:, j:j + X] for j in range(box)
    )
    out = out.at[:, half, :].add(-corr_r)
    colp = jnp.pad(frames[:, :, X - 1], ((0, 0), (half, half)))
    corr_c = sum(
        float(ux[i, 0]) * colp[:, i:i + Y] for i in range(box)
    )
    return out.at[:, :, half].add(-corr_c)


@functools.partial(jax.jit, static_argnames=("box", "size"))
def _identify_compact(frames, minimum_ng, box, size):
    """Device-side threshold + compaction: returns the true hit count
    plus (frame, y, x, ng) arrays of static length *size* (fill rows
    marked frame == -1). The caller retries with a bigger size iff
    count > size.

    Compaction is cumsum + a sorted-unique scatter: hit tile t lands
    at slot ``c[t] − 1`` of an int32 output (out-of-bounds slots for
    non-hits are dropped), instead of ``jnp.nonzero(size=)`` or
    cumsum + ``searchsorted``. All three are order-exact; measured on
    a (256, 256², u16) chunk on TPU v5e the scatter's single pass
    over the tile grid costs ~6 ms where the binary search pays ~21
    (21 gather rounds × size targets at ~137M gathers/s) and
    nonzero's lowering 152 ms.

    The scan runs over the (half+1)²-TILE grid, not pixels: hits are
    local maxima with Chebyshev separation > half (the strict/
    non-strict window split forbids two passing maxima within half of
    each other), so every aligned (half+1)² tile holds AT MOST ONE
    hit. Reducing mask/ng/position onto tiles first shrinks the
    cumsum + binary-search problem 16× for box=7 (measured 34 ms →
    ~8 ms on a (256, 256²) chunk, the dominant e2e-compute cost).
    Hit order is (frame, tile-row, tile-col) — frame-major like the
    row-major scan, with intra-frame order permuted only between
    hits of the same 4-px band."""
    B, Y, X = frames.shape
    T = box // 2 + 1
    Ty, Tx = -(-Y // T), -(-X // T)
    from picasso_tpu.ops import identify_pallas as _idp

    mode = _idp.identify_mode()
    if mode is not None and (
        mode == "interpret" or _idp.pallas_supported(frames.shape, box)
    ):
        # fused Mosaic kernel: maxima + net gradient + threshold +
        # tile reduction in one VMEM pass (ops/identify_pallas.py)
        tm, tl, tn = _idp.identify_tiles_pallas(
            frames, minimum_ng, box,
            interpret=mode == "interpret",
        )
        tile_mask = (tm > 0.5).ravel()
        tile_loc = jnp.round(tl).astype(jnp.int32).ravel()
        tile_ng = tn.ravel()
    else:
        maxima, ng = identify_maps(frames, box)
        mask = maxima & (ng > minimum_ng)
        Yp, Xp = Ty * T, Tx * T
        if (Yp, Xp) != (Y, X):
            pad = ((0, 0), (0, Yp - Y), (0, Xp - X))
            mask = jnp.pad(mask, pad)
            ng = jnp.pad(ng, pad)
        m = mask.reshape(B, Ty, T, Tx, T)
        # ≤1 hit per tile ⇒ plain sums recover the hit's local
        # offset, and reducing ng onto tiles here means the full-res
        # ng map is only ever consumed by fused reductions — no
        # 4·B·Y·X-byte materialization and no post-compaction gather
        tile_mask = m.any(axis=(2, 4)).ravel()
        loc = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) * T + \
            jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        tile_loc = jnp.sum(
            m * loc[None, None, :, None, :],
            axis=(2, 4), dtype=jnp.int32,
        ).ravel()
        tile_ng = jnp.sum(
            m * ng.reshape(B, Ty, T, Tx, T), axis=(2, 4),
        ).ravel()

    c = jnp.cumsum(tile_mask.astype(jnp.int32))
    count = c[-1]
    # hit tiles scatter their index to slot c-1; non-hits (and hits
    # beyond the bucket when count > size — the caller retries) aim
    # out of bounds and are dropped. In-bounds slots are unique and
    # written in ascending order.
    pos = jnp.where(tile_mask, c - 1, size)
    tile_idx = jax.lax.broadcasted_iota(
        jnp.int32, (c.shape[0], 1), 0
    ).ravel()
    idx = (
        jnp.zeros(size, jnp.int32)
        .at[pos]
        .set(tile_idx, mode="drop", unique_indices=True)
    )
    valid = jnp.arange(1, size + 1, dtype=jnp.int32) <= count
    li = tile_loc[idx]
    f = jnp.where(valid, idx // (Ty * Tx), -1)
    rem = idx % (Ty * Tx)
    y = jnp.where(valid, (rem // Tx) * T + li // T, -1)
    x = jnp.where(valid, (rem % Tx) * T + li % T, -1)
    # exactly one nonzero per hit tile, so the tile reduction IS the
    # hit's ng value (fill rows read tile 0 — trimmed by `valid`)
    ng_vals = tile_ng[idx]
    return count, f, y, x, ng_vals


#: speculative compaction bucket per frame-batch shape — one device
#: round-trip in the common case, a retry only when a chunk has more
#: spots than any chunk of that shape before it
_BUCKET_HINT: dict[tuple[int, ...], int] = {}


def identify_frames(
    frames: np.ndarray,
    minimum_ng: float,
    box: int,
    frame_offset: int = 0,
    roi: tuple[tuple[int, int], tuple[int, int]] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Identify spots in a batch of frames; returns flat
    (frame, y, x, net_gradient) arrays. ROI crops before
    identification and offsets coordinates back, matching
    identify_in_frame (localize.py:295-337).

    Host↔device traffic is minimized: frames upload in their native
    dtype (u16 is half the bytes of f32; the cast runs on device) and
    only the compacted spot arrays come back — a count first, then a
    power-of-two-sized nonzero (static shapes; a handful of bucket
    sizes ever compile) instead of full (B, Y, X) maps."""
    frames = np.asarray(frames)
    if roi is not None:
        (y0, x0), (y1, x1) = roi
        frames = frames[:, y0:y1, x0:x1]
    dev = jnp.asarray(frames)
    ng_thresh = jnp.float32(minimum_ng)
    size = _BUCKET_HINT.get(frames.shape, 4096)
    while True:
        count, f, y, x, ng_vals = _identify_compact(
            dev, ng_thresh, box, size
        )
        n = int(count)
        if n <= size:
            break
        size = 1 << (n - 1).bit_length()
    _BUCKET_HINT[frames.shape] = max(
        _BUCKET_HINT.get(frames.shape, 0), size
    )
    if n == 0:
        empty = np.zeros(0, np.int64)
        return empty, empty, empty, np.zeros(0, np.float32)
    # jnp.nonzero packs real hits first, in row-major (frame-major)
    # order; fill rows (frame == -1) trail and are dropped by [:n].
    f_idx = np.asarray(f)[:n].astype(np.int64)
    y = np.asarray(y)[:n].astype(np.int64)
    x = np.asarray(x)[:n].astype(np.int64)
    ng_vals = np.asarray(ng_vals)[:n].astype(np.float32)
    if roi is not None:
        y = y + roi[0][0]
        x = x + roi[0][1]
    return f_idx + frame_offset, y, x, ng_vals


def identify_frames_dispatch(
    frames: np.ndarray,
    minimum_ng: float,
    box: int,
    frame_offset: int = 0,
    roi: tuple[tuple[int, int], tuple[int, int]] | None = None,
):
    """Asynchronous half of :func:`identify_frames`: upload the chunk
    and dispatch the identify program WITHOUT waiting for results, so
    a streaming caller can overlap the next chunk's host decode and
    device transfer with this chunk's compute. Pass the returned
    handle to :func:`identify_frames_finalize`."""
    frames = np.asarray(frames)
    if roi is not None:
        (y0, x0), (y1, x1) = roi
        frames = frames[:, y0:y1, x0:x1]
    dev = jnp.asarray(frames)
    ng_thresh = jnp.float32(minimum_ng)
    size = _BUCKET_HINT.get(frames.shape, 4096)
    result = _identify_compact(dev, ng_thresh, box, size)
    return (dev, ng_thresh, box, size, result, frames.shape,
            frame_offset, roi)


def identify_frames_finalize(handle):
    """Synchronous half of :func:`identify_frames_dispatch`: wait for
    the dispatched program, re-run with a larger compaction bucket if
    the speculative size overflowed (rare once the per-shape hint is
    warm), and return host (frame, y, x, net_gradient) arrays."""
    (dev, ng_thresh, box, size, result, shape, frame_offset,
     roi) = handle
    while True:
        count, f, y, x, ng_vals = result
        n = int(count)
        if n <= size:
            break
        size = 1 << (n - 1).bit_length()
        result = _identify_compact(dev, ng_thresh, box, size)
    _BUCKET_HINT[shape] = max(_BUCKET_HINT.get(shape, 0), size)
    if n == 0:
        empty = np.zeros(0, np.int64)
        return empty, empty, empty, np.zeros(0, np.float32)
    f_idx = np.asarray(f)[:n].astype(np.int64)
    y = np.asarray(y)[:n].astype(np.int64)
    x = np.asarray(x)[:n].astype(np.int64)
    ng_vals = np.asarray(ng_vals)[:n].astype(np.float32)
    if roi is not None:
        y = y + roi[0][0]
        x = x + roi[0][1]
    return f_idx + frame_offset, y, x, ng_vals


# ---------------------------------------------------------------------------
# ROI extraction + photon conversion
# ---------------------------------------------------------------------------


def cut_spots_numpy(
    movie, ids_frame: np.ndarray, ids_x: np.ndarray, ids_y: np.ndarray,
    box: int,
) -> np.ndarray:
    """Gather (N, box, box) ROIs from a frame-indexable movie on host
    (replaces picasso/localize.py:917-1098). Uses the native C++
    gather when available; otherwise a vectorized fancy-index
    gather."""
    r = box // 2
    offs = np.arange(-r, r + 1)
    if isinstance(movie, np.ndarray) or hasattr(movie, "__array__"):
        movie_arr = np.asarray(movie)
        from picasso_tpu import native

        if native.AVAILABLE and movie_arr.flags.c_contiguous:
            return native.cut_spots(
                movie_arr, ids_frame, ids_x, ids_y, box
            )
        yy = ids_y[:, None, None] + offs[None, :, None]
        xx = ids_x[:, None, None] + offs[None, None, :]
        return movie_arr[ids_frame[:, None, None], yy, xx]
    # lazy movie: frame-by-frame (identifications are frame-sorted)
    n = len(ids_frame)
    spots = np.zeros((n, box, box), dtype=movie.dtype)
    order = np.argsort(ids_frame, kind="stable")
    sorted_frames = ids_frame[order]
    unique_frames, starts = np.unique(sorted_frames, return_index=True)
    bounds = list(starts) + [n]
    for fi, frame_number in enumerate(unique_frames):
        frame = np.asarray(movie[int(frame_number)])
        for j in range(bounds[fi], bounds[fi + 1]):
            k = order[j]
            yc, xc = ids_y[k], ids_x[k]
            spots[k] = frame[yc - r:yc + r + 1, xc - r:xc + r + 1]
    return spots


def to_photons(spots: np.ndarray, camera_info: dict) -> np.ndarray:
    """(raw - baseline) * sensitivity / gain
    (picasso/localize.py:1101-1112)."""
    spots = np.float32(spots)
    baseline = camera_info["Baseline"]
    sensitivity = camera_info["Sensitivity"]
    gain = camera_info["Gain"]
    return (spots - baseline) * sensitivity / gain
