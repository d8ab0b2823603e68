"""picasso_tpu.ops.neighbors — blocked device pairwise-distance kernels.

TPU-native replacement for the reference's KDTree / threaded-numba
neighbor machinery (picasso/postprocess.py:1002 distance_histogram,
:3704 nn_analysis; picasso/spinna.py:696-845 get_NN_dist*, :846
NND_score).  A KDTree is a pointer-chasing host structure; on TPU the
idiomatic design is brute-force distance tiles streamed through VMEM:

- squared distances are computed per coordinate axis as broadcasted
  differences (D is 2 or 3, so the ``|a|^2+|b|^2-2ab`` MXU trick would
  run the systolic array at K=3 — pure overhead — and loses precision
  catastrophically for nm-scale coordinates; the difference form is
  exact to f32 rounding),
- k-nearest-neighbors keeps a running top-k carry across b-blocks
  inside one ``lax.scan`` (memory is O(N·block), never O(N·M)),
- pair histograms scan upper-triangular block pairs, scatter-adding
  into the bin vector on device.

Everything here is shape-static, masked and jit/vmap-composable so the
SPINNA batched scorer can fuse simulation + NND + KS into one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Default tile sizes: (A_CHUNK x B_BLOCK) distance tiles of f32 are
# 64 MB at 4096^2 — comfortably inside HBM working set while amortizing
# scan overhead. Tests override with small blocks to exercise padding.
A_CHUNK = 4096
B_BLOCK = 4096


def _pad_rows(x: np.ndarray, n: int, value=0.0) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.full((n - x.shape[0],) + x.shape[1:], value, x.dtype)
    return np.concatenate([x, pad], axis=0)


# ---------------------------------------------------------------------------
# k nearest neighbors
# ---------------------------------------------------------------------------


def _block_d2(a, b_blk):
    """Squared distances (Na, Bb) between a (Na, D) and b_blk (Bb, D),
    accumulated per axis so XLA never materializes (Na, Bb, D).
    Deliberately NOT the |a|^2+|b|^2-2ab^T MXU identity: distances of
    ~1e-2 x coordinate scale cancel catastrophically in f32 there
    (measured 3e-4 absolute error vs the KDTree — too coarse for the
    1e-5 parity contract)."""
    d2 = jnp.zeros((a.shape[0], b_blk.shape[0]), jnp.float32)
    for d in range(a.shape[1]):
        diff = a[:, d][:, None] - b_blk[:, d][None, :]
        d2 = d2 + diff * diff
    return d2


def _merge_topk(top, d2, k):
    """Merge running k-smallest (Na, k) with a block's distances
    (Na, Bb) by k iterative min-extractions — O(k) cheap VPU passes
    instead of lax.top_k, which lowers to a full variadic SORT of the
    merged row on TPU (the single hottest cost in the SPINNA batched
    scorer before this)."""
    if k == 1:
        return jnp.minimum(
            top, jnp.min(d2, axis=1, keepdims=True)
        )
    cur = jnp.concatenate([top, d2], axis=1)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (1, cur.shape[1]), 1
    )
    outs = []
    for _ in range(k):
        idx = jnp.argmin(cur, axis=1)
        outs.append(
            jnp.take_along_axis(cur, idx[:, None], axis=1)[:, 0]
        )
        # knock out exactly the extracted occurrence (argmin returns
        # one winner even among ties); iota compare keeps the live
        # set to cur + one bool — no integer cumsum workspace
        cur = jnp.where(cols == idx[:, None], jnp.inf, cur)
    return jnp.stack(outs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self")
)
def _knn_scan(a, a_index, b_blocks, b_valid, b_base, k, exclude_self):
    """Running top-k smallest squared distances over b blocks.

    a: (Na, D) f32; a_index: (Na,) int32 global indices (for
    self-exclusion); b_blocks: (nb, Bb, D); b_valid: (nb, Bb) bool;
    b_base: (nb,) int32 global start index of each block.
    Returns (Na, k) squared distances, +inf where fewer than k valid
    neighbors exist.
    """
    Na = a.shape[0]
    Bb = b_blocks.shape[1]
    top0 = jnp.full((Na, k), jnp.inf, jnp.float32)

    def body(top, xs):
        b_blk, valid, base = xs
        d2 = _block_d2(a, b_blk)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        if exclude_self:
            j_idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, Bb), 1
            )
            d2 = jnp.where(a_index[:, None] == j_idx, jnp.inf, d2)
        top = _merge_topk(top, d2, k)
        return top, None

    top, _ = jax.lax.scan(body, top0, (b_blocks, b_valid, b_base))
    return top


def knn(
    a: np.ndarray,
    b: np.ndarray,
    k: int,
    *,
    exclude_self: bool = False,
    a_chunk: int = A_CHUNK,
    b_block: int = B_BLOCK,
) -> np.ndarray:
    """k smallest Euclidean distances from each row of a into b.

    Drop-in for ``KDTree(b).query(a, k)`` distances (sorted ascending;
    +inf where b has fewer than k usable points). ``exclude_self``
    masks index-equal pairs — pass it when a *is* b, matching the
    reference's query(k+1)-drop-first idiom (picasso/postprocess.py:
    3704, spinna.py:696).
    """
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    N, D = a.shape
    M = b.shape[0]
    if N == 0 or k == 0:
        return np.zeros((N, k), np.float32)
    if M == 0:
        return np.full((N, k), np.inf, np.float32)
    nb = max(1, -(-M // b_block))
    b_pad = _pad_rows(b, nb * b_block)
    b_blocks = b_pad.reshape(nb, b_block, D)
    b_valid = (
        np.arange(nb * b_block).reshape(nb, b_block) < M
    )
    b_base = (np.arange(nb) * b_block).astype(np.int32)
    out = np.empty((N, k), np.float32)
    chunk = min(a_chunk, max(256, N))
    for start in range(0, N, chunk):
        stop = min(start + chunk, N)
        a_part = _pad_rows(a[start:stop], chunk)
        idx = (start + np.arange(chunk)).astype(np.int32)
        d2 = _knn_scan(
            a_part, idx, b_blocks, b_valid, b_base, k, exclude_self
        )
        out[start:stop] = np.asarray(d2)[: stop - start]
    return np.sqrt(out)


def knn_masked(
    a, b, a_mask, b_mask, k: int, exclude_self: bool = False,
    b_block: int | None = None,
):
    """Device-resident masked kNN, jit/vmap-composable.

    a: (N, D), b: (M, D) with boolean validity masks. Returns (N, k)
    distances; rows with a_mask False and missing neighbors are +inf.
    ``b_block`` (a static divisor of M after padding) bounds the live
    distance tile at (N, b_block) — vmapping callers (the SPINNA
    batched scorer) use it to keep batch x N x block inside HBM.
    """
    M, D = b.shape
    if b_block is None or b_block >= M:
        b_block = M
    nb = -(-M // b_block)
    pad = nb * b_block - M
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros((pad, D), b.dtype)], axis=0
        )
        b_mask = jnp.concatenate(
            [b_mask, jnp.zeros((pad,), bool)], axis=0
        )
    b_blocks = b.reshape(nb, b_block, D)
    b_valid = b_mask.reshape(nb, b_block)
    b_base = (
        jax.lax.broadcasted_iota(jnp.int32, (nb,), 0) * b_block
    )
    a_index = jax.lax.broadcasted_iota(jnp.int32, (a.shape[0],), 0)
    d2 = _knn_scan(
        a, a_index, b_blocks, b_valid, b_base, k, exclude_self
    )
    d = jnp.sqrt(d2)
    return jnp.where(a_mask[:, None], d, jnp.inf)


# ---------------------------------------------------------------------------
# 2-sample Kolmogorov–Smirnov statistic (device)
# ---------------------------------------------------------------------------


_KS_S_BLOCK = 8192


def ks_2samp_masked(sample, sample_mask, gt_sorted):
    """KS statistic between a masked device sample and a fixed sorted
    reference sample (all valid). Matches
    ``scipy.stats.ks_2samp(sample, gt).statistic`` exactly for finite
    inputs (picasso/spinna.py:846 scores with the statistic only).

    Sort-free: F2 is piecewise-constant between consecutive gt points,
    so sup(F1-F2) over interval (g_j, g_{j+1}] is the F1 left-limit at
    g_{j+1} minus j/n2, and sup(F2-F1) is j/n2 minus F1(g_j) — the
    exact statistic needs only count(sample < g) and count(sample <= g)
    per gt point, a blocked compare-count instead of sorting the (wide,
    mostly padded) sample. TPU row sorts were the single hottest op of
    the SPINNA batched scorer; this is ~7x cheaper at its shapes.

    sample: (S,) f32 with sample_mask (S,) bool; gt_sorted: (G,) f32
    ascending. Invalid sample entries are excluded from the sample
    ECDF. Returns a scalar in [0, 1]; 1.0 when the masked sample is
    empty (matching NND_score's empty-pair convention).
    """
    G = gt_sorted.shape[0]
    n2 = jnp.float32(G)
    valid = sample_mask & jnp.isfinite(sample)
    n1 = jnp.sum(valid).astype(jnp.float32)
    s = jnp.where(valid, sample, jnp.inf)
    S = s.shape[0]
    blk = min(_KS_S_BLOCK, S)
    nb = -(-S // blk)
    pad = nb * blk - S
    if pad:
        s = jnp.concatenate(
            [s, jnp.full((pad,), jnp.inf, s.dtype)]
        )
    blocks = s.reshape(nb, blk)

    def body(carry, b):
        le, lt = carry
        cmp = b[:, None] - gt_sorted[None, :]
        le = le + jnp.sum((cmp <= 0).astype(jnp.int32), axis=0)
        lt = lt + jnp.sum((cmp < 0).astype(jnp.int32), axis=0)
        return (le, lt), None

    zero = jnp.zeros((G,), jnp.int32)
    (le, lt), _ = jax.lax.scan(body, (zero, zero), blocks)
    inv_n1 = 1.0 / jnp.maximum(n1, 1.0)
    f1_le = le.astype(jnp.float32) * inv_n1  # F1 at g_j
    f1_lt = lt.astype(jnp.float32) * inv_n1  # F1 left-limit at g_j
    j_hi = (
        jax.lax.broadcasted_iota(jnp.float32, (G,), 0) + 1.0
    ) / n2  # F2 at g_j
    j_lo = jax.lax.broadcasted_iota(jnp.float32, (G,), 0) / n2
    # intervals right of g_j (incl. past g_G where F2 = 1) and left
    # of g_j (incl. before g_1 where F2 = 0)
    d = jnp.maximum(
        jnp.max(j_hi - f1_le), jnp.max(f1_lt - j_lo)
    )
    return jnp.where(n1 > 0, jnp.maximum(d, 0.0), 1.0)


# ---------------------------------------------------------------------------
# Pairwise distance histogram (device, blocked over block pairs)
# ---------------------------------------------------------------------------

# Block-pair tiles per device call: each (PAIR_BLOCK x PAIR_BLOCK) tile
# can contribute at most PAIR_BLOCK^2 counts, so cap pairs/call to keep
# the uint32 histogram from overflowing (host accumulates in uint64).
PAIR_BLOCK = 2048
_PAIRS_PER_CALL = 768


@functools.partial(jax.jit, static_argnames=("n_bins", "block"))
def _dh_scan(pts, valid, pair_ij, inv_bin, n_bins, block):
    """Histogram pair distances for a list of block pairs.

    pts: (nb*block, D) padded points; valid: (nb*block,) bool;
    pair_ij: (P, 2) int32 block indices with i <= j (padding rows use
    i = j = -1 and are skipped via the validity mask).
    """
    D = pts.shape[1]

    def body(hist, ij):
        i, j = ij[0], ij[1]
        live = i >= 0
        i = jnp.maximum(i, 0)
        j = jnp.maximum(j, 0)
        a = jax.lax.dynamic_slice(pts, (i * block, 0), (block, D))
        b = jax.lax.dynamic_slice(pts, (j * block, 0), (block, D))
        va = jax.lax.dynamic_slice(valid, (i * block,), (block,))
        vb = jax.lax.dynamic_slice(valid, (j * block,), (block,))
        d2 = _block_d2(a, b)
        gi = i * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, 1), 0
        )
        gj = j * block + jax.lax.broadcasted_iota(
            jnp.int32, (1, block), 1
        )
        ok = (
            va[:, None]
            & vb[None, :]
            & (gi < gj)
            & live
        )
        bins = jnp.floor(jnp.sqrt(d2) * inv_bin).astype(jnp.int32)
        bins = jnp.where(ok & (bins < n_bins), bins, n_bins)
        hist = hist.at[bins.ravel()].add(1, mode="drop")
        return hist, None

    hist0 = jnp.zeros((n_bins + 1,), jnp.uint32)
    hist, _ = jax.lax.scan(body, hist0, pair_ij)
    return hist[:n_bins]


def pairwise_distance_histogram(
    pts: np.ndarray,
    bin_size: float,
    n_bins: int,
    *,
    block: int = PAIR_BLOCK,
) -> np.ndarray:
    """Histogram of all i<j pair distances, bin k = [k*bs, (k+1)*bs).

    The device analogue of the reference's threaded-numba block scan
    (picasso/postprocess.py:1002) — but counts ALL pairs (the
    reference's 2x2 forward-window scan structurally undercounts; see
    postprocess.distance_histogram's documented divergence).
    Returns uint64 counts (host-accumulated across scan chunks).
    """
    pts = np.ascontiguousarray(pts, np.float32)
    N, D = pts.shape
    out = np.zeros(n_bins, np.uint64)
    if N < 2 or n_bins <= 0:
        return out
    # small inputs shrink the tile edge (power-of-two bucket, >=128)
    # instead of sweeping full 2048^2 tiles — a 2-point histogram must
    # not execute 768 padded block pairs (it cost 10 s on CPU)
    block = min(block, 1 << max(7, (N - 1).bit_length()))
    nb = -(-N // block)
    pts_pad = _pad_rows(pts, nb * block)
    valid = np.arange(nb * block) < N
    ii, jj = np.triu_indices(nb)
    pairs = np.column_stack([ii, jj]).astype(np.int32)
    inv_bin = np.float32(1.0 / bin_size)
    per_call = _PAIRS_PER_CALL
    for start in range(0, len(pairs), per_call):
        chunk = pairs[start : start + per_call]
        pad_len = max(1, 1 << (len(chunk) - 1).bit_length())
        chunk = _pad_rows(
            chunk, min(per_call, pad_len), value=-1
        )
        hist = _dh_scan(
            jnp.asarray(pts_pad),
            jnp.asarray(valid),
            jnp.asarray(chunk),
            inv_bin,
            n_bins,
            block,
        )
        out += np.asarray(hist, np.uint64)
    return out


# ---------------------------------------------------------------------------
# Radius neighbor counts (device, for local density)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("exclude_self",))
def _radius_count_scan(a, a_index, b_blocks, b_valid, b_base, r2,
                       exclude_self):
    Na = a.shape[0]
    Bb = b_blocks.shape[1]

    def body(counts, xs):
        b_blk, valid, base = xs
        d2 = _block_d2(a, b_blk)
        ok = valid[None, :] & (d2 <= r2)
        if exclude_self:
            j_idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, Bb), 1
            )
            ok = ok & (a_index[:, None] != j_idx)
        return counts + jnp.sum(ok, axis=1, dtype=jnp.int32), None

    counts, _ = jax.lax.scan(
        body, jnp.zeros((Na,), jnp.int32), (b_blocks, b_valid, b_base)
    )
    return counts


def radius_count(
    a: np.ndarray,
    b: np.ndarray,
    r: float,
    *,
    exclude_self: bool = False,
    a_chunk: int = A_CHUNK,
    b_block: int = B_BLOCK,
) -> np.ndarray:
    """Number of points of b within distance r (inclusive) of each row
    of a — the device analogue of
    ``KDTree.query_ball_point(..., return_length=True)``."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    N, D = a.shape
    M = b.shape[0]
    if N == 0 or M == 0:
        return np.zeros(N, np.int32)
    nb = -(-M // b_block)
    b_pad = _pad_rows(b, nb * b_block)
    b_blocks = b_pad.reshape(nb, b_block, D)
    b_valid = np.arange(nb * b_block).reshape(nb, b_block) < M
    b_base = (np.arange(nb) * b_block).astype(np.int32)
    r2 = np.float32(r) ** 2
    out = np.empty(N, np.int32)
    chunk = min(a_chunk, max(256, N))
    for start in range(0, N, chunk):
        stop = min(start + chunk, N)
        a_part = _pad_rows(a[start:stop], chunk)
        idx = (start + np.arange(chunk)).astype(np.int32)
        counts = _radius_count_scan(
            a_part, idx, b_blocks, b_valid, b_base, r2, exclude_self
        )
        out[start:stop] = np.asarray(counts)[: stop - start]
    return out


def use_device() -> bool:
    """Route pairwise-distance work to these blocked device kernels or
    a host KDTree. ``PICASSO_TPU_NEIGHBORS`` = device|host forces a
    path; the default (auto) uses the device kernels on TPU — where
    brute-force distance tiles beat a pointer-chasing KDTree by orders
    of magnitude — and the KDTree on CPU backends, where it is the
    stronger algorithm."""
    import os

    mode = os.environ.get("PICASSO_TPU_NEIGHBORS", "auto")
    if mode == "host":
        return False
    if mode == "device":
        return True
    import jax

    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=())
def _radius_max_scan(a, b_blocks, b_valid, b_vals, r2):
    def body(cur, xs):
        b_blk, valid, vals = xs
        d2 = _block_d2(a, b_blk)
        ok = valid[None, :] & (d2 <= r2)
        contrib = jnp.where(ok, vals[None, :], -jnp.inf)
        return jnp.maximum(cur, jnp.max(contrib, axis=1)), None

    out, _ = jax.lax.scan(
        body,
        jnp.full((a.shape[0],), -jnp.inf, jnp.float32),
        (b_blocks, b_valid, b_vals),
    )
    return out


def radius_max(
    a: np.ndarray,
    b: np.ndarray,
    r: float,
    values: np.ndarray,
    *,
    a_chunk: int = A_CHUNK,
    b_block: int = B_BLOCK,
) -> np.ndarray:
    """Max of ``values[j]`` over all b[j] within distance r (inclusive)
    of each row of a — the neighborhood max-reduce used by the SMLM
    local-maxima clusterer (picasso/clusterer.py:114 assign_to_cluster
    prelude). Rows with no neighbor in range return -inf."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    N, D = a.shape
    M = b.shape[0]
    if N == 0 or M == 0:
        return np.full(N, -np.inf, np.float32)
    nb = -(-M // b_block)
    b_pad = _pad_rows(b, nb * b_block)
    b_blocks = b_pad.reshape(nb, b_block, D)
    b_valid = np.arange(nb * b_block).reshape(nb, b_block) < M
    b_vals = _pad_rows(values, nb * b_block).reshape(nb, b_block)
    r2 = np.float32(r) ** 2
    out = np.empty(N, np.float32)
    chunk = min(a_chunk, max(256, N))
    for start in range(0, N, chunk):
        stop = min(start + chunk, N)
        a_part = _pad_rows(a[start:stop], chunk)
        res = _radius_max_scan(
            a_part, b_blocks, b_valid, b_vals, r2
        )
        out[start:stop] = np.asarray(res)[: stop - start]
    return out
