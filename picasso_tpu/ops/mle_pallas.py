"""Pallas TPU tile kernel for the MLE Gaussian fitter.

Runs the exact fit program of ops/mle.py (_fit_core — same separable
bilinear math, same convergence semantics) inside a Pallas kernel with
a grid over spot tiles. Two wins over the monolithic XLA program:

1. Every per-iteration intermediate (C/D grids, axis factors) lives in
   VMEM for the tile — spots stream from HBM exactly once.
2. Per-TILE early exit: each tile's while_loop stops when ITS spots
   converge. With heavy-tailed per-spot iteration counts, the batch
   cost drops from max-over-batch to mean of max-over-tile.

Numerics are identical to the XLA path (same jnp ops); the only
difference is summation tiling. Used by gaussmle_batched when enabled
and supported; falls back to the XLA program otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from picasso_tpu.ops import mle as _mle

# Spots per tile: lanes-last layout (S, S, TILE). 512 lanes keeps all
# per-iteration intermediates (~60 (S, TILE) rows + 2 (S, S, TILE)
# grids) comfortably inside VMEM for S<=15.
TILE = 512


def _tile_kernel(spots_ref, nv_ref, theta_ref, crlb_ref, ll_ref,
                 iters_ref, *, eps, max_it, method):
    spots_t = spots_ref[:, :, :]
    lane0 = pl.program_id(0) * TILE
    theta6, crlb6, ll, iters = _mle._fit_core(
        spots_t, eps, max_it, method=method,
        n_valid=nv_ref[0, 0], lane0=lane0,
    )
    theta_ref[:, :] = theta6
    crlb_ref[:, :] = crlb6
    ll_ref[:, :] = ll[None, :]
    iters_ref[:, :] = iters[None, :].astype(jnp.int32)


def fit_pallas_t(
    spots_t: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    interpret: bool = False,
    n_valid=None,
):
    """Lanes-last entry: (S, S, N) f32 spots, N a multiple of TILE.
    Returns (theta (6, N), crlb (6, N), ll (N,), iters (N,)).
    Composes inside larger jitted programs (the fused
    identify+cut+fit chain feeds it directly).

    ``n_valid``: lanes at index >= n_valid start converged (bucket
    padding must not drag its tile to max_it — see _mle._fit_core).
    """
    s, _, n = spots_t.shape
    assert n % TILE == 0, f"batch must be a multiple of {TILE}"
    grid = (n // TILE,)
    kernel = functools.partial(
        _tile_kernel, eps=eps, max_it=max_it, method=method
    )
    nv = jnp.asarray(
        n if n_valid is None else n_valid, jnp.int32
    ).reshape(1, 1)
    theta, crlb, ll, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (s, s, TILE),
                lambda t: (0, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (6, TILE), lambda t: (0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (6, TILE), lambda t: (0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE), lambda t: (0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE), lambda t: (0, t),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        interpret=interpret,
    )(spots_t, nv)
    return theta, crlb, ll[0], iters[0]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "max_it", "method", "interpret"),
)
def fit_pallas(
    spots: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    interpret: bool = False,
):
    """Fit an (N, S, S) spot batch with the tiled Pallas kernel.
    N must be a multiple of TILE. Returns (thetas (N, 6), CRLBs (N, 6),
    log_likelihoods (N,), iterations (N,))."""
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    theta, crlb, ll, iters = fit_pallas_t(
        spots_t, eps, max_it, method=method, interpret=interpret
    )
    return theta.T, crlb.T, ll, iters


@functools.partial(
    jax.jit,
    static_argnames=("eps", "max_it", "method", "interpret"),
)
def fit_pallas_boundary(
    spots: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    interpret: bool = False,
):
    """(N, S, S) wrapper over :func:`fit_pallas_boundary_t` — same
    contract as :func:`fit_pallas`, bit-identical results, straggler
    compaction between log-spaced boundaries."""
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    theta, crlb, ll, iters = fit_pallas_boundary_t(
        spots_t, eps, max_it, method=method, interpret=interpret
    )
    return theta.T, crlb.T, ll, iters


_PALLAS_OK: dict[tuple[int, str], bool] = {}


def pallas_supported(box: int = 7, method: str = "sigmaxy") -> bool:
    """Compile-probe the kernel once per (box, method) per process;
    False where the Mosaic lowering is unavailable OR this particular
    shape exceeds the VMEM budget — large boxes can fail even when the
    7x7 probe compiles, so the gate must match the real call."""
    key = (box, method)
    if key not in _PALLAS_OK:
        try:
            probe = jnp.ones((TILE, box, box), jnp.float32)
            out = fit_pallas(probe, 1e-3, 1, method=method)
            np.asarray(out[3])
            _PALLAS_OK[key] = True
        except Exception as exc:
            from picasso_tpu.ops import _probe

            if _probe.probe_failure_permanent(
                exc, _probe.current_platform()
            ):
                _PALLAS_OK[key] = False
            else:
                # transient backend weather: report, do NOT cache
                _probe.note_transient("mle", exc)
                return False
    return _PALLAS_OK[key]


# ---------------------------------------------------------------------------
# Multi-round fit with straggler compaction
# ---------------------------------------------------------------------------
# Per-spot iteration counts are heavy-tailed (mean ~8, p99 ~20, max
# ~100): a tile runs until ITS slowest spot converges, so random spot
# placement makes every tile pay near the global tail. Running the fit
# as short rounds and stable-sorting lanes by convergence between
# rounds packs the stragglers into the leading tiles — converged tiles'
# while_loops exit on the first condition check (~free) — cutting the
# Newton cost from per-tile-max toward the true per-spot mean. The
# whole schedule (rounds statically unrolled, argsort + gather between
# them) compiles into ONE device program: no extra host round-trips.
#
# NOT the default path: measured on a v5e chip at box=7, one lane-axis
# gather of the spot batch costs ~5 ms — more than the ~7 ms of
# straggler iterations the whole schedule can save, so
# gaussmle_batched keeps the single-pass kernel. Retained (with a
# bit-exactness test) because the trade flips for larger boxes or
# much higher iteration caps, where Newton work grows but the gather
# cost is unchanged.


# ---------------------------------------------------------------------------
# Phase-boundary fit: log-spaced straggler compaction
# ---------------------------------------------------------------------------
# Round-5 measurement (118k dense spots, (256, 256²) chunk): per-spot
# Newton iteration counts are heavy-tailed — 45% of spots are still
# iterating at 12, 15% at 32, 4% never converge — and the stragglers
# are spread uniformly, so EVERY 512-lane tile runs to max_it: 23,100
# tile-iterations where an oracle lane order needs 4,536 (0.196×). No
# pre-fit feature predicts iteration count (best, sx+sy, reaches only
# 0.78×; net gradient 0.95×) — but after K iterations the done mask is
# a PERFECT predictor of "needs more". So: run K iterations, stable-
# partition lanes (stragglers first) with a sort-free counting-sort
# permutation, resume; converged tiles' while_loops exit on the first
# condition check. The multiround variant below this section lost to
# its own argsort + lane-axis takes (~5 ms per round); the boundary
# permute here measures 0.21 ms per 49-row batch on chip (counting-
# sort slot + transpose + row-gather — gathers must ride whole
# trailing rows, CLAUDE.md round-3/4 rules). Log-spaced boundaries
# track the tail with O(log max_it) permutes.


def _phase_specs(s, R, with_state, tile):
    specs = [
        pl.BlockSpec((s, s, tile), lambda t: (0, 0, t),
                     memory_space=pltpu.VMEM),       # spots
    ]
    if with_state:
        for r in (R, R, 1, 1, R):                    # th/old/done/it/ms
            specs.append(
                pl.BlockSpec((r, tile), lambda t, r=r: (0, t),
                             memory_space=pltpu.VMEM)
            )
    return specs


def _phase_state_out(n, R, tile):
    specs = tuple(
        pl.BlockSpec((r, tile), lambda t, r=r: (0, t),
                     memory_space=pltpu.VMEM)
        for r in (R, R, 1, 1, R)
    )
    shapes = tuple(
        jax.ShapeDtypeStruct((r, n), jnp.float32)
        for r in (R, R, 1, 1, R)
    )
    return specs, shapes


def _start_phase_kernel(spots_ref, nv_ref, th_o, old_o, done_o, it_o,
                        ms_o, *, eps, k, method, tile):
    th, old, done, it, ms = _mle._fit_start(
        spots_ref[:, :, :], eps, k, method,
        n_valid=nv_ref[0, 0], lane0=pl.program_id(0) * tile,
    )
    th_o[:, :] = th
    old_o[:, :] = old
    done_o[:, :] = done
    it_o[:, :] = it
    ms_o[:, :] = ms


def _resume_phase_kernel(spots_ref, th_ref, old_ref, done_ref, it_ref,
                         ms_ref, th_o, old_o, done_o, it_o, ms_o, *,
                         eps, k, method):
    th, old, done, it, ms = _mle._fit_resume(
        spots_ref[:, :, :], th_ref[:, :], old_ref[:, :],
        done_ref[:, :], it_ref[:, :], ms_ref[:, :], eps, k, method,
    )
    th_o[:, :] = th
    old_o[:, :] = old
    done_o[:, :] = done
    it_o[:, :] = it
    ms_o[:, :] = ms


def _finish_phase_kernel(spots_ref, th_ref, old_ref, done_ref, it_ref,
                         ms_ref, theta_o, crlb_o, ll_o, iters_o, *,
                         eps, k, method):
    theta6, crlb6, ll, iters = _mle._fit_finish(
        spots_ref[:, :, :], th_ref[:, :], old_ref[:, :],
        done_ref[:, :], it_ref[:, :], ms_ref[:, :], eps, k, method,
    )
    theta_o[:, :] = theta6
    crlb_o[:, :] = crlb6
    ll_o[:, :] = ll[None, :]
    iters_o[:, :] = iters[None, :].astype(jnp.int32)


def _permute_lanes(perm, *arrays_t):
    """Permute the LAST (lane) axis of each array by ``perm`` via the
    fast whole-trailing-row gather: (R, N) → rows-first (N, R) → row
    gather → back. Lane-axis advanced indexing would be the slow
    elementwise-gather path (round-3 table)."""
    outs = []
    for a in arrays_t:
        flat = a.reshape(-1, a.shape[-1])
        outs.append(jnp.take(flat.T, perm, axis=0).T.reshape(a.shape))
    return outs


def _stragglers_first(done_row):
    """Stable counting-sort permutation putting unconverged lanes
    first: perm (N,) i32 with new_pos → old_pos. Sort-free (argsort
    lowers to a ~3M elem/s variadic sort; two cumsums + a 1-to-1
    scatter are ~free)."""
    n = done_row.shape[0]
    unconv = 1.0 - done_row
    cu = jnp.cumsum(unconv)
    slot = jnp.where(
        unconv > 0.5, cu - 1.0, cu[-1] + jnp.cumsum(done_row) - 1.0
    ).astype(jnp.int32)
    t = jax.lax.iota(jnp.int32, n)
    return jnp.zeros((n,), jnp.int32).at[slot].set(t)


def default_boundaries(max_it: int) -> tuple[int, ...]:
    """Two log-spaced compaction points (~max_it/6 and /2). On-chip
    A/B over the measured iteration histogram (tools/measure_r5g):
    (16, 48) beat (12, 25, 50) and (8, 16, 32, 64) at max_it=100 —
    each extra phase costs a full-grid pass of fixed per-tile
    overhead, so two well-placed boundaries win."""
    bs = sorted({
        b for b in (max(max_it // 6, 4), max_it // 2) if b < max_it
    })
    return tuple(bs)


def _default_phase_tile(s: int, n: int) -> int:
    """Widest phase tile that divides n within the VMEM budget
    (~60 (S, tile) f32 rows + 3 (S, S, tile) grids + state): 2048
    lanes for s <= 9, 1024 for s <= 13, else the base TILE."""
    cap = 2048 if s <= 9 else (1024 if s <= 13 else TILE)
    t = cap
    while t > TILE and n % t:
        t //= 2
    return t if n % t == 0 else TILE


def fit_pallas_boundary_t(
    spots_t: jnp.ndarray,
    eps: float,
    max_it: int,
    method: str = "sigmaxy",
    n_valid=None,
    boundaries: tuple[int, ...] | None = None,
    phase_tile: int | None = None,
    interpret: bool = False,
):
    """Phase-boundary MLE fit, lanes-last: same contract and BIT-
    IDENTICAL results as :func:`fit_pallas_t` (resumed Newton rounds
    reproduce the single-pass trajectory per lane; the permutes only
    relocate lanes), but tiles stop paying for stragglers they don't
    own. Composes inside the fused identify+cut+fit chain.

    ``phase_tile`` widens the per-phase tile (fewer grid steps — the
    measured fixed cost is ~8 µs per grid step, so a 256-step phase
    pays ~2 ms of pure overhead at TILE=512). Early-exit granularity
    stays fine-grained because lanes are stragglers-first: at most
    one tile per phase straddles the active front."""
    s, _, n = spots_t.shape
    if phase_tile is None:
        phase_tile = _default_phase_tile(s, n)
    tile = phase_tile
    assert n % tile == 0, f"batch must be a multiple of {tile}"
    if boundaries is None:
        boundaries = default_boundaries(max_it)
    bs = sorted({int(b) for b in boundaries if 0 < int(b) < max_it})
    if not bs:
        return fit_pallas_t(
            spots_t, eps, max_it, method=method, n_valid=n_valid,
            interpret=interpret,
        )
    R = 6 if method == "sigmaxy" else 5
    grid = (n // tile,)
    nv = jnp.asarray(
        n if n_valid is None else n_valid, jnp.int32
    ).reshape(1, 1)
    state_out, state_shapes = _phase_state_out(n, R, tile)

    start = pl.pallas_call(
        functools.partial(
            _start_phase_kernel, eps=eps, k=bs[0], method=method,
            tile=tile,
        ),
        grid=grid,
        in_specs=_phase_specs(s, R, False, tile)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=state_out,
        out_shape=state_shapes,
        interpret=interpret,
    )
    th, old, done, iters, ms = start(spots_t, nv)
    # original lane index, carried as an f32 row through the permutes
    # (exact for n < 2^24; avoids slow 1D integer lane gathers)
    orig = jax.lax.iota(jnp.int32, n).astype(jnp.float32)[None, :]

    def compact(spots_t, th, old, done, iters, ms, orig):
        perm = _stragglers_first(done[0])
        state = jnp.concatenate([th, old, done, iters, ms, orig])
        spots_t, state = _permute_lanes(perm, spots_t, state)
        th, old = state[:R], state[R:2 * R]
        done, iters = state[2 * R:2 * R + 1], state[2 * R + 1:2 * R + 2]
        ms, orig = state[2 * R + 2:3 * R + 2], state[3 * R + 2:]
        return spots_t, th, old, done, iters, ms, orig

    prev = bs[0]
    for b in bs[1:]:
        spots_t, th, old, done, iters, ms, orig = compact(
            spots_t, th, old, done, iters, ms, orig
        )
        resume = pl.pallas_call(
            functools.partial(
                _resume_phase_kernel, eps=eps, k=b - prev,
                method=method,
            ),
            grid=grid,
            in_specs=_phase_specs(s, R, True, tile),
            out_specs=state_out,
            out_shape=state_shapes,
            interpret=interpret,
        )
        th, old, done, iters, ms = resume(
            spots_t, th, old, done, iters, ms
        )
        prev = b

    spots_t, th, old, done, iters, ms, orig = compact(
        spots_t, th, old, done, iters, ms, orig
    )
    finish = pl.pallas_call(
        functools.partial(
            _finish_phase_kernel, eps=eps, k=max_it - prev,
            method=method,
        ),
        grid=grid,
        in_specs=_phase_specs(s, R, True, tile),
        out_specs=(
            pl.BlockSpec((6, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        interpret=interpret,
    )
    theta6, crlb6, ll, it_i = finish(spots_t, th, old, done, iters, ms)

    # undo the composed permutation: lane i holds original spot
    # orig[i]; inv[orig[i]] = i, then one row-gather restores order
    orig_i = orig[0].astype(jnp.int32)
    inv = (
        jnp.zeros((n,), jnp.int32)
        .at[orig_i]
        .set(jax.lax.iota(jnp.int32, n))
    )
    out = jnp.concatenate(
        [theta6, crlb6, ll, it_i.astype(jnp.float32)]
    )
    (out,) = _permute_lanes(inv, out)
    return (
        out[0:6], out[6:12], out[12],
        out[13].astype(jnp.int32),
    )


def _round_specs(s):
    state_in = [
        pl.BlockSpec((s, s, TILE), lambda t: (0, 0, t),
                     memory_space=pltpu.VMEM),       # spots
        pl.BlockSpec((6, TILE), lambda t: (0, t),
                     memory_space=pltpu.VMEM),       # theta
        pl.BlockSpec((6, TILE), lambda t: (0, t),
                     memory_space=pltpu.VMEM),       # old
        pl.BlockSpec((1, TILE), lambda t: (0, t),
                     memory_space=pltpu.VMEM),       # done
        pl.BlockSpec((1, TILE), lambda t: (0, t),
                     memory_space=pltpu.VMEM),       # iters
        pl.BlockSpec((6, TILE), lambda t: (0, t),
                     memory_space=pltpu.VMEM),       # max_step
    ]
    state_out = tuple(state_in[1:])
    return state_in, state_out


def _state_shapes(n):
    return (
        jax.ShapeDtypeStruct((6, n), jnp.float32),
        jax.ShapeDtypeStruct((6, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((6, n), jnp.float32),
    )


def _first_round_kernel(spots_ref, theta_o, old_o, done_o, iters_o,
                        ms_o, *, eps, round_it):
    sp = spots_ref[:, :, :]
    th0, old0, done0, it0, ms = _mle._init_state(sp, "sigmaxy")
    th, old, done, it = _mle._run_newton_rounds(
        sp, th0, old0, done0, it0, ms, eps, round_it, "sigmaxy"
    )
    theta_o[:, :] = th
    old_o[:, :] = old
    done_o[:, :] = done
    iters_o[:, :] = it
    ms_o[:, :] = ms


def _resume_round_kernel(spots_ref, th_ref, old_ref, done_ref,
                         it_ref, ms_ref, theta_o, old_o, done_o,
                         iters_o, ms_o, *, eps, round_it):
    sp = spots_ref[:, :, :]
    ms = ms_ref[:, :]
    th, old, done, it = _mle._run_newton_rounds(
        sp,
        th_ref[:, :],
        old_ref[:, :],
        done_ref[:, :],
        it_ref[:, :],
        ms,
        eps,
        round_it,
        "sigmaxy",
    )
    theta_o[:, :] = th
    old_o[:, :] = old
    done_o[:, :] = done
    iters_o[:, :] = it
    ms_o[:, :] = ms


def _finalize_kernel(spots_ref, th_ref, theta_o, crlb_o, ll_o):
    sp = spots_ref[:, :, :]
    th6, crlb6, ll = _mle._crlb_ll_for(th_ref[:, :], sp, "sigmaxy")
    theta_o[:, :] = th6
    crlb_o[:, :] = crlb6
    ll_o[:, :] = ll[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "max_it", "round_it", "interpret"),
)
def fit_pallas_multiround(
    spots: jnp.ndarray,
    eps: float,
    max_it: int,
    round_it: int = 8,
    interpret: bool = False,
):
    """Multi-round sigmaxy MLE fit with straggler compaction; same
    returns as fit_pallas, bit-identical results (the resumed Newton
    trajectory and the final CRLB pass compute the exact same values,
    just in sorted lane positions)."""
    n, s, _ = spots.shape
    assert n % TILE == 0, f"batch must be a multiple of {TILE}"
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    grid = (n // TILE,)
    in_specs, out_specs = _round_specs(s)

    first = pl.pallas_call(
        functools.partial(
            _first_round_kernel, eps=eps,
            round_it=min(round_it, max_it),
        ),
        grid=grid,
        in_specs=in_specs[:1],
        out_specs=out_specs,
        out_shape=_state_shapes(n),
        interpret=interpret,
    )
    th, old, done, iters, ms = first(spots_t)

    perm = jnp.arange(n)
    budget = max_it - min(round_it, max_it)
    while budget > 0:
        r = min(round_it, budget)
        budget -= r
        # stable partition: unconverged lanes (done 0.0) first
        order = jnp.argsort(done[0], stable=True)
        perm = perm[order]
        spots_t = jnp.take(spots_t, order, axis=2)
        th = jnp.take(th, order, axis=1)
        old = jnp.take(old, order, axis=1)
        done = jnp.take(done, order, axis=1)
        iters = jnp.take(iters, order, axis=1)
        ms = jnp.take(ms, order, axis=1)
        resume = pl.pallas_call(
            functools.partial(
                _resume_round_kernel, eps=eps, round_it=r
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=_state_shapes(n),
            interpret=interpret,
        )
        th, old, done, iters, ms = resume(
            spots_t, th, old, done, iters, ms
        )

    finalize = pl.pallas_call(
        _finalize_kernel,
        grid=grid,
        in_specs=in_specs[:2],
        out_specs=(
            out_specs[0],
            out_specs[0],
            pl.BlockSpec((1, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,
    )
    th6, crlb, ll = finalize(spots_t, th)

    # undo the accumulated permutation
    inv = jnp.argsort(perm)
    return (
        th6[:, inv].T,
        crlb[:, inv].T,
        ll[0, inv],
        iters[0, inv].astype(jnp.int32),
    )
