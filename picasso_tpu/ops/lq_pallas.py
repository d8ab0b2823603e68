"""Pallas TPU tile kernel for the least-squares Gaussian fitter.

Same design as ops/mle_pallas.py: a grid over 512-spot tiles, each tile
running the full LM program (ops/lq.py:_lm_core) with all per-iteration
intermediates resident in VMEM and per-tile early exit. This is the
TPU-native equivalent of the reference's vendored CUDA Gpufit DLL
(GAUSS_2D_ELLIPTIC batched LM, picasso/gausslq.py:346-395).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from picasso_tpu.ops import lq as _lq

TILE = 512


def _tile_kernel(spots_ref, nv_ref, theta_ref, *, max_it, ftol):
    spots_t = spots_ref[:, :, :]
    theta_ref[:, :] = _lq._lm_core(
        spots_t, max_it, ftol,
        n_valid=nv_ref[0, 0], lane0=pl.program_id(0) * TILE,
    )


def fit_pallas_t(
    spots_t: jnp.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
    interpret: bool = False,
    n_valid=None,
) -> jnp.ndarray:
    """Lanes-last entry: (S, S, N) f32 spots, N a multiple of TILE.
    Returns theta (6, N). Composes inside larger jitted programs (the
    fused identify+cut+fit chain feeds it directly — its ROIs are
    already lanes-last, so no transpose happens on device).
    Lanes >= ``n_valid`` start converged (bucket-padding garbage must
    not drag its tile to max_it)."""
    s, _, n = spots_t.shape
    assert n % TILE == 0, f"batch must be a multiple of {TILE}"
    kernel = functools.partial(
        _tile_kernel, max_it=max_it, ftol=float(ftol)
    )
    nv = jnp.asarray(
        n if n_valid is None else n_valid, jnp.int32
    ).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec(
                (s, s, TILE), lambda t: (0, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (6, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, n), jnp.float32),
        interpret=interpret,
    )(spots_t, nv)


# ---------------------------------------------------------------------------
# Phase-boundary LM fit (straggler compaction between log-spaced
# iteration boundaries — see ops/mle_pallas.py for the measured
# rationale; the LM carry (theta, lam, cost, done) is resumable per
# ops/lq._lm_rounds).
# ---------------------------------------------------------------------------


def _lm_state_specs(n, tile):
    rows = (6, 1, 1, 1)                      # theta, lam, cost, done
    specs = tuple(
        pl.BlockSpec((r, tile), lambda t, r=r: (0, t),
                     memory_space=pltpu.VMEM)
        for r in rows
    )
    shapes = tuple(
        jax.ShapeDtypeStruct((r, n), jnp.float32) for r in rows
    )
    return specs, shapes


def _lm_start_kernel(spots_ref, nv_ref, th_o, lam_o, cost_o, done_o,
                     *, k, ftol, tile):
    sp = spots_ref[:, :, :]
    th0, lam0, cost0, done0 = _lq._lm_init(
        sp, n_valid=nv_ref[0, 0], lane0=pl.program_id(0) * tile
    )
    th, lam, cost, done = _lq._lm_rounds(
        sp, th0, lam0, cost0, done0, k, ftol
    )
    th_o[:, :] = th
    lam_o[:, :] = lam
    cost_o[:, :] = cost
    done_o[:, :] = done


def _lm_resume_kernel(spots_ref, th_ref, lam_ref, cost_ref, done_ref,
                      th_o, lam_o, cost_o, done_o, *, k, ftol):
    th, lam, cost, done = _lq._lm_rounds(
        spots_ref[:, :, :], th_ref[:, :], lam_ref[:, :],
        cost_ref[:, :], done_ref[:, :], k, ftol,
    )
    th_o[:, :] = th
    lam_o[:, :] = lam
    cost_o[:, :] = cost
    done_o[:, :] = done


def fit_pallas_boundary_t(
    spots_t: jnp.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
    n_valid=None,
    boundaries: tuple[int, ...] | None = None,
    phase_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Phase-boundary LM fit, lanes-last: bit-identical to
    :func:`fit_pallas_t` (per-lane trajectories are position-
    independent), with stragglers compacted into the leading tiles at
    each boundary so converged tiles exit at the first condition
    check. ``phase_tile`` widens the per-phase tile (see
    ops/mle_pallas.fit_pallas_boundary_t)."""
    from picasso_tpu.ops import mle_pallas as _mp

    s, _, n = spots_t.shape
    if phase_tile is None:
        phase_tile = _mp._default_phase_tile(s, n)
    tile = phase_tile
    assert n % tile == 0, f"batch must be a multiple of {tile}"
    if boundaries is None:
        boundaries = _mp.default_boundaries(max_it)
    bs = sorted({int(b) for b in boundaries if 0 < int(b) < max_it})
    if not bs:
        return fit_pallas_t(
            spots_t, max_it, ftol, interpret=interpret,
            n_valid=n_valid,
        )
    grid = (n // tile,)
    nv = jnp.asarray(
        n if n_valid is None else n_valid, jnp.int32
    ).reshape(1, 1)
    state_specs, state_shapes = _lm_state_specs(n, tile)
    spots_spec = pl.BlockSpec(
        (s, s, tile), lambda t: (0, 0, t), memory_space=pltpu.VMEM
    )

    start = pl.pallas_call(
        functools.partial(
            _lm_start_kernel, k=bs[0], ftol=float(ftol), tile=tile
        ),
        grid=grid,
        in_specs=[spots_spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=state_specs,
        out_shape=state_shapes,
        interpret=interpret,
    )
    th, lam, cost, done = start(spots_t, nv)
    orig = jax.lax.iota(jnp.int32, n).astype(jnp.float32)[None, :]

    prev = bs[0]
    for b in bs[1:] + [max_it]:
        perm = _mp._stragglers_first(done[0])
        state = jnp.concatenate([th, lam, cost, done, orig])
        spots_t, state = _mp._permute_lanes(perm, spots_t, state)
        th, lam, cost = state[:6], state[6:7], state[7:8]
        done, orig = state[8:9], state[9:]
        resume = pl.pallas_call(
            functools.partial(
                _lm_resume_kernel, k=b - prev, ftol=float(ftol)
            ),
            grid=grid,
            in_specs=[spots_spec] + list(state_specs),
            out_specs=state_specs,
            out_shape=state_shapes,
            interpret=interpret,
        )
        th, lam, cost, done = resume(spots_t, th, lam, cost, done)
        prev = b

    orig_i = orig[0].astype(jnp.int32)
    inv = (
        jnp.zeros((n,), jnp.int32)
        .at[orig_i]
        .set(jax.lax.iota(jnp.int32, n))
    )
    (th,) = _mp._permute_lanes(inv, th)
    return th


@functools.partial(
    jax.jit, static_argnames=("max_it", "ftol", "interpret")
)
def fit_pallas(
    spots: jnp.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """LM-fit an (N, S, S) spot batch with the tiled Pallas kernel;
    N must be a multiple of TILE. Returns theta (N, 6)."""
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    return fit_pallas_t(
        spots_t, max_it=max_it, ftol=ftol, interpret=interpret
    ).T


@functools.partial(
    jax.jit, static_argnames=("max_it", "ftol", "interpret")
)
def fit_pallas_boundary(
    spots: jnp.ndarray,
    max_it: int = 30,
    ftol: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, S, S) wrapper over :func:`fit_pallas_boundary_t` — same
    contract and bit-identical results as :func:`fit_pallas`."""
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    return fit_pallas_boundary_t(
        spots_t, max_it=max_it, ftol=ftol, interpret=interpret
    ).T


_PALLAS_OK: dict[int, bool] = {}


def pallas_supported(box: int = 7) -> bool:
    """Compile-probe the kernel once per box size per process; False
    where the Mosaic lowering is unavailable OR this box exceeds the
    VMEM budget (the 7x7 probe alone cannot vouch for large boxes)."""
    if box not in _PALLAS_OK:
        try:
            probe = jnp.ones((TILE, box, box), jnp.float32)
            out = fit_pallas(probe, max_it=1)
            np.asarray(out)
            _PALLAS_OK[box] = True
        except Exception as exc:
            from picasso_tpu.ops import _probe

            if _probe.probe_failure_permanent(
                exc, _probe.current_platform()
            ):
                _PALLAS_OK[box] = False
            else:
                # transient backend weather: report, do NOT cache
                _probe.note_transient("lq", exc)
                return False
    return _PALLAS_OK[box]
