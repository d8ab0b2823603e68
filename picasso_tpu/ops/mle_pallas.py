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


def _tile_kernel(spots_ref, theta_ref, crlb_ref, ll_ref, iters_ref,
                 *, eps, max_it, method):
    spots_t = spots_ref[:, :, :]
    theta6, crlb6, ll, iters = _mle._fit_core(
        spots_t, eps, max_it, method=method
    )
    theta_ref[:, :] = theta6
    crlb_ref[:, :] = crlb6
    ll_ref[:, :] = ll[None, :]
    iters_ref[:, :] = iters[None, :].astype(jnp.int32)


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
    n, s, _ = spots.shape
    assert n % TILE == 0, f"batch must be a multiple of {TILE}"
    spots_t = jnp.transpose(spots.astype(jnp.float32), (1, 2, 0))
    grid = (n // TILE,)
    kernel = functools.partial(
        _tile_kernel, eps=eps, max_it=max_it, method=method
    )
    theta, crlb, ll, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (s, s, TILE),
                lambda t: (0, 0, t),
                memory_space=pltpu.VMEM,
            ),
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
    )(spots_t)
    return theta.T, crlb.T, ll[0], iters[0]


_PALLAS_OK: bool | None = None


def pallas_supported() -> bool:
    """Compile-probe the kernel once per process; False on platforms
    where the Mosaic lowering is unavailable."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            probe = jnp.ones((TILE, 7, 7), jnp.float32)
            out = fit_pallas(probe, 1e-3, 1, method="sigmaxy")
            np.asarray(out[3])
            _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK
