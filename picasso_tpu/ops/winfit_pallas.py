"""Fused ROI-extraction + Gaussian-fit Pallas TPU kernel ("winfit").

Round-5 chain-budget attack (VERDICT r4 next #4): in the round-4
pipeline the ROI cut (7.3 ms), the photon-conversion glue (~2.2 ms)
and the fit (5.2 ms) are three separate HBM round-trips over the same
bytes — the barrel column extraction streams the gathered window rows
through HBM log₂(X/box) times, materializes (box, box, N) ROIs, XLA
converts them to photons as another full pass, and only then does the
fit kernel read them back.  This kernel collapses all of that into ONE
pass: the transposed overlapped-window row gather (the ``wincols``
form, one native-dtype gather row per spot) writes (box·X, N) to HBM
once, and the kernel reads each 512-spot tile into VMEM where it

1. barrel-extracts the per-spot columns (coarse-to-fine conditional
   static-slice selects along a SUBLANE axis — widths pad to 8s, and
   VMEM bandwidth makes the select traffic free),
2. converts to photons ((raw − baseline) · sensitivity/gain), and
3. runs the full LM / Newton-MLE fit program (ops/lq.py / ops/mle.py —
   the exact same jnp code the standalone tile kernels run, so results
   are bit-identical to the unfused path).

The reference counterpart is the ``_cut_spots_numba`` → ``_to_photons``
→ Gpufit/threaded-MLE sequence (picasso/localize.py:917/:1101/:1344),
which likewise streams spot ROIs through memory between stages.

Mosaic notes (CLAUDE.md): no ``jnp.pad`` — the barrel right-aligns its
``hi`` windows instead of padding; offsets are carried as a (1, TILE)
i32 row; baseline/sensitivity ride in SMEM as (1, 1) scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from picasso_tpu.ops import lq as _lq
from picasso_tpu.ops import mle as _mle

TILE = 512


def _barrel_mid(arr, offs, out: int):
    """Extract ``out`` consecutive elements along axis 1 of ``arr``
    ((B0, W, TILE)) at per-lane offsets ``offs`` ((1, TILE) i32,
    0 <= offs <= W - out): one conditional static-slice select per
    offset bit over strictly narrowing windows.

    Differs from ops/fused._barrel_extract in one Mosaic-driven way:
    when the kept width exceeds ``W - d`` the ``hi`` window is
    RIGHT-ALIGNED (start ``W - w2``) instead of zero-padded, and the
    subtracted shift follows — ``jnp.pad`` has no Mosaic lowering.
    Invariant per step: remaining offset < 2d, both windows cover
    every position the offset can still take. Selects only — exact
    for every dtype.
    """
    w = arr.shape[1]
    r = w - out
    if r <= 0:
        return arr
    s = offs.astype(jnp.int32)
    d = 1 << (r.bit_length() - 1)
    while d >= 1:
        w2 = max(w - d, out + d - 1)
        shift = w - w2  # hi-window start; <= d by construction
        hi = jax.lax.slice_in_dim(arr, shift, w, axis=1)
        lo = jax.lax.slice_in_dim(arr, 0, w2, axis=1)
        take = s >= d
        arr = jnp.where(take[:, None, :], hi, lo)
        s = s - shift * take.astype(jnp.int32)
        w = w2
        d >>= 1
    return arr


def _extract_photons(cols_ref, xoff_ref, base_ref, fac_ref, *, box,
                     width, early_cast):
    """Shared kernel prologue: (box·width, TILE) raw rows → (box, box,
    TILE) f32 photons. ``early_cast`` barrels in f32 (fallback for
    backends whose Mosaic build lacks 16-bit selects); otherwise the
    barrel runs in the movie's native dtype and only the final
    (box, box, TILE) window is cast."""
    cols = cols_ref[...]
    if early_cast:
        cols = cols.astype(jnp.float32)
    rows = cols.reshape(box, width, TILE)
    win = _barrel_mid(rows, xoff_ref[...], box)
    photons = (win.astype(jnp.float32) - base_ref[0, 0]) * fac_ref[0, 0]
    return photons


def _lq_kernel(cols_ref, xoff_ref, base_ref, fac_ref, nv_ref,
               theta_ref, *, box, width, max_it, ftol, early_cast):
    spots_t = _extract_photons(
        cols_ref, xoff_ref, base_ref, fac_ref,
        box=box, width=width, early_cast=early_cast,
    )
    theta_ref[...] = _lq._lm_core(
        spots_t, max_it, ftol,
        n_valid=nv_ref[0, 0], lane0=pl.program_id(0) * TILE,
    )


def _mle_kernel(cols_ref, xoff_ref, base_ref, fac_ref, nv_ref,
                theta_ref, crlb_ref, ll_ref, iters_ref, *, box,
                width, eps, max_it, method, early_cast):
    spots_t = _extract_photons(
        cols_ref, xoff_ref, base_ref, fac_ref,
        box=box, width=width, early_cast=early_cast,
    )
    theta6, crlb6, ll, iters = _mle._fit_core(
        spots_t, eps, max_it, method=method,
        n_valid=nv_ref[0, 0], lane0=pl.program_id(0) * TILE,
    )
    theta_ref[...] = theta6
    crlb_ref[...] = crlb6
    ll_ref[...] = ll[None, :]
    iters_ref[...] = iters[None, :].astype(jnp.int32)


def _common_specs(box, width):
    in_specs = [
        pl.BlockSpec(
            (box * width, TILE), lambda t: (0, t),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    return in_specs


def fit_lq_t(
    cols: jnp.ndarray,
    xoff: jnp.ndarray,
    baseline,
    factor,
    *,
    box: int,
    max_it: int = 30,
    ftol: float = 1e-6,
    early_cast: bool = False,
    interpret: bool = False,
    n_valid=None,
) -> jnp.ndarray:
    """cols (box·width, N) raw window rows (native dtype), xoff (1, N)
    i32 column offsets, scalar baseline/factor. Returns theta (6, N);
    bit-identical to cutting + converting + ``lq_pallas.fit_pallas_t``.
    Lanes >= ``n_valid`` start converged.
    """
    bw, n = cols.shape
    width = bw // box
    assert bw == box * width and n % TILE == 0
    kernel = functools.partial(
        _lq_kernel, box=box, width=width, max_it=max_it,
        ftol=float(ftol), early_cast=early_cast,
    )
    nv = jnp.asarray(
        n if n_valid is None else n_valid, jnp.int32
    ).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=_common_specs(box, width)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (6, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, n), jnp.float32),
        interpret=interpret,
    )(
        cols, xoff.astype(jnp.int32),
        jnp.asarray(baseline, jnp.float32).reshape(1, 1),
        jnp.asarray(factor, jnp.float32).reshape(1, 1),
        nv,
    )


def fit_mle_t(
    cols: jnp.ndarray,
    xoff: jnp.ndarray,
    baseline,
    factor,
    *,
    box: int,
    eps: float = 1e-3,
    max_it: int = 100,
    method: str = "sigmaxy",
    early_cast: bool = False,
    interpret: bool = False,
    n_valid=None,
):
    """MLE twin of :func:`fit_lq_t`. Returns (theta (6, N), crlb
    (6, N), ll (N,), iters (N,)). Lanes >= ``n_valid`` start
    converged (bucket-padding tiles must not run to max_it)."""
    bw, n = cols.shape
    width = bw // box
    assert bw == box * width and n % TILE == 0
    kernel = functools.partial(
        _mle_kernel, box=box, width=width, eps=eps, max_it=max_it,
        method=method, early_cast=early_cast,
    )
    nv = jnp.asarray(
        n if n_valid is None else n_valid, jnp.int32
    ).reshape(1, 1)
    theta, crlb, ll, iters = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=_common_specs(box, width)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(
                (6, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (6, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        interpret=interpret,
    )(
        cols, xoff.astype(jnp.int32),
        jnp.asarray(baseline, jnp.float32).reshape(1, 1),
        jnp.asarray(factor, jnp.float32).reshape(1, 1),
        nv,
    )
    return theta, crlb, ll[0], iters[0]


#: probe cache: (box, width, method, dtype) -> early_cast flag or None
_PROBED: dict[tuple, bool | None] = {}


def probe(box: int, width: int, method: str,
          dtype=np.uint16) -> bool | None:
    """Compile-probe the kernel at the REAL (box, width) — wide frames
    can exceed VMEM even when a narrow probe compiles. Returns the
    ``early_cast`` flag to use (native-dtype barrel preferred) or
    ``None`` when neither form lowers."""
    key = (box, width, method, np.dtype(dtype).str)
    if key in _PROBED:
        return _PROBED[key]
    result: bool | None = None
    for early_cast in (False, True):
        try:
            cols = jnp.ones((box * width, TILE), dtype)
            xoff = jnp.zeros((1, TILE), jnp.int32)
            if method == "lq":
                out = fit_lq_t(
                    cols, xoff, 0.0, 1.0, box=box, max_it=1,
                    early_cast=early_cast,
                )
                np.asarray(out)
            else:
                out = fit_mle_t(
                    cols, xoff, 0.0, 1.0, box=box, max_it=1,
                    method=method, early_cast=early_cast,
                )
                np.asarray(out[3])
            result = early_cast
            break
        except Exception:
            continue
    _PROBED[key] = result
    return result
