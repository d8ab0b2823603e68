"""Pallas MLE tile kernel: exact parity with the XLA program
(interpret mode — runs on any backend)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import make_gaussian_spot


def _spots(n, seed=0):
    rng = np.random.default_rng(seed)
    out = np.empty((n, 7, 7), np.float32)
    for i in range(n):
        clean = make_gaussian_spot(
            7,
            rng.uniform(-0.5, 0.5),
            rng.uniform(-0.5, 0.5),
            rng.uniform(0.9, 1.4),
            rng.uniform(0.9, 1.4),
            rng.uniform(2000, 8000),
            rng.uniform(5, 30),
        )
        out[i] = rng.poisson(np.maximum(clean, 0)).astype(np.float32)
    return out


@pytest.mark.parametrize("method", ["sigmaxy", "sigma"])
def test_pallas_matches_xla(method):
    import jax.numpy as jnp

    from picasso_tpu.ops.mle import _fit_chunk
    from picasso_tpu.ops.mle_pallas import TILE, fit_pallas

    spots = _spots(TILE)
    p = fit_pallas(
        jnp.asarray(spots), 1e-3, 50, method=method, interpret=True
    )
    x = _fit_chunk(jnp.asarray(spots), 1e-3, 50, method=method)
    for a, b, name in zip(p, x, ("theta", "crlb", "ll", "iters")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_pallas_multi_tile():
    import jax.numpy as jnp

    from picasso_tpu.ops.mle import _fit_chunk
    from picasso_tpu.ops.mle_pallas import TILE, fit_pallas

    # interpret-mode Pallas executes iterations at Python speed:
    # 12 iterations pin the same tile/early-exit schedule as 30 at
    # a third of the wall time
    spots = _spots(2 * TILE, seed=1)
    p = fit_pallas(jnp.asarray(spots), 1e-3, 12, interpret=True)
    x = _fit_chunk(jnp.asarray(spots), 1e-3, 12)
    # Per-tile early exit can stop iterating a tile before the global
    # batch would; converged thetas are frozen so results still agree.
    np.testing.assert_allclose(
        np.asarray(p[0]), np.asarray(x[0]), rtol=1e-6, atol=1e-5
    )


def test_multiround_bit_identical_to_single_pass():
    """Straggler-compaction schedule must reproduce the single-pass
    kernel exactly (same trajectories, just permuted lanes)."""
    import jax.numpy as jnp

    from picasso_tpu.ops.mle_pallas import (
        TILE, fit_pallas, fit_pallas_multiround,
    )

    # 16 iterations / round_it=8 still exercise two straggler
    # rounds + the tail; interpret mode pays per-iteration Python
    spots = _spots(2 * TILE)
    a = fit_pallas(jnp.asarray(spots), 1e-3, 16, interpret=True)
    b = fit_pallas_multiround(
        jnp.asarray(spots), 1e-3, 16, round_it=8, interpret=True
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
