"""Pallas LQ tile kernel: exact parity with the XLA LM program
(interpret mode — runs on any backend)."""

from __future__ import annotations

import numpy as np

from tests.conftest import make_gaussian_spot


def _spots(n, seed=1):
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


def test_lq_pallas_matches_xla():
    import jax.numpy as jnp

    from picasso_tpu.ops.lq import _fit_chunk
    from picasso_tpu.ops.lq_pallas import TILE, fit_pallas

    spots = _spots(TILE)
    p = np.asarray(
        fit_pallas(jnp.asarray(spots), max_it=30, interpret=True)
    )
    x = np.asarray(_fit_chunk(jnp.asarray(spots), 30))
    np.testing.assert_array_equal(p, x)


def test_lq_pallas_multi_tile_with_degenerate_padding():
    import jax.numpy as jnp

    from picasso_tpu.ops.lq import _fit_chunk
    from picasso_tpu.ops.lq_pallas import TILE, fit_pallas

    spots = _spots(TILE)
    # last tile is all-ones padding (degenerate sigma=0 spots) — must
    # not poison the loop for the real tile
    padded = np.concatenate(
        [spots, np.ones((TILE, 7, 7), np.float32)]
    )
    p = np.asarray(
        fit_pallas(jnp.asarray(padded), max_it=30, interpret=True)
    )
    x = np.asarray(_fit_chunk(jnp.asarray(padded), 30))
    np.testing.assert_array_equal(p[:TILE], x[:TILE])
    assert np.isfinite(p[:TILE]).all()
