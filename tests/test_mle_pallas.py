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


def test_n_valid_freezes_padding_only():
    """Lanes >= n_valid start converged (bucket-padding garbage must
    not drag tiles to max_it); real lanes are bit-identical with and
    without the hint, in both the XLA core and the Pallas tiles."""
    import jax.numpy as jnp

    from picasso_tpu.ops.mle import _fit_core
    from picasso_tpu.ops.mle_pallas import TILE, fit_pallas_t

    n_real = TILE + 37
    spots = _spots(2 * TILE, seed=3)
    # Poison the tail with clamped-garbage-looking data (all-equal
    # rows never converge under Newton without the freeze).
    spots[n_real:] = 1.0
    spots_t = jnp.asarray(np.transpose(spots, (1, 2, 0)))

    base = _fit_core(spots_t, 1e-3, 12)
    hint = _fit_core(spots_t, 1e-3, 12, n_valid=jnp.int32(n_real))
    for a, b, name in zip(base, hint, ("theta", "crlb", "ll", "it")):
        np.testing.assert_array_equal(
            np.asarray(a)[..., :n_real],
            np.asarray(b)[..., :n_real],
            err_msg=name,
        )
    # Padding lanes ran zero iterations under the hint.
    assert int(np.max(np.asarray(hint[3])[n_real:])) == 0

    # Same contract inside the Pallas tiles: the hint leaves real
    # lanes bit-identical (tile-vs-whole-batch width differences are
    # orthogonal and covered by test_pallas_multi_tile).
    p0 = fit_pallas_t(spots_t, 1e-3, 12, interpret=True)
    p = fit_pallas_t(
        spots_t, 1e-3, 12, n_valid=jnp.int32(n_real), interpret=True
    )
    for a, b, name in zip(p0, p, ("theta", "crlb", "ll", "it")):
        np.testing.assert_array_equal(
            np.asarray(a)[..., :n_real],
            np.asarray(b)[..., :n_real],
            err_msg=name,
        )
    assert int(np.max(np.asarray(p[3])[n_real:])) == 0


def test_n_valid_freezes_padding_lq():
    """Same contract for the LM (gausslq) core and its Pallas tiles."""
    import jax.numpy as jnp

    from picasso_tpu.ops.lq import _lm_core
    from picasso_tpu.ops.lq_pallas import TILE, fit_pallas_t

    n_real = TILE + 37
    spots = _spots(2 * TILE, seed=4)
    spots[n_real:] = 1.0
    spots_t = jnp.asarray(np.transpose(spots, (1, 2, 0)))

    base = _lm_core(spots_t, 12, 1e-6)
    hint = _lm_core(spots_t, 12, 1e-6, n_valid=jnp.int32(n_real))
    np.testing.assert_array_equal(
        np.asarray(base)[:, :n_real], np.asarray(hint)[:, :n_real]
    )
    p0 = fit_pallas_t(spots_t, 12, 1e-6, interpret=True)
    p = fit_pallas_t(
        spots_t, 12, 1e-6, n_valid=jnp.int32(n_real), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(p0)[:, :n_real], np.asarray(p)[:, :n_real]
    )


@pytest.mark.parametrize("method", ["sigmaxy", "sigma"])
def test_boundary_bit_identical(method):
    """Phase-boundary straggler compaction (log-spaced boundaries,
    counting-sort permutes) reproduces the single-pass kernel exactly
    for real lanes, junk tail included."""
    import jax.numpy as jnp

    from picasso_tpu.ops.mle_pallas import (
        TILE, fit_pallas_boundary_t, fit_pallas_t,
    )

    n_real = TILE + 101
    spots = _spots(2 * TILE, seed=5)
    spots[n_real:] = 1.0
    spots_t = jnp.asarray(np.transpose(spots, (1, 2, 0)))

    a = fit_pallas_t(
        spots_t, 1e-3, 24, method=method, n_valid=jnp.int32(n_real),
        interpret=True,
    )
    b = fit_pallas_boundary_t(
        spots_t, 1e-3, 24, method=method, n_valid=jnp.int32(n_real),
        boundaries=(6, 12), interpret=True,
    )
    for x, y, name in zip(a, b, ("theta", "crlb", "ll", "iters")):
        np.testing.assert_array_equal(
            np.asarray(x)[..., :n_real],
            np.asarray(y)[..., :n_real],
            err_msg=name,
        )


def test_boundary_empty_schedule_falls_back():
    """No in-range boundaries → the single-pass kernel verbatim."""
    import jax.numpy as jnp

    from picasso_tpu.ops.mle_pallas import (
        TILE, fit_pallas_boundary_t, fit_pallas_t,
    )

    spots = _spots(TILE, seed=6)
    spots_t = jnp.asarray(np.transpose(spots, (1, 2, 0)))
    a = fit_pallas_t(spots_t, 1e-3, 8, interpret=True)
    b = fit_pallas_boundary_t(
        spots_t, 1e-3, 8, boundaries=(8, 99), interpret=True
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_boundary_bit_identical_lq():
    """Same contract for the LM fitter."""
    import jax.numpy as jnp

    from picasso_tpu.ops.lq_pallas import (
        TILE, fit_pallas_boundary_t, fit_pallas_t,
    )

    n_real = TILE + 101
    spots = _spots(2 * TILE, seed=7)
    spots[n_real:] = 1.0
    spots_t = jnp.asarray(np.transpose(spots, (1, 2, 0)))
    a = fit_pallas_t(
        spots_t, 20, 1e-6, n_valid=jnp.int32(n_real), interpret=True
    )
    b = fit_pallas_boundary_t(
        spots_t, 20, 1e-6, n_valid=jnp.int32(n_real),
        boundaries=(5, 10), interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(a)[:, :n_real], np.asarray(b)[:, :n_real]
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
