"""Headline benchmark: MLE spot-fit throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "mle_fit_throughput", "value": N, "unit": "spots/s",
   "vs_baseline": N}

Baseline: the driver-defined north star of 1,000,000 spots/s on a
TPU v5e chip (BASELINE.md; the reference publishes no numbers — its
MLE runs per-spot numba loops on CPU threads). vs_baseline is
value / 1e6, so >1.0 beats the target.

The workload mirrors the reference's defaults: 7x7 boxes, sigmaxy MLE,
eps=1e-3, max 100 iterations (picasso/__main__.py:1235-1240), on
realistic Poisson-noised DNA-PAINT spots.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_spots(n: int, box: int = 7, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    half = box // 2
    grid = np.arange(-half, half + 1, dtype=np.float64)
    x0 = rng.uniform(-0.5, 0.5, n)
    y0 = rng.uniform(-0.5, 0.5, n)
    sx = rng.uniform(0.9, 1.4, n)
    sy = rng.uniform(0.9, 1.4, n)
    photons = rng.uniform(2000.0, 8000.0, n)
    bg = rng.uniform(5.0, 30.0, n)
    gx = np.exp(
        -0.5 * ((grid[None, :] - x0[:, None]) / sx[:, None]) ** 2
    ) / (sx[:, None] * np.sqrt(2 * np.pi))
    gy = np.exp(
        -0.5 * ((grid[None, :] - y0[:, None]) / sy[:, None]) ** 2
    ) / (sy[:, None] * np.sqrt(2 * np.pi))
    clean = (
        photons[:, None, None] * gy[:, :, None] * gx[:, None, :]
        + bg[:, None, None]
    )
    return rng.poisson(clean).astype(np.float32)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )
    import jax.numpy as jnp

    from picasso_tpu.ops import mle_pallas
    from picasso_tpu.ops.mle import _fit_chunk

    n = 262144  # one device batch
    spots = jnp.asarray(make_spots(n))

    use_pallas = mle_pallas.pallas_supported()
    fit = (
        (lambda s: mle_pallas.fit_pallas(s, 0.001, 100))
        if use_pallas
        else (lambda s: _fit_chunk(s, 0.001, 100, method="sigmaxy"))
    )

    # Device-compute timing: chain CHAIN data-dependent fits inside ONE
    # device program and transfer a single scalar, so per-call host
    # latency (large and noisy on tunneled backends) is amortized 1/CHAIN
    # and then subtracted. block_until_ready can return at dispatch on
    # such backends, so the scalar transfer is the synchronization.
    CHAIN = 8

    @jax.jit
    def fit_chain(s):
        def body(i, acc):
            # acc feeds back into the input at float32-epsilon scale to
            # force sequential execution (no CSE/hoisting of the fit)
            th, crlb, ll, it = fit(s + acc * 1e-30)
            return jnp.sum(th) + jnp.sum(ll) + 0.0 * acc

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    @jax.jit
    def noop(s):
        return jnp.sum(s[0, 0])

    def timed(f, reps=3):
        float(f(spots))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(spots))
            times.append(time.perf_counter() - t0)
        return min(times)

    latency = timed(noop)
    dt = (timed(fit_chain) - latency) / CHAIN
    throughput = n / dt
    print(
        json.dumps(
            {
                "metric": "mle_fit_throughput",
                "value": round(throughput),
                "unit": "spots/s",
                "vs_baseline": round(throughput / 1_000_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
