"""Round-5j: decompose the standalone MLE fit kernel's wall time into
per-iteration marginal cost vs fixed overhead, to TEST the roofline
gap diagnosis instead of asserting it (VERDICT r4 weak #2).

Method: eps=0 never converges (strict < test), so every lane runs
exactly max_it Newton iterations — timing max_it in {4, 8, 16, 32}
gives a clean linear model  ms = fixed + slope * max_it  at full tile
occupancy. slope implies the issued-op efficiency of one iteration
(useful FLOPs/iter / slope); comparing fixed+slope*exec_iters with
the production (eps 1e-3) measurement validates the executed-budget
model.

    python tools/measure_r5j.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from bench import make_spots  # noqa: E402

N = 262144
CHAIN = 8
OUT = "/tmp/r5j_results.jsonl"


def main():
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            done = {json.loads(ln)["name"] for ln in fh if ln.strip()}

    def record(name, **fields):
        d = {"name": name, **fields}
        with open(OUT, "a") as fh:
            fh.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)
        done.add(name)

    import jax
    import jax.numpy as jnp

    from picasso_tpu.ops import mle_pallas

    assert mle_pallas.pallas_supported(7)
    spots = jnp.asarray(
        np.transpose(make_spots(N), (1, 2, 0)), jnp.float32
    )

    @jax.jit
    def noop(s):
        return jnp.sum(s[0, 0, :8])

    def timed(f, *args, reps=3):
        float(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    lat = timed(noop, spots)
    print(f"# latency {lat*1e3:.2f} ms", file=sys.stderr)

    def fit_chain(eps, max_it):
        @jax.jit
        def chained(s):
            def body(i, acc):
                th = mle_pallas.fit_pallas_t(
                    s + acc * 1e-30, eps, max_it
                )[0]
                return jnp.sum(th) * 1e-9 + 0.0 * acc

            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        return chained

    for mi in (4, 8, 16, 32):
        name = f"forced:{mi}"
        if name in done:
            continue
        ms = (timed(fit_chain(0.0, mi), spots) - lat) / CHAIN * 1e3
        record(name, ms=round(ms, 2), max_it=mi)

    if "production" not in done:
        ms = (timed(fit_chain(1e-3, 100), spots) - lat) / CHAIN * 1e3
        out = mle_pallas.fit_pallas_t(spots, 1e-3, 100)
        iters = np.asarray(out[3])
        tiles = iters.reshape(-1, 512)
        record(
            "production", ms=round(ms, 2),
            mean_iters=round(float(iters.mean()), 2),
            exec_iters=round(float(tiles.max(axis=1).mean()), 2),
        )

    # least-squares line over the forced rows
    rows = [json.loads(ln) for ln in open(OUT) if ln.strip()]
    forced = sorted(
        (r["max_it"], r["ms"]) for r in rows if "max_it" in r
    )
    if len(forced) >= 2 and "fitline" not in done:
        x = np.array([f[0] for f in forced], np.float64)
        y = np.array([f[1] for f in forced], np.float64)
        slope, fixed = np.polyfit(x, y, 1)
        flops_iter = 2341 * N  # useful FLOPs per full-batch iteration
        record(
            "fitline", slope_ms_per_iter=round(float(slope), 4),
            fixed_ms=round(float(fixed), 3),
            slope_implied_tflops=round(
                flops_iter / (slope * 1e-3) / 1e12, 3
            ),
        )


if __name__ == "__main__":
    main()
