"""Round-5h: phase-tile width sweep for the boundary fit — each
phase's fixed per-grid-step cost (~8 µs, inferred from r5g: 2 extra
full-grid passes cost ~4 ms at TILE=512) shrinks with wider tiles.

    python tools/measure_r5h.py
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
from bench import make_bench_movie  # noqa: E402

CHAIN = 8
OUT = "/tmp/r5h_results.jsonl"


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

    import picasso_tpu  # noqa: F401
    from picasso_tpu.ops import fused, lq_pallas, mle_pallas

    ng_t = jnp.float32(4000.0)
    use_pallas = lq_pallas.pallas_supported(7)

    def timed(f, *fargs, reps=3):
        float(f(*fargs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def chain_row(name, dev, latency, method, max_it, boundary,
                  schedule=None, tile=None):
        if name in done:
            print(f"# skip {name}", file=sys.stderr)
            return
        os.environ["PICASSO_TPU_ROI_CUT"] = "winblocks"
        os.environ["PICASSO_TPU_WINBLK"] = "32"
        os.environ["PICASSO_TPU_FIT_BOUNDARY"] = (
            "1" if boundary else "0"
        )
        saved = (
            mle_pallas.default_boundaries,
            mle_pallas._default_phase_tile,
        )
        if schedule is not None:
            mle_pallas.default_boundaries = lambda m: schedule
        if tile is not None:
            mle_pallas._default_phase_tile = lambda s, n: tile
        fused.identify_cut_fit.clear_cache()
        try:
            @jax.jit
            def f_chain(fr, eps):
                out = fused.identify_cut_fit(
                    fr, ng_t + eps, jnp.float32(0.0),
                    jnp.float32(1.0), box=7, size=1 << 17, eps=1e-3,
                    max_it=max_it, method=method,
                    use_pallas=use_pallas,
                )
                return jnp.sum(out[5]), out[0]

            n_spots = int(f_chain(dev, jnp.float32(0.0))[1])

            @jax.jit
            def chained(fr):
                def body(i, acc):
                    return (
                        f_chain(fr, acc * 1e-30)[0] * 1e-9 + 0.0 * acc
                    )

                return jax.lax.fori_loop(
                    0, CHAIN, body, jnp.float32(0.0)
                )

            ms = (timed(chained, dev) - latency) / CHAIN * 1e3
            record(
                name, ms=round(ms, 2), n_spots=n_spots,
                spots_per_s=round(n_spots / (ms / 1e3)),
            )
        except Exception as exc:
            record(name, error=repr(exc)[:300])
        finally:
            mle_pallas.default_boundaries = saved[0]
            mle_pallas._default_phase_tile = saved[1]
            os.environ.pop("PICASSO_TPU_ROI_CUT", None)
            os.environ.pop("PICASSO_TPU_WINBLK", None)
            os.environ.pop("PICASSO_TPU_FIT_BOUNDARY", None)
            fused.identify_cut_fit.clear_cache()

    @jax.jit
    def noop(s):
        return jnp.sum(s[0, :8].astype(jnp.float32))

    movie_n = make_bench_movie(
        256, 256, 1200, 0.5, np.random.default_rng(13)
    )
    dev_n = jnp.asarray(movie_n)
    lat_n = timed(noop, dev_n)
    print(f"# latency {lat_n*1e3:.2f} ms", file=sys.stderr)

    chain_row("mle:b16-48:t512", dev_n, lat_n, "sigmaxy", 100, True,
              schedule=(16, 48), tile=512)
    chain_row("mle:b16-48:t2048", dev_n, lat_n, "sigmaxy", 100, True,
              schedule=(16, 48), tile=2048)
    chain_row("mle:b16-48:t1024", dev_n, lat_n, "sigmaxy", 100, True,
              schedule=(16, 48), tile=1024)
    chain_row("mle:b12-24-48-72:t2048", dev_n, lat_n, "sigmaxy", 100,
              True, schedule=(12, 24, 48, 72), tile=2048)
    chain_row("mle:b24:t2048", dev_n, lat_n, "sigmaxy", 100, True,
              schedule=(24,), tile=2048)
    chain_row("lq:off", dev_n, lat_n, "lq", 30, False)
    chain_row("lq:b5-15:t2048", dev_n, lat_n, "lq", 30, True,
              schedule=(5, 15), tile=2048)
    chain_row("lq:b8:t2048", dev_n, lat_n, "lq", 30, True,
              schedule=(8,), tile=2048)


if __name__ == "__main__":
    main()
