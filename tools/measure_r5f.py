"""Round-5f: A/B the n_valid padding-lane freeze inside ONE session.

The fused chain's fit bucket (1<<17 lanes) pads ~13k junk lanes past
the compacted count; without the hint every tile that contains junk
runs to max_it (measured: 100 iterations in every tail tile). The
hint starts those lanes converged. Measure the narrow chain (MLE and
LQ) with the hint active (current code) and with it stripped (a
wrapper that drops n_valid), same session, same workload.

    python tools/measure_r5f.py
"""

from __future__ import annotations

import functools
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
OUT = "/tmp/r5f_results.jsonl"


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

    real_mle = mle_pallas.fit_pallas_t
    real_lq = lq_pallas.fit_pallas_t

    @functools.wraps(real_mle)
    def mle_nohint(*a, n_valid=None, **kw):
        return real_mle(*a, **kw)

    @functools.wraps(real_lq)
    def lq_nohint(*a, n_valid=None, **kw):
        return real_lq(*a, **kw)

    def timed(f, *fargs, reps=3):
        float(f(*fargs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def chain_row(name, dev, latency, method, max_it, hint):
        if name in done:
            print(f"# skip {name}", file=sys.stderr)
            return
        os.environ["PICASSO_TPU_ROI_CUT"] = "winblocks"
        os.environ["PICASSO_TPU_WINBLK"] = "32"
        mle_pallas.fit_pallas_t = real_mle if hint else mle_nohint
        lq_pallas.fit_pallas_t = real_lq if hint else lq_nohint
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
            mle_pallas.fit_pallas_t = real_mle
            lq_pallas.fit_pallas_t = real_lq
            os.environ.pop("PICASSO_TPU_ROI_CUT", None)
            os.environ.pop("PICASSO_TPU_WINBLK", None)
            fused.identify_cut_fit.clear_cache()

    @jax.jit
    def noop(s):
        return jnp.sum(s[0, 0].astype(jnp.float32))

    movie_n = make_bench_movie(
        256, 256, 1200, 0.5, np.random.default_rng(13)
    )
    dev_n = jnp.asarray(movie_n)
    lat_n = timed(noop, dev_n)
    print(f"# latency {lat_n*1e3:.2f} ms", file=sys.stderr)

    chain_row("narrow:mle:hint", dev_n, lat_n, "sigmaxy", 100, True)
    chain_row("narrow:mle:nohint", dev_n, lat_n, "sigmaxy", 100,
              False)
    chain_row("narrow:lq:hint", dev_n, lat_n, "lq", 30, True)
    chain_row("narrow:lq:nohint", dev_n, lat_n, "lq", 30, False)


if __name__ == "__main__":
    main()
