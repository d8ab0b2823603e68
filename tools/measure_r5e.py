"""Round-5e: close the default decisions — wide chain with the
incumbent `blocks` cut vs winblocks32, and the narrow MLE chain with
winblocks32.

    python tools/measure_r5e.py
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
OUT = "/tmp/r5e_results.jsonl"


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
    from picasso_tpu.ops import fused, lq_pallas

    ng_t = jnp.float32(4000.0)
    use_pallas = None

    def timed(f, *fargs, reps=3):
        float(f(*fargs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def chain_row(name, dev, latency, method, max_it, cut, blk=None):
        nonlocal use_pallas
        if name in done:
            print(f"# skip {name}", file=sys.stderr)
            return
        if use_pallas is None:
            use_pallas = lq_pallas.pallas_supported(7)
        os.environ["PICASSO_TPU_ROI_CUT"] = cut
        if blk:
            os.environ["PICASSO_TPU_WINBLK"] = str(blk)
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
            os.environ.pop("PICASSO_TPU_ROI_CUT", None)
            os.environ.pop("PICASSO_TPU_WINBLK", None)
            fused.identify_cut_fit.clear_cache()

    @jax.jit
    def noop(s):
        return jnp.sum(s[0, 0].astype(jnp.float32))

    # ---- narrow workload ----
    movie_n = make_bench_movie(
        256, 256, 1200, 0.5, np.random.default_rng(13)
    )
    dev_n = jnp.asarray(movie_n)
    lat_n = timed(noop, dev_n)
    print(f"# latency {lat_n*1e3:.2f} ms", file=sys.stderr)

    chain_row("narrow:mle:winblocks32", dev_n, lat_n, "sigmaxy", 100,
              "winblocks", 32)
    chain_row("narrow:mle:winrows", dev_n, lat_n, "sigmaxy", 100,
              "winrows")
    chain_row("narrow:lq:winblocks32", dev_n, lat_n, "lq", 30,
              "winblocks", 32)

    # ---- wide workload ----
    movie_w = make_bench_movie(
        32, 1024, 1200, 0.5, np.random.default_rng(13)
    )
    dev_w = jnp.asarray(movie_w)
    lat_w = timed(noop, dev_w)

    chain_row("wide:lq:blocks", dev_w, lat_w, "lq", 30, "blocks")
    chain_row("wide:lq:winblocks32", dev_w, lat_w, "lq", 30,
              "winblocks", 32)


if __name__ == "__main__":
    main()
