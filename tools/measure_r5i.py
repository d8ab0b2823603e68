"""Round-5i: decompose the ~1.4 ms/boundary glue of the phase-
boundary fit. Same chain, monkeypatched glue variants:

  full      — production (counting-sort slot + permute)
  identslot — permutation forced to identity (keeps the takes,
              drops cumsum+scatter slot calc)
  nopermute — no lane movement at all (same per-tile work as
              single-pass, so (nopermute - off) = pure extra-phase
              overhead: 2 more pallas_calls + state round-trips)

    python tools/measure_r5i.py
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
OUT = "/tmp/r5i_results.jsonl"


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

    real_slot = mle_pallas._stragglers_first
    real_perm = mle_pallas._permute_lanes

    def ident_slot(done_row):
        n = done_row.shape[0]
        z = (done_row[:1] * 0.0).astype(jnp.int32)[0]
        return jax.lax.iota(jnp.int32, n) + z

    def no_perm(perm, *arrays):
        return [a + 0.0 for a in arrays]

    def timed(f, *fargs, reps=3):
        float(f(*fargs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def chain_row(name, dev, latency, boundary, glue="full"):
        if name in done:
            print(f"# skip {name}", file=sys.stderr)
            return
        os.environ["PICASSO_TPU_ROI_CUT"] = "winblocks"
        os.environ["PICASSO_TPU_WINBLK"] = "32"
        os.environ["PICASSO_TPU_FIT_BOUNDARY"] = (
            "1" if boundary else "0"
        )
        if glue == "identslot":
            mle_pallas._stragglers_first = ident_slot
        elif glue == "nopermute":
            mle_pallas._stragglers_first = ident_slot
            mle_pallas._permute_lanes = no_perm
        fused.identify_cut_fit.clear_cache()
        try:
            @jax.jit
            def f_chain(fr, eps):
                out = fused.identify_cut_fit(
                    fr, ng_t + eps, jnp.float32(0.0),
                    jnp.float32(1.0), box=7, size=1 << 17, eps=1e-3,
                    max_it=100, method="sigmaxy",
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
            mle_pallas._stragglers_first = real_slot
            mle_pallas._permute_lanes = real_perm
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

    chain_row("mle:off", dev_n, lat_n, False)
    chain_row("mle:full", dev_n, lat_n, True)
    chain_row("mle:identslot", dev_n, lat_n, True, "identslot")
    chain_row("mle:nopermute", dev_n, lat_n, True, "nopermute")

    # slot-calc alone (cumsum + 1-to-1 scatter), non-hoistable
    if "slotcalc" not in done:
        n = 1 << 17
        rng = np.random.default_rng(0)
        dd = jnp.asarray((rng.random(n) < 0.6).astype(np.float32))

        @jax.jit
        def slot_chain(d):
            def body(i, acc):
                s = real_slot(
                    jnp.minimum(d + acc * 1e-30, 1.0)
                )
                return acc + jnp.sum(s[:8].astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        ms = (timed(slot_chain, dd) - lat_n) / CHAIN * 1e3
        record("slotcalc", ms=round(ms, 3))


if __name__ == "__main__":
    main()
