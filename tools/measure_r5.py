"""Round-5 on-chip A/B: fused cut+fit kernel (winfit) and the
early-y-reduction Newton step, against the round-4 defaults.

Resumable: each measurement lands in --out (JSONL) as soon as it
completes and is skipped on re-runs, so tunnel hangs cost one
measurement, not the table. Run on the real TPU:

    python tools/measure_r5.py --out /tmp/r5_results.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from bench import make_bench_movie, make_spots  # noqa: E402

CHAIN = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_results.jsonl")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--only", default=None,
                    help="comma list of measurement names to run")
    args = ap.parse_args()

    done = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            for line in fh:
                if line.strip():
                    d = json.loads(line)
                    done[d["name"]] = d

    def record(name, **fields):
        d = {"name": name, **fields}
        with open(args.out, "a") as fh:
            fh.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)
        done[name] = d

    only = set(args.only.split(",")) if args.only else None

    def wanted(name):
        if name in done:
            print(f"# skip {name} (done)", file=sys.stderr)
            return False
        return only is None or name in only

    import jax
    import jax.numpy as jnp

    import picasso_tpu  # noqa: F401
    from picasso_tpu.ops import fused, mle_pallas

    movie = make_bench_movie(
        args.frames, args.size, 1200, 0.5, np.random.default_rng(13)
    )
    dev = jnp.asarray(movie)
    ng_t = jnp.float32(4000.0)
    kind = jax.devices()[0].device_kind
    print(f"# device: {kind}", file=sys.stderr)

    @jax.jit
    def noop(s):
        return jnp.sum(s[0, 0].astype(jnp.float32))

    def timed(f, *fargs, reps=3):
        float(f(*fargs))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    latency = timed(noop, dev)
    print(f"# latency {latency*1e3:.2f} ms", file=sys.stderr)

    n_spots = None

    def chain_measure(name, method, cut, max_it, mle_step="rowacc"):
        nonlocal n_spots
        if not wanted(name):
            return
        os.environ["PICASSO_TPU_ROI_CUT"] = cut
        os.environ["PICASSO_TPU_MLE_STEP"] = mle_step
        fused.identify_cut_fit.clear_cache()
        try:
            @jax.jit
            def f_chain(fr, eps):
                out = fused.identify_cut_fit(
                    fr, ng_t + eps, jnp.float32(0.0), jnp.float32(1.0),
                    box=7, size=1 << 17, eps=1e-3, max_it=max_it,
                    method=method, use_pallas=True,
                )
                return jnp.sum(out[5]), out[0]

            @jax.jit
            def chained(fr):
                def body(i, acc):
                    return (
                        f_chain(fr, acc * 1e-30)[0] * 1e-9 + 0.0 * acc
                    )

                return jax.lax.fori_loop(
                    0, CHAIN, body, jnp.float32(0.0)
                )

            if n_spots is None:
                n_spots = int(f_chain(dev, jnp.float32(0.0))[1])
            t0 = time.perf_counter()
            ms = (timed(chained, dev) - latency) / CHAIN * 1e3
            record(
                name, ms=round(ms, 2), n_spots=n_spots,
                spots_per_s=round(n_spots / (ms / 1e3)),
                wall_incl_compile_s=round(time.perf_counter() - t0, 1),
            )
        except Exception as exc:
            record(name, error=repr(exc)[:300])
        finally:
            os.environ.pop("PICASSO_TPU_ROI_CUT", None)
            os.environ.pop("PICASSO_TPU_MLE_STEP", None)
            fused.identify_cut_fit.clear_cache()

    def fit_measure(name, mle_step):
        if not wanted(name):
            return
        os.environ["PICASSO_TPU_MLE_STEP"] = mle_step
        mle_pallas.fit_pallas.clear_cache()
        try:
            spots = jnp.asarray(make_spots(262144))

            @jax.jit
            def chained(s):
                def body(i, acc):
                    out = mle_pallas.fit_pallas(
                        s + acc * 1e-30, 0.001, 100
                    )
                    return (
                        jnp.sum(out[0]) + jnp.sum(out[2])
                    ) * 1e-9 + 0.0 * acc

                return jax.lax.fori_loop(
                    0, CHAIN, body, jnp.float32(0.0)
                )

            dt = (timed(chained, spots) - latency) / CHAIN
            record(
                name, ms=round(dt * 1e3, 2),
                spots_per_s=round(262144 / dt),
            )
        except Exception as exc:
            record(name, error=repr(exc)[:300])
        finally:
            os.environ.pop("PICASSO_TPU_MLE_STEP", None)
            mle_pallas.fit_pallas.clear_cache()

    # standalone MLE fit: the round-4 default vs the early step
    fit_measure("fit:mle:rowacc", "rowacc")
    fit_measure("fit:mle:early", "early")

    # LQ chain: round-4 default cut vs the fused cut+fit kernel
    chain_measure("chain:lq:winrows", "lq", "winrows", 30)
    chain_measure("chain:lq:winfit", "lq", "winfit", 30)

    # MLE chain (production default fitter): both cuts, both steps
    chain_measure("chain:mle:winrows", "sigmaxy", "winrows", 100)
    chain_measure("chain:mle:winfit", "sigmaxy", "winfit", 100)
    chain_measure(
        "chain:mle:winfit:early", "sigmaxy", "winfit", 100, "early"
    )
    chain_measure(
        "chain:mle:winrows:early", "sigmaxy", "winrows", 100, "early"
    )


if __name__ == "__main__":
    main()
