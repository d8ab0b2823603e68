"""Round-5 stage decomposition at current session weather: where do
the non-fit milliseconds of the narrow chain actually go?

    python tools/measure_r5b.py --out /tmp/r5b_results.jsonl
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
from bench import make_bench_movie  # noqa: E402

CHAIN = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5b_results.jsonl")
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = {
                json.loads(ln)["name"] for ln in fh if ln.strip()
            }

    def record(name, **fields):
        d = {"name": name, **fields}
        with open(args.out, "a") as fh:
            fh.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)
        done.add(name)

    import jax
    import jax.numpy as jnp

    import picasso_tpu  # noqa: F401
    from picasso_tpu.ops import fused, lq_pallas
    from picasso_tpu.ops.identify import _identify_compact, identify_maps

    movie = make_bench_movie(
        256, 256, 1200, 0.5, np.random.default_rng(13)
    )
    dev = jnp.asarray(movie)
    ng_t = jnp.float32(4000.0)

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

    def chain_ms(fn, *extra):
        @jax.jit
        def chained(fr, *ex):
            def body(i, acc):
                return fn(fr, acc * 1e-30, *ex) * 1e-9 + 0.0 * acc

            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        return (timed(chained, dev, *extra) - latency) / CHAIN * 1e3

    def run(name, fn, *extra):
        if name in done:
            print(f"# skip {name}", file=sys.stderr)
            return
        try:
            record(name, ms=round(chain_ms(fn, *extra), 2))
        except Exception as exc:
            record(name, error=repr(exc)[:300])

    # 1. identify maps only
    def f_maps(fr, eps):
        mx, ng = identify_maps(fr.astype(jnp.float32) + eps, 7)
        return jnp.sum(ng) + jnp.sum(mx)

    run("identify_maps", f_maps)

    # 2. identify + compaction
    def f_compact(fr, eps):
        count, f, y, x, ng = _identify_compact(fr, ng_t + eps, 7, 1 << 17)
        return jnp.sum(ng) + count.astype(jnp.float32)

    run("identify_compact", f_compact)

    count, f, y, x, ng = _identify_compact(dev, ng_t, 7, 1 << 17)
    n_spots = int(np.asarray(count))
    print(f"# n_spots {n_spots}", file=sys.stderr)

    def data_dep(eps, yy):
        return yy + (eps > 2.0).astype(yy.dtype)

    # 3. ROI cut alone (winrows)
    def f_cut(fr, eps, ff, yy, xx):
        rois = fused.cut_rois_t_winrows(fr, ff, data_dep(eps, yy), xx, 7)
        return jnp.sum(rois)

    run("cut:winrows", f_cut, f, y, x)

    # 4. cut + photon conversion (the "glue" candidate)
    def f_cutconv(fr, eps, ff, yy, xx):
        rois = fused.cut_rois_t_winrows(fr, ff, data_dep(eps, yy), xx, 7)
        return jnp.sum((rois - 1.5) * 0.8)

    run("cut:winrows+convert", f_cutconv, f, y, x)

    # 5. cut + convert + fit as one program (= chain minus identify)
    def f_cutfit(fr, eps, ff, yy, xx):
        rois = fused.cut_rois_t_winrows(fr, ff, data_dep(eps, yy), xx, 7)
        th = lq_pallas.fit_pallas_t((rois - 1.5) * 0.8, 30, 1e-6)
        return jnp.sum(th)

    run("cut+convert+fit:lq", f_cutfit, f, y, x)

    # 6. fit alone on pre-cut ROIs
    rois0 = fused.cut_rois_t_winrows(dev, f, y, x, 7)

    @jax.jit
    def fit_chain(r0):
        def body(i, acc):
            th = lq_pallas.fit_pallas_t(r0 + acc * 1e-30, 30, 1e-6)
            return jnp.sum(th) * 1e-9 + 0.0 * acc

        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    if "fit:lq" not in done:
        try:
            t = (timed(fit_chain, rois0) - latency) / CHAIN * 1e3
            record("fit:lq", ms=round(t, 2), n_spots=n_spots)
        except Exception as exc:
            record("fit:lq", error=repr(exc)[:300])

    # 7. full chain reference point, same session
    def f_chain(fr, eps):
        out = fused.identify_cut_fit(
            fr, ng_t + eps, jnp.float32(0.0), jnp.float32(1.0),
            box=7, size=1 << 17, eps=1e-3, max_it=30, method="lq",
            use_pallas=True,
        )
        return jnp.sum(out[5])

    run("chain:lq", f_chain)


if __name__ == "__main__":
    main()
