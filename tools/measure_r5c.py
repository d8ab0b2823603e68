"""Round-5 ROI-cut decomposition: window build / row gather / barrel
/ final transpose of cut_rois_t_winrows, measured separately so the
cut's floor is evidence, not inference.

    python tools/measure_r5c.py --out /tmp/r5c_results.jsonl
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
    ap.add_argument("--out", default="/tmp/r5c_results.jsonl")
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = {json.loads(ln)["name"] for ln in fh if ln.strip()}

    def record(name, **fields):
        d = {"name": name, **fields}
        with open(args.out, "a") as fh:
            fh.write(json.dumps(d) + "\n")
        print(json.dumps(d), flush=True)
        done.add(name)

    import jax
    import jax.numpy as jnp

    import picasso_tpu  # noqa: F401
    from picasso_tpu.ops import fused
    from picasso_tpu.ops.identify import _identify_compact

    movie = make_bench_movie(
        256, 256, 1200, 0.5, np.random.default_rng(13)
    )
    dev = jnp.asarray(movie)
    ng_t = jnp.float32(4000.0)
    box, r = 7, 3
    B, Y, X = movie.shape
    nwin = Y - box + 1

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

    count, f, y, x, ng = _identify_compact(dev, ng_t, 7, 1 << 17)
    print(f"# n_spots {int(np.asarray(count))}", file=sys.stderr)

    def data_dep(eps, yy):
        return yy + (eps > 2.0).astype(yy.dtype)

    def build_win(fr):
        return jnp.stack(
            [fr[:, i:i + nwin, :] for i in range(box)], axis=2
        ).reshape(B, nwin, box * X)

    def gather_rows(fr, ff, yy, xx):
        fc = jnp.clip(ff, 0, B - 1)
        yc = jnp.clip(yy, r, Y - r - 1)
        win = build_win(fr)
        return win[fc, yc - r].reshape(fc.shape[0], box, X)

    # a. overlapped-window build alone
    def f_build(fr, eps):
        w = build_win(fr + (eps > 2.0).astype(fr.dtype))
        return jnp.sum(w[:, 0, 0].astype(jnp.float32))

    run("win_build", f_build)

    # b. build + row gather
    def f_gather(fr, eps, ff, yy, xx):
        rows = gather_rows(fr, ff, data_dep(eps, yy), xx)
        return jnp.sum(rows[:, 0, 0].astype(jnp.float32))

    run("win_build+gather", f_gather, f, y, x)

    # c. + barrel (no final transpose; output (N, box, box))
    def f_barrel(fr, eps, ff, yy, xx):
        rows = gather_rows(fr, ff, data_dep(eps, yy), xx)
        xc = jnp.clip(xx, r, X - r - 1)
        out = fused._barrel_extract(rows, xc - r, 2, box)
        return jnp.sum(out.astype(jnp.float32))

    run("win_build+gather+barrel", f_barrel, f, y, x)

    # d. full cut (adds the (N, box, box) -> (box, box, N) transpose)
    def f_cut(fr, eps, ff, yy, xx):
        rois = fused.cut_rois_t_winrows(
            fr, ff, data_dep(eps, yy), xx, 7
        )
        return jnp.sum(rois)

    run("cut:winrows(full)", f_cut, f, y, x)


if __name__ == "__main__":
    main()
