"""Round-5d: winblocks ROI cut on chip — blk sweep + full chain.

    python tools/measure_r5d.py --out /tmp/r5d_results.jsonl
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
    ap.add_argument("--out", default="/tmp/r5d_results.jsonl")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
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
        args.frames, args.size, 1200, 0.5, np.random.default_rng(13)
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

    count, f, y, x, ng = _identify_compact(dev, ng_t, 7, 1 << 17)
    n_spots = int(np.asarray(count))
    print(f"# n_spots {n_spots}", file=sys.stderr)

    def data_dep(eps, yy):
        return yy + (eps > 2.0).astype(yy.dtype)

    # reference point at this session's weather
    def f_winrows(fr, eps, ff, yy, xx):
        rois = fused.cut_rois_t_winrows(
            fr, ff, data_dep(eps, yy), xx, 7
        )
        return jnp.sum(rois)

    run("cut:winrows", f_winrows, f, y, x)

    def f_blocks(fr, eps, ff, yy, xx):
        rois = fused.cut_rois_t_blocks(
            fr, ff, data_dep(eps, yy), xx, 7
        )
        return jnp.sum(rois)

    run("cut:blocks", f_blocks, f, y, x)

    for blk in (8, 16, 32, 64):
        def f_cut(fr, eps, ff, yy, xx, _blk=blk):
            rois = fused.cut_rois_t_winblocks(
                fr, ff, data_dep(eps, yy), xx, 7, blk=_blk
            )
            return jnp.sum(rois)

        run(f"cut:winblocks{blk}", f_cut, f, y, x)

    # full chains via the env knobs
    from picasso_tpu.ops import lq_pallas

    use_pallas = lq_pallas.pallas_supported(7)

    for mode, blk in (("winrows", None), ("winblocks", 8),
                      ("winblocks", 16), ("winblocks", 32)):
        name = f"chain:{mode}" + (str(blk) if blk else "")
        if name in done:
            print(f"# skip {name}", file=sys.stderr)
            continue
        os.environ["PICASSO_TPU_ROI_CUT"] = mode
        if blk:
            os.environ["PICASSO_TPU_WINBLK"] = str(blk)
        fused.identify_cut_fit.clear_cache()
        try:
            def f_chain(fr, eps):
                out = fused.identify_cut_fit(
                    fr, ng_t + eps, jnp.float32(0.0),
                    jnp.float32(1.0), box=7, size=1 << 17, eps=1e-3,
                    max_it=30, method="lq", use_pallas=use_pallas,
                )
                return jnp.sum(out[5])

            ms = chain_ms(f_chain)
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


if __name__ == "__main__":
    main()
