"""On-chip stage-by-stage measurement of the fused localize chain.

One command produces the whole A/B table for the round-4 candidates:

    python tools/measure_chain.py            # all stages + variants
    python tools/measure_chain.py --quick    # chain totals only

Measures (each as a chained fori_loop consuming into one device
scalar, minus dispatch latency — the CLAUDE.md timing discipline):

  identify_maps        windowed maxima + net gradient maps
  identify_compact     + threshold / tile-reduce / scatter compaction
  cut:rows             round-3 production ROI cut (row gather + 1-hot)
  cut:blocks           tile-block candidate (ops/fused.cut_rois_t_blocks)
  fit:lq               Pallas LM on the cut ROIs
  chain:<cut>          full identify_cut_fit with each cut
  ng_tile:<cap>        net-gradient band-tile A/B (subprocess per cap,
                       since the cap is read at trace time)

Run on the real TPU (do NOT set JAX_PLATFORMS=cpu). Results print as
one JSON line per measurement for copy-paste into
docs/performance.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_bench_movie  # noqa: E402  (shared workload)


def make_movie(n_frames=256, size=256, n_sites=1200, p_on=0.5, seed=13):
    return make_bench_movie(
        n_frames, size, n_sites, p_on, np.random.default_rng(seed)
    )


def emit(name, ms, **extra):
    print(
        json.dumps({"stage": name, "ms": round(ms, 2), **extra}),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--no-ab", action="store_true",
        help="skip the trace-time-env A/B subprocess children",
    )
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=1 << 17)
    ap.add_argument(
        "--inner", choices=["ng64", "ng256", "idpallas", "ngsep"],
        default=None,
        help="(internal) trace-time-env A/B child",
    )
    args = ap.parse_args()

    if args.inner == "idpallas":
        os.environ["PICASSO_TPU_IDENTIFY"] = "pallas"
    elif args.inner == "ngsep":
        os.environ["PICASSO_TPU_NG"] = "sep"
    elif args.inner:
        os.environ["PICASSO_TPU_NG_TILE"] = (
            "64" if args.inner == "ng64" else "256"
        )

    import jax
    import jax.numpy as jnp

    import picasso_tpu  # noqa: F401  (compilation cache)
    from picasso_tpu.ops import fused
    from picasso_tpu.ops.identify import _identify_compact, identify_maps

    CHAIN = args.chain
    movie = make_movie(args.frames, args.size)
    dev = jnp.asarray(movie)
    ng_t = jnp.float32(4000.0)
    kind = jax.devices()[0].device_kind
    print(f"# device: {kind}, movie {movie.shape} u16", file=sys.stderr)

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

    def chain_ms(fn, *extra):
        """fn: (frames, eps, *extra) -> device scalar. eps makes
        iterations data-dependent. Extra device operands are passed as
        ARGUMENTS (closure-captured device arrays would embed as
        constants — a device->host readback on the tunneled backend,
        CLAUDE.md)."""

        @jax.jit
        def chained(fr, *ex):
            def body(i, acc):
                return fn(fr, acc * 1e-30, *ex) * 1e-9 + 0.0 * acc

            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        return (timed(chained, dev, *extra) - latency) / CHAIN * 1e3

    # ---- trace-time-env A/B variants run in subprocesses
    if args.inner is None and not args.quick and not args.no_ab:
        for cap in ("ng64", "ng256", "idpallas", "ngsep"):
            r = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--inner", cap, "--quick",
                    "--frames", str(args.frames),
                    "--size", str(args.size),
                    "--bucket", str(args.bucket),
                ],
                capture_output=True, text=True, timeout=1800,
            )
            for line in r.stdout.splitlines():
                if line.strip():
                    d = json.loads(line)
                    d["stage"] = f"{d['stage']}@{cap}"
                    print(json.dumps(d), flush=True)
            if r.returncode != 0:
                print(f"# {cap} child rc={r.returncode}: "
                      f"{r.stderr[-500:]}", file=sys.stderr)

    # ---- stage: identify maps ----
    if not args.quick:
        def f_maps(fr, eps):
            mx, ng = identify_maps(fr.astype(jnp.float32) + eps, 7)
            return jnp.sum(ng) + jnp.sum(mx)

        emit("identify_maps", chain_ms(f_maps))

        # fused Mosaic identify kernel (maps + threshold + tile
        # reduce in one pass) — kernel only, Mosaic lowering
        from picasso_tpu.ops import identify_pallas as idp

        if jax.default_backend() != "cpu" and idp.pallas_supported(
            movie.shape, 7
        ):
            def f_idp(fr, eps):
                tm, tl, tn = idp.identify_tiles_pallas(
                    fr, ng_t + eps, 7
                )
                return jnp.sum(tn) + jnp.sum(tm)

            emit("identify_tiles_pallas", chain_ms(f_idp))
        else:
            print("# identify_tiles_pallas: unsupported/CPU",
                  file=sys.stderr)

    # ---- stage: identify + compaction ----
    bucket = args.bucket

    def f_compact(fr, eps):
        count, f, y, x, ng = _identify_compact(
            fr, ng_t + eps, 7, bucket
        )
        return jnp.sum(ng) + count.astype(jnp.float32)

    n_spots = int(
        np.asarray(_identify_compact(dev, ng_t, 7, bucket)[0])
    )
    if not args.quick:
        emit("identify_compact", chain_ms(f_compact), n_spots=n_spots)

        # ---- stage: ROI cut variants on a FIXED hit list ----
        count, f, y, x, ng = _identify_compact(dev, ng_t, 7, bucket)

        for name, cut in (
            ("cut:rows", fused.cut_rois_t),
            ("cut:blocks", fused.cut_rois_t_blocks),
            ("cut:shift", fused.cut_rois_t_shift),
            ("cut:slab", fused.cut_rois_t_slab),
            ("cut:winrows", fused.cut_rois_t_winrows),
            ("cut:wincols", fused.cut_rois_t_wincols),
            ("cut:span", fused.cut_rois_t_span),
            ("cut:spanblocks", fused.cut_rois_t_spanblocks),
        ):
            def f_cut(fr, eps, ff, yy2, xx2, _cut=cut):
                # the gather indices must be data-dependent or XLA
                # hoists the whole cut out of the timing loop (eps is
                # ~1e-39, so the comparison is always False and the
                # indices are unchanged — but unprovably so)
                yyd = yy2 + (eps > 2.0).astype(yy2.dtype)
                rois = _cut(fr, ff, yyd, xx2, 7)
                return jnp.sum(rois)

            emit(name, chain_ms(f_cut, f, y, x), n_spots=n_spots)

        # ---- stage: fit on pre-cut ROIs ----
        rois = fused.cut_rois_t(dev, f, y, x, 7)

        from picasso_tpu.ops import lq_pallas

        use_pallas = lq_pallas.pallas_supported(7)

        @jax.jit
        def fit_chain(r0):
            def body(i, acc):
                rr = r0 + acc * 1e-30
                if use_pallas:
                    th = lq_pallas.fit_pallas_t(rr, 30, 1e-6)
                else:
                    from picasso_tpu.ops import lq as _lq

                    th = _lq._lm_core(rr, 30, 1e-6)
                return jnp.sum(th) * 1e-9 + 0.0 * acc

            return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        t = (timed(fit_chain, rois) - latency) / CHAIN * 1e3
        emit("fit:lq", t, pallas=bool(use_pallas), n_spots=n_spots)

    # ---- full chain with each cut ----
    from picasso_tpu.ops import lq_pallas

    use_pallas = (
        jax.default_backend() != "cpu"
        and lq_pallas.pallas_supported(7)
    )
    # A/B children vary identify-stage knobs only — one cut route
    # (the narrow-frame production default) isolates their effect
    modes = ("rows",) if args.inner else ("rows", "blocks", "shift",
                                          "slab", "winrows", "wincols",
                                          "winfit")
    for mode in modes:
        os.environ["PICASSO_TPU_ROI_CUT"] = mode

        # fresh trace per mode: the env is read at trace time, so the
        # jit caches must not be shared between modes
        fused.identify_cut_fit.clear_cache()

        def f_chain(fr, eps):
            out = fused.identify_cut_fit(
                fr, ng_t + eps, jnp.float32(0.0), jnp.float32(1.0),
                box=7, size=bucket, eps=1e-3, max_it=30, method="lq",
                use_pallas=use_pallas,
            )
            return jnp.sum(out[5])

        ms = chain_ms(f_chain)
        emit(
            f"chain:{mode}", ms, n_spots=n_spots,
            spots_per_s=round(n_spots / (ms / 1e3)),
            pallas=bool(use_pallas),
        )
    os.environ.pop("PICASSO_TPU_ROI_CUT", None)


if __name__ == "__main__":
    main()
