"""End-to-end drive of the localization pipeline on the bundled real
movie, through the public library surface. Used by /verify.

Prints the loc count, RMS vs the reference's shipped output, and
round-trips the result through the HDF5/YAML contract in a temp dir.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

# run from a checkout even when the editable install is absent
# (fresh containers lose site-packages; the repo root is authoritative)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if os.environ.get("PICASSO_FORCE_CPU") == "1":
    # the environment's TPU plugin shadows JAX_PLATFORMS; pin CPU
    # before any backend query
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(method: str = "gaussmle") -> int:
    from picasso_tpu import io, localize

    movie, minfo = io.load_movie(
        "/root/reference/tests/data/testdata.raw"
    )
    cam = {"Baseline": 0, "Sensitivity": 1, "Gain": 1, "Pixelsize": 130}
    locs, info = localize.localize(
        movie,
        cam,
        {"Min. Net Gradient": 5000, "Box Size": 7},
        movie_info=minfo,
        fitting_method=method,
        max_it=1000,
        return_info=True,
    )
    print(f"pipeline[{method}] locs: {len(locs)}")
    ref, _ = io.load_locs(
        "/root/reference/tests/data/testdata_locs.hdf5"
    )
    ref = ref[ref["frame"] < len(movie)]
    ours = locs.sort_values(["frame", "x"]).reset_index(drop=True)
    refs = ref.sort_values(["frame", "x"]).reset_index(drop=True)
    n = min(len(ours), len(refs))
    rms = float(
        np.sqrt(
            np.mean(
                (ours["x"][:n] - refs["x"][:n]) ** 2
                + (ours["y"][:n] - refs["y"][:n]) ** 2
            )
        )
    )
    print(f"x/y RMS vs reference: {rms * 130:.3f} nm over {n} locs")
    d = tempfile.mkdtemp()
    out = os.path.join(d, "drive_locs.hdf5")
    io.save_locs(out, locs, info)
    re_locs, _ = io.load_locs(out)
    print(f"roundtrip: {len(re_locs)} locs")
    ok = (
        len(locs) > 0
        and (method != "gaussmle" or rms * 130 < 5.0)
        and len(re_locs) == len(locs)
    )
    print("DRIVE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
