"""Example 1 — localization (counterpart of the reference's
sample_notebook_1_localize.ipynb): identify spots, fit them, save locs
with the metadata chain, and run the combined one-call pipeline.

Run: python examples/01_localize.py [movie.raw] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

DEFAULT_MOVIE = "/root/reference/tests/data/testdata.raw"
CAMERA = {"Baseline": 0, "Sensitivity": 1, "Gain": 1, "Pixelsize": 130}
MIN_NET_GRADIENT = 5000
BOX = 7


def main(movie_path: str = DEFAULT_MOVIE, out_dir: str | None = None):
    from picasso_tpu import io, localize

    out_dir = out_dir or tempfile.mkdtemp(prefix="picasso_tpu_ex1_")
    movie, info = io.load_movie(movie_path)
    print(f"movie: {movie.shape} ({info[0]['Data Type']})")

    # -- step 1: spot identification (max filter + net gradient) --
    ids = localize.identify(
        movie, MIN_NET_GRADIENT, BOX, return_info=False
    )
    print(f"identified {len(ids)} spots "
          f"(min net gradient {MIN_NET_GRADIENT}, box {BOX})")

    # -- step 2: fit integrated 2D Gaussians by MLE --
    locs, fit_info = localize.fit2D(
        movie, info, CAMERA, ids, BOX, fitting_method="gaussmle"
    )
    print(locs[["frame", "x", "y", "photons", "sx", "sy",
                "lpx", "lpy"]].head())

    # -- step 3: save with the full metadata chain --
    out = os.path.join(out_dir, "example_locs.hdf5")
    io.save_locs(out, locs, info + [fit_info])
    print(f"saved {len(locs)} locs to {out}")

    # -- alternatively: one call does identify + fit (+ optional 3D) --
    locs2 = localize.localize(
        movie, CAMERA,
        {"Min. Net Gradient": MIN_NET_GRADIENT, "Box Size": BOX},
        movie_info=info, fitting_method="gaussmle", return_info=False,
    )
    assert len(locs2) == len(locs)
    return locs, out


if __name__ == "__main__":
    main(*sys.argv[1:])
