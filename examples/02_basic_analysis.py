"""Example 2 — basic analysis (counterpart of
sample_notebook_2_basic_analysis.ipynb): load locs, pick regions,
NeNA precision, filtering, drift correction, rendering an image,
binding kinetics.

Run: python examples/02_basic_analysis.py [locs.hdf5] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

DEFAULT_LOCS = "/root/reference/tests/data/testdata_locs.hdf5"


def main(locs_path: str = DEFAULT_LOCS, out_dir: str | None = None):
    import numpy as np

    from picasso_tpu import io, lib, postprocess, render

    out_dir = out_dir or tempfile.mkdtemp(prefix="picasso_tpu_ex2_")
    locs, info = io.load_locs(locs_path)
    print(f"{len(locs)} locs; info chain has {len(info)} block(s)")

    # -- picking: locs within circular regions --
    centers = [(16.0, 16.0), (8.0, 20.0)]
    picked = postprocess.picked_locs(
        locs, info, centers, "Circle", pick_size=3.0
    )
    print(f"picked {sum(len(p) for p in picked)} locs "
          f"in {len(picked)} picks")

    # -- NeNA: experimental localization precision --
    try:
        _, nena_px = postprocess.nena(locs, info)
        print(f"NeNA precision: {nena_px:.3f} px")
    except Exception as e:  # tiny datasets may not converge
        print(f"NeNA skipped: {e}")

    # -- filtering by column ranges --
    tight = locs[(locs["lpx"] < 0.5) & (locs["lpy"] < 0.5)]
    print(f"{len(tight)}/{len(locs)} locs pass the lp filter")

    # -- drift correction (RCC); needs enough frames per segment --
    n_frames = lib.get_from_metadata(info, "Frames")
    seg = max(2, n_frames // 5)
    try:
        drift, undrifted = postprocess.undrift(
            tight, info, seg, display=False
        )
        print(f"RCC drift: x std {np.std(drift['x']):.4f} px")
    except Exception as e:
        undrifted = tight
        print(f"undrift skipped: {e}")

    # -- save + render an image --
    out = os.path.join(out_dir, "analysis_locs.hdf5")
    io.save_locs(out, undrifted, info)
    n, image = render.render(
        undrifted, info, oversampling=8, blur_method="gaussian"
    )
    print(f"rendered {n} locs into {image.shape}")

    # -- binding kinetics: linked event lengths / dark times --
    linked = postprocess.link(undrifted, info, r_max=0.5,
                              max_dark_time=1)
    dark = postprocess.compute_dark_times(linked)
    print(f"{len(linked)} binding events; "
          f"mean length {linked['len'].mean():.2f} frames")
    return linked, out


if __name__ == "__main__":
    main(*sys.argv[1:])
