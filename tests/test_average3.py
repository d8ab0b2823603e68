"""3D particle averaging: rotated synthetic particles must align back
onto the template (capability of the reference Average3 app)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import average3

INFO = [{"Frames": 100, "Height": 64, "Width": 64, "Pixelsize": 130}]

# L-shaped 3D template (px, px, nm): breaks all rotational symmetry
TEMPLATE = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.8, 0.0, 0.0],
        [1.6, 0.0, 0.0],
        [0.0, 0.7, 0.0],
        [0.0, 0.0, 120.0],
    ]
)


def _dataset(n_groups=14, locs_per_site=12, noise=0.03, seed=2):
    rng = np.random.default_rng(seed)
    rows = []
    true_angles = rng.uniform(0, 2 * np.pi, n_groups)
    for g in range(n_groups):
        ang = true_angles[g]
        pts = TEMPLATE.copy()
        x, y, z = average3.rotate_axis(
            "z", pts[:, 0], pts[:, 1], pts[:, 2], ang, 130
        )
        dx, dy = rng.normal(0, 0.15, 2)
        dz = rng.normal(0, 20.0)
        for px, py, pz in zip(x, y, z):
            for _ in range(locs_per_site):
                rows.append(
                    (
                        g,
                        px + dx + rng.normal(0, noise),
                        py + dy + rng.normal(0, noise),
                        pz + dz + rng.normal(0, noise * 130),
                    )
                )
    arr = np.array(rows)
    n = len(arr)
    return pd.DataFrame(
        {
            "frame": np.arange(n, dtype=np.uint32),
            "x": arr[:, 1].astype(np.float32),
            "y": arr[:, 2].astype(np.float32),
            "z": arr[:, 3].astype(np.float32),
            "photons": np.full(n, 1000, np.float32),
            "sx": np.full(n, 1.0, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 5, np.float32),
            "lpx": np.full(n, 0.03, np.float32),
            "lpy": np.full(n, 0.03, np.float32),
            "group": arr[:, 0].astype(np.int32),
        }
    )


def _group_spread(locs):
    """Entropy of the merged xy histogram — drops when the groups'
    site clouds align into sharp common peaks."""
    merged_x = locs["x"].to_numpy()
    merged_y = locs["y"].to_numpy()
    H, *_ = np.histogram2d(
        merged_x, merged_y, bins=60, range=[[-3, 3], [-3, 3]]
    )
    p = H / H.sum()
    entropy = -np.sum(p[p > 0] * np.log(p[p > 0]))
    return entropy


def test_average3_aligns_rotated_particles():
    locs = _dataset()
    before = _group_spread(locs)
    out = average3.average3(
        locs, INFO, iterations=2, oversampling=8, rot_axes=("z",)
    )
    after = _group_spread(out)
    # aligned ensemble is much sharper (lower histogram entropy)
    assert after < before - 0.3
    # z translation jitter removed: per-group z means coincide
    z_means = out.groupby("group")["z"].mean()
    assert z_means.std() < 10.0


def test_average3_requires_groups_and_z():
    locs = _dataset().drop(columns=["z"])
    with pytest.raises(AssertionError):
        average3.average3(locs, INFO)


def test_rotate_axis_roundtrip():
    rng = np.random.default_rng(0)
    x, y, z = rng.normal(0, 1, (3, 50))
    z = z * 100
    for axis in ("x", "y", "z"):
        xr, yr, zr = average3.rotate_axis(axis, x, y, z, 0.7, 130)
        xb, yb, zb = average3.rotate_axis(axis, xr, yr, zr, -0.7, 130)
        np.testing.assert_allclose(xb, x, atol=1e-10)
        np.testing.assert_allclose(yb, y, atol=1e-10)
        np.testing.assert_allclose(zb, z, atol=1e-8)
