"""Native C++ runtime kernels: build, parity with the pure-Python
implementations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import native

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="native library not built"
)


def test_link_groups_matches_python():
    from picasso_tpu.postprocess import _get_link_groups

    rng = np.random.default_rng(0)
    n = 2000
    frame = np.sort(rng.integers(0, 500, n)).astype(np.int64)
    x = rng.uniform(0, 20, n).astype(np.float32)
    y = rng.uniform(0, 20, n).astype(np.float32)
    group = np.zeros(n, np.int32)
    ours = native.link_groups(frame, x, y, group, 0.3, 3)
    ref = _get_link_groups(frame, x, y, 0.3, 3, group)
    np.testing.assert_array_equal(ours, ref)


def test_link_groups_with_groups():
    from picasso_tpu.postprocess import _get_link_groups

    rng = np.random.default_rng(1)
    n = 500
    frame = np.sort(rng.integers(0, 100, n)).astype(np.int64)
    x = rng.uniform(0, 5, n).astype(np.float32)
    y = rng.uniform(0, 5, n).astype(np.float32)
    group = rng.integers(0, 3, n).astype(np.int32)
    ours = native.link_groups(frame, x, y, group, 0.5, 2)
    ref = _get_link_groups(frame, x, y, 0.5, 2, group)
    np.testing.assert_array_equal(ours, ref)


def test_cut_spots_matches_fancy_index():
    rng = np.random.default_rng(2)
    movie = rng.integers(
        0, 65535, (20, 48, 48)
    ).astype(np.uint16)
    n = 300
    ids_frame = rng.integers(0, 20, n)
    ids_x = rng.integers(3, 44, n)
    ids_y = rng.integers(3, 44, n)
    box = 7
    ours = native.cut_spots(movie, ids_frame, ids_x, ids_y, box)
    r = box // 2
    offs = np.arange(-r, r + 1)
    ref = movie[
        ids_frame[:, None, None],
        ids_y[:, None, None] + offs[None, :, None],
        ids_x[:, None, None] + offs[None, None, :],
    ]
    np.testing.assert_array_equal(ours, ref)


def test_cut_spots_to_photons_fused():
    rng = np.random.default_rng(3)
    movie = rng.integers(0, 4000, (5, 32, 32)).astype(np.uint16)
    ids_frame = np.array([0, 2, 4])
    ids_x = np.array([10, 15, 20])
    ids_y = np.array([12, 8, 25])
    out = native.cut_spots_to_photons(
        movie, ids_frame, ids_x, ids_y, 7,
        baseline=100, sensitivity=2.0, gain=4.0,
    )
    spots = native.cut_spots(movie, ids_frame, ids_x, ids_y, 7)
    expected = (spots.astype(np.float32) - 100) * 2.0 / 4.0
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_link_through_public_api_uses_native():
    """postprocess.link produces identical results whether or not the
    native path is active."""
    from picasso_tpu import postprocess

    rng = np.random.default_rng(4)
    n = 400
    locs = pd.DataFrame(
        {
            "frame": np.sort(
                rng.integers(0, 200, n)
            ).astype(np.uint32),
            "x": rng.uniform(0, 10, n).astype(np.float32),
            "y": rng.uniform(0, 10, n).astype(np.float32),
            "photons": np.full(n, 1000, np.float32),
            "sx": np.full(n, 1.0, np.float32),
            "sy": np.full(n, 1.0, np.float32),
            "bg": np.full(n, 10, np.float32),
            "lpx": np.full(n, 0.05, np.float32),
            "lpy": np.full(n, 0.05, np.float32),
        }
    )
    info = [{"Frames": 200, "Height": 32, "Width": 32}]
    linked_native = postprocess.link(locs, info, 0.3, 3)
    saved = native.AVAILABLE
    try:
        native.AVAILABLE = False
        linked_python = postprocess.link(locs, info, 0.3, 3)
    finally:
        native.AVAILABLE = saved
    pd.testing.assert_frame_equal(linked_native, linked_python)
