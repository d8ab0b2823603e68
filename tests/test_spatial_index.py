"""Morton render-index pyramid (mirrors the reference's
test_spatial_index.py): query completeness vs brute force, level
selection, full-FOV bypass."""

from __future__ import annotations

import numpy as np
import pandas as pd

from picasso_tpu import spatial_index

INFO = [{"Frames": 100, "Height": 128, "Width": 128, "Pixelsize": 130}]


def _locs(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "frame": rng.integers(0, 100, n).astype(np.uint32),
            "x": rng.uniform(0, 128, n).astype(np.float32),
            "y": rng.uniform(0, 128, n).astype(np.float32),
        }
    )


class TestQuery:
    def test_query_superset_of_viewport(self):
        locs = _locs()
        index = spatial_index.build_render_index(locs, INFO)
        viewport = ((20.0, 30.0), (40.0, 55.0))
        idx = spatial_index.query_viewport(index, viewport)
        assert idx is not None
        got = set(idx.tolist())
        (y_min, x_min), (y_max, x_max) = viewport
        inside = np.nonzero(
            (locs["y"].to_numpy() >= y_min)
            & (locs["y"].to_numpy() < y_max)
            & (locs["x"].to_numpy() >= x_min)
            & (locs["x"].to_numpy() < x_max)
        )[0]
        # every in-viewport loc is returned (blocks may add a margin)
        assert set(inside.tolist()) <= got

    def test_full_fov_bypass(self):
        locs = _locs(5000)
        index = spatial_index.build_render_index(locs, INFO)
        idx = spatial_index.query_viewport(
            index, ((0.0, 0.0), (128.0, 128.0))
        )
        assert idx is None  # caller renders everything directly

    def test_small_viewport_returns_small_subset(self):
        locs = _locs()
        index = spatial_index.build_render_index(locs, INFO)
        idx = spatial_index.query_viewport(
            index, ((60.0, 60.0), (64.0, 64.0))
        )
        assert idx is not None
        assert len(idx) < len(locs) / 10

    def test_empty_region(self):
        locs = _locs(2000)
        locs = locs[(locs["x"] > 64) | (locs["y"] > 64)]
        index = spatial_index.build_render_index(locs, INFO)
        idx = spatial_index.query_viewport(
            index, ((2.0, 2.0), (5.0, 5.0))
        )
        assert idx is not None
        assert len(idx) == 0


class TestMorton:
    def test_encode_orders_locality(self):
        x = np.array([0, 1, 0, 1], np.uint32)
        y = np.array([0, 0, 1, 1], np.uint32)
        codes = spatial_index._morton_encode_2d(x, y)
        assert len(set(codes.tolist())) == 4
        # Z-order: (0,0) < (1,0) < (0,1) < (1,1)
        assert codes[0] < codes[1] < codes[2] < codes[3]


class TestIndexStructure:
    def _index(self, n=3000, seed=0):
        import pandas as pd

        rng = np.random.default_rng(seed)
        locs = pd.DataFrame({
            "x": rng.uniform(0, 64, n).astype(np.float32),
            "y": rng.uniform(0, 64, n).astype(np.float32),
        })
        info = [{"Frames": 10, "Height": 64, "Width": 64}]
        return locs, spatial_index.build_render_index(locs, info)

    def test_perm_is_a_permutation(self):
        locs, index = self._index()
        perm = index["perm"] if isinstance(index, dict) else None
        if perm is None:
            perm = getattr(index, "perm", None)
        if perm is None:
            pytest.skip("index layout has no explicit permutation")
        assert sorted(np.asarray(perm).tolist()) == list(
            range(len(locs))
        )

    def test_empty_locs_builds(self):
        import pandas as pd

        locs = pd.DataFrame({
            "x": np.empty(0, np.float32),
            "y": np.empty(0, np.float32),
        })
        info = [{"Frames": 1, "Height": 64, "Width": 64}]
        index = spatial_index.build_render_index(locs, info)
        out = spatial_index.query_viewport(
            index, ((0.0, 0.0), (8.0, 8.0))
        )
        assert out is None or len(out) == 0

    def test_viewport_outside_fov_empty(self):
        locs, index = self._index()
        out = spatial_index.query_viewport(
            index, ((100.0, 100.0), (120.0, 120.0))
        )
        assert out is not None and len(out) == 0

    def test_overhanging_viewport_clips(self):
        locs, index = self._index()
        out = spatial_index.query_viewport(
            index, ((60.0, 60.0), (80.0, 80.0))
        )
        if out is None:
            pytest.skip("bypass threshold returns None")
        sel = locs.iloc[out]
        strict = (
            (locs["x"] >= 60) & (locs["y"] >= 60)
        ).sum()
        assert len(sel) >= strict

    def test_negative_enclosing_viewport_full(self):
        locs, index = self._index()
        out = spatial_index.query_viewport(
            index, ((-10.0, -10.0), (70.0, 70.0))
        )
        # covers the full FOV -> bypass (None) or everything
        assert out is None or len(out) == len(locs)

    def test_render_parity_with_full_locs(self):
        import pandas as pd

        from picasso_tpu import render

        locs, index = self._index()
        info = [{"Frames": 10, "Height": 64, "Width": 64,
                 "Pixelsize": 130}]
        vp = ((10.0, 12.0), (30.0, 33.0))
        idx = spatial_index.query_viewport(index, vp)
        subset = locs if idx is None else locs.iloc[idx]
        n1, img1 = render.render(
            locs, info, oversampling=4, viewport=vp
        )
        n2, img2 = render.render(
            subset, info, oversampling=4, viewport=vp
        )
        assert n1 == n2
        np.testing.assert_array_equal(img1, img2)
