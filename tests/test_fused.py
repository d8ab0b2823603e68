"""Fused device-resident localize (ops/fused.py): the single-program
identify+cut+fit path must match the staged identify → get_spots →
fit2D path exactly — same hits, same fit numerics — for both fitters,
with ROI/frame-bounds handling intact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from picasso_tpu import localize, simulate
from picasso_tpu.ops import fused

CAMERA = {"Baseline": 100, "Sensitivity": 0.5, "Gain": 1,
          "Pixelsize": 130}


@pytest.fixture(scope="module")
def sim_movie():
    movie, _, _ = simulate.simulate_movie(
        n_sites=20, imagesize=64, frames=60, taud=1500,
        photonrate=70, seed=11,
    )
    # camera counts: add baseline so conversion is non-trivial
    return (movie + 100).astype(np.uint16)


def _staged(movie, method, mle_method="sigmaxy"):
    ids = localize.identify(movie, 3000, 7, return_info=False)
    spots = localize.get_spots(movie, ids, 7, CAMERA)
    if method == "gaussmle":
        from picasso_tpu import gaussmle

        t, c, ll, it = gaussmle.gaussmle(
            spots, 0.001, 100, mle_method
        )
        return ids, t, c, ll, it
    from picasso_tpu import gausslq

    return ids, gausslq.fit_spots(spots), None, None, None


class TestFusedParity:
    @pytest.mark.parametrize("method", ["gaussmle", "gausslq"])
    def test_matches_staged_path(self, sim_movie, method):
        ids_s, t_s, c_s, ll_s, it_s = _staged(sim_movie, method)
        ids_f, (t_f, c_f, ll_f, it_f) = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA, fitting_method=method,
        )
        assert len(ids_f) == len(ids_s) > 50
        np.testing.assert_array_equal(
            ids_f["frame"].to_numpy(), ids_s["frame"].to_numpy()
        )
        np.testing.assert_array_equal(
            ids_f["x"].to_numpy(), ids_s["x"].to_numpy()
        )
        np.testing.assert_allclose(
            ids_f["net_gradient"], ids_s["net_gradient"], rtol=1e-6
        )
        np.testing.assert_allclose(t_f, t_s, rtol=2e-4, atol=2e-4)
        if method == "gaussmle":
            np.testing.assert_allclose(
                c_f, c_s, rtol=2e-3, atol=1e-5
            )
            np.testing.assert_allclose(
                ll_f, ll_s, rtol=2e-4, atol=2e-3
            )
            np.testing.assert_array_equal(it_f, it_s)

    def test_sigma_method(self, sim_movie):
        ids_s, t_s, c_s, ll_s, it_s = _staged(
            sim_movie, "gaussmle", "sigma"
        )
        ids_f, (t_f, c_f, ll_f, it_f) = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA, fitting_method="gaussmle",
            mle_method="sigma",
        )
        assert len(ids_f) == len(ids_s)
        np.testing.assert_allclose(t_f, t_s, rtol=2e-4, atol=2e-4)

    def test_mesh_routing_matches_single_device(
        self, sim_movie, monkeypatch
    ):
        """Production mesh routing (auto when >1 device visible) must
        deliver the same hits and fits as the single-device chain."""
        ids_1, (t_1, c_1, ll_1, it_1) = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA, fitting_method="gaussmle",
        )
        monkeypatch.setenv("PICASSO_TPU_FUSED_MESH", "auto")
        ids_m, (t_m, c_m, ll_m, it_m) = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA, fitting_method="gaussmle",
        )
        assert len(ids_m) == len(ids_1) > 50
        for col in ("frame", "x", "y"):
            np.testing.assert_array_equal(
                ids_m[col].to_numpy(), ids_1[col].to_numpy()
            )
        np.testing.assert_allclose(t_m, t_1, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(c_m, c_1, rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(ll_m, ll_1, rtol=2e-4, atol=2e-3)
        np.testing.assert_array_equal(it_m, it_1)

    def test_roi_and_frame_bounds(self, sim_movie):
        roi = ((8, 8), (56, 56))
        bounds = (10, 40)
        ids_s = localize.identify(
            sim_movie, 3000, 7, roi=roi, frame_bounds=bounds,
            return_info=False,
        )
        ids_f, _ = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA, fitting_method="gausslq",
            roi=roi, frame_bounds=bounds,
        )
        assert len(ids_f) == len(ids_s)
        np.testing.assert_array_equal(
            ids_f["y"].to_numpy(), ids_s["y"].to_numpy()
        )
        np.testing.assert_array_equal(
            ids_f["x"].to_numpy(), ids_s["x"].to_numpy()
        )
        assert ids_f["frame"].min() >= 10
        assert ids_f["frame"].max() <= 40

    def test_empty_movie_bounds(self, sim_movie):
        ids, (t, c, ll, it) = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA,
            frame_bounds=(900, 999),
        )
        assert len(ids) == 0
        assert t.shape == (0, 6)

    def test_localize_entry_uses_fused(self, sim_movie):
        """localize.localize routes scalar-camera movies through the
        fused path and returns the same locs as fit2D staging."""
        locs = localize.localize(
            sim_movie, dict(CAMERA),
            {"Min. Net Gradient": 3000, "Box Size": 7},
            fitting_method="gaussmle",
        )
        ids, t, c, ll, it = _staged(sim_movie, "gaussmle")
        from picasso_tpu import gaussmle

        expected = gaussmle.locs_from_fits(ids, t, c, ll, it, 7)
        np.testing.assert_allclose(
            locs["x"].to_numpy(), expected["x"].to_numpy(),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            locs["photons"].to_numpy(),
            expected["photons"].to_numpy(), rtol=2e-4,
        )

    def test_lazy_movie_streams(self, sim_movie):
        """Lazy (non-array) movies stream chunk-by-chunk through the
        same fused program."""

        class Lazy:
            dtype = sim_movie.dtype

            def __len__(self):
                return len(sim_movie)

            def __getitem__(self, it):
                return sim_movie[it]

        ids_a, (t_a, *_) = fused.localize_fused(
            sim_movie, 3000, 7, CAMERA, fitting_method="gausslq",
        )
        ids_l, (t_l, *_) = fused.localize_fused(
            Lazy(), 3000, 7, CAMERA, fitting_method="gausslq",
            frame_chunk=17, prefetch_depth=2,
        )
        assert len(ids_l) == len(ids_a)
        np.testing.assert_array_equal(
            ids_l["x"].to_numpy(), ids_a["x"].to_numpy()
        )
        np.testing.assert_allclose(t_l, t_a, rtol=2e-4, atol=2e-4)


class TestCutRoisT:
    """cut_rois_t is the MXU one-hot column gather; its block-windowed
    fast path (X % _BLOCK == 0) and full-width fallback must both
    reproduce the plain numpy window cut exactly for integer camera
    data, including spots at the eligible-border extremes."""

    def _reference(self, frames, f, y, x, box):
        r = box // 2
        out = np.empty((box, box, len(f)), np.float32)
        for n, (fn, yn, xn) in enumerate(zip(f, y, x)):
            out[:, :, n] = frames[
                fn, yn - r:yn + r + 1, xn - r:xn + r + 1
            ].astype(np.float32)
        return out

    @pytest.mark.parametrize("X", [1024, 256, 96, 32])
    def test_exact_vs_numpy(self, X):
        rng = np.random.default_rng(3)
        box, r = 7, 3
        B, Y = 4, 48
        frames = rng.integers(0, 65535, (B, Y, X), dtype=np.uint16)
        n = 64
        f = rng.integers(0, B, n).astype(np.int32)
        y = rng.integers(r, Y - r, n).astype(np.int32)
        x = rng.integers(r, X - r, n).astype(np.int32)
        # force border extremes and block-boundary straddles
        x[:6] = [r, X - r - 1, 63 % (X - r - 1 - r) + r,
                 64 % (X - r - 1 - r) + r, 65 % (X - r - 1 - r) + r,
                 (X // 2)]
        import jax.numpy as jnp

        got = np.asarray(
            fused.cut_rois_t(jnp.asarray(frames), f, y, x, box)
        )
        np.testing.assert_array_equal(
            got, self._reference(frames, f, y, x, box)
        )

    def test_exact_on_f32_integer_frames(self):
        # the e2e-compute bench feeds f32 frames holding u16 values;
        # the HIGHEST-precision one-hot einsum must stay exact
        rng = np.random.default_rng(4)
        box, r = 7, 3
        frames = rng.integers(
            0, 65535, (2, 64, 128), dtype=np.uint16
        ).astype(np.float32)
        f = np.zeros(16, np.int32)
        y = rng.integers(r, 64 - r, 16).astype(np.int32)
        x = rng.integers(r, 128 - r, 16).astype(np.int32)
        import jax.numpy as jnp

        got = np.asarray(
            fused.cut_rois_t(jnp.asarray(frames), f, y, x, box)
        )
        np.testing.assert_array_equal(
            got, self._reference(frames, f, y, x, box)
        )

    def test_fill_rows_clamp(self):
        import jax.numpy as jnp

        frames = np.arange(2 * 64 * 64, dtype=np.uint16).reshape(
            2, 64, 64)
        f = np.array([-1, 0], np.int32)
        y = np.array([-1, 10], np.int32)
        x = np.array([-1, 10], np.int32)
        got = np.asarray(
            fused.cut_rois_t(jnp.asarray(frames), f, y, x, 7)
        )
        # fill row clamps to frame 0's top-left eligible window
        np.testing.assert_array_equal(
            got[:, :, 0], frames[0, 0:7, 0:7].astype(np.float32)
        )
        np.testing.assert_array_equal(
            got[:, :, 1], frames[0, 7:14, 7:14].astype(np.float32)
        )


class TestCutRoisTBlocks:
    """The tile-block ROI cut must reproduce the plain numpy window
    cut exactly: any window of an ELIGIBLE hit (r <= y < Y-r-1) is
    covered by the 3x3 aligned (T, T) block patch, and the two
    one-hot extractions at HIGHEST precision are exact for integer
    camera data."""

    def _reference(self, frames, f, y, x, box):
        r = box // 2
        out = np.empty((box, box, len(f)), np.float32)
        for n, (fn, yn, xn) in enumerate(zip(f, y, x)):
            out[:, :, n] = frames[
                fn, yn - r:yn + r + 1, xn - r:xn + r + 1
            ].astype(np.float32)
        return out

    @pytest.mark.parametrize("box", [5, 7, 9])
    @pytest.mark.parametrize("shape", [(48, 64), (50, 98), (32, 256)])
    def test_exact_vs_numpy(self, box, shape):
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        r = box // 2
        B = 3
        Y, X = shape
        frames = rng.integers(0, 65535, (B, Y, X), dtype=np.uint16)
        n = 96
        f = rng.integers(0, B, n).astype(np.int32)
        y = rng.integers(r, Y - r - 1, n).astype(np.int32)
        x = rng.integers(r, X - r - 1, n).astype(np.int32)
        # border extremes of the eligible interior + block straddles
        y[:4] = [r, Y - r - 2, r + 1, (Y - r - 2)]
        x[:4] = [r, X - r - 2, X - r - 2, r]
        got = np.asarray(
            fused.cut_rois_t_blocks(jnp.asarray(frames), f, y, x, box)
        )
        np.testing.assert_array_equal(
            got, self._reference(frames, f, y, x, box)
        )

    def test_fill_rows_and_f32_frames(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        frames = rng.integers(
            0, 65535, (2, 64, 64), dtype=np.uint16
        ).astype(np.float32)
        f = np.array([-1, 1], np.int32)
        y = np.array([-1, 30], np.int32)
        x = np.array([-1, 33], np.int32)
        got = np.asarray(
            fused.cut_rois_t_blocks(jnp.asarray(frames), f, y, x, 7)
        )
        # fill row clamps to frame 0's top-left eligible window
        np.testing.assert_array_equal(
            got[:, :, 0], frames[0, :7, :7].astype(np.float32)
        )
        np.testing.assert_array_equal(
            got[:, :, 1], frames[1, 27:34, 30:37].astype(np.float32)
        )

    def test_agrees_with_row_cut(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(9)
        frames = rng.integers(0, 65535, (4, 96, 96), dtype=np.uint16)
        n = 128
        f = rng.integers(0, 4, n).astype(np.int32)
        y = rng.integers(3, 92, n).astype(np.int32)
        x = rng.integers(3, 92, n).astype(np.int32)
        a = np.asarray(
            fused.cut_rois_t(jnp.asarray(frames), f, y, x, 7)
        )
        b = np.asarray(
            fused.cut_rois_t_blocks(jnp.asarray(frames), f, y, x, 7)
        )
        np.testing.assert_array_equal(a, b)


class TestCutRoisTSpan:
    """The row-span cuts gather each window's box CONTIGUOUS frame
    rows as one slice (one gather row per spot; two per spot in the
    column-blocked wide-frame view) and must reproduce the plain
    numpy window cut exactly, including eligible-border extremes,
    fill rows, and block straddles."""

    def _reference(self, frames, f, y, x, box):
        r = box // 2
        out = np.empty((box, box, len(f)), np.float32)
        for n, (fn, yn, xn) in enumerate(zip(f, y, x)):
            out[:, :, n] = frames[
                fn, yn - r:yn + r + 1, xn - r:xn + r + 1
            ].astype(np.float32)
        return out

    @pytest.mark.parametrize(
        "cut", ["span", "spanblocks", "shift", "slab", "winrows", "wincols"], ids=str
    )
    @pytest.mark.parametrize("box", [5, 7, 9])
    @pytest.mark.parametrize("shape", [(48, 64), (50, 98), (32, 256)])
    def test_exact_vs_numpy(self, cut, box, shape):
        import jax.numpy as jnp

        fn_cut = getattr(fused, f"cut_rois_t_{cut}")
        rng = np.random.default_rng(11)
        r = box // 2
        B = 3
        Y, X = shape
        frames = rng.integers(0, 65535, (B, Y, X), dtype=np.uint16)
        n = 96
        f = rng.integers(0, B, n).astype(np.int32)
        y = rng.integers(r, Y - r - 1, n).astype(np.int32)
        x = rng.integers(r, X - r - 1, n).astype(np.int32)
        y[:4] = [r, Y - r - 2, r + 1, (Y - r - 2)]
        x[:4] = [r, X - r - 2, X - r - 2, r]
        if X >= 130:
            # straddle the 64-px block boundary both ways
            x[4:8] = [62, 63, 64, 65]
        got = np.asarray(
            fn_cut(jnp.asarray(frames), f, y, x, box)
        )
        np.testing.assert_array_equal(
            got, self._reference(frames, f, y, x, box)
        )

    @pytest.mark.parametrize(
        "cut", ["span", "spanblocks", "shift", "slab", "winrows", "wincols"], ids=str
    )
    def test_fill_rows_and_f32_frames(self, cut):
        import jax.numpy as jnp

        fn_cut = getattr(fused, f"cut_rois_t_{cut}")
        rng = np.random.default_rng(12)
        frames = rng.integers(
            0, 65535, (2, 64, 128), dtype=np.uint16
        ).astype(np.float32)
        f = np.array([-1, 1], np.int32)
        y = np.array([-1, 30], np.int32)
        x = np.array([-1, 33], np.int32)
        got = np.asarray(fn_cut(jnp.asarray(frames), f, y, x, 7))
        np.testing.assert_array_equal(
            got[:, :, 0], frames[0, :7, :7].astype(np.float32)
        )
        np.testing.assert_array_equal(
            got[:, :, 1], frames[1, 27:34, 30:37].astype(np.float32)
        )


@pytest.mark.parametrize(
    "cut", ["blocks", "span", "spanblocks", "shift", "slab", "winrows",
            "wincols", "winblocks"]
)
def test_chain_parity_blocks_cut_and_pallas_identify(
    monkeypatch, cut
):
    """Full identify_cut_fit with the round-4 candidate routes
    (each PICASSO_TPU_ROI_CUT variant, PICASSO_TPU_IDENTIFY=interpret)
    must reproduce the default chain exactly: same hits, same thetas
    (all cuts are exact window extractions; both identify routes
    produce hit-identical tile arrays)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    frames = rng.poisson(30, (8, 64, 64)).astype(np.uint16)
    yy, xx = np.mgrid[-3:4, -3:4]
    psf = np.exp(-(yy**2 + xx**2) / 2.4)
    for i in range(8):
        for cy, cx in ((10, 10), (30, 20), (50, 40), (20, 50)):
            frames[i, cy - 3:cy + 4, cx - 3:cx + 4] += rng.poisson(
                psf * 600
            ).astype(np.uint16)
    dev = jnp.asarray(frames)
    args = (dev, jnp.float32(2000), jnp.float32(0), jnp.float32(1))
    kw = dict(box=7, size=512, eps=1e-3, max_it=30, method="lq")

    # baseline is pinned to the einsum rows cut (the default route is
    # width-dispatched and changed to winrows in round 4)
    monkeypatch.setenv("PICASSO_TPU_ROI_CUT", "rows")
    fused.identify_cut_fit.clear_cache()
    want = tuple(
        map(np.asarray, fused.identify_cut_fit(*args, **kw))
    )
    assert int(want[0]) > 8

    monkeypatch.setenv("PICASSO_TPU_ROI_CUT", cut)
    monkeypatch.setenv("PICASSO_TPU_IDENTIFY", "interpret")
    fused.identify_cut_fit.clear_cache()
    try:
        got = tuple(
            map(np.asarray, fused.identify_cut_fit(*args, **kw))
        )
    finally:
        monkeypatch.undo()
        fused.identify_cut_fit.clear_cache()

    assert int(got[0]) == int(want[0])
    for g, w in zip(got[1:4], want[1:4]):
        np.testing.assert_array_equal(g, w)
    # Identical ROIs in (pinned bit-exactly by TestCutRoisTSpan) —
    # the einsum cuts then compile to the identical fit program, but
    # the barrel cuts' select chains fuse INTO the LM loop and change
    # XLA's f32 reduction order there; 30 LM iterations amplify that
    # reassociation to ~2e-4 relative, so those two pin allclose.
    if cut in ("shift", "slab", "winrows", "wincols", "winblocks"):
        np.testing.assert_allclose(
            got[5], want[5], rtol=1e-3, atol=1e-3
        )
    else:
        np.testing.assert_array_equal(got[5], want[5])


@pytest.mark.parametrize("method", ["lq", "sigmaxy"])
def test_chain_parity_winfit_fused_cut_fit(monkeypatch, method):
    """The fused cut+photon-convert+fit Pallas kernel
    (PICASSO_TPU_ROI_CUT=winfit, ops/winfit_pallas) must be
    BIT-identical to the split wincols-cut -> convert -> Pallas-fit
    chain: the in-VMEM barrel picks the same raw values, and the
    photon conversion and fit program are the same jnp code."""
    import jax.numpy as jnp

    rng = np.random.default_rng(27)
    frames = rng.poisson(30, (8, 64, 64)).astype(np.uint16)
    yy, xx = np.mgrid[-3:4, -3:4]
    psf = np.exp(-(yy**2 + xx**2) / 2.4)
    for i in range(8):
        for cy, cx in ((10, 10), (30, 20), (50, 40), (20, 50)):
            frames[i, cy - 3:cy + 4, cx - 3:cx + 4] += rng.poisson(
                psf * 600
            ).astype(np.uint16)
    dev = jnp.asarray(frames)
    # non-trivial camera constants so the in-kernel conversion is
    # actually exercised
    args = (dev, jnp.float32(2000), jnp.float32(1.5), jnp.float32(0.8))
    kw = dict(
        box=7, size=512, eps=1e-3, max_it=30, method=method,
        use_pallas=True, pallas_interpret=True,
    )

    monkeypatch.setenv("PICASSO_TPU_ROI_CUT", "wincols")
    fused.identify_cut_fit.clear_cache()
    want = tuple(map(np.asarray, fused.identify_cut_fit(*args, **kw)))
    assert int(want[0]) > 8

    monkeypatch.setenv("PICASSO_TPU_ROI_CUT", "winfit")
    fused.identify_cut_fit.clear_cache()
    try:
        got = tuple(
            map(np.asarray, fused.identify_cut_fit(*args, **kw))
        )
    finally:
        monkeypatch.undo()
        fused.identify_cut_fit.clear_cache()

    assert int(got[0]) == int(want[0])
    for g, w in zip(got[1:], want[1:]):
        np.testing.assert_array_equal(g, w)


def test_winfit_barrel_matches_xla_barrel():
    """_barrel_mid (right-aligned hi windows, no pads) must agree with
    the proven ops/fused._barrel_extract on every offset."""
    import jax.numpy as jnp

    from picasso_tpu.ops.winfit_pallas import _barrel_mid

    rng = np.random.default_rng(5)
    for width, out in ((256, 7), (64, 7), (33, 5), (8, 7), (7, 7)):
        n = 16
        arr = jnp.asarray(
            rng.integers(0, 60000, (out, width, n)).astype(np.uint16)
        )
        offs = jnp.asarray(
            rng.integers(0, width - out + 1, (1, n)).astype(np.int32)
        )
        got = np.asarray(_barrel_mid(arr, offs, out))
        want = np.asarray(
            fused._barrel_extract(arr, offs[0], 1, out, batch_axis=-1)
        )
        np.testing.assert_array_equal(got, want)


class TestCutRoisTWinblocks:
    def test_matches_reference_cut_all_blk(self):
        """Column-blocked window cut is an exact window extraction for
        every blk at every geometry (eligible centers: the identifier
        never emits centers within r of the border, and the window
        variants clamp the CENTER at edges where the einsum cut clamps
        per-row — a documented don't-care)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        r = 3
        cases = [
            ((4, 64, 64), 16), ((4, 64, 64), 32), ((2, 48, 96), 16),
            ((2, 40, 256), 8), ((2, 40, 256), 64),
        ]
        for (B, Y, X), blk in cases:
            frames = jnp.asarray(
                rng.integers(0, 60000, (B, Y, X)).astype(np.uint16)
            )
            n = 257
            f = jnp.asarray(rng.integers(0, B, n))
            y = jnp.asarray(rng.integers(r, Y - r, n))
            x = jnp.asarray(rng.integers(r, X - r, n))
            want = np.asarray(fused.cut_rois_t(frames, f, y, x, 7))
            got = np.asarray(
                fused.cut_rois_t_winblocks(frames, f, y, x, 7, blk=blk)
            )
            np.testing.assert_array_equal(got, want)

    def test_fallback_when_unsuitable(self):
        """X not a multiple of blk (or blk < box) falls back to the
        winrows route, exactly."""
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        frames = jnp.asarray(
            rng.integers(0, 60000, (2, 33, 37)).astype(np.uint16)
        )
        n = 31
        f = jnp.asarray(rng.integers(0, 2, n))
        y = jnp.asarray(rng.integers(3, 30, n))
        x = jnp.asarray(rng.integers(3, 34, n))
        want = np.asarray(fused.cut_rois_t(frames, f, y, x, 7))
        for blk in (16, 4):
            got = np.asarray(
                fused.cut_rois_t_winblocks(frames, f, y, x, 7, blk=blk)
            )
            np.testing.assert_array_equal(got, want)
