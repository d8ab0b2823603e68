"""The fused Mosaic identify kernel must reproduce the XLA identify
maps + tile reduction EXACTLY at the hit level (same hits, same
positions) and to f32 eps on the net-gradient values — interpret mode
on CPU; bench.py's parity check certifies the device lowering."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from picasso_tpu.ops import identify as idops
from picasso_tpu.ops import identify_pallas as idp


def _movie(n_frames=6, size=48, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.poisson(30, (n_frames, size, size)).astype(np.uint16)
    yy, xx = np.mgrid[-3:4, -3:4]
    psf = np.exp(-(yy**2 + xx**2) / 2.4)
    for i in range(n_frames):
        for cy, cx in ((10, 10), (30, 20), (40, 40), (5, 40)):
            frames[i, cy - 3:cy + 4, cx - 3:cx + 4] += rng.poisson(
                psf * 600
            ).astype(np.uint16)
    return frames


@pytest.mark.parametrize("box", [5, 7])
@pytest.mark.parametrize("shape", [(48, 48), (50, 62)])
def test_tiles_match_xla_reduction(box, shape, monkeypatch):
    frames = _movie(size=48)[:, : shape[0], : shape[1]]
    thresh = 2000.0

    tm, tl, tn = idp.identify_tiles_pallas(
        jnp.asarray(frames), thresh, box, interpret=True
    )
    tm, tl, tn = map(np.asarray, (tm, tl, tn))

    # XLA reference tile arrays (the else-branch of _identify_compact)
    maxima, ng = idops.identify_maps(jnp.asarray(frames), box)
    maxima, ng = np.asarray(maxima), np.asarray(ng)
    mask = maxima & (ng > thresh)
    B, Y, X = mask.shape
    T = box // 2 + 1
    Yp, Xp = -(-Y // T) * T, -(-X // T) * T
    mask_p = np.zeros((B, Yp, Xp), bool)
    mask_p[:, :Y, :X] = mask
    ng_p = np.zeros((B, Yp, Xp), np.float32)
    ng_p[:, :Y, :X] = ng
    m = mask_p.reshape(B, Yp // T, T, Xp // T, T)
    ref_mask = m.any(axis=(2, 4))
    loc = np.arange(T)[:, None] * T + np.arange(T)[None, :]
    ref_loc = (m * loc[None, None, :, None, :]).sum(axis=(2, 4))
    ref_ng = (m * ng_p.reshape(B, Yp // T, T, Xp // T, T)).sum(
        axis=(2, 4)
    )

    np.testing.assert_array_equal(tm > 0.5, ref_mask)
    np.testing.assert_array_equal(
        np.round(tl).astype(int)[ref_mask], ref_loc[ref_mask]
    )
    # net gradient: same rank-3 factors, different contraction order
    np.testing.assert_allclose(
        tn[ref_mask], ref_ng[ref_mask], rtol=2e-5, atol=1e-2
    )
    assert ref_mask.sum() > 8  # the comparison actually saw hits


def test_identify_compact_routes_through_pallas(monkeypatch):
    """PICASSO_TPU_IDENTIFY=interpret routes _identify_compact through
    the kernel; hits must match the XLA route exactly."""
    frames = _movie()
    dev = jnp.asarray(frames)
    want = tuple(
        map(np.asarray, idops._identify_compact(dev, 2000.0, 7, 512))
    )
    monkeypatch.setenv("PICASSO_TPU_IDENTIFY", "interpret")
    idops._identify_compact.clear_cache()
    try:
        got = tuple(
            map(
                np.asarray,
                idops._identify_compact(dev, 2000.0, 7, 512),
            )
        )
    finally:
        monkeypatch.undo()
        idops._identify_compact.clear_cache()
    assert int(got[0]) == int(want[0])
    for g, w in zip(got[1:4], want[1:4]):
        np.testing.assert_array_equal(g, w)
    n = int(want[0])
    np.testing.assert_allclose(
        got[4][:n], want[4][:n], rtol=2e-5, atol=1e-2
    )


@pytest.mark.parametrize("band_px", [8, 12, 16])
def test_banded_matches_whole_frame(band_px):
    """Forcing multiple row bands per frame must not change any tile
    output: band boundaries are invisible (halo'd views + global
    eligibility masking)."""
    frames = _movie(n_frames=4, size=48)
    thresh = 2000.0
    whole = idp.identify_tiles_pallas(
        jnp.asarray(frames), thresh, 7, interpret=True,
        band_px=1 << 10,
    )
    banded = idp.identify_tiles_pallas(
        jnp.asarray(frames), thresh, 7, interpret=True,
        band_px=band_px,
    )
    for w, b in zip(whole, banded):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(b))


def test_banded_wide_frame_matches_xla():
    """A wide frame (band plan kicks in automatically) still matches
    the XLA reduction hit-for-hit."""
    rng = np.random.default_rng(5)
    frames = rng.poisson(30, (2, 40, 1056)).astype(np.uint16)
    yy, xx = np.mgrid[-3:4, -3:4]
    psf = np.exp(-(yy**2 + xx**2) / 2.4)
    for i in range(2):
        for cy, cx in ((10, 10), (30, 520), (20, 1040), (8, 700)):
            frames[i, cy - 3:cy + 4, cx - 3:cx + 4] += rng.poisson(
                psf * 600
            ).astype(np.uint16)
    thresh = 2000.0
    tm, tl, tn = map(
        np.asarray,
        idp.identify_tiles_pallas(
            jnp.asarray(frames), thresh, 7, interpret=True
        ),
    )
    maxima, ng = idops.identify_maps(jnp.asarray(frames), 7)
    maxima, ng = np.asarray(maxima), np.asarray(ng)
    mask = maxima & (ng > thresh)
    B, Y, X = mask.shape
    T = 4
    ref = mask.reshape(B, Y // T, T, X // T, T).any(axis=(2, 4))
    np.testing.assert_array_equal(tm > 0.5, ref)
    assert ref.sum() >= 8
