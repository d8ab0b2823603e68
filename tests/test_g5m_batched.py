"""Batched device G5M EM vs the serial per-cluster path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from picasso_tpu import g5m
from picasso_tpu.ops import gmm

INFO = [{"Frames": 1000, "Height": 64, "Width": 64, "Pixelsize": 130}]


def _clusters(rng, n_clusters, sep=0.15, lp=0.03):
    """Clusters with 1 or 2 molecules and varying sizes."""
    Xs, lps, truth = [], [], []
    for i in range(n_clusters):
        cx, cy = 5 + 3 * (i % 10), 5 + 3 * (i // 10)
        n_mols = 1 + (i % 2)
        size = rng.integers(60, 200)
        mols = np.array(
            [
                [cx + (m - (n_mols - 1) / 2) * sep, cy]
                for m in range(n_mols)
            ]
        )
        which = rng.integers(0, n_mols, size)
        pts = mols[which] + rng.normal(0, lp, (size, 2))
        Xs.append(pts)
        lps.append(np.full(size, lp))
        truth.append(mols)
    return Xs, lps, truth


def test_fit_batched_recovers_separated_components():
    rng = np.random.default_rng(0)
    Xs, lps, truth = _clusters(rng, 12)
    X, mask, lp = gmm.pad_clusters(Xs, lps, 256)
    for K in (1, 2):
        w, m, cv, pc, lb, conv, valid, ok = gmm.fit_g5m_batched(
            jnp.asarray(X), jnp.asarray(mask), jnp.asarray(lp),
            jax.random.PRNGKey(1),
            K=K, sigma_bounds=(0.8, 1.5), isotropic=True,
            loc_local=True, n_init=3, min_locs=10,
        )
        m = np.asarray(m)
        ok = np.asarray(ok)
        for g, mols in enumerate(truth):
            if len(mols) != K or not ok[g]:
                continue
            got = np.sort(m[g, :, 0])
            want = np.sort(mols[:, 0])
            np.testing.assert_allclose(got, want, atol=0.03)


def test_bic_batched_matches_serial_model():
    rng = np.random.default_rng(2)
    X1 = np.vstack(
        [
            rng.normal([5, 5], 0.03, (120, 2)),
            rng.normal([5.3, 5], 0.03, (120, 2)),
        ]
    )
    lp1 = np.full(240, 0.03)
    model = g5m.G5M_2D(2, 10, (0.8, 1.5)).fit(X1, lp1)
    assert model is not None
    ref_bic = model.bic(X1)
    X, mask, lp = gmm.pad_clusters([X1], [lp1], 256)
    got = np.asarray(
        gmm.bic_batched(
            jnp.asarray(X),
            jnp.asarray(mask),
            jnp.asarray(model.weights_[None], jnp.float32),
            jnp.asarray(model.means_[None], jnp.float32),
            jnp.asarray(
                model.precisions_cholesky_[None], jnp.float32
            ),
            jnp.asarray(
                np.isin(
                    np.arange(2), model.valid_idx
                )[None]
            ),
            True,
        )
    )[0]
    assert got == pytest.approx(ref_bic, rel=1e-3)


def _locs_from_clusters(Xs, lp=0.03, rng=None):
    rng = rng or np.random.default_rng(5)
    rows, groups, frames = [], [], []
    for gi, pts in enumerate(Xs):
        rows.append(pts)
        groups.append(np.full(len(pts), gi))
        # several binding events spread over time
        f = np.sort(rng.integers(0, 950, len(pts))).astype(
            np.uint32
        )
        frames.append(f)
    arr = np.vstack(rows)
    n = len(arr)
    return pd.DataFrame(
        {
            "frame": np.concatenate(frames),
            "x": arr[:, 0].astype(np.float32),
            "y": arr[:, 1].astype(np.float32),
            "photons": np.full(n, 1000, np.float32),
            "lpx": np.full(n, lp, np.float32),
            "lpy": np.full(n, lp, np.float32),
            "group": np.concatenate(groups).astype(np.int32),
        }
    )


def test_g5m_batched_matches_serial_structurally(monkeypatch):
    rng = np.random.default_rng(3)
    Xs, lps, truth = _clusters(rng, 16)
    locs = _locs_from_clusters(Xs)
    monkeypatch.setenv("PICASSO_TPU_G5M", "device")
    np.random.seed(7)
    centers_b, clustered_b, _ = g5m.g5m(
        locs, INFO, min_locs=10, postprocess=False
    )
    monkeypatch.setenv("PICASSO_TPU_G5M", "host")
    np.random.seed(7)
    centers_s, clustered_s, _ = g5m.g5m(
        locs, INFO, min_locs=10, postprocess=False
    )
    # same number of molecules recovered, in the same places
    assert len(centers_b) == len(centers_s)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(
        centers_s[["x", "y"]].to_numpy()
    ).query(centers_b[["x", "y"]].to_numpy())
    assert d.max() < 0.02
    # molecule counts per input group agree
    nb = centers_b.groupby("group_input").size()
    ns = centers_s.groupby("group_input").size()
    pd.testing.assert_series_equal(nb, ns)
    # and both recover the ground truth
    true = np.vstack(truth)
    d, _ = cKDTree(true).query(
        centers_b[["x", "y"]].to_numpy()
    )
    assert d.max() < 0.05


def test_g5m_batched_3d(monkeypatch):
    rng = np.random.default_rng(4)
    n = 150
    lp = 0.03
    pts = np.column_stack(
        [
            rng.normal(5, lp, n),
            rng.normal(5, lp, n),
            rng.normal(0, lp * 130, n),  # z in nm
        ]
    )
    locs = pd.DataFrame(
        {
            "frame": np.sort(
                rng.integers(0, 950, n)
            ).astype(np.uint32),
            "x": pts[:, 0].astype(np.float32),
            "y": pts[:, 1].astype(np.float32),
            "z": pts[:, 2].astype(np.float32),
            "photons": np.full(n, 1000, np.float32),
            "lpx": np.full(n, lp, np.float32),
            "lpy": np.full(n, lp, np.float32),
            "lpz": np.full(n, 2 * lp * 130, np.float32),
            "group": np.zeros(n, np.int32),
        }
    )
    calib = {
        "X Coefficients": [1.0],
        "Y Coefficients": [1.0],
        "Magnification factor": 0.79,
    }
    monkeypatch.setenv("PICASSO_TPU_G5M", "device")
    centers, _, _ = g5m.g5m(
        locs, INFO, min_locs=10, postprocess=False,
        calibration=calib,
    )
    assert len(centers) == 1
    assert centers["x"].iloc[0] == pytest.approx(5.0, abs=0.02)
    assert "fitted_sigma_z" in centers.columns


def test_g5m_batched_skips_small_clusters(monkeypatch):
    rng = np.random.default_rng(6)
    Xs = [
        rng.normal([5, 5], 0.03, (100, 2)),
        rng.normal([9, 9], 0.03, (5, 2)),  # below min_locs
    ]
    locs = _locs_from_clusters(Xs)
    monkeypatch.setenv("PICASSO_TPU_G5M", "device")
    centers, _, _ = g5m.g5m(
        locs, INFO, min_locs=10, postprocess=False
    )
    assert set(centers["group_input"]) == {0}
