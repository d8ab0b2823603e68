"""Batched device SPINNA scoring vs the serial numpy scorer.

The two paths draw from different RNG streams, so equivalence is
statistical: scores per candidate agree within simulation noise, the
fitted optimum lands on the same stoichiometry for a well-separated
problem, and the deterministic sub-components (thinning counts, mask
support, pair bookkeeping) are checked exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from picasso_tpu import spinna
from picasso_tpu.ops.spinna_batch import BatchedScorer, _bucket


def _dimer(dist=20.0, title="dimer"):
    s = spinna.Structure(title)
    s.define_coordinates(
        "A", [-dist / 2, dist / 2], [0.0, 0.0], [0.0, 0.0]
    )
    return s


def _monomer():
    s = spinna.Structure("monomer")
    s.define_coordinates("A", [0.0], [0.0], [0.0])
    return s


def _mixer(width=3000.0, height=3000.0, le=0.9, unc=2.0, **kw):
    return spinna.StructureMixer(
        [_monomer(), _dimer()],
        label_unc={"A": unc},
        le={"A": le},
        width=width,
        height=height,
        **kw,
    )


def _gt_coords(mixer, n_mono, n_dim, seed=0):
    np.random.seed(seed)
    return mixer.run_simulation([n_mono, n_dim])


def test_bucket():
    assert _bucket(1) == 8
    assert _bucket(8) == 8
    assert _bucket(9) == 16
    assert _bucket(1000) == 1024


def test_batched_scores_match_serial_statistically():
    mixer = _mixer()
    gt = _gt_coords(mixer, 200, 400, seed=1)
    sp = spinna.SPINNA(mixer, gt, N_sim=8)
    grid = spinna.generate_N_structures(
        mixer.structures, {"A": 1000}, granularity=9
    )
    rows = mixer.convert_N_structures_to_array(grid)

    np.random.seed(2)
    scorer = sp._get_batched_scorer(rows)
    batched = scorer.score(rows, seed=7)
    serial = np.array([sp._evaluate_single(r) for r in rows])

    # same stochastic objective: scores track each other candidate by
    # candidate well inside simulation noise
    assert np.max(np.abs(batched - serial)) < 0.06
    assert np.corrcoef(batched, serial)[0, 1] > 0.98
    # both paths identify the same clearly-separated optimum region
    assert abs(
        int(np.argmin(batched)) - int(np.argmin(serial))
    ) <= 1


def test_fit_recovers_mixture_through_batched_path(monkeypatch):
    monkeypatch.setenv("PICASSO_TPU_SPINNA", "device")
    mixer = _mixer()
    gt = _gt_coords(mixer, 600, 200, seed=3)
    sp = spinna.SPINNA(mixer, gt, N_sim=8)
    grid = spinna.generate_N_structures(
        mixer.structures, {"A": 1000}, granularity=11
    )
    np.random.seed(4)
    props, score = sp.fit(grid, fitting_mode="brute-force")
    # ground truth: 600 of 1000 targets in monomers = 60 %
    assert props[0] == pytest.approx(60.0, abs=12.0)
    assert score < 0.15


def test_serial_env_forces_loop(monkeypatch):
    monkeypatch.setenv("PICASSO_TPU_SPINNA", "host")
    mixer = _mixer()
    gt = _gt_coords(mixer, 100, 100, seed=5)
    sp = spinna.SPINNA(mixer, gt, N_sim=2)
    rows = np.array([[100, 100], [200, 50]], np.int32)
    np.random.seed(6)
    _, scores = sp.NN_scorer(rows)
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()


def test_le_thinning_exact_counts():
    mixer = _mixer(le=0.7)
    gt = _gt_coords(mixer, 50, 50, seed=8)
    sp = spinna.SPINNA(mixer, gt, N_sim=1)
    rows = np.array([[64, 32], [10, 5], [0, 3]], np.int32)
    scorer = sp._get_batched_scorer(rows)
    counts = jnp.asarray(rows[:, 1])  # dimer structure (2 targets)
    sim = scorer._simulate_structure(
        1, counts, jax.random.PRNGKey(0)
    )
    _, keep = sim["A"]
    kept = np.asarray(keep.sum(axis=1))
    expected = np.floor(rows[:, 1] * 2 * 0.7).astype(int)
    np.testing.assert_array_equal(kept, expected)


def test_mask_placement_stays_on_support():
    mask = np.zeros((10, 10), np.float32)
    mask[2:4, 5:9] = 1.0
    mask /= mask.sum()
    mask_dict = {
        "masks": {"A": mask},
        "infos": {"A": {"Binsize (nm)": 100.0}},
    }
    mixer = spinna.StructureMixer(
        [_monomer()],
        label_unc={"A": 0.0},
        le={"A": 1.0},
        mask_dict=mask_dict,
    )
    gt = {"A": np.random.default_rng(0).uniform(0, 1000, (50, 2))}
    sp = spinna.SPINNA(mixer, gt, N_sim=1)
    rows = np.array([[500]], np.int32)
    scorer = sp._get_batched_scorer(rows)
    sim = scorer._simulate_structure(
        0, jnp.asarray(rows[:, 0]), jax.random.PRNGKey(1)
    )
    pts, keep = sim["A"]
    pts = np.asarray(pts)[np.asarray(keep)]
    # mask support is x in [500, 900), y in [200, 400)
    assert (pts[:, 0] >= 500).all() and (pts[:, 0] <= 900).all()
    assert (pts[:, 1] >= 200).all() and (pts[:, 1] <= 400).all()


def test_3d_mixer_scores():
    mixer = _mixer(depth=800.0, random_rot_mode="3D")
    gt = _gt_coords(mixer, 150, 150, seed=9)
    sp = spinna.SPINNA(mixer, gt, N_sim=4)
    rows = np.array(
        [[150, 150], [300, 75], [0, 225]], np.int32
    )
    np.random.seed(10)
    scorer = sp._get_batched_scorer(rows)
    batched = scorer.score(rows, seed=11)
    serial = np.array([sp._evaluate_single(r) for r in rows])
    assert np.all(np.abs(batched - serial) < 0.08)
    assert int(np.argmin(batched)) == int(np.argmin(serial)) == 0


def test_bootstrap_through_batched_scorer(monkeypatch):
    monkeypatch.setenv("PICASSO_TPU_SPINNA", "device")
    monkeypatch.setattr(spinna, "N_BOOTSTRAPS", 3)
    mixer = _mixer()
    gt = _gt_coords(mixer, 300, 100, seed=12)
    sp = spinna.SPINNA(mixer, gt, N_sim=2)
    grid = spinna.generate_N_structures(
        mixer.structures, {"A": 500}, granularity=6
    )
    np.random.seed(13)
    (props, props_std), (score, score_std) = sp.fit(
        grid, fitting_mode="brute-force", bootstrap=True
    )
    assert np.all(np.isfinite(props_std))
    assert np.isfinite(score_std)


def test_empty_candidate_scores_one():
    mixer = _mixer()
    gt = _gt_coords(mixer, 50, 50, seed=14)
    sp = spinna.SPINNA(mixer, gt, N_sim=1)
    rows = np.array([[0, 0], [50, 50]], np.int32)
    scorer = sp._get_batched_scorer(rows)
    scores = scorer.score(rows, seed=15)
    assert scores[0] == 1.0
    assert scores[1] < 1.0
