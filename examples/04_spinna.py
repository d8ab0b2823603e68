"""Example 4 — SPINNA (counterpart of
sample_notebook_4_spinna.ipynb): define structures, simulate a
labeled mixture, compare NND histograms and fit stoichiometries.

Run: python examples/04_spinna.py
"""

from __future__ import annotations

import sys


def main(out_dir: str | None = None):
    import numpy as np

    from picasso_tpu import spinna

    np.random.seed(0)

    # -- define structures: monomer and dimer of one target protein --
    monomer = spinna.Structure("monomer")
    monomer.define_coordinates("EGFR", [0.0], [0.0])
    dimer = spinna.Structure("dimer")
    dimer.define_coordinates("EGFR", [-10.0, 10.0], [0.0, 0.0])

    # -- mixer: labeling uncertainty + efficiency over a 20x20 um ROI --
    mixer = spinna.StructureMixer(
        [monomer, dimer],
        label_unc={"EGFR": 3.0},
        le={"EGFR": 1.0},
        width=20000.0,
        height=20000.0,
    )

    # -- ground truth: 300 monomers + 350 dimers (70% of targets in
    #    dimers) stands in for the experimental localizations --
    gt = mixer.run_simulation([300, 350])
    n_targets = sum(len(v) for v in gt.values()) if isinstance(
        gt, dict
    ) else len(gt)
    print(f"simulated 'experiment' with {n_targets} target positions")

    # -- search space over stoichiometries for 1000 targets --
    candidates = spinna.generate_N_structures(
        mixer.structures, {"EGFR": 1000}, granularity=21
    )

    # -- fit: which mixture reproduces the observed NND histogram? --
    spin = spinna.SPINNA(mixer, gt, N_sim=2)
    props, score = spin.fit_stoichiometry(
        candidates, fitting_mode="coarse-to-fine"
    )
    print(f"fitted target proportions: monomer {props[0]:.0f}%, "
          f"dimer {props[1]:.0f}% (truth 30/70), KS score {score:.3f}")
    return props, score


if __name__ == "__main__":
    main(*sys.argv[1:])
