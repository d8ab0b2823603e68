"""The examples/ scripts (counterparts of the reference's
samples/sample_notebook_*.ipynb) must run end-to-end."""

from __future__ import annotations

import importlib.util
import os

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
)
REF_DATA = "/root/reference/tests/data"


def _load(name):
    path = os.path.join(EXAMPLES, name)
    spec = importlib.util.spec_from_file_location(
        name.replace(".py", "").replace("-", "_"), path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref_data = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="bundled reference data absent"
)


@needs_ref_data
def test_example_1_localize(tmp_path):
    mod = _load("01_localize.py")
    locs, out = mod.main(out_dir=str(tmp_path))
    assert len(locs) == 30
    assert os.path.getsize(out) > 0


@needs_ref_data
def test_example_2_basic_analysis(tmp_path):
    mod = _load("02_basic_analysis.py")
    linked, out = mod.main(out_dir=str(tmp_path))
    assert len(linked) > 0
    assert os.path.getsize(out) > 0


def test_example_3_clustering(tmp_path):
    mod = _load("03_clustering.py")
    centers, resi_centers = mod.main(out_dir=str(tmp_path))
    assert len(centers) == 12
    assert len(resi_centers) > 0


@pytest.mark.slow
def test_example_4_spinna(tmp_path):
    mod = _load("04_spinna.py")
    props, score = mod.main()
    assert props[1] == pytest.approx(70, abs=20)
    assert score < 0.3
