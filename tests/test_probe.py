"""Pallas compile-probe failure classification (ops/_probe.py).

A transient backend failure (tunnel weather) must NOT be cached as a
permanent "no Pallas" verdict — one bench run recorded a 0.36x
baseline headline when a bad tunnel minute poisoned the probe cache
for the whole process. Lowering/VMEM failures and anything on CPU
stay permanently cached (no Mosaic backend to come back)."""

import numpy as np
import pytest

from picasso_tpu.ops import _probe, lq_pallas, mle_pallas


def test_classifier_permanent_markers():
    perm = _probe.probe_failure_permanent
    assert perm(RuntimeError("Mosaic lowering failed: no rule"), "tpu")
    assert perm(NotImplementedError("no pallas here"), "tpu")
    assert perm(MemoryError("RESOURCE_EXHAUSTED: vmem"), "tpu")
    assert perm(ValueError("anything at all"), "cpu")


def test_classifier_transient():
    perm = _probe.probe_failure_permanent
    assert not perm(TimeoutError("deadline exceeded"), "tpu")
    assert not perm(ConnectionError("socket closed"), "tpu")
    assert not perm(RuntimeError("INTERNAL: server error"), "tpu")
    # a dead backend (platform query itself failed) is transient
    assert not perm(RuntimeError("backend gone"), "")


@pytest.mark.parametrize("mod,probe_args", [
    (mle_pallas, (3,)),
    (lq_pallas, (3,)),
])
def test_transient_failure_not_cached(monkeypatch, mod, probe_args):
    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise TimeoutError("tunnel deadline exceeded")

    monkeypatch.setattr(mod, "fit_pallas", boom)
    monkeypatch.setattr(_probe, "current_platform", lambda: "tpu")
    cache = mod._PALLAS_OK
    saved = dict(cache)
    cache.clear()
    try:
        assert mod.pallas_supported(*probe_args) is False
        assert not cache, "transient failure must not be cached"
        assert mod.pallas_supported(*probe_args) is False
        assert len(calls) == 2, "second call must re-probe"
    finally:
        cache.clear()
        cache.update(saved)


def test_permanent_failure_cached_once(monkeypatch):
    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("Mosaic lowering failed")

    monkeypatch.setattr(mle_pallas, "fit_pallas", boom)
    monkeypatch.setattr(_probe, "current_platform", lambda: "tpu")
    cache = mle_pallas._PALLAS_OK
    saved = dict(cache)
    cache.clear()
    try:
        assert mle_pallas.pallas_supported(3) is False
        assert mle_pallas.pallas_supported(3) is False
        assert len(calls) == 1, "permanent verdict must cache"
    finally:
        cache.clear()
        cache.update(saved)


def test_probe_still_true_on_healthy_path():
    """The real probe on this host (CPU interpret path unavailable →
    permanent False, cached) keeps its old fast behavior."""
    got = mle_pallas.pallas_supported(7)
    assert got in (True, False)
    assert (7, "sigmaxy") in mle_pallas._PALLAS_OK
