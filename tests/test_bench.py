"""Supervisor/state plumbing of bench.py (VERDICT r3 missing #1/#2).

The bench must survive backend outages: the supervising parent
restarts a failed child with backoff, and the state file makes the
restart resume — completed stages are never re-run and the headline
line always lands (with a diagnostic when nothing could be measured).
These tests exercise exactly that machinery on CPU with a zero budget
(every measurement stage skips instantly), so they pin the harness,
not the numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env: dict, timeout: int = 300):
    env = os.environ.copy()
    env.pop("PICASSO_BENCH_STATE", None)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",
            "PICASSO_BENCH_BUDGET_S": "0",
            "PICASSO_BENCH_RETRY_BACKOFF_S": "0.1",
        }
    )
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=timeout,
    )


def test_supervisor_restarts_crashed_child_and_lands_headline():
    """A child that dies is restarted; the resumed child completes and
    the FINAL stdout line is the headline metric."""
    out = _run_bench({"PICASSO_BENCH_TEST_CRASH": "1"})
    lines = [
        json.loads(ln) for ln in out.stdout.splitlines() if ln.strip()
    ]
    assert lines, out.stderr[-2000:]
    # the crash hook fired exactly once and the supervisor retried
    assert "attempt 1 failed (rc=7" in out.stderr, out.stderr[-2000:]
    # final line is the headline (zero budget -> diagnostic value 0)
    assert lines[-1]["metric"] == "mle_fit_throughput"
    assert "error" in lines[-1]
    # exactly one headline line despite the restart
    heads = [
        ln for ln in lines if ln["metric"] == "mle_fit_throughput"
    ]
    assert len(heads) == 1


def test_zero_budget_run_emits_single_diagnostic_headline():
    """Without crashes, a zero-budget run skips every stage and still
    emits exactly one parseable headline line."""
    out = _run_bench({})
    lines = [
        json.loads(ln) for ln in out.stdout.splitlines() if ln.strip()
    ]
    assert len(lines) == 1, (out.stdout, out.stderr[-2000:])
    assert lines[0]["metric"] == "mle_fit_throughput"
    assert lines[0]["value"] == 0
    assert "SKIP" in out.stderr  # stages skipped by budget, not run
