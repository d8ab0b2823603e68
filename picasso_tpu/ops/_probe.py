"""Classification of Pallas compile-probe failures.

A probe exception means one of two very different things: the Mosaic
lowering genuinely cannot compile this kernel/shape (permanent — cache
False and route to the XLA path), or the backend had transient weather
(tunnel timeout, connection loss, server-side error) that says nothing
about the kernel. Caching False on the latter silently degrades every
downstream dispatch decision for the life of the process — one bench
run recorded a 0.36x-baseline artifact exactly this way when the probe
hit a bad tunnel minute — so transient failures are reported but NOT
cached; the next probe retries.
"""

from __future__ import annotations

import sys

# lowering/resource failures are a property of the kernel+shape on
# this platform and never heal on retry
_PERMANENT_MARKERS = (
    "mosaic",
    "notimplemented",
    "unimplemented",
    "unsupported",
    "vmem",
    "resource_exhausted",
    "out of memory",
    "lowering",
)


def probe_failure_permanent(exc: BaseException, platform: str) -> bool:
    """True when `exc` from a compile probe is safe to cache as a
    permanent "no Pallas here" verdict. On CPU every failure is
    permanent (there is no Mosaic backend to come back); elsewhere
    only recognizable lowering/resource errors are."""
    if platform == "cpu":
        return True
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(m in msg for m in _PERMANENT_MARKERS)


def current_platform() -> str:
    """The active backend platform, or "" when even that query fails
    (a dead backend is the textbook transient failure)."""
    try:
        import jax

        return jax.devices()[0].platform
    except Exception:
        return ""


def note_transient(kind: str, exc: BaseException) -> None:
    """One stderr line so a degraded run says why (the probe's caller
    deliberately returns plain False to keep call sites simple)."""
    print(
        f"picasso_tpu: transient {kind} pallas-probe failure, not "
        f"cached (retry may succeed): {type(exc).__name__}: "
        f"{str(exc)[:200]}",
        file=sys.stderr,
        flush=True,
    )
