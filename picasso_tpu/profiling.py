"""Device tracing/profiling — the observability layer the reference
lacks (SURVEY §5: reference has tqdm progress only; gpufit returned a
bare exec_time). Wraps jax.profiler so any pipeline stage can be
captured and inspected in TensorBoard/Perfetto.

Usage:

    from picasso_tpu import profiling

    with profiling.trace("/tmp/picasso_trace"):
        locs = localize.localize(movie, camera_info, params)

    @profiling.annotate("fit-chunk")
    def my_stage(...): ...

or from the CLI: ``picasso-tpu localize movie.raw --profile DIR``.
Environment variable ``PICASSO_TPU_PROFILE=DIR`` traces any run
without code changes (applied around CLI commands).
"""

from __future__ import annotations

import contextlib
import functools
import os
import time


@contextlib.contextmanager
def trace(log_dir: str | None = None, create_perfetto_link: bool = False):
    """Capture a device+host trace into *log_dir* (TensorBoard format).
    No-op when log_dir is None and PICASSO_TPU_PROFILE is unset."""
    log_dir = log_dir or os.environ.get("PICASSO_TPU_PROFILE")
    if not log_dir:
        yield None
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a named trace annotation so it
    shows up as a labeled span on the profile timeline."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                import jax

                ctx = jax.profiler.TraceAnnotation(name)
            except Exception:
                ctx = contextlib.nullcontext()
            with ctx:
                return fn(*args, **kwargs)

        return wrapper

    return deco


class StageTimer:
    """Lightweight wall-clock stage log (host side): collects
    (stage, seconds) pairs for pipeline summaries."""

    def __init__(self):
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def report(self) -> str:
        total = sum(dt for _, dt in self.stages)
        lines = [
            f"{name}: {dt:.3f}s ({dt / total * 100:.0f}%)"
            for name, dt in self.stages
        ]
        lines.append(f"total: {total:.3f}s")
        return "\n".join(lines)
