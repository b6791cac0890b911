"""Optional JAX profiler tracing (SURVEY.md section 5: the reference has
only wall-clock prints; the TPU build adds structured timings
(pipeline timings.json) and opt-in profiler traces).

Set LDW_PROFILE=/path/to/tracedir to capture a TensorBoard-loadable trace
around the MI sweep or any wrapped region.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_trace(region: str):
    """Trace the region when LDW_PROFILE is set; no-op otherwise."""
    base = os.environ.get("LDW_PROFILE")
    if not base:
        yield
        return
    import jax

    path = os.path.join(base, region)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace (TraceAnnotation); no-op without an
    active profiler."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
