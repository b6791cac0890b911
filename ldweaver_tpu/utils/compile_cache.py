"""Persistent XLA compilation cache.

Through the relay'd TPU every XLA compile costs ~15-40 s of round-trip
wall (CLAUDE.md), and the production SPMD sweep compiles one program per
(Rf, Rt, pure, cap) bucket — 17 programs at the 131k bench shape, ~125 s
of the round-3/4 pipeline leg's dispatch wall.  The programs are
identical across runs (static shapes, same HLO), so JAX's persistent
compilation cache turns every repeat compile into a disk read.  The
reference has no analogue (R/BLAS has no compile step); this is the TPU
cost model's own fix.

Enabled by default at the first sweep/pipeline entry; opt out with
LDW_NO_COMPILE_CACHE=1, relocate with LDW_COMPILE_CACHE_DIR.  Backends
whose PJRT plugin cannot serialize executables simply miss the cache
(JAX warns and compiles as before) — enabling is always safe.
"""

from __future__ import annotations

import os

_DONE: list = []


def enable_compilation_cache() -> bool:
    """Idempotently point JAX at a persistent on-disk compile cache.

    Returns True when the cache directory is configured (not a guarantee
    that the backend can serialize into it)."""
    if _DONE:
        return _DONE[0]
    if os.environ.get("LDW_NO_COMPILE_CACHE") == "1":
        _DONE.append(False)
        return False
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # the caller (e.g. bench.py's leg children) already configured
        # jax's own env knob — respect it rather than redirecting
        _DONE.append(True)
        return True
    path = os.environ.get("LDW_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "ldweaver_tpu", "xla"
    )
    ok = True
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            # a user already configured the cache programmatically via
            # jax.config.update — respect it like the env knob above
            _DONE.append(True)
            return True
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything — but only where it pays: on the relay'd TPU
        # a tiny slice/concat program still costs a full 15-40 s compile
        # round trip, so no entry is too small there.  CPU backends (the
        # test suite) compile those helpers in milliseconds; caching each
        # per-shape retrace (e.g. _build_lr_concat's per-row-pattern
        # traces) would only grow the dir without bound and add
        # serialization I/O, so they keep JAX's defaults (ADVICE r4).
        # Decide from the CONFIGURED platform string, never from
        # jax.default_backend(): initializing the backend here would make
        # a numpy-only pipeline run claim the relay'd TPU (and block on
        # the pool if another client holds it — CLAUDE.md).
        platforms = (
            jax.config.jax_platforms
            or os.environ.get("JAX_PLATFORMS", "")
        )
        if "cpu" not in str(platforms).split(","):
            for key, val in (
                ("jax_persistent_cache_min_compile_time_secs", 0.0),
                ("jax_persistent_cache_min_entry_size_bytes", -1),
            ):
                try:
                    jax.config.update(key, val)
                except Exception:
                    pass  # older jax: defaults are merely less aggressive
    except Exception:
        ok = False
    _DONE.append(ok)
    return ok
