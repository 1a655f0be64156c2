"""Persistent XLA compilation cache, on by default for the entry points.

Measured (round 4, real TPU through the axon remote-compile path): with
`JAX_COMPILATION_CACHE_DIR` set, compiled executables are reused across
processes — the ~100-170 s first-touch compiles of the chicago/video-shape
baseline programs drop to ~1-2 s in later processes, cutting a full
benchmark pass from ~35 min to ~25 min and validation reruns to seconds of
compile time. bench.py and both CLIs call :func:`enable_persistent_cache`;
set ``TRITD_NO_COMPILE_CACHE=1`` to opt out (e.g. for cold-compile
measurements — bench rows report ``compile_s`` either way).
"""

from __future__ import annotations

import os

# Anchored to the package's parent (the repo root for a source checkout,
# where .jax_cache is gitignored) rather than the CWD, so invoking the CLIs
# from elsewhere does not scatter cache directories (r4 advisor).
DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Idempotently point JAX's compilation cache at `cache_dir` (default:
    env `JAX_COMPILATION_CACHE_DIR`, else `.jax_cache` under the package's
    parent directory). Returns True if the cache is enabled. Never raises —
    an unwritable directory or an old JAX just means cold compiles."""
    if os.environ.get("TRITD_NO_COMPILE_CACHE") == "1":
        return False
    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist every compile costing >= 0.5 s: that covers everything
        # worth caching (the 1-170 s solver/baseline programs) while
        # keeping the thousands of sub-0.5 s helper jits — cheap to redo —
        # out of the cache directory.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return False
