"""Build the native runtime library (g++ -O3 -shared) on first use.

No pip/apt dependencies: the .so is compiled from runtime/csrc/ into a cache
directory next to the package and loaded with ctypes. If no toolchain is
available the callers fall back to the JAX implementations in
:mod:`tritd_tpu.ops.prox`.
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SOURCES = ("proximal.cpp",)


def _cache_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        with open(os.path.join(_CSRC, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build_library(force: bool = False) -> str | None:
    """Compile (if needed) and return the .so path, or None if no g++."""
    so_path = os.path.join(_cache_dir(), f"libtritd_runtime_{_source_hash()}.so")
    if os.path.exists(so_path) and not force:
        return so_path
    sources = [os.path.join(_CSRC, s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *sources, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        try:  # retry without -march=native (portability)
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            return None
    return so_path
