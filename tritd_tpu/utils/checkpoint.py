"""Checkpoint/resume of ADMM solver state.

The reference has no solver-state checkpointing — only per-method artifact
.mat caching (`video_triple_comparison.m:58-62`; SURVEY §5). Here the full
TriTDState pytree (A, B, C, O, E, Y_L, Y_O, mu, k, histories) is saved every
N iterations so long video runs restart exactly. Orbax is used when
available; a plain .npz fallback keeps zero hard deps.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers.base import TriTDState

_FIELDS = TriTDState._fields


def save_state(path: str, state: TriTDState) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    np.savez_compressed(path, **arrays)
    return path


def load_state(path: str, dtype=None) -> TriTDState:
    with np.load(path) as f:
        kwargs = {name: jnp.asarray(f[name]) for name in _FIELDS}
    if dtype is not None:
        for name in ("a", "b", "c", "o", "e", "y_l", "y_o", "mu_l", "mu_o"):
            kwargs[name] = kwargs[name].astype(dtype)
    return TriTDState(**kwargs)


class CheckpointManager:
    """Every-N-iterations checkpointer with optional Orbax backend."""

    def __init__(self, directory: str, every: int = 25, use_orbax: bool = False):
        self.directory = directory
        self.every = every
        self._ocp = None
        if use_orbax:
            import orbax.checkpoint as ocp

            self._ocp = ocp.PyTreeCheckpointer()

    def maybe_save(self, state: TriTDState) -> str | None:
        k = int(state.k)
        if k == 0 or k % self.every:
            return None
        if self._ocp is not None:
            path = os.path.join(os.path.abspath(self.directory), f"step_{k:06d}")
            self._ocp.save(path, jax.tree_util.tree_map(np.asarray, state._asdict()))
            return path
        path = os.path.join(self.directory, f"step_{k:06d}.npz")
        return save_state(path, state)

    def latest(self) -> str | None:
        if not os.path.isdir(self.directory):
            return None
        steps = sorted(
            p for p in os.listdir(self.directory) if p.startswith("step_")
        )
        return os.path.join(self.directory, steps[-1]) if steps else None
