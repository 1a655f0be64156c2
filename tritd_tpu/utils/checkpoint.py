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


def _np_savable(x) -> np.ndarray:
    """npz stores non-native dtypes (bfloat16) as raw void and np.load cannot
    reconstruct them; widen to float32 — exact, since bf16 ⊂ f32 — and let
    load_state's dtype/storage_dtype recast narrow it back bitwise."""
    arr = np.asarray(x)
    if arr.dtype == jnp.bfloat16:
        arr = arr.astype(np.float32)
    elif arr.dtype.kind == "V":
        # Legacy checkpoints stored bf16 as 2-byte raw void; astype on a void
        # array raises, so reinterpret the buffer as bf16 first (r2 advisor).
        arr = arr.view(jnp.bfloat16).astype(np.float32)
    return arr


def save_state(path: str, state: TriTDState) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {name: _np_savable(getattr(state, name)) for name in _FIELDS}
    np.savez_compressed(path, **arrays)
    return path


def load_state(
    path: str, dtype=None, d=None, einsum_dtype=None, storage_dtype=None
) -> TriTDState:
    """Load a TriTDState checkpoint.

    Args:
      path: .npz written by :func:`save_state`.
      dtype: when set, recast the solver arrays to this dtype (resuming
        under a different config.dtype).
      d: the observed tensor; required only to backfill the carried
        factor-solve target `t` when resuming a checkpoint written before
        `t` was added to the state (it is derivable: t = d - o + y_l/mu_l).
      einsum_dtype: the dtype admm_iteration will produce `t` in
        (config.jnp_einsum_dtype()); `t` is recast to it (else to the
        storage dtype, else to `dtype`) so the while_loop carry matches.
      storage_dtype: config.jnp_storage_dtype() when the run uses narrow
        HBM storage — the data-sized fields (o, e, y_l, y_o) recast to it.
    """
    with np.load(path) as f:
        kwargs = {name: jnp.asarray(f[name]) for name in _FIELDS if name in f}
    if dtype is not None:
        for name in ("a", "b", "c", "mu_l", "mu_o"):
            kwargs[name] = kwargs[name].astype(dtype)
        sd = storage_dtype if storage_dtype is not None else dtype
        for name in ("o", "e", "y_l", "y_o"):
            kwargs[name] = kwargs[name].astype(sd)
    if "t" not in kwargs:
        # Pre-`t` checkpoint: reconstruct instead of failing (exact — the
        # solver would have carried exactly this value).
        if d is None:
            raise ValueError(
                f"checkpoint {path!r} predates the carried field 't'; pass "
                "the observed tensor d to load_state to reconstruct it"
            )
        s = kwargs
        kwargs["t"] = jnp.asarray(d, s["o"].dtype) - s["o"] + s["y_l"] / s["mu_l"]
    t_dtype = (
        einsum_dtype
        if einsum_dtype is not None
        else (storage_dtype if storage_dtype is not None else dtype)
    )
    if t_dtype is not None:
        kwargs["t"] = kwargs["t"].astype(t_dtype)
    missing = [name for name in _FIELDS if name not in kwargs]
    if missing:
        raise KeyError(f"checkpoint {path!r} missing fields {missing}")
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
