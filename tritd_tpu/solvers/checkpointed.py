"""Checkpoint/resume execution of the ADMM solver.

The reference's only resume story is hand-reloading saved .mat artifacts
(`video_triple_comparison.m:33`, SURVEY §5). Here the solver runs in jit'd
segments of N iterations with the full TriTDState pytree checkpointed
between segments, so a long video run restarts EXACTLY where it stopped
(bitwise: the state carries duals, penalties, histories, and the iteration
counter)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..utils.checkpoint import load_state, save_state
from .admm import admm_iteration, init_state
from .base import TriTDConfig, TriTDResult, TriTDState


@functools.partial(jax.jit, static_argnames=("cfg",))
def run_segment(
    d: jnp.ndarray, state: TriTDState, k_end: jnp.ndarray, cfg: TriTDConfig
) -> TriTDState:
    """Advance the solver to iteration min(k_end, max_iter) or convergence."""
    d = d.astype(cfg.jnp_dtype())
    norm_d = jnp.linalg.norm(d.ravel())
    d = d.astype(cfg.jnp_storage_dtype())  # narrow HBM copy when configured

    def cond(s: TriTDState):
        return (s.k < k_end) & (s.k < cfg.max_iter) & ~s.done

    def body(s: TriTDState):
        return admm_iteration(d, s, cfg, norm_d=norm_d)

    return jax.lax.while_loop(cond, body, state)


def tritd_admm_checkpointed(
    d: jnp.ndarray,
    cfg: TriTDConfig,
    ckpt_dir: str,
    every: int = 25,
    key: jax.Array | None = None,
    resume: bool = True,
) -> TriTDResult:
    """Run robust TriTD-ADMM with a checkpoint every `every` iterations.

    If `resume` and a checkpoint exists in ckpt_dir, execution continues
    from it; results are identical to an uninterrupted run."""
    if key is None:
        key = jax.random.PRNGKey(0)
    d = d.astype(cfg.jnp_dtype())

    latest = None
    if resume and os.path.isdir(ckpt_dir):
        steps = sorted(p for p in os.listdir(ckpt_dir) if p.startswith("step_"))
        if steps:
            latest = os.path.join(ckpt_dir, steps[-1])
    state = (
        load_state(
            latest, cfg.jnp_dtype(), d=d,
            einsum_dtype=cfg.jnp_einsum_dtype(),
            storage_dtype=(
                cfg.jnp_storage_dtype()
                if cfg.jnp_storage_dtype() != cfg.jnp_dtype()
                else None
            ),
        )
        if latest
        else init_state(d, cfg, key)
    )
    # A checkpoint written under a smaller max_iter carries shorter history
    # arrays; extend them (NaN-filled) so the new loop can index to max_iter.
    if state.err_hist.shape[0] < cfg.max_iter:
        pad = cfg.max_iter - state.err_hist.shape[0]
        nanpad = jnp.full((pad,), jnp.nan, state.err_hist.dtype)
        state = state._replace(
            err_hist=jnp.concatenate([state.err_hist, nanpad]),
            rre_hist=jnp.concatenate([state.rre_hist, nanpad]),
        )

    while int(state.k) < cfg.max_iter and not bool(state.done):
        k_end = jnp.asarray(int(state.k) + every, jnp.int32)
        state = run_segment(d, state, k_end, cfg)
        save_state(
            os.path.join(ckpt_dir, f"step_{int(state.k):06d}.npz"), state
        )
        # Failure-drill hook (SURVEY §5 failure detection; r4 weak #8): kill
        # this process abruptly right after a checkpoint lands, so the
        # resume path can be exercised under a REAL process death rather
        # than a clean early return. Exit code 17 marks the injected fault.
        die_at = os.environ.get("TRITD_DIE_AFTER_SAVE_STEP")
        if die_at is not None and int(state.k) >= int(die_at):
            os._exit(17)

    dtype = cfg.jnp_dtype()
    return TriTDResult(
        a=state.a, b=state.b, c=state.c,
        o=state.o.astype(dtype), e=state.e.astype(dtype),
        err_hist=state.err_hist, rre_hist=state.rre_hist, n_iters=state.k,
    )
