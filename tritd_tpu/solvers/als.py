"""TriTD-ALS and TriTD-MALS — plain alternating ridge least squares on an
uncorrupted tensor (no sparse part).

Reference: `fast_robust_triple_tensor/triple_decomp_ALS.m:1-64`. The loop
records the relative error of the CURRENT factors first, checks the
relative-change stop, then does the three mode solves with a fixed 1e-9
ridge — replicated here exactly (including errHist ordering).

MALS (`fast_robust_triple_tensor/triple_decomp_MALS.m`) is broken as
committed (`pniv` typo at :22, undefined G/X2/H/X3 at :31-41, stop rule
commented out). Per SURVEY §2.1 the defects are NOT replicated: our MALS is
the repaired intent — identical mode updates, error recorded AFTER the sweep,
and no early stop (it always runs max_iter, matching the commented-out
break).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import designs, normal_eq
from ..ops.fold import core_a_from_mat, core_b_from_mat, core_c_from_mat
from .admm import init_factors
from .base import TriTDConfig, TriTDResult


def _als_sweep(x, a, b, c, cfg: TriTDConfig):
    """Three ridge mode solves with the ALS alpha=1e-9
    (`triple_decomp_ALS.m:25-38`)."""
    r = cfg.rank
    k1, rhs1 = normal_eq.gram_and_rhs(1, x, a, b, c, variant=cfg.variant)
    a = core_a_from_mat(normal_eq.ridge_solve(k1, rhs1, cfg.alpha_c, cfg.solve_method), r)
    k2, rhs2 = normal_eq.gram_and_rhs(2, x, a, b, c, variant=cfg.variant)
    b = core_b_from_mat(normal_eq.ridge_solve(k2, rhs2, cfg.alpha_c, cfg.solve_method), r)
    k3, rhs3 = normal_eq.gram_and_rhs(3, x, a, b, c, variant=cfg.variant)
    c = core_c_from_mat(normal_eq.ridge_solve(k3, rhs3, cfg.alpha_c, cfg.solve_method), r)
    return a, b, c


@functools.partial(jax.jit, static_argnames=("cfg", "mals"))
def _als_run(x, key, cfg: TriTDConfig, mals: bool):
    dtype = cfg.jnp_dtype()
    x = x.astype(dtype)
    norm_x = jnp.linalg.norm(x.ravel())
    a, b, c = init_factors(key, x.shape, cfg.rank, dtype)
    err_hist0 = jnp.full((cfg.max_iter,), jnp.nan, dtype)

    def cond(carry):
        a, b, c, err_hist, k, done = carry
        return (k < cfg.max_iter) & ~done

    def body(carry):
        a, b, c, err_hist, k, done = carry
        if mals:
            # MALS: sweep first, then record the post-sweep error; no stop.
            a, b, c = _als_sweep(x, a, b, c, cfg)
            xhat = designs.triple_product(a, b, c, variant=cfg.variant)
            err = jnp.linalg.norm((x - xhat).ravel()) / norm_x
            err_hist = err_hist.at[k].set(err)
            return (a, b, c, err_hist, k + 1, done)
        # ALS: record the error of the incoming factors, stop on relative
        # change, then sweep (`triple_decomp_ALS.m:16-38`).
        xhat = designs.triple_product(a, b, c, variant=cfg.variant)
        err = jnp.linalg.norm((x - xhat).ravel()) / norm_x
        err_hist = err_hist.at[k].set(err)
        err_prev = err_hist[jnp.maximum(k - 1, 0)]
        done = (k >= 1) & (jnp.abs(err - err_prev) < cfg.tol * err_prev)
        a, b, c = _als_sweep(x, a, b, c, cfg)
        return (a, b, c, err_hist, k + 1, done)

    a, b, c, err_hist, k, _ = jax.lax.while_loop(
        cond, body, (a, b, c, err_hist0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    zeros = jnp.zeros_like(x)
    return TriTDResult(
        a=a, b=b, c=c, o=zeros, e=zeros,
        err_hist=err_hist, rre_hist=err_hist, n_iters=k,
    )


def tritd_als(
    x: jnp.ndarray,
    cfg: TriTDConfig = TriTDConfig(tol=1e-5),
    key: jax.Array | None = None,
) -> TriTDResult:
    """Alternating-LS TriTD fit of an uncorrupted tensor."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _als_run(x, key, cfg, mals=False)


def tritd_mals(
    x: jnp.ndarray,
    cfg: TriTDConfig = TriTDConfig(),
    key: jax.Array | None = None,
) -> TriTDResult:
    """Repaired MALS variant (see module docstring)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _als_run(x, key, cfg, mals=True)
