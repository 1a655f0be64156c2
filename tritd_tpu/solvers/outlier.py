"""Nonconvex-robust TriTD-ADMM variant with l_p-style reweighted shrinkage.

Reference: `fast_robust_triple_tensor/test.m:1-211` (the file declares
`triple_decomp_ADMM_outlier`; despite its name it is an alternative solver,
not a test — SURVEY §2.1). Single-penalty ADMM on the splitting
Y = TriTD(A,B,C), X = Y + O, with

  * weighted soft-thresholding of O (weights = 1 in the committed code,
    `test.m:42-44`),
  * a weighted soft-threshold applied to the freshly solved A rows with
    weights W_A = 1/(|A| + eps)^(theta - p)  (`test.m:77-93`) to push
    sparsity into the mode-1 core,
  * the factor solves use the RAW data X (not the split residual), with
    ridge 1e-12 for A and 1e-9 for B, C (`test.m:80,109,116`).

Note the video driver calls `triple_decomp_ADMM_outlier`
(`video_triple_comparison.m:54`), which as committed dispatches nowhere (no
file of that name, SURVEY §2.1 defects). The intended video solver is the
standard ADMM (`tritd_tpu.solvers.admm`) with video presets; this module
keeps the nonconvex variant itself at parity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import designs, normal_eq
from ..ops.fold import core_a_from_mat, core_b_from_mat, core_c_from_mat
from ..ops.shrinkage import lp_reweight, weighted_soft_threshold
from .admm import init_factors
from .base import TriTDResult


@dataclasses.dataclass(frozen=True)
class OutlierConfig:
    """Arguments of `triple_decomp_ADMM_outlier(X, r, rho, lambda, gamma_A,
    epsilon, p, theta, maxIter, tol)` (`test.m:1`)."""

    rank: int = 5
    rho: float = 1.0
    lambda_l1: float = 0.1
    gamma_a: float = 1e-3
    epsilon: float = 1e-3
    p: float = 0.5
    theta: float = 1.0
    max_iter: int = 100
    tol: float = 1e-5
    variant: str = "hadamard"
    solve_method: str = "cholesky"
    dtype: str = "float32"

    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _outlier_run(x, key, cfg: OutlierConfig):
    dtype = cfg.jnp_dtype()
    x = x.astype(dtype)
    norm_x = jnp.linalg.norm(x.ravel())
    a, b, c = init_factors(key, x.shape, cfg.rank, dtype)
    zeros = jnp.zeros_like(x)
    err_hist0 = jnp.full((cfg.max_iter,), jnp.nan, dtype)
    r = cfg.rank
    rho = cfg.rho

    def cond(carry):
        *_, k, done = carry
        return (k < cfg.max_iter) & ~done

    def body(carry):
        a, b, c, o, lam_dual, gam_dual, err_hist, k, done = carry

        # Y update from current triple product (`test.m:36-38`)
        t = designs.triple_product(a, b, c, variant=cfg.variant)
        y_new = (x - o + rho * (t + lam_dual / rho)) / (1.0 + rho)

        # O update: weighted soft threshold with W_O = 1 (`test.m:42-44`)
        o_new = weighted_soft_threshold(
            x - y_new + gam_dual / rho, cfg.lambda_l1 / rho, jnp.ones_like(x)
        )

        # dual ascent (`test.m:47-48`)
        lam_dual = lam_dual + rho * (t - y_new)
        gam_dual = gam_dual + rho * (x - y_new - o_new)

        # A solve on RAW data + nonconvex reweighted shrinkage (`test.m:73-93`)
        k1, rhs1 = normal_eq.gram_and_rhs(1, x, a, b, c, variant=cfg.variant)
        a_rows = normal_eq.ridge_solve(k1, rhs1, 1e-12, cfg.solve_method)
        w_a = lp_reweight(a_rows, cfg.epsilon, cfg.p, cfg.theta)
        a = core_a_from_mat(
            weighted_soft_threshold(a_rows, cfg.gamma_a, w_a), r
        )

        # B, C solves on raw data with 1e-9 ridge (`test.m:105-118`)
        k2, rhs2 = normal_eq.gram_and_rhs(2, x, a, b, c, variant=cfg.variant)
        b = core_b_from_mat(normal_eq.ridge_solve(k2, rhs2, 1e-9, cfg.solve_method), r)
        k3, rhs3 = normal_eq.gram_and_rhs(3, x, a, b, c, variant=cfg.variant)
        c = core_c_from_mat(normal_eq.ridge_solve(k3, rhs3, 1e-9, cfg.solve_method), r)

        err = jnp.linalg.norm((x - y_new - o_new).ravel()) / norm_x
        err_hist = err_hist.at[k].set(err)
        err_prev = err_hist[jnp.maximum(k - 1, 0)]
        done = (k >= 1) & (jnp.abs(err - err_prev) < cfg.tol * err_prev)
        return (a, b, c, o_new, lam_dual, gam_dual, err_hist, k + 1, done)

    carry0 = (
        a, b, c, zeros, zeros, zeros, err_hist0,
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    a, b, c, o, _, _, err_hist, k, _ = jax.lax.while_loop(cond, body, carry0)
    return TriTDResult(
        a=a, b=b, c=c, o=o, e=o, err_hist=err_hist, rre_hist=err_hist, n_iters=k
    )


def tritd_admm_outlier(
    x: jnp.ndarray,
    cfg: OutlierConfig = OutlierConfig(),
    key: jax.Array | None = None,
) -> TriTDResult:
    """Nonconvex reweighted robust TriTD (see module docstring)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _outlier_run(x, key, cfg)
