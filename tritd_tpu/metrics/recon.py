"""Reconstruction metrics: RMSE / NRMSE (RRE) over masked entries.

Reference: the `evaluate` local function shared by both drivers
(`traffic_triple_comparison.m:194-202`, `video_triple_comparison.m:290-298`):
rmse = ||X_hat[mask] - gt||_2 (an UN-normalized Frobenius distance, despite
the name), nrmse = rmse / ||gt||_2 — the "RRE" of the published tables.
"""

from __future__ import annotations

import jax.numpy as jnp


def evaluate(x_hat: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None):
    """(rmse, nrmse) over entries where mask is True (all entries if None).

    Matches `evaluate(X, gt, mask)` exactly: rmse is the l2 distance over the
    selected entries, nrmse normalizes by the l2 norm of the selected ground
    truth. Implemented with where-masking (static shapes, jit-safe)."""
    if mask is None:
        diff = (x_hat - gt).ravel()
        gtv = gt.ravel()
    else:
        diff = jnp.where(mask, x_hat - gt, 0.0).ravel()
        gtv = jnp.where(mask, gt, 0.0).ravel()
    rmse = jnp.linalg.norm(diff)
    nrmse = rmse / jnp.linalg.norm(gtv)
    return rmse, nrmse


def rre(x_hat: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Relative reconstruction error — the headline metric of BASELINE.md."""
    return evaluate(x_hat, gt, mask)[1]


def relative_change(new: jnp.ndarray, old: jnp.ndarray) -> jnp.ndarray:
    """||new - old|| / ||old|| — the baselines' convergence probe
    (`TT_TRPCA.m:73`, `RTRC.m:69-70`, `RC_FCTN.m:103`)."""
    return jnp.linalg.norm((new - old).ravel()) / jnp.linalg.norm(old.ravel())
