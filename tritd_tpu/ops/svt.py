"""Singular-value thresholding (SVT) operators for the baseline suite.

The four vendored baselines (TT-TRPCA, RC-FCTN, RTRC) are all SVT-ADMMs.
Two semantics exist in the reference:

* ``svt`` — standard: shrink singular values by tau, keep the > 0 ones
  (`other_methods/tensor-ring/shrink_matrix.m:27-32` else-branch).
* ``svt_ref_compat`` — the TTNN/FCTN variant with the truncation quirk
  ``r = sum(S > 1)`` — values in (0, 1] after shrinkage are ALSO dropped
  (`.../lib/TTNN/Functions/SVT.m:8`, `IPI_RTC_FCTN-main/lib/SVT.m:8`). Kept
  behind an explicit function because it changes results.

On TPU the SVD is the throughput pain point of the baselines (not of TriTD —
that is the point of the method); jnp.linalg.svd lowers to XLA's
divide-and-conquer which is acceptable for the benchmark sizes. Shapes are
static so everything jits.
"""

from __future__ import annotations

import jax.numpy as jnp

from .shrinkage import soft_threshold


def svt(m: jnp.ndarray, tau: jnp.ndarray | float) -> jnp.ndarray:
    """Standard singular-value soft-thresholding: U max(S - tau, 0) V^T."""
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    s_shrunk = jnp.maximum(s - tau, 0.0)
    return (u * s_shrunk[None, :]) @ vt


def svt_ref_compat(m: jnp.ndarray, tau: jnp.ndarray | float) -> jnp.ndarray:
    """SVT with the reference's ``r = sum(soft(S,tau) > 1)`` truncation quirk
    (`TTNN/Functions/SVT.m:5-12`): shrunken values <= 1 are zeroed entirely.

    Because singular values are sorted descending, zeroing the tail is
    equivalent to the reference's rank-r head slice — implemented with a
    static-shape mask (no dynamic shapes under jit)."""
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    s_shrunk = soft_threshold(s, tau)
    s_kept = jnp.where(s_shrunk > 1.0, s_shrunk, 0.0)
    return (u * s_kept[None, :]) @ vt
