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
that is the point of the method). The benchmark unfoldings are extremely
rectangular (23×46368, 100×50000, 529×2016, …), so the TPU-native route is
the **Gram-eigh path** (default): eigh of the thin-side k×k Gram (k =
min(p,q)) plus two GEMMs, never materializing the long singular factor —

    SVT(M) = U f(σ)/σ Uᵀ M        (p ≤ q, MMᵀ = U σ² Uᵀ)
    SVT(M) = M V f(σ)/σ Vᵀ        (p > q, MᵀM = V σ² Vᵀ)

where f is the singular-value shrinkage. The GEMMs ride the MXU; the eigh is
k×k. Squaring halves the working precision of tiny singular values, but SVT
zeroes everything below tau anyway — values that survive shrinkage carry
sqrt(eps)-level relative error (~3e-4 f32), inside the baselines' own
convergence tolerance (equality vs the SVD path is pinned by tests).
``method="svd"`` keeps XLA's native SVD for exact-reference numerics.
Shapes are static so everything jits.
"""

from __future__ import annotations

import jax.numpy as jnp

from .shrinkage import soft_threshold


def _apply_spectral(m: jnp.ndarray, shrink, method: str) -> jnp.ndarray:
    """Reconstruct with shrunk singular values: shrink(σ) maps the singular
    values to their replacements (zeros drop the component)."""
    if method == "svd":
        u, s, vt = jnp.linalg.svd(m, full_matrices=False)
        return (u * shrink(s)[None, :]) @ vt
    if method != "gram":
        raise ValueError(f"unknown SVT method {method!r}; use 'gram' or 'svd'")
    p, q = m.shape
    if p <= q:
        w, u = jnp.linalg.eigh(m @ m.T)
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        scale = shrink(s) / jnp.maximum(s, jnp.finfo(m.dtype).tiny)
        return (u * scale[None, :]) @ (u.T @ m)
    w, v = jnp.linalg.eigh(m.T @ m)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    scale = shrink(s) / jnp.maximum(s, jnp.finfo(m.dtype).tiny)
    return (m @ v) @ (v.T * scale[:, None])


def svt(m: jnp.ndarray, tau: jnp.ndarray | float, method: str = "gram") -> jnp.ndarray:
    """Standard singular-value soft-thresholding: U max(S - tau, 0) V^T."""
    return _apply_spectral(m, lambda s: jnp.maximum(s - tau, 0.0), method)


def svt_ref_compat(
    m: jnp.ndarray, tau: jnp.ndarray | float, method: str = "gram"
) -> jnp.ndarray:
    """SVT with the reference's ``r = sum(soft(S,tau) > 1)`` truncation quirk
    (`TTNN/Functions/SVT.m:5-12`): shrunken values <= 1 are zeroed entirely.

    The reference slices the rank-r head of the descending spectrum; zeroing
    every shrunken value <= 1 is order-independent and equivalent —
    implemented with a static-shape mask (no dynamic shapes under jit)."""

    def shrink(s):
        s_shrunk = soft_threshold(s, tau)
        return jnp.where(s_shrunk > 1.0, s_shrunk, 0.0)

    return _apply_spectral(m, shrink, method)
