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
rectangular (23×46368, 100×50000, 529×2016, …), so the TPU-native fast route
is the **Gram-eigh path** (``method="gram"``): eigh of the thin-side k×k
Gram (k = min(p,q)) plus two GEMMs, never materializing the long singular
factor —

    SVT(M) = U f(σ)/σ Uᵀ M        (p ≤ q, MMᵀ = U σ² Uᵀ)
    SVT(M) = M V f(σ)/σ Vᵀ        (p > q, MᵀM = V σ² Vᵀ)

where f is the singular-value shrinkage. The GEMMs ride the MXU; the eigh is
k×k.

Error analysis (honest version, r2 advisor fix): the raw Gram eigenvalues
carry absolute error ~eps·σ_max², so sqrt gives σ with *relative* error
~eps·(σ_max/σ)² — O(1) once σ/σ_max ~ sqrt(eps) (≈3e-4 in f32). Two
mitigations are built in:

* **Refined singular values.** σ is NOT taken from sqrt(eigenvalues); it is
  recovered from the row/column norms of the already-needed projection
  (UᵀM or MV), whose absolute error is ~eps·σ_max — relative error
  ~eps·σ_max/σ, the same first-power law as a backward-stable SVD. This is
  free: the projection is one of the two reconstruction GEMMs.
* **Subspace caveat.** The eigh *basis* still mixes components whose σ² are
  within ~eps·σ_max² of each other. The SVT reconstruction
  U diag(f(σ)/σ) Uᵀ M is a function of the computed orthonormal basis, so
  intra-cluster rotation cancels; residual error appears only where the
  shrinkage weight f(σ)/σ varies across a near-degenerate cluster, i.e.
  near the threshold τ for components with σ ≲ sqrt(eps)·σ_max.

Because of that caveat the **default is** ``method="svd"`` (exact-reference
numerics, backward-stable); callers on the TPU hot path opt into "gram"
explicitly — the baseline benchmark does so after an at-scale parity check
(`tests/test_ops.py` pins gram vs svd at the 100×50000 benchmark shape and
on ill-conditioned spectra). Shapes are static so everything jits.
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
        _, u = jnp.linalg.eigh(m @ m.T)
        proj = u.T @ m  # rows are σ_i·v_iᵀ for the computed basis
        # Refined σ: row norms of the projection — absolute error ~eps·σ_max
        # (first power), vs ~eps·σ_max²/σ from sqrt(eigenvalue). See module
        # docstring.
        s = jnp.sqrt(jnp.sum(proj * proj, axis=1))
        scale = shrink(s) / jnp.maximum(s, jnp.finfo(m.dtype).tiny)
        return (u * scale[None, :]) @ proj
    _, v = jnp.linalg.eigh(m.T @ m)
    proj = m @ v  # columns are σ_i·u_i for the computed basis
    s = jnp.sqrt(jnp.sum(proj * proj, axis=0))
    scale = shrink(s) / jnp.maximum(s, jnp.finfo(m.dtype).tiny)
    return proj @ (v.T * scale[:, None])


def svt(m: jnp.ndarray, tau: jnp.ndarray | float, method: str = "svd") -> jnp.ndarray:
    """Standard singular-value soft-thresholding: U max(S - tau, 0) V^T."""
    return _apply_spectral(m, lambda s: jnp.maximum(s - tau, 0.0), method)


def svt_ref_compat(
    m: jnp.ndarray, tau: jnp.ndarray | float, method: str = "svd"
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
