"""Symmetric tensor operations and eigen solvers — the Tensor Toolbox v3.1
``@symtensor`` / ``@symktensor`` class surface and the ``eig_sshopm`` /
``eig_geap`` / ``cp_sym`` / ``tucker_sym`` algorithms (SURVEY §2.3,
``Contents.m:17-50``; class dirs ``@symtensor`` 1,318 LoC, ``@symktensor``
1,375 LoC).

A symmetric tensor here is just a dense ``jnp.ndarray`` with equal mode
sizes (the toolbox's distinct-element compression is a RAM optimization that
works against XLA: contractions want the dense layout, and ``symmetrize``
is a handful of transposes XLA fuses). A symmetric Kruskal tensor is
``(weights, u)`` with one shared factor matrix.
"""

from __future__ import annotations

import functools
import itertools
import string

import jax
import jax.numpy as jnp

_LETTERS = string.ascii_lowercase


def symmetrize(x: jnp.ndarray) -> jnp.ndarray:
    """Symmetric part: average over all axis permutations —
    ``symmetrize(tensor)`` / the ``symtensor`` constructor's projection."""
    n = x.ndim
    out = jnp.zeros_like(x)
    perms = list(itertools.permutations(range(n)))
    for p in perms:
        out = out + jnp.transpose(x, p)
    return out / len(perms)


def is_symmetric(x: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
    """``issymmetric(tensor)`` as a traced boolean."""
    n = x.ndim
    ok = jnp.asarray(True)
    for p in itertools.permutations(range(n)):
        ok = ok & (jnp.max(jnp.abs(x - jnp.transpose(x, p))) <= tol)
    return ok


def symktensor_full(weights: jnp.ndarray, u: jnp.ndarray, order: int) -> jnp.ndarray:
    """Dense tensor of a symmetric Kruskal operator Σ_r w_r u_r^{⊗m} —
    ``full(symktensor)``."""
    specs = [f"{_LETTERS[ax]}r" for ax in range(order)]
    return jnp.einsum(
        ",".join(specs) + ",r->" + _LETTERS[:order],
        *([u] * order),
        weights,
        optimize="optimal",
    )


def ttsv(a: jnp.ndarray, x: jnp.ndarray, keep: int = 1) -> jnp.ndarray:
    """Symmetric tensor times the same vector in all but `keep` modes —
    ``ttsv(A, x, -keep)``: keep=0 gives the scalar Axᵐ, keep=1 the gradient
    direction Axᵐ⁻¹ (vector), keep=2 the Hessian-like matrix Axᵐ⁻²."""
    m = a.ndim
    out = a
    for _ in range(m - keep):
        out = jnp.tensordot(out, x, axes=([out.ndim - 1], [0]))
    return out


@functools.partial(jax.jit, static_argnames=("concave", "max_iters", "tol"))
def _sshopm_run(a, x0, shift, concave: bool, max_iters: int, tol: float):
    sign = -1.0 if concave else 1.0

    def body(carry):
        x, lam, _delta, it = carry
        newx = ttsv(a, x, 1) + shift * x
        newx = sign * newx
        newx = newx / jnp.linalg.norm(newx)
        newlam = newx @ ttsv(a, newx, 1)
        return newx, newlam, jnp.abs(newlam - lam), it + 1

    def cond(carry):
        return (carry[3] < max_iters) & (carry[2] >= tol)

    x0 = x0 / jnp.linalg.norm(x0)
    lam0 = x0 @ ttsv(a, x0, 1)
    init = (x0, lam0, jnp.asarray(jnp.inf, a.dtype), jnp.asarray(0, jnp.int32))
    x, lam, delta, iters = jax.lax.while_loop(cond, body, init)
    return lam, x, delta, iters


def eig_sshopm(
    a: jnp.ndarray,
    shift: float = 0.0,
    concave: bool = False,
    max_iters: int = 1000,
    tol: float = 1e-12,
    key=None,
    x0=None,
):
    """Shifted Symmetric Higher-Order Power Method for a real eigenpair
    ``Axᵐ⁻¹ = λx`` of a symmetric tensor — ``eig_sshopm.m`` semantics
    (update ``eig_sshopm.m:118-131``: x ← normalize(±(Axᵐ⁻¹ + αx)),
    λ = xᵀAxᵐ⁻¹, |Δλ| stop). `concave=True` searches for the minimal
    eigenvalue (the toolbox's 'Concave' flag flips the sign). A sufficiently
    positive (convex) / negative (concave) `shift` guarantees monotone
    convergence (Kolda & Mayo 2011); shift=0 is plain S-HOPM."""
    if x0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (a.shape[0],), a.dtype)
    lam, x, delta, iters = _sshopm_run(
        a, x0, jnp.asarray(shift, a.dtype), concave, max_iters, tol
    )
    return {"eigval": lam, "eigvec": x, "converged": delta < tol, "n_iters": iters}


@functools.partial(jax.jit, static_argnames=("max_iters", "tol"))
def _sshopmc_run(a, x0, shift, max_iters: int, tol: float):
    rdtype = jnp.real(x0).dtype

    def body(carry):
        x, lam, _delta, it = carry
        newx = (ttsv(a, x, 1) + shift * x) / (lam + shift)
        nx = jnp.linalg.norm(newx)
        # flag -1 (zero iterate) surfaces as a NaN eigenpair, the jit-safe
        # analogue of the reference's hard break
        newx = newx / jnp.where(nx < jnp.finfo(rdtype).eps, jnp.nan, nx)
        newlam = jnp.vdot(newx, ttsv(a, newx, 1))
        delta = jnp.abs(jnp.abs(newlam) - jnp.abs(lam))
        return newx, newlam, delta, it + 1

    def cond(carry):
        return (carry[3] < max_iters) & (carry[2] >= tol)

    x0 = x0 / jnp.linalg.norm(x0)
    lam0 = jnp.vdot(x0, ttsv(a, x0, 1))
    init = (x0, lam0, jnp.asarray(jnp.inf, rdtype), jnp.asarray(0, jnp.int32))
    x, lam, delta, iters = jax.lax.while_loop(cond, body, init)
    return lam, x, delta, iters


def eig_sshopmc(
    a: jnp.ndarray,
    shift: float = 0.0,
    max_iters: int = 1000,
    tol: float = 1e-10,
    key=None,
    x0=None,
):
    """Shifted power method for a REAL/COMPLEX eigenpair ``Axᵐ⁻¹ = λx`` of a
    real symmetric tensor — ``eig_sshopmc.m`` semantics (complex iterate,
    update newx = (Axᵐ⁻¹ + αx)/(λ + α) at `:93-94`, λ = xᴴAxᵐ⁻¹ at `:101`,
    stop on ||λ|−|λ_old|| < tol at `:103`; complex random start `:68`).
    Returns dict with complex eigval/eigvec."""
    if x0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        x0 = (
            2.0 * jax.random.uniform(kr, (a.shape[0],), a.dtype) - 1.0
        ) + 1j * jax.random.normal(ki, (a.shape[0],), a.dtype)
    x0 = jnp.asarray(x0, jnp.complex64 if a.dtype == jnp.float32 else jnp.complex128)
    a = a.astype(x0.dtype)
    lam, x, delta, iters = _sshopmc_run(
        a, x0, jnp.asarray(shift, x0.dtype), max_iters, tol
    )
    return {"eigval": lam, "eigvec": x, "converged": delta < tol, "n_iters": iters}


@functools.partial(jax.jit, static_argnames=("concave", "max_iters", "tol"))
def _geap_run(a, b, x0, shift, concave: bool, max_iters: int, tol: float):
    beta = -1.0 if concave else 1.0

    def body(carry):
        x, lam, _delta, it = carry
        axm1 = ttsv(a, x, 1)
        bxm1 = ttsv(b, x, 1)
        bxm = ttsv(b, x, 0)
        # `eig_geap.m:154`: newx = β(Axᵐ⁻¹ − λBxᵐ⁻¹ + (α+λ)(Bxᵐ)x),
        # then Euclidean renormalization (newx/norm(newx), `eig_geap.m:155`)
        # — λ = Axᵐ/Bxᵐ is scale-invariant, so the sphere choice only fixes
        # the iterate's scale, and the reference uses the Euclidean one.
        newx = beta * (axm1 - lam * bxm1 + (shift + lam) * bxm * x)
        newx = newx / jnp.linalg.norm(newx)
        newlam = ttsv(a, newx, 0) / ttsv(b, newx, 0)
        return newx, newlam, jnp.abs(newlam - lam), it + 1

    def cond(carry):
        return (carry[3] < max_iters) & (carry[2] >= tol)

    x0 = x0 / jnp.linalg.norm(x0)
    lam0 = ttsv(a, x0, 0) / ttsv(b, x0, 0)
    init = (x0, lam0, jnp.asarray(jnp.inf, a.dtype), jnp.asarray(0, jnp.int32))
    x, lam, delta, iters = jax.lax.while_loop(cond, body, init)
    return lam, x, delta, iters


def eig_geap(
    a: jnp.ndarray,
    b: jnp.ndarray,
    shift: float = 1.0,
    concave: bool = False,
    max_iters: int = 1000,
    tol: float = 1e-12,
    key=None,
    x0=None,
):
    """Generalized Eigenproblem Adaptive Power method for
    ``Axᵐ⁻¹ = λ Bxᵐ⁻¹`` (B symmetric positive definite on the sphere) —
    ``eig_geap.m`` semantics (update at `:154`, Euclidean renormalization
    of the iterate at `:155`, |Δλ| stop). The reference adapts `shift` from the Hessian spectrum;
    here it is a fixed margin (pass a larger value if λ oscillates)."""
    if x0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (a.shape[0],), a.dtype)
    lam, x, delta, iters = _geap_run(
        a, b, x0, jnp.asarray(shift, a.dtype), concave, max_iters, tol
    )
    return {"eigval": lam, "eigvec": x, "converged": delta < tol, "n_iters": iters}


def cp_sym(
    x: jnp.ndarray,
    rank: int,
    max_iters: int = 500,
    learning_rate: float = 0.02,
    tol: float = 1e-10,
    key=None,
):
    """Symmetric CP fit ``X ≈ Σ_r w_r u_r^{⊗m}`` — ``cp_sym.m`` semantics
    (the toolbox optimizes the symmetric objective with Poblano L-BFGS or
    fminunc; here Adam on (w, U) with autodiff — same objective
    ``‖X − full(symktensor)‖²/‖X‖²``)."""
    import optax

    if key is None:
        key = jax.random.PRNGKey(0)
    m = x.ndim
    n = x.shape[0]
    ku, kw = jax.random.split(key)
    u0 = jax.random.normal(ku, (n, rank), x.dtype) * (1.0 / jnp.sqrt(n))
    w0 = jax.random.normal(kw, (rank,), x.dtype)
    norm_sq = jnp.maximum(jnp.sum(x**2), 1e-30)

    def loss(params):
        w, u = params
        return jnp.sum((x - symktensor_full(w, u, m)) ** 2) / norm_sq

    opt = optax.adam(learning_rate)

    @jax.jit
    def run(params0):
        def body(carry):
            params, state, prev, _d, it = carry
            value, grad = jax.value_and_grad(loss)(params)
            updates, state = opt.update(grad, state, params)
            params = optax.apply_updates(params, updates)
            return params, state, value, jnp.abs(value - prev), it + 1

        def cond(carry):
            return (carry[4] < max_iters) & (carry[3] >= tol)

        init = (
            params0,
            opt.init(params0),
            jnp.asarray(jnp.inf, x.dtype),
            jnp.asarray(jnp.inf, x.dtype),
            jnp.asarray(0, jnp.int32),
        )
        params, _s, value, _d, iters = jax.lax.while_loop(cond, body, init)
        return params, value, iters

    (w, u), final_loss, iters = run((w0, u0))
    # normalize columns, absorbing magnitude^m into the weights
    norms = jnp.linalg.norm(u, axis=0)
    safe = jnp.where(norms > 0, norms, 1.0)
    u = u / safe
    w = w * safe**m
    fit = 1.0 - jnp.sqrt(jnp.maximum(final_loss, 0.0))
    return {"weights": w, "u": u, "fit": fit, "n_iters": iters}


def tucker_sym(
    x: jnp.ndarray,
    rank: int,
    max_iters: int = 100,
    tol: float = 1e-10,
):
    """Symmetric Tucker approximation ``X ≈ core ×₁ U ... ×ₘ U`` with one
    shared orthonormal factor — ``tucker_sym.m`` semantics (higher-order
    power iteration: U ← leading left-singular basis of the mode-1 unfolding
    of X projected by Uᵀ on all other modes; fit from the core norm)."""
    m = x.ndim
    n = x.shape[0]
    norm_x = jnp.linalg.norm(x.ravel())

    from .decomp import _leading_basis, tucker_ttm

    u = _leading_basis(x, 0, rank)

    @functools.partial(jax.jit, static_argnames=())
    def step(u):
        proj = [jnp.eye(n, dtype=x.dtype)] + [u] * (m - 1)
        y = tucker_ttm(x, proj, transpose=True)
        ym = y.reshape(n, -1)
        gram = ym @ ym.T
        _w, v = jnp.linalg.eigh(gram)
        return v[:, ::-1][:, :rank]

    fit_prev = -jnp.inf
    iters = 0
    for it in range(max_iters):
        u = step(u)
        core = tucker_ttm(x, [u] * m, transpose=True)
        resid_sq = jnp.maximum(norm_x**2 - jnp.sum(core**2), 0.0)
        fit = 1.0 - jnp.sqrt(resid_sq) / norm_x
        iters = it + 1
        if abs(float(fit) - float(fit_prev)) < tol:
            break
        fit_prev = fit
    core = tucker_ttm(x, [u] * m, transpose=True)
    resid_sq = jnp.maximum(norm_x**2 - jnp.sum(core**2), 0.0)
    fit = 1.0 - jnp.sqrt(resid_sq) / norm_x
    return {"core": core, "u": u, "fit": fit, "n_iters": iters}
