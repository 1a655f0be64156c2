"""Kruskal/CP tensor utilities — the Tensor Toolbox surface the reference
drivers actually exercise (SURVEY §2.3: `ktensor`, `tenmat`, `khatrirao`,
`tenrand`, `create_problem` via SOFIA).

Functional JAX equivalents; a CP tensor is just `(weights, [u1, ..., uN])`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def khatrirao(*mats: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Column-wise Khatri-Rao product of (n_i, R) matrices -> (prod n_i, R).

    Matches Tensor Toolbox `khatrirao` (row ordering of the FIRST matrix
    varying slowest; `reverse=True` flips the operand order, as the toolbox's
    'r' flag does)."""
    ms = list(mats[::-1]) if reverse else list(mats)
    r = ms[0].shape[1]
    out = ms[0]
    for m in ms[1:]:
        out = (out[:, None, :] * m[None, :, :]).reshape(-1, r)
    return out


def ktensor_full(factors, weights=None) -> jnp.ndarray:
    """Dense tensor of a Kruskal operator — `double(full(ktensor(U)))`."""
    r = factors[0].shape[1]
    if weights is None:
        weights = jnp.ones((r,), factors[0].dtype)
    eins_in = []
    letters = "ijklmnop"
    for ax, u in enumerate(factors):
        eins_in.append(f"{letters[ax]}r")
    spec = ",".join(eins_in) + ",r->" + letters[: len(factors)]
    return jnp.einsum(spec, *factors, weights, optimize="optimal")


def tenmat(x: jnp.ndarray, row_modes, col_modes=None) -> jnp.ndarray:
    """Matricize a tensor with the given row (and optional column) modes —
    the `tenmat` class collapsed to a function. Modes are 0-indexed."""
    n = x.ndim
    row_modes = tuple(row_modes)
    if col_modes is None:
        col_modes = tuple(m for m in range(n) if m not in row_modes)
    else:
        col_modes = tuple(col_modes)
    perm = row_modes + col_modes
    xp = jnp.transpose(x, perm)
    rows = 1
    for m in row_modes:
        rows *= x.shape[m]
    return xp.reshape(rows, -1)


def tenrand(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform [0,1) random tensor — `tenrand`."""
    return jax.random.uniform(key, tuple(shape), dtype)


def cp_normalize(factors, weights=None):
    """Normalize factor columns to unit l2 norm, absorbing norms into the
    weight vector — `ktensor/normalize` semantics."""
    r = factors[0].shape[1]
    if weights is None:
        weights = jnp.ones((r,), factors[0].dtype)
    new_factors = []
    for u in factors:
        norms = jnp.linalg.norm(u, axis=0)
        safe = jnp.where(norms > 0, norms, 1.0)
        new_factors.append(u / safe)
        weights = weights * norms
    return new_factors, weights


def create_problem(
    key: jax.Array,
    shape,
    rank: int,
    noise: float = 0.1,
    dtype=jnp.float32,
):
    """Synthetic CP problem a la Tensor Toolbox `create_problem` (used by
    SOFIA's `make_synthetic.m:11-27`): random factors, dense full tensor,
    additive Gaussian noise of relative magnitude `noise`."""
    keys = jax.random.split(key, len(shape) + 1)
    factors = [
        jax.random.normal(k, (s, rank), dtype) for k, s in zip(keys[:-1], shape)
    ]
    clean = ktensor_full(factors)
    nz = jax.random.normal(keys[-1], clean.shape, dtype)
    data = clean + noise * jnp.linalg.norm(clean.ravel()) / (
        jnp.linalg.norm(nz.ravel()) + 1e-30
    ) * nz
    return {"factors": factors, "clean": clean, "data": data}
