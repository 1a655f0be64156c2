"""Tensor constructors, matrix generators and Kruskal/Tucker class helpers —
the remaining Tensor Toolbox v3.1 function surface (SURVEY §2.3,
``Contents.m:17-50``): ``tendiag/teneye/tenones/tenzeros/tenrandblk``,
``matrandorth/matrandnorm/matrandcong``, ``create_guess``,
``create_problem_binary``, ``export_data/import_data``, and the ``ktensor``
(``arrange``, ``fixsigns``, ``innerprod``, ``norm``, ``score``), ``ttensor``
and ``sumtensor`` class operations the library's algorithms rest on.

Functional JAX equivalents; Kruskal tensors are ``(weights, [U_1..U_N])``,
Tucker tensors are ``(core, [U_1..U_N])``, sum tensors are plain lists of
dense tensors (callers ``full`` each part first — the class added lazy
summation only, which XLA fusion subsumes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .decomp import tucker_ttm
from .kruskal import cp_normalize, ktensor_full


def ttm(x: jnp.ndarray, u: jnp.ndarray, mode: int, transpose: bool = False) -> jnp.ndarray:
    """Single-mode tensor-times-matrix — Tensor Toolbox ``ttm(X, U, n)``
    (``@tensor/ttm.m``): contracts U (or Uᵀ with the toolbox's 't' flag)
    against mode `mode` (0-based), replacing that dimension. N-way."""
    if transpose:
        u = u.T
    moved = jnp.moveaxis(x, mode, 0)
    out = jnp.tensordot(u, moved, axes=([1], [0]))
    return jnp.moveaxis(out, 0, mode)


def ttv(x: jnp.ndarray, vecs, modes=None) -> jnp.ndarray:
    """Tensor-times-vector(s) — Tensor Toolbox ``ttv(X, v, n)`` /
    ``ttv(X, {v1..vk}, dims)`` (``@tensor/ttv.m``): contracts each vector
    along its mode and DROPS that mode. `vecs` is one vector or a sequence;
    `modes` defaults to the first len(vecs) modes, like the toolbox."""
    if isinstance(vecs, jnp.ndarray) and vecs.ndim == 1:
        vecs = [vecs]
        modes = [0 if modes is None else int(modes)]
    else:
        vecs = list(vecs)
        modes = (
            list(range(len(vecs)))
            if modes is None
            else [int(m) for m in modes]
        )
    # contract highest mode first so earlier mode indices stay valid
    for m, v in sorted(zip(modes, vecs), key=lambda p: -p[0]):
        x = jnp.tensordot(x, v, axes=([m], [0]))
    return x


def ttt(a: jnp.ndarray, b: jnp.ndarray, adims=None, bdims=None) -> jnp.ndarray:
    """Tensor-times-tensor — Tensor Toolbox ``ttt(A, B[, adims[, bdims]])``
    (``@tensor/ttt.m``): with no dims the outer product, with dims the
    contraction of A's `adims` against B's `bdims` (defaulting to `adims`,
    as the toolbox does); contracting every mode yields the scalar inner
    product. Modes are 0-based. The result's modes are A's remaining modes
    followed by B's remaining modes (the toolbox's tenmat row/col order)."""
    if adims is None:
        adims = ()
    adims = (adims,) if isinstance(adims, int) else tuple(adims)
    bdims = adims if bdims is None else (
        (bdims,) if isinstance(bdims, int) else tuple(bdims)
    )
    if len(adims) == 0:
        return jnp.tensordot(a, b, axes=0)
    return jnp.tensordot(a, b, axes=(list(adims), list(bdims)))


def nvecs(x: jnp.ndarray, mode: int, r: int, flipsign: bool = True) -> jnp.ndarray:
    """Leading-r eigenvectors of the mode-`mode` unfolding Gram Xn·Xnᵀ —
    ``@tensor/nvecs.m`` (eigs 'LM' branch). Dense symmetric eigendecomposition
    instead of Lanczos: the Gram is (n_mode × n_mode), small by construction.
    `flipsign` makes each column's largest-|.|-entry positive, as the
    toolbox default does."""
    xn = jnp.moveaxis(x, mode, 0).reshape(x.shape[mode], -1)
    w, v = jnp.linalg.eigh(xn @ xn.T)  # ascending
    u = v[:, ::-1][:, :r]
    if flipsign:
        mx = jnp.argmax(jnp.abs(u), axis=0)
        s = jnp.sign(u[mx, jnp.arange(u.shape[1])])
        u = u * jnp.where(s == 0, 1.0, s)[None, :]
    return u


def collapse(x: jnp.ndarray, dims=None, fun=jnp.sum) -> jnp.ndarray:
    """Reduce over `dims` with `fun` (default sum) — ``@tensor/collapse.m``.
    `fun` is any reduction accepting an `axis` argument (jnp.sum, jnp.max,
    jnp.mean, ...); collapsing every mode returns a scalar.

    Negative dims follow the toolbox's `tt_dimscheck` exclusion convention
    (0-based here): ``dims=-k`` (or a tuple of negatives) means "all modes
    EXCEPT mode k" — e.g. ``collapse(x, -2)`` reduces every mode but mode 2
    (`@tensor/collapse.m` via `tt_dimscheck.m`). Mixing signs is an error,
    matching the toolbox."""
    if dims is None:
        dims = tuple(range(x.ndim))
    dims = (dims,) if isinstance(dims, int) else tuple(dims)
    if len(dims) == 0:
        return x
    if any(d < 0 for d in dims):
        if not all(d < 0 for d in dims):
            raise ValueError("collapse dims must be all >=0 or all negative")
        excluded = {-d for d in dims}
        dims = tuple(d for d in range(x.ndim) if d not in excluded)
        if len(dims) == 0:
            return x
    return fun(x, axis=dims)


def contract(x: jnp.ndarray, i: int, j: int) -> jnp.ndarray:
    """Trace over modes `i` and `j` (equal size, distinct) —
    ``@tensor/contract.m``."""
    if i == j:
        raise ValueError("must contract along two different dimensions")
    if x.shape[i] != x.shape[j]:
        raise ValueError("must contract along equally sized dimensions")
    return jnp.trace(x, axis1=i, axis2=j)


def scale(x: jnp.ndarray, s: jnp.ndarray, dims) -> jnp.ndarray:
    """Scale the fibers of `x` lying in modes `dims` elementwise by the
    tensor `s` of shape ``x.shape[dims]`` — ``@tensor/scale.m``. A vector
    `s` with ``dims=k`` rescales mode-k slices; a full-shape `s` with all
    dims is a Hadamard product."""
    dims = (dims,) if isinstance(dims, int) else tuple(dims)
    s = jnp.asarray(s)
    expect = tuple(x.shape[d] for d in dims)
    if s.shape != expect:
        raise ValueError(f"scale factor shape {s.shape} != {expect}")
    # align s's axes with x's dims (dims may be unordered), broadcast the rest
    pairs = sorted(zip(dims, range(len(dims))))
    s = jnp.transpose(s, [k for _, k in pairs])
    shape = [1] * x.ndim
    for d, _ in pairs:
        shape[d] = x.shape[d]
    return x * s.reshape(shape)


# ---------------------------------------------------------------- constructors


def tenzeros(shape, dtype=jnp.float32) -> jnp.ndarray:
    """``tenzeros(sz)``."""
    return jnp.zeros(tuple(shape), dtype)


def tenones(shape, dtype=jnp.float32) -> jnp.ndarray:
    """``tenones(sz)``."""
    return jnp.ones(tuple(shape), dtype)


def tendiag(v: jnp.ndarray, shape=None) -> jnp.ndarray:
    """Dense tensor with `v` on the superdiagonal — ``tendiag(v, sz)``."""
    n = int(v.shape[0])
    if shape is None:
        shape = (n, n, n)
    shape = tuple(int(s) for s in shape)
    out = jnp.zeros(shape, v.dtype)
    idx = jnp.arange(n)
    return out.at[tuple(idx for _ in shape)].set(v)


def teneye(order: int, size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity tensor E of even order m with ``ttsv(E, x, -1) = x`` for all
    unit-norm x — ``teneye.m`` semantics (reference
    ``other_methods/tensor_toolbox-v3.1/teneye.m:30-38``: each entry is the
    fraction of the m! index permutations whose m/2 adjacent pairs are all
    equal). Built here as the permutation-average of the delta-chain
    prod_k delta(i_{2k}, i_{2k+1}) — identical by symmetry of the count,
    without the per-index loop. Like the original it only exists for even
    order and is practical only for small (m, n)."""
    import itertools

    if order % 2 != 0:
        raise ValueError("identity tensor only exists for even order")
    shape = (size,) * order
    idx = np.indices(shape)
    chain = np.ones(shape, dtype=np.float64)
    for k in range(0, order - 1, 2):
        chain = chain * (idx[k] == idx[k + 1])
    out = np.zeros(shape, dtype=np.float64)
    perms = list(itertools.permutations(range(order)))
    for p in perms:
        out += np.transpose(chain, p)
    return jnp.asarray(out / len(perms), dtype)


def tenrandblk(key: jax.Array, block_sizes, noise: float = 0.1, dtype=jnp.float32):
    """Nearly block-diagonal random tensor — ``tenrandblk``: dense noise of
    magnitude `noise` plus unit-norm random blocks on the diagonal. Block
    rows of `block_sizes` (n_blocks, N) give each block's extent per mode."""
    block_sizes = [tuple(int(s) for s in row) for row in block_sizes]
    n = len(block_sizes[0])
    shape = tuple(sum(row[ax] for row in block_sizes) for ax in range(n))
    k_noise, *k_blocks = jax.random.split(key, len(block_sizes) + 1)
    out = noise * jax.random.normal(k_noise, shape, dtype)
    offs = [0] * n
    for row, kb in zip(block_sizes, k_blocks):
        blk = jax.random.normal(kb, row, dtype)
        blk = blk / jnp.linalg.norm(blk.ravel())
        sl = tuple(slice(offs[ax], offs[ax] + row[ax]) for ax in range(n))
        out = out.at[sl].add(blk)
        offs = [offs[ax] + row[ax] for ax in range(n)]
    return out


# ------------------------------------------------------------- random matrices


def matrandnorm(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize columns to unit 2-norm — ``matrandnorm``."""
    norms = jnp.linalg.norm(x, axis=0, keepdims=True)
    return x / jnp.where(norms > 0, norms, 1.0)


def matrandorth(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Random n x n orthogonal matrix (Haar via QR with sign fix) —
    ``matrandorth``."""
    a = jax.random.normal(key, (n, n), dtype)
    q, r = jnp.linalg.qr(a)
    return q * jnp.sign(jnp.diag(r))[None, :]


def matrandcong(key: jax.Array, m: int, n: int, gamma: float, dtype=jnp.float32):
    """Random (m, n) matrix with unit-norm columns and pairwise congruence
    (column inner product) exactly `gamma` — ``matrandcong``'s contract,
    constructed directly: columns = sqrt(gamma)*u + sqrt(1-gamma)*e_i with a
    shared random unit vector u in the orthogonal complement of the chosen
    orthonormal columns e_i."""
    k1, k2 = jax.random.split(key)
    q = matrandorth(k1, m, dtype)  # orthonormal basis
    e = q[:, :n]
    if m > n:
        # unit vector in span of remaining basis columns
        w = jax.random.normal(k2, (m - n,), dtype)
        u = q[:, n:] @ (w / jnp.linalg.norm(w))
    else:
        raise ValueError("matrandcong requires m > n")
    c = jnp.sqrt(jnp.asarray(gamma, dtype))
    s = jnp.sqrt(jnp.asarray(1.0 - gamma, dtype))
    return c * u[:, None] + s * e


# --------------------------------------------------------------- ktensor class


def ktensor_norm(weights: jnp.ndarray, factors) -> jnp.ndarray:
    """Frobenius norm of a Kruskal tensor without materializing it —
    ``norm(ktensor)``: sqrt(w^T (hadamard of Grams) w)."""
    g = weights[:, None] * weights[None, :]
    for u in factors:
        g = g * (u.T @ u)
    return jnp.sqrt(jnp.maximum(jnp.sum(g), 0.0))


def ktensor_innerprod(weights, factors, other) -> jnp.ndarray:
    """<ktensor, X> for dense X or another ktensor —
    ``innerprod(ktensor, ...)``."""
    if isinstance(other, tuple):
        w2, f2 = other
        g = weights[:, None] * w2[None, :]
        for u, v in zip(factors, f2):
            g = g * (u.T @ v)
        return jnp.sum(g)
    from .decomp import mttkrp

    n = len(factors)
    m = mttkrp(other, factors, n - 1)
    return jnp.sum(weights[None, :] * factors[n - 1] * m)


def ktensor_arrange(weights, factors):
    """Normalize columns and sort components by weight descending —
    ``arrange(ktensor)``."""
    factors, weights = cp_normalize(list(factors), weights)
    order = jnp.argsort(-weights)
    return weights[order], [u[:, order] for u in factors]


def ktensor_fixsigns(weights, factors):
    """Flip signs so each column's largest-magnitude entry is positive,
    keeping the product invariant — ``fixsigns(ktensor)``: sign flips are
    absorbed pairwise; an odd total flip count per component is absorbed
    into the weight."""
    weights = jnp.asarray(weights)
    total_sign = jnp.ones_like(weights)
    new_factors = []
    for u in factors:
        mx = jnp.argmax(jnp.abs(u), axis=0)
        s = jnp.sign(u[mx, jnp.arange(u.shape[1])])
        s = jnp.where(s == 0, 1.0, s)
        new_factors.append(u * s[None, :])
        total_sign = total_sign * s
    return weights * total_sign, new_factors


def ktensor_score(weights_a, factors_a, weights_b, factors_b) -> jnp.ndarray:
    """Congruence score between two same-rank Kruskal tensors —
    ``score(ktensor, ktensor)`` with greedy component matching: mean over
    matched components of the product of per-mode column cosines times the
    weight-penalty factor (1 - |wa - wb| / max(wa, wb))."""
    wa, fa = ktensor_arrange(weights_a, factors_a)
    wb, fb = ktensor_arrange(weights_b, factors_b)
    r = wa.shape[0]
    c = jnp.ones((r, r), fa[0].dtype)
    for u, v in zip(fa, fb):
        c = c * jnp.abs(u.T @ v)
    penalty = 1.0 - jnp.abs(wa[:, None] - wb[None, :]) / jnp.maximum(
        jnp.maximum(wa[:, None], wb[None, :]), 1e-30
    )
    c = c * penalty
    # greedy assignment (the toolbox default 'greedy' option)
    def body(carry, _):
        cmat, acc = carry
        flat = jnp.argmax(cmat)
        i, j = flat // r, flat % r
        best = cmat[i, j]
        cmat = cmat.at[i, :].set(-jnp.inf).at[:, j].set(-jnp.inf)
        return (cmat, acc + best), best

    (_, total), _ = jax.lax.scan(body, (c, jnp.asarray(0.0, c.dtype)), None, length=r)
    return total / r


# ------------------------------------------------------ ttensor / sumtensor


def ttensor_full(core: jnp.ndarray, factors) -> jnp.ndarray:
    """Dense tensor of a Tucker operator — ``full(ttensor)``."""
    return tucker_ttm(core, list(factors), transpose=False)


def ttensor_norm(core: jnp.ndarray, factors) -> jnp.ndarray:
    """``norm(ttensor)`` without materializing: fold the small Gram of each
    factor into the core (exact also for non-orthonormal factors)."""
    y = core
    n = core.ndim
    for ax, u in enumerate(factors):
        g = u.T @ u  # (r_ax, r_ax)
        y = jnp.moveaxis(
            jnp.tensordot(y, g, axes=([ax], [0])), -1, ax
        )
    return jnp.sqrt(jnp.maximum(jnp.sum(core * y), 0.0))


def sumtensor_full(parts) -> jnp.ndarray:
    """``full(sumtensor)``: sum of already-densified parts."""
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


# ----------------------------------------------------------- problem helpers


def create_guess(key: jax.Array, shape, rank: int, dtype=jnp.float32):
    """Random initial factor guess — ``create_guess`` ('rand' factors)."""
    keys = jax.random.split(key, len(shape))
    return [jax.random.uniform(k, (s, rank), dtype) for k, s in zip(keys, shape)]


def create_problem_binary(key: jax.Array, shape, rank: int, noise: float = 0.1):
    """Random low-rank 0/1 tensor — ``create_problem_binary``: Bernoulli
    draws with odds given by a low-rank nonnegative parameter tensor."""
    k_factors, k_draw = jax.random.split(key)
    keys = jax.random.split(k_factors, len(shape))
    factors = [
        jax.random.uniform(k, (s, rank), jnp.float32) for k, s in zip(keys, shape)
    ]
    m = ktensor_full(factors)
    p = m / (1.0 + m)  # odds -> probability
    p = (1.0 - noise) * p + noise * 0.5
    data = (jax.random.uniform(k_draw, p.shape) < p).astype(jnp.float32)
    return {"factors": factors, "prob": p, "data": data}


# ------------------------------------------------------------------ data files


def export_data(x, path: str) -> None:
    """Write a tensor/matrix in the Tensor Toolbox interchange format —
    ``export_data``: a 'tensor'/'matrix' header, ndims, size line, then
    values (one per line, columns varying fastest per our row-major
    convention, documented in the header comment we emit)."""
    arr = np.asarray(x)
    kind = "matrix" if arr.ndim == 2 else "tensor"
    with open(path, "w") as f:
        f.write(f"{kind}\n{arr.ndim}\n")
        f.write(" ".join(str(s) for s in arr.shape) + "\n")
        for v in arr.ravel():
            f.write(f"{v:.16g}\n")


def import_data(path: str) -> np.ndarray:
    """Read the interchange format written by :func:`export_data` —
    ``import_data``."""
    with open(path) as f:
        kind = f.readline().strip()
        if kind not in ("tensor", "matrix"):
            raise ValueError(f"unsupported data type {kind!r}")
        ndim = int(f.readline())
        shape = tuple(int(s) for s in f.readline().split())
        assert len(shape) == ndim
        vals = np.array([float(f.readline()) for _ in range(int(np.prod(shape)))])
    return vals.reshape(shape)
