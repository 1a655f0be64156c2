"""Tensor Toolbox class surface — thin, immutable, pytree-registered wrappers
over the functional kernel layer.

The reference vendors the full Tensor Toolbox v3.1 class library (SURVEY §2.3:
``@tensor`` 2,974 LoC, ``@sptensor`` 3,732, ``@ktensor`` 2,495, ``@ttensor``
964, ``@tenmat`` 671, ``@sptenmat`` 737, ``@symtensor`` 1,318, ``@symktensor``
1,375, ``@sumtensor`` 517 under
``other_methods/tensor_toolbox-v3.1``). The algorithms and kernels already
live as pure functions in :mod:`tritd_tpu.ops` — this module supplies the
*class* face: operator overloads, methods, and conversions, matching the
MATLAB method files named in each docstring.

TPU-native design notes
-----------------------
* Every class is registered as a JAX pytree, so instances flow through
  ``jit`` / ``vmap`` / ``grad`` / ``shard_map`` unchanged; static structure
  (shapes, mode lists) rides in the aux data, arrays are leaves.
* Instances are immutable — all methods return new objects (the MATLAB
  classes are value types too, so semantics match).
* Arithmetic follows the toolbox: ``+ - * /`` are elementwise
  (``plus/minus/times/rdivide.m``; MATLAB's ``mtimes`` on tensors only
  accepts scalars, which Python's ``*`` subsumes), comparisons return
  boolean tensors (``eq/ne/lt/le/gt/ge.m``).
* ``SymTensor`` stores the dense symmetrized array rather than the
  distinct-element compression (deliberate, XLA-friendly — see
  :mod:`tritd_tpu.ops.symmetric`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .decomp import mttkrp as _dense_mttkrp
from .kruskal import cp_normalize, khatrirao, ktensor_full
from . import sparse as _sp
from . import symmetric as _sym
from . import tenutils as _tu

__all__ = [
    "Tensor",
    "SpTensor",
    "KTensor",
    "TTensor",
    "SymTensor",
    "SymKTensor",
    "SumTensor",
    "TenMat",
    "SpTenMat",
]


def _data_of(other):
    """Unwrap a Tensor/array operand to a raw array (scalar passes through)."""
    if isinstance(other, Tensor):
        return other.data
    return other


@jax.tree_util.register_pytree_node_class
class Tensor:
    """Dense tensor — ``@tensor``. Wraps one ``jnp.ndarray``.

    Methods mirror the ``@tensor`` method files: ``norm.m``, ``innerprod.m``,
    ``ttm.m``, ``ttv.m``, ``ttt.m``, ``ttsv.m``, ``mttkrp.m``, ``nvecs.m``,
    ``collapse.m``, ``contract.m``, ``scale.m``, ``squeeze.m``,
    ``permute.m``, ``reshape.m``, ``symmetrize.m``, ``issymmetric.m``,
    ``tenfun.m``, ``full.m``, ``double.m``, plus the arithmetic /
    comparison / logical operator files.
    """

    def __init__(self, data):
        self.data = jnp.asarray(data)

    # -- pytree
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        return obj

    # -- shape surface (`ndims.m`, `size.m`, `nnz.m`, `isscalar.m`)
    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def nnz(self):
        return jnp.sum(self.data != 0)

    def isscalar(self) -> bool:
        return self.data.ndim == 0

    # -- conversions (`full.m`, `double.m`)
    def full(self) -> "Tensor":
        return self

    def double(self) -> jnp.ndarray:
        return self.data

    def __array__(self, dtype=None):
        import numpy as np

        return np.asarray(self.data, dtype=dtype)

    # -- arithmetic (`plus/minus/times/rdivide/ldivide/power/uminus.m`)
    def __add__(self, other):
        return Tensor(self.data + _data_of(other))

    __radd__ = __add__

    def __sub__(self, other):
        return Tensor(self.data - _data_of(other))

    def __rsub__(self, other):
        return Tensor(_data_of(other) - self.data)

    def __mul__(self, other):
        return Tensor(self.data * _data_of(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return Tensor(self.data / _data_of(other))

    def __rtruediv__(self, other):
        return Tensor(_data_of(other) / self.data)

    def __pow__(self, other):
        return Tensor(self.data ** _data_of(other))

    def __neg__(self):
        return Tensor(-self.data)

    def __pos__(self):
        return self

    def __abs__(self):
        return Tensor(jnp.abs(self.data))

    def exp(self):
        return Tensor(jnp.exp(self.data))

    # -- comparisons / logicals (`eq/ne/lt/le/gt/ge/and/or/not/xor.m`)
    def __eq__(self, other):
        return Tensor(self.data == _data_of(other))

    def __ne__(self, other):
        return Tensor(self.data != _data_of(other))

    def __lt__(self, other):
        return Tensor(self.data < _data_of(other))

    def __le__(self, other):
        return Tensor(self.data <= _data_of(other))

    def __gt__(self, other):
        return Tensor(self.data > _data_of(other))

    def __ge__(self, other):
        return Tensor(self.data >= _data_of(other))

    __hash__ = None  # like ndarray: == is elementwise

    def logical_and(self, other):
        return Tensor((self.data != 0) & (_data_of(other) != 0))

    def logical_or(self, other):
        return Tensor((self.data != 0) | (_data_of(other) != 0))

    def logical_not(self):
        return Tensor(self.data == 0)

    def logical_xor(self, other):
        return Tensor((self.data != 0) ^ (_data_of(other) != 0))

    def isequal(self, other) -> jnp.ndarray:
        o = _data_of(other)
        if jnp.shape(o) != self.shape:
            return jnp.asarray(False)
        return jnp.all(self.data == o)

    # -- indexing (`subsref.m`; returns Tensor like X(ranges) does).
    # MATLAB's `end`-style indexing (`@tensor/end.m`: X(end,:,:)) maps to
    # Python's native negative indexing — X[-1] / X[..., -1] — so no
    # separate helper is needed; pinned by test_classes.py.
    def __getitem__(self, idx):
        return Tensor(self.data[idx])

    def find(self):
        """(subs, vals) of nonzero entries — ``@tensor/find.m``. Returns an
        (nnz, ndim) 0-based subscript array + the matching values. NOTE:
        output shape is data-dependent, so call OUTSIDE jit (like the
        toolbox, which is host-side); inside jit use jnp.nonzero with a
        static size argument instead."""
        import numpy as _np

        arr = _np.asarray(self.data)
        subs = _np.argwhere(arr)
        return subs, arr[tuple(subs.T)]

    # -- scalar division forms (`@tensor/mldivide.m`, `mrdivide.m`): the
    # toolbox defines A \ X (scalar left-divide) and X / B (scalar
    # right-divide); the elementwise ldivide/rdivide general forms are
    # covered by __truediv__/__rtruediv__ above.
    def mldivide(self, scalar):
        """scalar \\ X — every element divided by `scalar`."""
        return Tensor(self.data / scalar)

    def mrdivide(self, scalar):
        """X / scalar — alias of __truediv__ for scalar operands."""
        return Tensor(self.data / scalar)

    # -- structure ops (`permute/reshape/squeeze.m`)
    def permute(self, order) -> "Tensor":
        return Tensor(jnp.transpose(self.data, tuple(order)))

    def reshape(self, shape) -> "Tensor":
        return Tensor(self.data.reshape(tuple(shape)))

    def squeeze(self) -> "Tensor":
        return Tensor(jnp.squeeze(self.data))

    # -- numerics
    def norm(self) -> jnp.ndarray:
        """Frobenius norm — ``@tensor/norm.m``."""
        return jnp.linalg.norm(self.data.ravel())

    def innerprod(self, other) -> jnp.ndarray:
        """<X, Y> — ``@tensor/innerprod.m``; accepts any class (the toolbox
        dispatches dense-vs-decomposed to the decomposed class's method)."""
        if isinstance(other, (KTensor, TTensor, SpTensor, SumTensor)):
            return other.innerprod(self)
        return jnp.vdot(self.data.ravel(), _data_of(other).ravel())

    def ttm(self, mats, modes=None, transpose: bool = False) -> "Tensor":
        """Tensor-times-matrix — ``@tensor/ttm.m`` (list or single)."""
        if isinstance(mats, (jnp.ndarray,)) or (
            hasattr(mats, "ndim") and getattr(mats, "ndim", None) == 2
        ):
            mats = [mats]
            modes = [0 if modes is None else int(modes)]
        else:
            mats = list(mats)
            modes = (
                list(range(len(mats)))
                if modes is None
                else [int(m) for m in modes]
            )
        out = self.data
        for m, u in zip(modes, mats):
            out = _tu.ttm(out, jnp.asarray(u), m, transpose=transpose)
        return Tensor(out)

    def ttv(self, vecs, modes=None) -> "Tensor":
        out = _tu.ttv(self.data, vecs, modes)
        return Tensor(out)

    def ttt(self, other, adims=None, bdims=None) -> "Tensor":
        return Tensor(_tu.ttt(self.data, _data_of(other), adims, bdims))

    def ttsv(self, x, keep: int = 1):
        return _sym.ttsv(self.data, x, keep)

    def mttkrp(self, factors, mode: int) -> jnp.ndarray:
        return _dense_mttkrp(self.data, [jnp.asarray(u) for u in factors], mode)

    def nvecs(self, mode: int, r: int) -> jnp.ndarray:
        return _tu.nvecs(self.data, mode, r)

    def collapse(self, dims=None, fun=jnp.sum):
        out = _tu.collapse(self.data, dims, fun)
        return out if jnp.ndim(out) == 0 else Tensor(out)

    def contract(self, i: int, j: int):
        out = _tu.contract(self.data, i, j)
        return out if jnp.ndim(out) == 0 else Tensor(out)

    def scale(self, s, dims) -> "Tensor":
        return Tensor(_tu.scale(self.data, _data_of(s), dims))

    def symmetrize(self) -> "Tensor":
        return Tensor(_sym.symmetrize(self.data))

    def issymmetric(self, tol: float = 1e-6):
        return _sym.is_symmetric(self.data, tol)

    def tenfun(self, fn, *others) -> "Tensor":
        """Apply an elementwise function across tensors — ``tenfun.m``."""
        return Tensor(fn(self.data, *[_data_of(o) for o in others]))

    def mask(self, w) -> jnp.ndarray:
        """Values at the nonzeros of mask W (column vector) — ``mask.m``."""
        wd = _data_of(w)
        return self.data.ravel()[jnp.nonzero(wd.ravel())[0]]

    def to_tenmat(self, row_modes, col_modes=None) -> "TenMat":
        return TenMat.from_tensor(self.data, row_modes, col_modes)

    def __repr__(self):
        return f"Tensor(shape={tuple(self.shape)}, dtype={self.data.dtype})"


@jax.tree_util.register_pytree_node_class
class SpTensor:
    """Sparse COO tensor — ``@sptensor``; wraps the static-nnz functional
    representation of :mod:`tritd_tpu.ops.sparse` (``vals, coords, shape``).
    Duplicate coordinates accumulate, as ``sptensor.m`` documents."""

    def __init__(self, vals, coords, shape):
        self.vals = jnp.asarray(vals)
        self.coords = jnp.asarray(coords)
        self.shape = tuple(int(s) for s in shape)

    def tree_flatten(self):
        return (self.vals, self.coords), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.vals, obj.coords = children
        obj.shape = aux
        return obj

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def nnz(self):
        return self.vals.shape[0]

    # -- conversions (`full.m`, `double.m`)
    def full(self) -> Tensor:
        return Tensor(_sp.sp_full(self.vals, self.coords, self.shape))

    def double(self) -> jnp.ndarray:
        return self.full().data

    # -- arithmetic: value maps that fix 0 stay sparse (`times`-style);
    #    sptensor +- sptensor concatenates (duplicates accumulate).
    def __mul__(self, other):
        if isinstance(other, SpTensor):
            # elementwise product: gather other's dense values at our coords
            dense = other.double()
            return SpTensor(
                self.vals * dense[tuple(self.coords.T)], self.coords, self.shape
            )
        if isinstance(other, (Tensor,)) or hasattr(other, "ndim") and getattr(
            other, "ndim", 0
        ) > 0:
            dense = _data_of(other)
            return SpTensor(
                self.vals * dense[tuple(self.coords.T)], self.coords, self.shape
            )
        return SpTensor(self.vals * other, self.coords, self.shape)

    __rmul__ = __mul__

    def __truediv__(self, scalar):
        return SpTensor(self.vals / scalar, self.coords, self.shape)

    def __neg__(self):
        return SpTensor(-self.vals, self.coords, self.shape)

    def __abs__(self):
        return SpTensor(jnp.abs(self.vals), self.coords, self.shape)

    def __add__(self, other):
        if isinstance(other, SpTensor):
            if other.shape != self.shape:
                raise ValueError("shape mismatch")
            return SpTensor(
                jnp.concatenate([self.vals, other.vals]),
                jnp.concatenate([self.coords, other.coords]),
                self.shape,
            )
        return Tensor(self.double() + _data_of(other))

    def __sub__(self, other):
        return self + (-other if isinstance(other, SpTensor) else Tensor(-_data_of(other)))

    def elemwise(self, fn) -> "SpTensor":
        v, c, s = _sp.sp_elemwise(self.vals, self.coords, self.shape, fn)
        return SpTensor(v, c, s)

    def find(self):
        """(subs, vals) of stored entries — ``@sptensor/find.m`` (the stored
        coordinate list IS the answer for a sparse tensor)."""
        return self.coords, self.vals

    def coalesce(self) -> "SpTensor":
        """Merge duplicate coordinates (host-side; not jittable — nnz
        changes)."""
        import numpy as np

        lin = np.asarray(_sp.sp_sub2ind(self.coords, self.shape))
        uniq, inv = np.unique(lin, return_inverse=True)
        vals = jnp.zeros((len(uniq),), self.vals.dtype).at[inv].add(self.vals)
        coords = _sp.sp_ind2sub(jnp.asarray(uniq), self.shape)
        return SpTensor(vals, coords, self.shape)

    # -- numerics
    def norm(self) -> jnp.ndarray:
        return _sp.sp_norm(self.vals, self.coords, self.shape)

    def innerprod(self, other) -> jnp.ndarray:
        if isinstance(other, SpTensor):
            other = other.full()
        return _sp.sp_innerprod(
            self.vals, self.coords, self.shape, _data_of(other)
        )

    def ttv(self, vecs, modes) -> Tensor:
        if hasattr(vecs, "ndim") and getattr(vecs, "ndim", None) == 1:
            vecs, modes = [vecs], [int(modes)]
        else:
            vecs = list(vecs)
            modes = [int(m) for m in modes]
        out = _sp.sp_ttv(self.vals, self.coords, self.shape, vecs, modes)
        return Tensor(out)

    def mttkrp(self, factors, mode: int) -> jnp.ndarray:
        return _sp.sp_mttkrp(self.vals, self.coords, self.shape, factors, mode)

    def permute(self, order) -> "SpTensor":
        order = tuple(order)
        return SpTensor(
            self.vals,
            self.coords[:, jnp.array(order)],
            tuple(self.shape[m] for m in order),
        )

    def to_sptenmat(self, row_modes, col_modes=None) -> "SpTenMat":
        vals, (ri, ci), (nr, nc) = _sp.sptenmat(
            self.vals, self.coords, self.shape, row_modes, col_modes
        )
        n = self.ndim
        row_modes = tuple(int(m) for m in row_modes)
        if col_modes is None:
            col_modes = tuple(m for m in range(n) if m not in row_modes)
        return SpTenMat(vals, ri, ci, row_modes, tuple(col_modes), self.shape)

    def __repr__(self):
        return f"SpTensor(shape={self.shape}, nnz={self.nnz})"


@jax.tree_util.register_pytree_node_class
class KTensor:
    """Kruskal tensor — ``@ktensor``: ``(weights λ, factors U_1..U_N)``."""

    def __init__(self, factors, weights=None):
        self.factors = [jnp.asarray(u) for u in factors]
        r = self.factors[0].shape[1]
        self.weights = (
            jnp.ones((r,), self.factors[0].dtype)
            if weights is None
            else jnp.asarray(weights)
        )

    def tree_flatten(self):
        return (self.weights, self.factors), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.weights, obj.factors = children[0], list(children[1])
        return obj

    @property
    def shape(self):
        return tuple(u.shape[0] for u in self.factors)

    @property
    def ndim(self):
        return len(self.factors)

    def ncomponents(self) -> int:
        """``ncomponents.m``."""
        return self.factors[0].shape[1]

    # -- conversions
    def full(self) -> Tensor:
        return Tensor(ktensor_full(self.factors, self.weights))

    def double(self) -> jnp.ndarray:
        return self.full().data

    def tovec(self, lambdaflag: bool = True) -> jnp.ndarray:
        """Stack factors (column-major per factor) into one vector —
        ``tovec.m``."""
        parts = [u.T.ravel() for u in self.factors]
        if lambdaflag:
            parts = [self.weights] + parts
        return jnp.concatenate(parts)

    @classmethod
    def from_vec(cls, x, shape, rank: int, lambdaflag: bool = True):
        """Inverse of :meth:`tovec` (``ktensor.m`` 'fromvector')."""
        x = jnp.asarray(x)
        off = 0
        if lambdaflag:
            weights, off = x[:rank], rank
        else:
            weights = None
        factors = []
        for s in shape:
            factors.append(x[off : off + s * rank].reshape(rank, s).T)
            off += s * rank
        return cls(factors, weights)

    # -- arithmetic (`plus/minus/mtimes/uminus.m`)
    def __add__(self, other: "KTensor") -> "KTensor":
        if not isinstance(other, KTensor):
            return Tensor(self.double() + _data_of(other))
        return KTensor(
            [
                jnp.concatenate([u, v], axis=1)
                for u, v in zip(self.factors, other.factors)
            ],
            jnp.concatenate([self.weights, other.weights]),
        )

    def __sub__(self, other: "KTensor"):
        return self + (-other if isinstance(other, KTensor) else Tensor(-_data_of(other)))

    def __neg__(self) -> "KTensor":
        return KTensor(self.factors, -self.weights)

    def __mul__(self, scalar) -> "KTensor":
        return KTensor(self.factors, self.weights * scalar)

    __rmul__ = __mul__

    # -- numerics
    def norm(self) -> jnp.ndarray:
        return _tu.ktensor_norm(self.weights, self.factors)

    def innerprod(self, other) -> jnp.ndarray:
        if isinstance(other, KTensor):
            return _tu.ktensor_innerprod(
                self.weights, self.factors, (other.weights, other.factors)
            )
        return _tu.ktensor_innerprod(self.weights, self.factors, _data_of(other))

    def mttkrp(self, factors, mode: int) -> jnp.ndarray:
        """``@ktensor/mttkrp.m``: V = U_n diag(λ) ∏_{i≠n} (U_iᵀ V_i) —
        never materializes the dense tensor."""
        r2 = jnp.asarray(factors[0]).shape[1]
        w = self.weights[:, None] * jnp.ones((1, r2), self.weights.dtype)
        for i, v in enumerate(factors):
            if i == mode:
                continue
            w = w * (self.factors[i].T @ jnp.asarray(v))
        return self.factors[mode] @ w

    def normalize(self) -> "KTensor":
        factors, weights = cp_normalize(self.factors, self.weights)
        return KTensor(factors, weights)

    def arrange(self) -> "KTensor":
        w, f = _tu.ktensor_arrange(self.weights, self.factors)
        return KTensor(f, w)

    def fixsigns(self) -> "KTensor":
        w, f = _tu.ktensor_fixsigns(self.weights, self.factors)
        return KTensor(f, w)

    def redistribute(self, mode: int) -> "KTensor":
        """Absorb λ into factor `mode` — ``redistribute.m``."""
        new = list(self.factors)
        new[mode] = new[mode] * self.weights[None, :]
        return KTensor(new, jnp.ones_like(self.weights))

    def score(self, other: "KTensor") -> jnp.ndarray:
        return _tu.ktensor_score(
            self.weights, self.factors, other.weights, other.factors
        )

    def permute(self, order) -> "KTensor":
        return KTensor([self.factors[m] for m in order], self.weights)

    def ttv(self, vecs, modes=None) -> "KTensor | jnp.ndarray":
        """``@ktensor/ttv.m``: contract vectors into λ; remaining modes stay
        Kruskal (scalar when every mode is contracted)."""
        if hasattr(vecs, "ndim") and getattr(vecs, "ndim", None) == 1:
            vecs, modes = [vecs], [0 if modes is None else int(modes)]
        else:
            vecs = list(vecs)
            modes = (
                list(range(len(vecs))) if modes is None else [int(m) for m in modes]
            )
        w = self.weights
        for m, v in zip(modes, vecs):
            w = w * (self.factors[m].T @ jnp.asarray(v))
        rest = [u for i, u in enumerate(self.factors) if i not in set(modes)]
        if not rest:
            return jnp.sum(w)
        return KTensor(rest, w)

    def __repr__(self):
        return f"KTensor(shape={self.shape}, rank={self.ncomponents()})"


@jax.tree_util.register_pytree_node_class
class TTensor:
    """Tucker tensor — ``@ttensor``: ``(core G, factors U_1..U_N)``."""

    def __init__(self, core, factors):
        self.core = jnp.asarray(_data_of(core))
        self.factors = [jnp.asarray(u) for u in factors]

    def tree_flatten(self):
        return (self.core, self.factors), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.core, obj.factors = children[0], list(children[1])
        return obj

    @property
    def shape(self):
        return tuple(u.shape[0] for u in self.factors)

    @property
    def ndim(self):
        return len(self.factors)

    def full(self) -> Tensor:
        return Tensor(_tu.ttensor_full(self.core, self.factors))

    def double(self) -> jnp.ndarray:
        return self.full().data

    def norm(self) -> jnp.ndarray:
        return _tu.ttensor_norm(self.core, self.factors)

    def innerprod(self, other) -> jnp.ndarray:
        """``@ttensor/innerprod.m``: pull the factors onto the dense operand
        (cost Σ r_i · prod n) instead of densifying the Tucker operand."""
        if isinstance(other, TTensor):
            other = other.full()
        small = Tensor(_data_of(other)).ttm(self.factors, transpose=True)
        return jnp.vdot(self.core.ravel(), small.data.ravel())

    def ttm(self, mats, modes=None, transpose: bool = False) -> "TTensor":
        """``@ttensor/ttm.m``: absorb V into the factor of that mode."""
        if hasattr(mats, "ndim") and getattr(mats, "ndim", None) == 2:
            mats, modes = [mats], [0 if modes is None else int(modes)]
        else:
            mats = list(mats)
            modes = (
                list(range(len(mats))) if modes is None else [int(m) for m in modes]
            )
        new = list(self.factors)
        for m, v in zip(modes, mats):
            v = jnp.asarray(v)
            new[m] = (v.T if transpose else v) @ new[m]
        return TTensor(self.core, new)

    def ttv(self, vecs, modes=None):
        """``@ttensor/ttv.m``: contract vᵀU_m into the core; remaining modes
        stay Tucker (scalar when every mode is contracted)."""
        if hasattr(vecs, "ndim") and getattr(vecs, "ndim", None) == 1:
            vecs, modes = [vecs], [0 if modes is None else int(modes)]
        else:
            vecs = list(vecs)
            modes = (
                list(range(len(vecs))) if modes is None else [int(m) for m in modes]
            )
        core = self.core
        # contract highest mode first so earlier axes stay valid
        pairs = sorted(zip(modes, vecs), key=lambda p: -p[0])
        for m, v in pairs:
            core = jnp.tensordot(core, self.factors[m].T @ jnp.asarray(v), axes=([m], [0]))
        rest = [u for i, u in enumerate(self.factors) if i not in set(modes)]
        if not rest:
            return core  # scalar
        return TTensor(core, rest)

    def mttkrp(self, factors, mode: int) -> jnp.ndarray:
        """``@ttensor/mttkrp.m``: fold Uᵢᵀ Vᵢ into the core, MTTKRP the small
        core, then lift through U_n."""
        small = [
            jnp.eye(self.core.shape[i], dtype=self.core.dtype)
            if i == mode
            else self.factors[i].T @ jnp.asarray(factors[i])
            for i in range(self.ndim)
        ]
        w = _dense_mttkrp(self.core, small, mode)
        return self.factors[mode] @ w

    def __repr__(self):
        return f"TTensor(shape={self.shape}, core={tuple(self.core.shape)})"


@jax.tree_util.register_pytree_node_class
class SymTensor:
    """Symmetric tensor — ``@symtensor``. Stores the dense symmetrized array
    (not the distinct-element compression — deliberate, XLA-friendly;
    :mod:`tritd_tpu.ops.symmetric` docstring)."""

    def __init__(self, data, presymmetrized: bool = False):
        data = jnp.asarray(_data_of(data))
        self.data = data if presymmetrized else _sym.symmetrize(data)

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        return obj

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def full(self) -> Tensor:
        return Tensor(self.data)

    def double(self) -> jnp.ndarray:
        return self.data

    def issymmetric(self, tol: float = 1e-6):
        return _sym.is_symmetric(self.data, tol)

    def ttsv(self, x, keep: int = 1):
        return _sym.ttsv(self.data, x, keep)

    def norm(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.data.ravel())

    def __repr__(self):
        return f"SymTensor(order={self.ndim}, n={self.shape[0] if self.ndim else 0})"


@jax.tree_util.register_pytree_node_class
class SymKTensor:
    """Symmetric Kruskal tensor — ``@symktensor``: Σ_r λ_r u_r^{⊗m}."""

    def __init__(self, weights, u, order: int):
        self.weights = jnp.asarray(weights)
        self.u = jnp.asarray(u)
        self.order = int(order)

    def tree_flatten(self):
        return (self.weights, self.u), self.order

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.weights, obj.u = children
        obj.order = aux
        return obj

    @property
    def shape(self):
        return (self.u.shape[0],) * self.order

    def full(self) -> SymTensor:
        return SymTensor(
            _sym.symktensor_full(self.weights, self.u, self.order),
            presymmetrized=True,
        )

    def double(self) -> jnp.ndarray:
        return self.full().data

    def norm(self) -> jnp.ndarray:
        g = (self.u.T @ self.u) ** self.order
        q = self.weights @ g @ self.weights
        return jnp.sqrt(jnp.maximum(q, 0.0))

    def __repr__(self):
        return f"SymKTensor(n={self.u.shape[0]}, rank={self.u.shape[1]}, m={self.order})"


@jax.tree_util.register_pytree_node_class
class SumTensor:
    """Lazy sum of tensors of any class — ``@sumtensor``. Parts densify
    only on ``full``; ``innerprod`` distributes over the parts
    (``@sumtensor/innerprod.m``)."""

    def __init__(self, parts):
        self.parts = [
            p if isinstance(p, (Tensor, SpTensor, KTensor, TTensor)) else Tensor(p)
            for p in parts
        ]

    def tree_flatten(self):
        return (self.parts,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.parts = list(children[0])
        return obj

    @property
    def shape(self):
        return self.parts[0].shape

    @property
    def ndim(self):
        return len(self.shape)

    def __add__(self, other) -> "SumTensor":
        if isinstance(other, SumTensor):
            return SumTensor(self.parts + other.parts)
        return SumTensor(self.parts + [other])

    def full(self) -> Tensor:
        return Tensor(_tu.sumtensor_full([p.double() for p in self.parts]))

    def double(self) -> jnp.ndarray:
        return self.full().data

    def innerprod(self, other) -> jnp.ndarray:
        return sum(p.innerprod(other) for p in self.parts)

    def norm(self) -> jnp.ndarray:
        return self.full().norm()

    def __repr__(self):
        return f"SumTensor({len(self.parts)} parts, shape={self.shape})"


@jax.tree_util.register_pytree_node_class
class TenMat:
    """Tensor-as-matrix — ``@tenmat``: a matricized view that remembers the
    original shape and the row/column mode split, so it converts back."""

    def __init__(self, data, row_modes, col_modes, tshape):
        self.data = jnp.asarray(data)
        self.row_modes = tuple(int(m) for m in row_modes)
        self.col_modes = tuple(int(m) for m in col_modes)
        self.tshape = tuple(int(s) for s in tshape)

    @classmethod
    def from_tensor(cls, x, row_modes, col_modes=None) -> "TenMat":
        x = jnp.asarray(_data_of(x))
        n = x.ndim
        row_modes = (
            (row_modes,) if isinstance(row_modes, int) else tuple(row_modes)
        )
        if col_modes is None:
            col_modes = tuple(m for m in range(n) if m not in row_modes)
        else:
            col_modes = (
                (col_modes,) if isinstance(col_modes, int) else tuple(col_modes)
            )
        from .kruskal import tenmat as _tenmat_fn

        return cls(_tenmat_fn(x, row_modes, col_modes), row_modes, col_modes, x.shape)

    def tree_flatten(self):
        return (self.data,), (self.row_modes, self.col_modes, self.tshape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        obj.row_modes, obj.col_modes, obj.tshape = aux
        return obj

    @property
    def shape(self):
        return self.data.shape

    def tsize(self):
        """Original tensor shape — ``tsize.m``."""
        return self.tshape

    def double(self) -> jnp.ndarray:
        return self.data

    def to_tensor(self) -> Tensor:
        """Invert the matricization (inverse of :meth:`from_tensor`)."""
        perm = self.row_modes + self.col_modes
        shape_p = tuple(self.tshape[m] for m in perm)
        inv = [0] * len(perm)
        for pos, m in enumerate(perm):
            inv[m] = pos
        return Tensor(jnp.transpose(self.data.reshape(shape_p), inv))

    @property
    def T(self) -> "TenMat":
        """``ctranspose.m``: swap the row/column mode split."""
        return TenMat(self.data.T, self.col_modes, self.row_modes, self.tshape)

    def norm(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.data.ravel())

    def __add__(self, other):
        return TenMat(
            self.data + (other.data if isinstance(other, TenMat) else other),
            self.row_modes,
            self.col_modes,
            self.tshape,
        )

    def __sub__(self, other):
        return TenMat(
            self.data - (other.data if isinstance(other, TenMat) else other),
            self.row_modes,
            self.col_modes,
            self.tshape,
        )

    def __neg__(self):
        return TenMat(-self.data, self.row_modes, self.col_modes, self.tshape)

    def __mul__(self, other):
        """``@tenmat/mtimes.m``: scalar scaling, or matrix product whose
        result tensor has A's row modes then B's column modes."""
        if not isinstance(other, TenMat):
            return TenMat(
                self.data * other, self.row_modes, self.col_modes, self.tshape
            )
        tsiz = tuple(self.tshape[m] for m in self.row_modes) + tuple(
            other.tshape[m] for m in other.col_modes
        )
        nr = len(self.row_modes)
        return TenMat(
            self.data @ other.data,
            tuple(range(nr)),
            tuple(range(nr, len(tsiz))),
            tsiz,
        )

    __rmul__ = __mul__

    def __repr__(self):
        return (
            f"TenMat(shape={tuple(self.shape)}, rows={self.row_modes}, "
            f"cols={self.col_modes}, tshape={self.tshape})"
        )


@jax.tree_util.register_pytree_node_class
class SpTenMat:
    """Sparse tensor-as-matrix — ``@sptenmat``: COO matricization keeping
    the mode split and original shape for round-trip."""

    def __init__(self, vals, row_idx, col_idx, row_modes, col_modes, tshape):
        self.vals = jnp.asarray(vals)
        self.row_idx = jnp.asarray(row_idx)
        self.col_idx = jnp.asarray(col_idx)
        self.row_modes = tuple(int(m) for m in row_modes)
        self.col_modes = tuple(int(m) for m in col_modes)
        self.tshape = tuple(int(s) for s in tshape)

    def tree_flatten(self):
        return (self.vals, self.row_idx, self.col_idx), (
            self.row_modes,
            self.col_modes,
            self.tshape,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.vals, obj.row_idx, obj.col_idx = children
        obj.row_modes, obj.col_modes, obj.tshape = aux
        return obj

    @property
    def shape(self):
        nr = 1
        for m in self.row_modes:
            nr *= self.tshape[m]
        nc = 1
        for m in self.col_modes:
            nc *= self.tshape[m]
        return (nr, nc)

    @property
    def nnz(self):
        return self.vals.shape[0]

    def double(self) -> jnp.ndarray:
        """Dense matrix — ``@sptenmat/double.m`` (duplicates accumulate)."""
        out = jnp.zeros(self.shape, self.vals.dtype)
        return out.at[self.row_idx, self.col_idx].add(self.vals)

    def to_sptensor(self) -> SpTensor:
        """Invert the matricization back to COO tensor coordinates."""
        row_shape = tuple(self.tshape[m] for m in self.row_modes)
        col_shape = tuple(self.tshape[m] for m in self.col_modes)
        subs = jnp.zeros(
            (self.vals.shape[0], len(self.tshape)), self.row_idx.dtype
        )
        if self.row_modes:
            rsub = _sp.sp_ind2sub(self.row_idx, row_shape)
            subs = subs.at[:, jnp.array(self.row_modes)].set(rsub)
        if self.col_modes:
            csub = _sp.sp_ind2sub(self.col_idx, col_shape)
            subs = subs.at[:, jnp.array(self.col_modes)].set(csub)
        return SpTensor(self.vals, subs, self.tshape)

    def __repr__(self):
        return f"SpTenMat(shape={self.shape}, nnz={self.nnz})"
