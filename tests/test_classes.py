"""Tensor Toolbox class-surface tests (`tritd_tpu.ops.classes`): operator
overloads vs numpy oracles, method results vs the functional kernels, and
pytree flow through jit — the class layer must be transparent to XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.ops import (
    KTensor,
    SpTenMat,
    SpTensor,
    SumTensor,
    SymKTensor,
    SymTensor,
    TenMat,
    Tensor,
    TTensor,
    collapse,
    contract,
    khatrirao,
    ktensor_full,
    mttkrp,
    nvecs,
    scale,
    sptenrand,
    ttm,
    ttt,
    ttv,
)


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.PRNGKey(1), (4, 5, 6))


@pytest.fixture(scope="module")
def y():
    return jax.random.normal(jax.random.PRNGKey(2), (4, 5, 6))


# ------------------------------------------------------------ free functions


def test_ttt_outer_contracted_inner(x, y):
    outer = ttt(x[:, :, 0], y[0, :, :])
    np.testing.assert_allclose(
        outer, np.multiply.outer(np.asarray(x[:, :, 0]), np.asarray(y[0, :, :])),
        rtol=1e-6,
    )
    contracted = ttt(x, y, adims=(1, 2))  # sum over modes 1,2 of both
    oracle = jnp.einsum("ajk,bjk->ab", x, y)
    np.testing.assert_allclose(contracted, oracle, rtol=1e-5)
    inner = ttt(x, y, adims=(0, 1, 2))
    np.testing.assert_allclose(inner, jnp.vdot(x, y), rtol=1e-5)


def test_ttt_mixed_dims(x):
    # contract a's mode 2 against b's mode 0
    b = jax.random.normal(jax.random.PRNGKey(3), (6, 3))
    out = ttt(x, b, adims=2, bdims=0)
    np.testing.assert_allclose(out, jnp.einsum("ijk,kl->ijl", x, b), rtol=1e-5)


def test_nvecs_spans_leading_subspace(x):
    u = nvecs(x, 0, 2)
    xn = np.asarray(x).reshape(4, -1)
    _, _, _ = np.linalg.svd(xn, full_matrices=False)
    u_svd = np.linalg.svd(xn, full_matrices=False)[0][:, :2]
    # same subspace: |u^T u_svd| should be identity up to sign
    overlap = np.abs(np.asarray(u).T @ u_svd)
    np.testing.assert_allclose(overlap, np.eye(2), atol=1e-4)
    # flipsign convention: largest-|.| entry of each column positive
    mx = np.argmax(np.abs(np.asarray(u)), axis=0)
    assert all(np.asarray(u)[mx[j], j] > 0 for j in range(2))


def test_collapse_contract_scale(x):
    np.testing.assert_allclose(
        collapse(x, 1), np.asarray(x).sum(axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(
        collapse(x, (0, 2), jnp.max), np.asarray(x).max(axis=(0, 2)), rtol=1e-6
    )
    assert collapse(x).shape == ()
    # negative dims = toolbox exclusion convention (tt_dimscheck, r2 advisor):
    # reduce all modes EXCEPT mode 2
    np.testing.assert_allclose(
        collapse(x, -2), np.asarray(x).sum(axis=(0, 1)), rtol=1e-5
    )
    sq = x[:, :4, :]  # (4,4,6): contract modes 0,1
    np.testing.assert_allclose(
        contract(sq, 0, 1), np.trace(np.asarray(sq), axis1=0, axis2=1), rtol=1e-5
    )
    s = jnp.arange(1.0, 6.0)
    np.testing.assert_allclose(
        scale(x, s, 1), np.asarray(x) * np.asarray(s)[None, :, None], rtol=1e-6
    )
    # unordered dims: s indexed (mode2, mode0)
    s2 = jax.random.normal(jax.random.PRNGKey(4), (6, 4))
    np.testing.assert_allclose(
        scale(x, s2, (2, 0)),
        np.asarray(x) * np.asarray(s2).T[:, None, :],
        rtol=1e-6,
    )
    with pytest.raises(ValueError):
        contract(x, 0, 1)  # unequal sizes
    with pytest.raises(ValueError):
        scale(x, s, 0)  # size mismatch


def test_tensor_find_divide_end_indexing():
    """`@tensor/{find,mldivide,mrdivide,end}.m` surface (r2 verdict #9)."""
    from tritd_tpu.ops.classes import SpTensor, Tensor

    arr = np.zeros((3, 4, 2), np.float32)
    arr[1, 2, 0] = 5.0
    arr[2, 0, 1] = -3.0
    t = Tensor(jnp.asarray(arr))
    subs, vals = t.find()
    assert sorted(map(tuple, subs.tolist())) == [(1, 2, 0), (2, 0, 1)]
    np.testing.assert_allclose(sorted(vals), [-3.0, 5.0])
    np.testing.assert_allclose(np.asarray(t.mldivide(2.0)), arr / 2.0)
    np.testing.assert_allclose(np.asarray(t.mrdivide(2.0)), arr / 2.0)
    # MATLAB X(end,:,:) == Python X[-1]
    np.testing.assert_allclose(np.asarray(t[-1]), arr[-1])
    sp = SpTensor(
        jnp.asarray([5.0, -3.0]),
        jnp.asarray([[1, 2, 0], [2, 0, 1]]),
        (3, 4, 2),
    )
    c, v = sp.find()
    np.testing.assert_allclose(np.asarray(c), [[1, 2, 0], [2, 0, 1]])
    np.testing.assert_allclose(np.asarray(v), [5.0, -3.0])


# ------------------------------------------------------------------- Tensor


def test_tensor_arithmetic_and_comparisons(x, y):
    a, b = Tensor(x), Tensor(y)
    np.testing.assert_allclose((a + b).data, x + y)
    np.testing.assert_allclose((a - 2.0).data, x - 2.0)
    np.testing.assert_allclose((3.0 * a).data, 3.0 * x)
    np.testing.assert_allclose((a * b).data, x * y)  # elementwise, like times.m
    np.testing.assert_allclose((a / (abs(b) + 1)).data, x / (jnp.abs(y) + 1))
    np.testing.assert_allclose((-a).data, -x)
    np.testing.assert_allclose((a**2).data, x**2)
    assert bool(jnp.all((a == a).data))
    assert (a < b).data.dtype == jnp.bool_
    assert bool(a.isequal(Tensor(x)))
    assert not bool(a.isequal(b))
    assert a[1:3, :, 0].shape == (2, 5)
    np.testing.assert_allclose(a.permute((2, 0, 1)).data, jnp.transpose(x, (2, 0, 1)))
    assert Tensor(x[:, :1, :]).squeeze().shape == (4, 6)


def test_tensor_methods_match_functional(x):
    t = Tensor(x)
    np.testing.assert_allclose(t.norm(), jnp.linalg.norm(x.ravel()), rtol=1e-6)
    u = jax.random.normal(jax.random.PRNGKey(5), (3, 5))
    np.testing.assert_allclose(t.ttm(u, 1).data, ttm(x, u, 1), rtol=1e-6)
    v = jax.random.normal(jax.random.PRNGKey(6), (5,))
    np.testing.assert_allclose(t.ttv(v, 1).data, ttv(x, v, 1), rtol=1e-6)
    fs = [jax.random.normal(jax.random.PRNGKey(10 + i), (s, 3)) for i, s in enumerate(x.shape)]
    np.testing.assert_allclose(t.mttkrp(fs, 0), mttkrp(x, fs, 0), rtol=1e-5)
    np.testing.assert_allclose(t.innerprod(Tensor(x)), jnp.vdot(x, x), rtol=1e-5)
    np.testing.assert_allclose(
        t.tenfun(jnp.maximum, Tensor(-x)).data, jnp.maximum(x, -x)
    )
    w = (x > 0).astype(x.dtype)
    np.testing.assert_allclose(t.mask(w), x.ravel()[np.asarray(w.ravel()) > 0])


def test_tensor_is_a_pytree(x):
    @jax.jit
    def f(t: Tensor) -> Tensor:
        return (t * 2.0 + 1.0).permute((1, 0, 2))

    out = f(Tensor(x))
    assert isinstance(out, Tensor)
    np.testing.assert_allclose(out.data, jnp.transpose(2 * x + 1, (1, 0, 2)))


# ----------------------------------------------------------------- SpTensor


@pytest.fixture(scope="module")
def sp():
    vals, coords, shape = sptenrand(jax.random.PRNGKey(7), (5, 6, 7), 30)
    return SpTensor(vals, coords, shape)


def test_sptensor_roundtrip_and_numerics(sp):
    dense = sp.double()
    np.testing.assert_allclose(sp.norm(), jnp.linalg.norm(dense.ravel()), rtol=1e-5)
    np.testing.assert_allclose(sp.innerprod(Tensor(dense)), jnp.vdot(dense, dense), rtol=1e-5)
    fs = [jax.random.normal(jax.random.PRNGKey(20 + i), (s, 2)) for i, s in enumerate(sp.shape)]
    np.testing.assert_allclose(sp.mttkrp(fs, 1), mttkrp(dense, fs, 1), rtol=1e-4)
    v = jax.random.normal(jax.random.PRNGKey(8), (6,))
    np.testing.assert_allclose(sp.ttv(v, 1).data, ttv(dense, v, 1), rtol=1e-5)


def test_sptensor_arithmetic(sp):
    dense = sp.double()
    np.testing.assert_allclose((2.0 * sp).double(), 2.0 * dense, rtol=1e-6)
    np.testing.assert_allclose((sp + sp).double(), 2.0 * dense, rtol=1e-6)
    np.testing.assert_allclose((sp - sp).double(), jnp.zeros_like(dense), atol=1e-6)
    np.testing.assert_allclose(abs(sp).double(), jnp.abs(dense), rtol=1e-6)
    np.testing.assert_allclose((sp * sp).double(), dense * dense, rtol=1e-5)
    np.testing.assert_allclose(
        sp.permute((2, 0, 1)).double(), jnp.transpose(dense, (2, 0, 1)), rtol=1e-6
    )
    co = (sp + sp).coalesce()
    assert co.nnz <= 2 * sp.nnz
    np.testing.assert_allclose(co.double(), 2.0 * dense, rtol=1e-5)


def test_sptenmat_roundtrip(sp):
    m = sp.to_sptenmat((2, 0))
    assert isinstance(m, SpTenMat)
    dense = sp.double()
    np.testing.assert_allclose(
        m.double(),
        jnp.transpose(dense, (2, 0, 1)).reshape(7 * 5, 6),
        rtol=1e-6,
    )
    back = m.to_sptensor()
    np.testing.assert_allclose(back.double(), dense, rtol=1e-6)


# ------------------------------------------------------------------ KTensor


@pytest.fixture(scope="module")
def kt():
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    fs = [jax.random.normal(k, (s, 3)) for k, s in zip(keys[:3], (4, 5, 6))]
    w = jnp.abs(jax.random.normal(keys[3], (3,))) + 0.5
    return KTensor(fs, w)


def test_ktensor_numerics(kt, x):
    dense = kt.double()
    np.testing.assert_allclose(kt.norm(), jnp.linalg.norm(dense.ravel()), rtol=1e-4)
    np.testing.assert_allclose(kt.innerprod(Tensor(x)), jnp.vdot(dense, x), rtol=1e-4)
    np.testing.assert_allclose(kt.innerprod(kt), jnp.vdot(dense, dense), rtol=1e-4)
    fs = [jax.random.normal(jax.random.PRNGKey(30 + i), (s, 2)) for i, s in enumerate(kt.shape)]
    np.testing.assert_allclose(kt.mttkrp(fs, 2), mttkrp(dense, fs, 2), rtol=1e-4)
    v = jax.random.normal(jax.random.PRNGKey(31), (5,))
    np.testing.assert_allclose(kt.ttv(v, 1).double(), ttv(dense, v, 1), rtol=1e-4)
    full_contract = kt.ttv(
        [jnp.ones((4,)), jnp.ones((5,)), jnp.ones((6,))], (0, 1, 2)
    )
    np.testing.assert_allclose(full_contract, dense.sum(), rtol=1e-4)


def test_ktensor_transforms_preserve_full(kt):
    dense = kt.double()
    for transformed in (kt.normalize(), kt.arrange(), kt.fixsigns(), kt.redistribute(1)):
        np.testing.assert_allclose(transformed.double(), dense, rtol=1e-4)
    assert kt.arrange().weights[0] >= kt.arrange().weights[-1]
    perm = kt.permute((2, 1, 0))
    np.testing.assert_allclose(
        perm.double(), jnp.transpose(dense, (2, 1, 0)), rtol=1e-4, atol=1e-6
    )
    s = kt.score(kt)
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_ktensor_plus_concat_and_vec_roundtrip(kt):
    both = kt + kt
    assert both.ncomponents() == 6
    np.testing.assert_allclose(both.double(), 2 * kt.double(), rtol=1e-4)
    np.testing.assert_allclose((kt - kt).double(), jnp.zeros(kt.shape), atol=1e-4)
    np.testing.assert_allclose((2.0 * kt).double(), 2 * kt.double(), rtol=1e-4)
    vec = kt.tovec()
    back = KTensor.from_vec(vec, kt.shape, kt.ncomponents())
    np.testing.assert_allclose(back.double(), kt.double(), rtol=1e-5)


def test_ktensor_jit_flow(kt):
    @jax.jit
    def f(k: KTensor):
        return k.normalize().norm()

    np.testing.assert_allclose(f(kt), kt.norm(), rtol=1e-4)


# ------------------------------------------------------------------ TTensor


@pytest.fixture(scope="module")
def tt():
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    core = jax.random.normal(keys[0], (2, 3, 2))
    fs = [
        jax.random.normal(k, (s, r))
        for k, s, r in zip(keys[1:], (4, 5, 6), (2, 3, 2))
    ]
    return TTensor(core, fs)


def test_ttensor_numerics(tt, x):
    dense = tt.double()
    np.testing.assert_allclose(tt.norm(), jnp.linalg.norm(dense.ravel()), rtol=1e-4)
    np.testing.assert_allclose(tt.innerprod(Tensor(x)), jnp.vdot(dense, x), rtol=1e-4)
    u = jax.random.normal(jax.random.PRNGKey(12), (7, 5))
    np.testing.assert_allclose(tt.ttm(u, 1).double(), ttm(dense, u, 1), rtol=1e-4)
    v = jax.random.normal(jax.random.PRNGKey(13), (5,))
    np.testing.assert_allclose(tt.ttv(v, 1).double(), ttv(dense, v, 1), rtol=1e-4)
    all_v = [jnp.ones((s,)) for s in tt.shape]
    np.testing.assert_allclose(tt.ttv(all_v, (0, 1, 2)), dense.sum(), rtol=1e-4)
    fs = [jax.random.normal(jax.random.PRNGKey(40 + i), (s, 2)) for i, s in enumerate(tt.shape)]
    np.testing.assert_allclose(tt.mttkrp(fs, 0), mttkrp(dense, fs, 0), rtol=1e-4)


# ------------------------------------------------- SymTensor / SymKTensor


def test_symtensor_and_symktensor():
    a = jax.random.normal(jax.random.PRNGKey(14), (4, 4, 4))
    st = SymTensor(a)
    assert bool(st.issymmetric())
    v = jax.random.normal(jax.random.PRNGKey(15), (4,))
    g = st.ttsv(v, keep=1)
    assert g.shape == (4,)

    u = jax.random.normal(jax.random.PRNGKey(16), (4, 2))
    w = jnp.array([1.5, -0.5])
    sk = SymKTensor(w, u, 3)
    dense = sk.double()
    oracle = jnp.einsum("ir,jr,kr,r->ijk", u, u, u, w)
    np.testing.assert_allclose(dense, oracle, rtol=1e-5)
    np.testing.assert_allclose(sk.norm(), jnp.linalg.norm(dense.ravel()), rtol=1e-4)
    assert bool(sk.full().issymmetric())


# ---------------------------------------------------------------- SumTensor


def test_sumtensor_mixed_parts(kt, sp, x):
    st = SumTensor([Tensor(jnp.zeros(kt.shape))])
    st = st + kt
    assert len(st.parts) == 2
    np.testing.assert_allclose(st.double(), kt.double(), rtol=1e-5)
    probe = Tensor(jnp.ones(kt.shape))
    np.testing.assert_allclose(
        st.innerprod(probe), kt.double().sum(), rtol=1e-4
    )
    np.testing.assert_allclose(st.norm(), kt.norm(), rtol=1e-4)


# ------------------------------------------------------------------- TenMat


def test_tenmat_roundtrip_and_transpose(x):
    m = TenMat.from_tensor(x, (2, 0))
    assert m.shape == (6 * 4, 5)
    assert m.tsize() == (4, 5, 6)
    np.testing.assert_allclose(m.to_tensor().data, x, rtol=1e-6)
    mt = m.T
    assert mt.shape == (5, 24)
    np.testing.assert_allclose(mt.to_tensor().data, x, rtol=1e-6)
    np.testing.assert_allclose(m.norm(), jnp.linalg.norm(x.ravel()), rtol=1e-6)
    np.testing.assert_allclose((m - m).double(), jnp.zeros(m.shape), atol=1e-7)
    np.testing.assert_allclose((m + m).double(), 2 * m.double(), rtol=1e-6)


def test_tenmat_mtimes(x, y):
    # A: rows=(0,), cols=(1,2); B = A' -> product is the mode-0 Gram,
    # a TenMat whose tensor shape is (4, 4) per @tenmat/mtimes.m tsize rule
    a = TenMat.from_tensor(x, (0,))
    prod = a * a.T
    assert isinstance(prod, TenMat)
    assert prod.tsize() == (4, 4)
    xn = np.asarray(x).reshape(4, -1)
    np.testing.assert_allclose(prod.double(), xn @ xn.T, rtol=1e-5)
    scaled = 2.0 * a
    np.testing.assert_allclose(scaled.double(), 2 * a.double(), rtol=1e-6)


def test_tensor_to_tenmat_and_jit(x):
    t = Tensor(x)
    m = t.to_tenmat((1,))
    np.testing.assert_allclose(
        m.double(), jnp.transpose(x, (1, 0, 2)).reshape(5, 24), rtol=1e-6
    )

    @jax.jit
    def f(mm: TenMat):
        return (mm * 3.0).to_tensor()

    out = f(m)
    assert isinstance(out, Tensor)
    np.testing.assert_allclose(out.data, 3 * x, rtol=1e-6)
