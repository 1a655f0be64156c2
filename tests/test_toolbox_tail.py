"""Long-tail Tensor Toolbox class methods (round-5 widening).

Pins the per-class method files that VERDICT r4 flagged as the remaining
"partial" inventory row: every method here is checked against a dense
numpy oracle (densify → apply the dense definition → compare), so the
sparse/Kruskal/Tucker structure-exploiting paths are verified, not just
exercised. Reference files cited per test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.ops.classes import (
    KTensor,
    SpTenMat,
    SpTensor,
    SumTensor,
    SymKTensor,
    SymTensor,
    TenMat,
    Tensor,
    TTensor,
)
from tritd_tpu.ops import tenutils as tu

RNG = np.random.default_rng(7)


def _rand_sp(shape, nnz):
    coords = np.stack(
        [RNG.integers(0, s, size=nnz) for s in shape], axis=1
    ).astype(np.int32)
    vals = RNG.standard_normal(nnz).astype(np.float32)
    return SpTensor(vals, coords, shape)


@pytest.fixture(scope="module")
def sp():
    return _rand_sp((4, 3, 5), 9)


@pytest.fixture(scope="module")
def kt():
    u = [RNG.standard_normal((s, 3)).astype(np.float32) for s in (4, 3, 5)]
    return KTensor(u, RNG.standard_normal(3).astype(np.float32))


@pytest.fixture(scope="module")
def tt():
    core = RNG.standard_normal((2, 3, 2)).astype(np.float32)
    u = [RNG.standard_normal((s, r)).astype(np.float32) for s, r in ((4, 2), (3, 3), (5, 2))]
    return TTensor(core, u)


# ---------------------------------------------------------------- @tensor


def test_tensor_mttkrps_matches_per_mode():
    """@tensor/mttkrps.m == the sequence of single-mode mttkrp calls."""
    x = Tensor(RNG.standard_normal((4, 3, 5)).astype(np.float32))
    us = [RNG.standard_normal((s, 2)).astype(np.float32) for s in (4, 3, 5)]
    seq = x.mttkrps(us)
    for n, m in enumerate(seq):
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(x.mttkrp(us, n)), rtol=1e-5
        )


def test_tensor_with_set_subsasgn():
    """@tensor/subsasgn.m — functional X(idx)=v."""
    x = Tensor(np.zeros((3, 3), np.float32))
    y = x.with_set((1, 2), 5.0)
    assert np.asarray(y.data)[1, 2] == 5.0
    assert np.asarray(x.data)[1, 2] == 0.0  # immutable


# -------------------------------------------------------------- @sptensor


def test_sptensor_comparisons_and_logicals(sp):
    """@sptensor/{eq,ne,lt,gt,and,or,not,xor}.m vs the dense truth."""
    d = np.asarray(sp.double())
    np.testing.assert_array_equal(np.asarray((sp == 0).data), d == 0)
    np.testing.assert_array_equal(np.asarray((sp != 0).data), d != 0)
    np.testing.assert_array_equal(np.asarray((sp > 0).data), d > 0)
    np.testing.assert_array_equal(np.asarray((sp <= 0).data), d <= 0)
    other = _rand_sp(sp.shape, 5)
    od = np.asarray(other.double())
    np.testing.assert_array_equal(
        np.asarray(sp.logical_and(other).data), (d != 0) & (od != 0)
    )
    np.testing.assert_array_equal(
        np.asarray(sp.logical_xor(other).data), (d != 0) ^ (od != 0)
    )
    np.testing.assert_array_equal(np.asarray(sp.logical_not().data), d == 0)
    assert bool(sp.isequal(SpTensor(sp.vals, sp.coords, sp.shape)))
    assert not sp.isscalar()


def test_sptensor_getitem_and_with_set(sp):
    """@sptensor/{subsref,subsasgn}.m — single-entry lookup + replace."""
    d = np.asarray(sp.double())
    i, j, k = (int(c) for c in np.asarray(sp.coords)[0])
    assert np.isclose(float(sp[i, j, k]), d[i, j, k])
    # negative ('end') indexing densifies consistently
    np.testing.assert_allclose(np.asarray(sp[-1].data), d[-1])
    y = sp.with_set([[i, j, k]], [99.0])
    assert np.isclose(float(y[i, j, k]), 99.0)  # replaced, not accumulated
    np.testing.assert_allclose(np.asarray(y.double())[0, 0, 0], d[0, 0, 0])


def test_sptensor_collapse_contract_scale(sp):
    """@sptensor/{collapse,contract,scale}.m vs dense oracles."""
    d = np.asarray(sp.double())
    np.testing.assert_allclose(
        np.asarray(sp.collapse((1,)).data), d.sum(axis=1), rtol=1e-5
    )
    assert np.isclose(float(sp.collapse()), d.sum(), rtol=1e-5)
    # max reducer densifies but must agree
    np.testing.assert_allclose(
        np.asarray(sp.collapse((0,), fun=jnp.max).data), d.max(axis=0)
    )
    cub = _rand_sp((4, 4, 3), 8)
    dc = np.asarray(cub.double())
    np.testing.assert_allclose(
        np.asarray(cub.contract(0, 1).data), np.einsum("iik->k", dc), rtol=1e-5
    )
    s = RNG.standard_normal(3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sp.scale(s, 1).double()), d * s[None, :, None], rtol=1e-5
    )


def test_sptensor_divide_by_ktensor(sp, kt):
    """@sptensor/divide.m:23-35 — elementwise X/K at the stored nonzeros."""
    kd = np.abs(np.asarray(kt.double())) + 0.5  # nonnegative ktensor
    kpos = KTensor([np.abs(np.asarray(u)) for u in kt.factors],
                   np.abs(np.asarray(kt.weights)))
    kfull = np.asarray(kpos.double())
    out = sp.divide(kpos)
    coords = np.asarray(sp.coords)
    expect = np.asarray(sp.vals) / np.maximum(
        kfull[tuple(coords.T)], 1e-10
    )
    np.testing.assert_allclose(np.asarray(out.vals), expect, rtol=1e-4)
    del kd


def test_sptensor_mask_nvecs_ones_spmatrix(sp):
    d = np.asarray(sp.double())
    w = _rand_sp(sp.shape, 4)
    np.testing.assert_allclose(
        np.asarray(sp.mask(w)), d[tuple(np.asarray(w.coords).T)], rtol=1e-6
    )
    # nvecs spans the same leading subspace as the dense path
    v_sp = np.asarray(sp.nvecs(0, 2))
    v_dense = np.asarray(tu.nvecs(sp.double(), 0, 2))
    np.testing.assert_allclose(np.abs(v_sp), np.abs(v_dense), atol=1e-5)
    assert np.all(np.asarray(sp.ones().vals) == 1)
    two = _rand_sp((4, 6), 5)
    np.testing.assert_allclose(np.asarray(two.spmatrix()), np.asarray(two.double()))


def test_sptensor_reshape_squeeze(sp):
    d = np.asarray(sp.double())
    r = sp.reshape((2, 2, 15))
    np.testing.assert_allclose(np.asarray(r.double()), d.reshape(2, 2, 15))
    s3 = SpTensor(sp.vals, np.asarray(sp.coords) * [1, 0, 1], (4, 1, 5))
    sq = s3.squeeze()
    assert sq.shape == (4, 5)


def test_sptensor_ttm_matches_dense(sp):
    """@sptensor/ttm.m — scatter-GEMM vs dense ttm, single + multi mode."""
    d = sp.double()
    u0 = RNG.standard_normal((6, 4)).astype(np.float32)
    u1 = RNG.standard_normal((2, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sp.ttm(u0, 0).data),
        np.asarray(tu.ttm(d, jnp.asarray(u0), 0)),
        rtol=1e-4, atol=1e-5,
    )
    got = sp.ttm([u0, u1], [0, 1]).data
    want = tu.ttm(tu.ttm(d, jnp.asarray(u0), 0), jnp.asarray(u1), 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    # transpose flag
    np.testing.assert_allclose(
        np.asarray(sp.ttm(u0.T, 0, transpose=True).data),
        np.asarray(tu.ttm(d, jnp.asarray(u0), 0)),
        rtol=1e-4, atol=1e-5,
    )


def test_sptensor_ttt_outer_and_contracted(sp):
    a = _rand_sp((2, 3), 4)
    b = _rand_sp((4, 2), 3)
    outer = a.ttt(b)
    assert isinstance(outer, SpTensor)
    np.testing.assert_allclose(
        np.asarray(outer.double()),
        np.multiply.outer(np.asarray(a.double()), np.asarray(b.double())),
        rtol=1e-5,
    )
    inner = a.ttt(b, adims=[0], bdims=[1])
    want = np.einsum("ij,ki->jk", np.asarray(a.double()), np.asarray(b.double()))
    np.testing.assert_allclose(np.asarray(inner.data), want, rtol=1e-5)


def test_sptensor_new_methods_jit(sp):
    """collapse/contract/scale/ttm/divide are jittable (static nnz)."""
    u = jnp.asarray(RNG.standard_normal((6, 4)).astype(np.float32))

    @jax.jit
    def f(t, u):
        return t.ttm(u, 0).data.sum() + t.collapse((0,)).data.sum()

    out = f(sp, u)
    assert np.isfinite(float(out))


# --------------------------------------------------------------- @ktensor


def test_ktensor_extract_tocell_update(kt):
    ex = kt.extract([0, 2])
    assert ex.ncomponents() == 2
    np.testing.assert_allclose(
        np.asarray(ex.weights), np.asarray(kt.weights)[[0, 2]]
    )
    assert len(kt.tocell()) == 3
    # update round-trips through tovec (the optimization interface)
    vec = kt.tovec()
    again = kt.update([-1, 0, 1, 2], vec)
    np.testing.assert_allclose(np.asarray(again.double()), np.asarray(kt.double()), rtol=1e-5)


def test_ktensor_mask_entries(kt, sp):
    w = _rand_sp(kt.shape, 6)
    got = kt.mask(w)
    want = np.asarray(kt.double())[tuple(np.asarray(w.coords).T)]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_ktensor_nvecs_matches_dense(kt):
    v_small = np.asarray(kt.nvecs(1, 2))
    v_dense = np.asarray(tu.nvecs(jnp.asarray(kt.double()), 1, 2))
    np.testing.assert_allclose(np.abs(v_small), np.abs(v_dense), atol=1e-4)


def test_ktensor_times_and_predicates(kt, sp):
    d = np.asarray(kt.double())
    sp4 = _rand_sp(kt.shape, 5)
    prod = kt.times(sp4)
    assert isinstance(prod, SpTensor)
    np.testing.assert_allclose(
        np.asarray(prod.double()),
        d * np.asarray(sp4.double()),
        rtol=1e-4, atol=1e-5,
    )
    assert bool(kt.isequal(KTensor([np.asarray(u) for u in kt.factors], kt.weights)))
    assert not kt.isscalar()


def test_ktensor_ttm_symmetrize():
    u = [RNG.standard_normal((4, 2)).astype(np.float32) for _ in range(3)]
    kt3 = KTensor(u, np.array([1.5, -0.5], np.float32))
    v = RNG.standard_normal((6, 4)).astype(np.float32)
    got = kt3.ttm(v, 1)
    want = tu.ttm(jnp.asarray(kt3.double()), jnp.asarray(v), 1)
    np.testing.assert_allclose(np.asarray(got.double()), np.asarray(want), rtol=1e-4, atol=1e-5)
    sym = kt3.symmetrize()
    assert bool(sym.issymmetric())
    # symmetrize of an already-symmetric ktensor is a fixed point in value,
    # including negative weights at EVEN order (sign lives in lambda — a
    # sign^(1/n) spread across factors would cancel for even n)
    ktsym = KTensor([u[0]] * 3, np.array([1.0, 2.0], np.float32))
    np.testing.assert_allclose(
        np.asarray(ktsym.symmetrize().double()),
        np.asarray(ktsym.double()),
        rtol=1e-4, atol=1e-5,
    )
    u4 = RNG.standard_normal((3, 2)).astype(np.float32)
    kt4 = KTensor([u4] * 4, np.array([1.0, -2.0], np.float32))
    np.testing.assert_allclose(
        np.asarray(kt4.symmetrize().double()),
        np.asarray(kt4.double()),
        rtol=1e-4, atol=1e-5,
    )


# --------------------------------------------------------------- @ttensor


def test_ttensor_scalar_ops_permute_entry(tt):
    d = np.asarray(tt.double())
    np.testing.assert_allclose(np.asarray((-tt).double()), -d, rtol=1e-5)
    np.testing.assert_allclose(np.asarray((tt * 2.0).double()), 2 * d, rtol=1e-5)
    p = tt.permute((2, 0, 1))
    np.testing.assert_allclose(
        np.asarray(p.double()), np.transpose(d, (2, 0, 1)), rtol=1e-4, atol=1e-5
    )
    assert np.isclose(float(tt[1, 2, 3]), d[1, 2, 3], rtol=1e-4)
    assert bool(tt.isequal(TTensor(tt.core, [np.asarray(u) for u in tt.factors])))
    assert not tt.isscalar()


def test_ttensor_nvecs_matches_dense(tt):
    v_small = np.asarray(tt.nvecs(0, 2))
    v_dense = np.asarray(tu.nvecs(jnp.asarray(tt.double()), 0, 2))
    np.testing.assert_allclose(np.abs(v_small), np.abs(v_dense), atol=1e-4)


# ------------------------------------------------- @tenmat / @sptenmat


def test_tenmat_indexing_and_with_set():
    x = RNG.standard_normal((3, 4, 2)).astype(np.float32)
    tm = TenMat.from_tensor(x, (0,))
    assert np.isclose(float(tm[1, 5]), float(np.asarray(tm.data)[1, 5]))
    y = tm.with_set((0, 0), 7.0)
    assert float(np.asarray(y.data)[0, 0]) == 7.0
    np.testing.assert_allclose(
        np.asarray(y.to_tensor().data).ravel()[0], 7.0
    )


def test_sptenmat_aatx_full_norm(sp):
    am = sp.to_sptenmat((0,))
    a = np.asarray(am.double())
    x = RNG.standard_normal(a.shape[0]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(am.aatx(x)), a @ (a.T @ x), rtol=1e-4, atol=1e-4
    )
    assert np.isclose(float(am.norm()), np.linalg.norm(a), rtol=1e-5)
    ftm = am.full()
    assert isinstance(ftm, TenMat)
    np.testing.assert_allclose(np.asarray(ftm.data), a)
    assert am.tsize() == sp.shape
    np.testing.assert_allclose(np.asarray((-am).double()), -a)


# ------------------------------------------- @symtensor / @symktensor


def test_symtensor_indices_vals_and_elementwise():
    x = SymTensor(RNG.standard_normal((3, 3, 3)).astype(np.float32))
    subs = x.indices()
    # C(n+m-1, m) distinct monomials for n=3, m=3 → 10
    assert subs.shape == (10, 3)
    assert np.all(np.diff(subs, axis=1) >= 0)
    np.testing.assert_allclose(
        np.asarray(x.vals()), np.asarray(x.data)[tuple(subs.T)]
    )
    d = np.asarray(x.data)
    np.testing.assert_allclose(np.asarray((x + x).data), 2 * d, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((x * 3.0).data), 3 * d, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((-x).data), -d)
    np.testing.assert_array_equal(np.asarray((x > 0).data), d > 0)
    np.testing.assert_array_equal(
        np.asarray(x.logical_not().data), d == 0
    )
    assert bool(x.isequal(SymTensor(d, presymmetrized=True)))
    got = x.tenfun(lambda a, b: a + 2 * b, x)
    np.testing.assert_allclose(np.asarray(got.data), 3 * d, rtol=1e-6)
    assert np.isclose(float(x[0, 1, 2]), d[0, 1, 2])


def test_symktensor_normalize_arrange_entry_score():
    u = RNG.standard_normal((4, 3)).astype(np.float32)
    lam = np.array([2.0, -1.0, 0.5], np.float32)
    k = SymKTensor(lam, u, 3)
    kn = k.normalize()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(kn.u), axis=0), np.ones(3), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kn.full().data), np.asarray(k.full().data), rtol=1e-4, atol=1e-5
    )
    ka = k.arrange()
    w = np.abs(np.asarray(ka.weights))
    assert np.all(np.diff(w) <= 1e-6)
    d = np.asarray(k.full().data)
    assert np.isclose(float(k.entry([1, 2, 3])), d[1, 2, 3], rtol=1e-4)
    assert float(k.score(k)) > 0.99
    # tovec/from_vec round trip
    k2 = SymKTensor.from_vec(k.tovec(), 4, 3, 3)
    np.testing.assert_allclose(np.asarray(k2.u), np.asarray(k.u))
    assert k.permute((0, 1, 2)) is k
    assert k.ncomponents() == 3 and k.ndim == 3 and k.issymmetric()


def test_symktensor_fg_matches_dense_objective_and_autodiff():
    """@symktensor/fg.m:60-76 fast path vs the dense definition: F must
    equal ‖A − full(M)‖² and G must equal JAX autodiff of that F."""
    n, p, m = 3, 2, 3
    a = SymTensor(np.asarray(RNG.standard_normal((n,) * m), np.float64))
    lam = jnp.asarray(RNG.standard_normal(p))
    u = jnp.asarray(RNG.standard_normal((n, p)))
    model = SymKTensor(lam, u, m)
    data = model.fg_setup(a)
    f, g = model.fg(data)
    dense_f = float(
        jnp.sum((a.data - SymKTensor(lam, u, m).full().data) ** 2)
    )
    # f32 under the CPU test config (conftest does not enable x64): the
    # Gram-identity F and the dense F agree to float32 roundoff
    assert np.isclose(float(f), dense_f, rtol=1e-5)

    def obj(vec):
        mk = SymKTensor.from_vec(vec, n, p, m)
        return jnp.sum((a.data - mk.full().data) ** 2)

    g_auto = jax.grad(obj)(model.tovec())
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_auto), rtol=1e-4, atol=1e-4
    )


# ----------------------------------------------------- audit completeness


def test_toolbox_method_map_is_complete_and_resolves():
    """docs/TOOLBOX_PARITY.md's map: every reference @class/*.m file is
    mapped and every mapped repo symbol resolves (tools/toolbox_audit.py)."""
    import importlib.util
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "toolbox_audit", repo / "tools" / "toolbox_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not mod.REF.is_dir():
        pytest.skip("reference toolbox not present")
    rows, n_impl, n_na, problems = mod.audit()
    assert problems == []
    assert n_impl >= 249
    # the committed doc is in sync with the mapping
    doc = (repo / "docs" / "TOOLBOX_PARITY.md").read_text()
    assert f"{n_impl} methods implemented, {n_na} justified n/a" in doc


# ------------------------------------------------------------ @sumtensor


def test_sumtensor_mttkrp_ttv(kt, sp, tt):
    x = Tensor(RNG.standard_normal((4, 3, 5)).astype(np.float32))
    st = SumTensor([x, kt, sp])
    dense = np.asarray(st.full().data)
    us = [RNG.standard_normal((s, 2)).astype(np.float32) for s in (4, 3, 5)]
    got = np.asarray(st.mttkrp(us, 1))
    want = np.asarray(Tensor(dense).mttkrp(us, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    vs = [RNG.standard_normal(s).astype(np.float32) for s in (4, 3, 5)]
    got_ttv = np.asarray(st.ttv(vs))
    want_ttv = np.asarray(tu.ttv(jnp.asarray(dense), vs))
    np.testing.assert_allclose(got_ttv, want_ttv, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray((-st).full().data), -dense, rtol=1e-5
    )
    assert not st.isscalar()
