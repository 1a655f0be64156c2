"""Tests for the extended Tensor Toolbox surface (SURVEY §2.3 class dirs and
``Contents.m:17-50`` algorithms): sparse COO ops, constructors/utilities,
ktensor/ttensor helpers, CP variants, symmetric eigen solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.ops import (
    cp_apr,
    cp_arls,
    cp_nmu,
    cp_opt,
    cp_sym,
    cp_wopt,
    create_problem_binary,
    eig_geap,
    eig_sshopm,
    export_data,
    gcp_opt,
    import_data,
    is_symmetric,
    khatrirao,
    ktensor_arrange,
    ktensor_fixsigns,
    ktensor_full,
    ktensor_innerprod,
    ktensor_norm,
    ktensor_score,
    matrandcong,
    matrandnorm,
    matrandorth,
    mttkrp,
    sp_full,
    sp_ind2sub,
    sp_innerprod,
    sp_mttkrp,
    sp_norm,
    sp_sub2ind,
    sp_ttv,
    sptendiag,
    sptenmat,
    sptenrand,
    sumtensor_full,
    symktensor_full,
    symmetrize,
    tendiag,
    teneye,
    tenmat,
    tenones,
    tenrandblk,
    tenzeros,
    ttensor_full,
    ttensor_norm,
    ttsv,
    tucker_sym,
    tucker_ttm,
)


# ------------------------------------------------------------------- sparse


class TestSparse:
    def test_sub2ind_roundtrip(self):
        shape = (3, 4, 5)
        coords = jnp.array([[0, 0, 0], [2, 3, 4], [1, 2, 3]], jnp.int32)
        idx = sp_sub2ind(coords, shape)
        back = sp_ind2sub(idx, shape)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))
        # row-major convention: last mode fastest
        assert int(idx[0]) == 0 and int(idx[1]) == 3 * 4 * 5 - 1

    def test_full_accumulates_duplicates(self):
        vals = jnp.array([1.0, 2.0, 5.0])
        coords = jnp.array([[0, 1], [0, 1], [1, 0]], jnp.int32)
        d = sp_full(vals, coords, (2, 2))
        np.testing.assert_allclose(
            np.asarray(d), np.array([[0.0, 3.0], [5.0, 0.0]])
        )

    def test_sptenrand_and_norm(self, rng_key):
        vals, coords, shape = sptenrand(rng_key, (6, 7, 8), nnz=40)
        assert vals.shape == (40,) and coords.shape == (40, 3)
        dense = sp_full(vals, coords, shape)
        np.testing.assert_allclose(
            float(sp_norm(vals, coords, shape)),
            float(jnp.linalg.norm(dense.ravel())),
            rtol=1e-6,
        )

    def test_sp_norm_large_shape_path(self, rng_key):
        # total size >> nnz triggers the sorted segment-sum path
        vals, coords, shape = sptenrand(rng_key, (30, 31, 32), nnz=10)
        # inject a duplicate coordinate
        coords = coords.at[1].set(coords[0])
        dense = sp_full(vals, coords, shape)
        np.testing.assert_allclose(
            float(sp_norm(vals, coords, shape)),
            float(jnp.linalg.norm(dense.ravel())),
            rtol=1e-6,
        )

    def test_sptendiag(self):
        v = jnp.array([1.0, 2.0, 3.0])
        vals, coords, shape = sptendiag(v)
        dense = sp_full(vals, coords, shape)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(tendiag(v)))

    def test_innerprod_matches_dense(self, rng_key):
        vals, coords, shape = sptenrand(rng_key, (5, 6, 7), nnz=25)
        other = jax.random.normal(jax.random.fold_in(rng_key, 1), shape)
        got = float(sp_innerprod(vals, coords, shape, other))
        want = float(jnp.sum(sp_full(vals, coords, shape) * other))
        # duplicates: innerprod gathers per-nonzero so duplicates also work
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_ttv_matches_dense(self, rng_key):
        vals, coords, shape = sptenrand(rng_key, (4, 5, 6), nnz=30)
        v1 = jax.random.normal(jax.random.fold_in(rng_key, 2), (5,))
        dense = sp_full(vals, coords, shape)
        got = sp_ttv(vals, coords, shape, [v1], [1])
        want = jnp.einsum("ijk,j->ik", dense, v1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
        # all-modes contraction -> scalar
        v0 = jax.random.normal(jax.random.fold_in(rng_key, 3), (4,))
        v2 = jax.random.normal(jax.random.fold_in(rng_key, 4), (6,))
        s = sp_ttv(vals, coords, shape, [v0, v1, v2], [0, 1, 2])
        np.testing.assert_allclose(
            float(s), float(jnp.einsum("ijk,i,j,k->", dense, v0, v1, v2)), rtol=1e-5
        )

    def test_sp_mttkrp_matches_dense(self, rng_key):
        vals, coords, shape = sptenrand(rng_key, (4, 5, 6), nnz=35)
        keys = jax.random.split(jax.random.fold_in(rng_key, 5), 3)
        factors = [jax.random.normal(k, (s, 3)) for k, s in zip(keys, shape)]
        dense = sp_full(vals, coords, shape)
        for mode in range(3):
            got = sp_mttkrp(vals, coords, shape, factors, mode)
            want = mttkrp(dense, factors, mode)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
            )

    def test_sptenmat_matches_tenmat(self, rng_key):
        vals, coords, shape = sptenrand(rng_key, (4, 5, 6), nnz=20)
        dense = sp_full(vals, coords, shape)
        mv, (ri, ci), (nr, nc) = sptenmat(vals, coords, shape, (1,))
        mat = jnp.zeros((nr, nc)).at[ri, ci].add(mv)
        np.testing.assert_allclose(
            np.asarray(mat), np.asarray(tenmat(dense, (1,))), rtol=1e-6
        )


# ------------------------------------------------------------- constructors


class TestConstructors:
    def test_tenzeros_ones_diag(self):
        assert float(tenzeros((2, 3)).sum()) == 0.0
        assert float(tenones((2, 3)).sum()) == 6.0
        d = tendiag(jnp.array([1.0, 2.0]), (2, 2, 2))
        assert float(d[0, 0, 0]) == 1.0 and float(d[1, 1, 1]) == 2.0
        assert float(jnp.abs(d).sum()) == 3.0

    def test_teneye_identity_property(self, rng_key):
        # ttsv(E, x, -1) == x for unit x — the toolbox's own doc test
        # (teneye.m:12-16).
        e = teneye(4, 3)
        x = jax.random.normal(rng_key, (3,))
        x = x / jnp.linalg.norm(x)
        np.testing.assert_allclose(
            np.asarray(ttsv(e, x, 1)), np.asarray(x), rtol=1e-5, atol=1e-6
        )

    def test_teneye_odd_order_rejected(self):
        with pytest.raises(ValueError):
            teneye(3, 3)

    def test_tenrandblk(self, rng_key):
        x = tenrandblk(rng_key, [(2, 3, 2), (3, 2, 4)], noise=0.01)
        assert x.shape == (5, 5, 6)
        # block energy dominates the noise floor
        blk1 = x[:2, :3, :2]
        assert float(jnp.linalg.norm(blk1.ravel())) > 0.5

    def test_matrand_family(self, rng_key):
        q = matrandorth(rng_key, 5)
        np.testing.assert_allclose(
            np.asarray(q.T @ q), np.eye(5), atol=1e-5
        )
        m = matrandnorm(jax.random.normal(rng_key, (6, 3)))
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(m, axis=0)), np.ones(3), rtol=1e-6
        )
        c = matrandcong(rng_key, 8, 3, gamma=0.6)
        g = np.asarray(c.T @ c)
        np.testing.assert_allclose(np.diag(g), np.ones(3), atol=1e-5)
        off = g[~np.eye(3, dtype=bool)]
        np.testing.assert_allclose(off, 0.6, atol=1e-5)


# ------------------------------------------------------- ktensor / ttensor


class TestKruskalHelpers:
    def _rand_kt(self, key, shape=(4, 5, 6), r=3):
        keys = jax.random.split(key, len(shape) + 1)
        factors = [jax.random.normal(k, (s, r)) for k, s in zip(keys[:-1], shape)]
        weights = jnp.abs(jax.random.normal(keys[-1], (r,))) + 0.1
        return weights, factors

    def test_norm_matches_dense(self, rng_key):
        w, fs = self._rand_kt(rng_key)
        dense = ktensor_full(fs, w)
        np.testing.assert_allclose(
            float(ktensor_norm(w, fs)),
            float(jnp.linalg.norm(dense.ravel())),
            rtol=1e-5,
        )

    def test_innerprod_dense_and_kt(self, rng_key):
        w, fs = self._rand_kt(rng_key)
        w2, fs2 = self._rand_kt(jax.random.fold_in(rng_key, 7))
        d1, d2 = ktensor_full(fs, w), ktensor_full(fs2, w2)
        np.testing.assert_allclose(
            float(ktensor_innerprod(w, fs, d2)),
            float(jnp.sum(d1 * d2)),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(ktensor_innerprod(w, fs, (w2, fs2))),
            float(jnp.sum(d1 * d2)),
            rtol=1e-4,
        )

    def test_arrange_and_fixsigns_invariant(self, rng_key):
        w, fs = self._rand_kt(rng_key)
        dense = ktensor_full(fs, w)
        wa, fa = ktensor_arrange(w, fs)
        assert bool(jnp.all(wa[:-1] >= wa[1:]))  # sorted descending
        np.testing.assert_allclose(
            np.asarray(ktensor_full(fa, wa)), np.asarray(dense), rtol=1e-4, atol=1e-5
        )
        wf, ff = ktensor_fixsigns(w, fs)
        np.testing.assert_allclose(
            np.asarray(ktensor_full(ff, wf)), np.asarray(dense), rtol=1e-4, atol=1e-5
        )
        for u in ff:
            mx = jnp.argmax(jnp.abs(u), axis=0)
            assert bool(jnp.all(u[mx, jnp.arange(u.shape[1])] >= 0))

    def test_score_self_is_one(self, rng_key):
        w, fs = self._rand_kt(rng_key)
        s = ktensor_score(w, fs, w, [u * 1.0 for u in fs])
        np.testing.assert_allclose(float(s), 1.0, atol=1e-4)
        # permuted components still score 1 (matching is permutation-free)
        perm = jnp.array([2, 0, 1])
        s2 = ktensor_score(w, fs, w[perm], [u[:, perm] for u in fs])
        np.testing.assert_allclose(float(s2), 1.0, atol=1e-4)

    def test_ttensor_full_and_norm(self, rng_key):
        keys = jax.random.split(rng_key, 4)
        core = jax.random.normal(keys[0], (2, 3, 2))
        factors = [
            jax.random.normal(k, (s, r))
            for k, (s, r) in zip(keys[1:], [(5, 2), (6, 3), (7, 2)])
        ]
        dense = ttensor_full(core, factors)
        want = jnp.einsum("abc,ia,jb,kc->ijk", core, *factors)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(want), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            float(ttensor_norm(core, factors)),
            float(jnp.linalg.norm(dense.ravel())),
            rtol=1e-4,
        )

    def test_sumtensor(self, rng_key):
        a = jax.random.normal(rng_key, (3, 3))
        np.testing.assert_allclose(
            np.asarray(sumtensor_full([a, 2 * a])), np.asarray(3 * a), rtol=1e-6
        )


# ------------------------------------------------------------- CP variants


class TestCPVariants:
    def _lowrank_nonneg(self, key, shape=(8, 9, 10), r=2):
        keys = jax.random.split(key, 3)
        fs = [jax.random.uniform(k, (s, r)) + 0.1 for k, s in zip(keys, shape)]
        return ktensor_full(fs), fs

    def test_cp_nmu_recovers_fit(self, rng_key):
        x, _ = self._lowrank_nonneg(rng_key)
        res = cp_nmu(x, rank=2, max_iters=500, tol=1e-9, key=rng_key)
        assert float(res["fit"]) > 0.99
        for u in res["factors"]:
            assert bool(jnp.all(u >= 0))

    def test_cp_apr_poisson(self, rng_key):
        x, _ = self._lowrank_nonneg(rng_key)
        counts = jax.random.poisson(jax.random.fold_in(rng_key, 3), 20.0 * x).astype(
            jnp.float32
        )
        res = cp_apr(counts, rank=2, max_outer=30, key=rng_key)
        m = ktensor_full(res["factors"], res["weights"])
        assert bool(jnp.all(m >= 0))
        rel = float(jnp.linalg.norm((m - counts).ravel()) / jnp.linalg.norm(counts.ravel()))
        assert rel < 0.35  # Poisson noise floor at mean ~20·x
        assert jnp.isfinite(res["log_likelihood"])

    def test_cp_arls_matches_als_quality(self, rng_key):
        x, _ = self._lowrank_nonneg(rng_key)
        res = cp_arls(x, rank=2, n_samples=200, max_iters=60, tol=0.0, key=rng_key)
        assert float(res["fit"]) > 0.97

    def test_cp_opt(self, rng_key):
        x, _ = self._lowrank_nonneg(rng_key, shape=(6, 7, 8))
        res = cp_opt(x, rank=2, max_iters=300, key=rng_key)
        assert float(res["fit"]) > 0.99

    def test_cp_wopt_ignores_masked_entries(self, rng_key):
        x, _ = self._lowrank_nonneg(rng_key, shape=(6, 7, 8))
        w = (jax.random.uniform(jax.random.fold_in(rng_key, 9), x.shape) > 0.3).astype(
            x.dtype
        )
        # corrupt the unobserved entries wildly; the fit must not care
        x_corrupt = jnp.where(w > 0, x, 1e3)
        res = cp_wopt(x_corrupt, w, rank=2, max_iters=300, key=rng_key)
        m = ktensor_full(res["factors"], res["weights"])
        rel = float(
            jnp.linalg.norm((w * (m - x)).ravel()) / jnp.linalg.norm((w * x).ravel())
        )
        assert rel < 0.05

    @pytest.mark.parametrize("loss", ["normal", "count", "bernoulli-logit"])
    def test_gcp_opt_losses(self, rng_key, loss):
        x, _ = self._lowrank_nonneg(rng_key, shape=(6, 7, 8))
        if loss == "bernoulli-logit":
            data = (x > jnp.median(x)).astype(jnp.float32)
        elif loss == "count":
            data = jnp.round(5.0 * x)
        else:
            data = x
        res = gcp_opt(data, rank=2, loss=loss, max_iters=400, key=rng_key)
        assert jnp.isfinite(res["objective"])
        m = ktensor_full(res["factors"], res["weights"])
        assert bool(jnp.all(jnp.isfinite(m)))
        if loss == "normal":
            rel = float(
                jnp.linalg.norm((m - data).ravel()) / jnp.linalg.norm(data.ravel())
            )
            assert rel < 0.15


# -------------------------------------------------------------- symmetric


class TestSymmetric:
    def test_symmetrize(self, rng_key):
        x = jax.random.normal(rng_key, (4, 4, 4))
        s = symmetrize(x)
        assert bool(is_symmetric(s))
        assert not bool(is_symmetric(x))

    def test_ttsv_orders(self, rng_key):
        a = symmetrize(jax.random.normal(rng_key, (4, 4, 4)))
        x = jax.random.normal(jax.random.fold_in(rng_key, 1), (4,))
        np.testing.assert_allclose(
            float(ttsv(a, x, 0)), float(jnp.einsum("ijk,i,j,k->", a, x, x, x)), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ttsv(a, x, 1)),
            np.asarray(jnp.einsum("ijk,j,k->i", a, x, x)),
            rtol=1e-5,
        )

    def test_eig_sshopm_eigenpair(self, rng_key):
        a = symmetrize(jax.random.normal(rng_key, (5, 5, 5, 5)))
        res = eig_sshopm(a, shift=2.0, max_iters=2000, tol=1e-13, key=rng_key)
        lam, x = res["eigval"], res["eigvec"]
        # residual of the eigen equation Ax^{m-1} = λx
        r = ttsv(a, x, 1) - lam * x
        assert float(jnp.linalg.norm(r)) < 1e-4
        np.testing.assert_allclose(float(jnp.linalg.norm(x)), 1.0, rtol=1e-5)

    def test_eig_geap_reduces_to_sshopm_with_identity_b(self, rng_key):
        a = symmetrize(jax.random.normal(rng_key, (4, 4, 4, 4)))
        e = teneye(4, 4)
        res = eig_geap(a, e, shift=3.0, max_iters=3000, tol=1e-13, key=rng_key)
        lam, x = res["eigval"], res["eigvec"]
        r = ttsv(a, x, 1) - lam * ttsv(e, x, 1)
        assert float(jnp.linalg.norm(r)) < 1e-3

    def test_cp_sym(self, rng_key):
        u = jax.random.normal(rng_key, (6, 2))
        w = jnp.array([2.0, -1.0])
        x = symktensor_full(w, u, 3)
        res = cp_sym(x, rank=2, max_iters=2000, key=jax.random.fold_in(rng_key, 2))
        assert float(res["fit"]) > 0.95

    def test_tucker_sym(self, rng_key):
        # symmetric low-multilinear-rank tensor
        u = jnp.linalg.qr(jax.random.normal(rng_key, (7, 3)))[0]
        core = symmetrize(jax.random.normal(jax.random.fold_in(rng_key, 1), (3, 3, 3)))
        x = tucker_ttm(core, [u, u, u], transpose=False)
        res = tucker_sym(x, rank=3)
        assert float(res["fit"]) > 0.999
        # factor is orthonormal
        np.testing.assert_allclose(
            np.asarray(res["u"].T @ res["u"]), np.eye(3), atol=1e-4
        )


# -------------------------------------------------------------- problem/io


class TestProblemAndIO:
    def test_create_problem_binary(self, rng_key):
        res = create_problem_binary(rng_key, (6, 7, 8), rank=2)
        assert set(np.unique(np.asarray(res["data"]))) <= {0.0, 1.0}
        assert bool(jnp.all((res["prob"] >= 0) & (res["prob"] <= 1)))

    def test_export_import_roundtrip(self, tmp_path, rng_key):
        x = jax.random.normal(rng_key, (3, 4, 2))
        p = str(tmp_path / "t.ttx")
        export_data(x, p)
        back = import_data(p)
        np.testing.assert_allclose(back, np.asarray(x), rtol=1e-12)

    def test_khatrirao_reverse(self, rng_key):
        a = jax.random.normal(rng_key, (3, 2))
        b = jax.random.normal(jax.random.fold_in(rng_key, 1), (4, 2))
        np.testing.assert_allclose(
            np.asarray(khatrirao(a, b, reverse=True)),
            np.asarray(khatrirao(b, a)),
            rtol=1e-6,
        )


class TestModeProducts:
    """Single-mode ttm/ttv — `@tensor/ttm.m`, `@tensor/ttv.m` semantics."""

    def test_ttm_matches_unfold_identity(self, rng_key):
        from tritd_tpu.ops import ttm

        x = jax.random.normal(rng_key, (4, 5, 6))
        u = jax.random.normal(jax.random.fold_in(rng_key, 1), (3, 5))
        got = ttm(x, u, 1)
        ref = jnp.einsum("ijt,kj->ikt", x, u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
        # 't' flag: contracts U^T, so U is (n_mode, k) here
        w = jax.random.normal(jax.random.fold_in(rng_key, 2), (4, 3))
        got_t = ttm(x, w, 0, transpose=True)
        ref_t = jnp.einsum("ijt,ik->kjt", x, w)
        assert got_t.shape == (3, 5, 6)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t), rtol=1e-6)

    def test_ttm_composes_to_tucker_ttm(self, rng_key):
        from tritd_tpu.ops import ttm
        from tritd_tpu.ops.decomp import tucker_ttm

        x = jax.random.normal(rng_key, (4, 5, 6))
        us = [
            jax.random.normal(jax.random.fold_in(rng_key, i), (3, s))
            for i, s in enumerate(x.shape)
        ]
        seq = x
        for ax, u in enumerate(us):
            seq = ttm(seq, u, ax)
        np.testing.assert_allclose(
            np.asarray(seq), np.asarray(tucker_ttm(x, us)), rtol=1e-5
        )

    def test_ttv_single_and_multi(self, rng_key):
        from tritd_tpu.ops import ttv

        x = jax.random.normal(rng_key, (4, 5, 6))
        v = jax.random.normal(jax.random.fold_in(rng_key, 1), (5,))
        got = ttv(x, v, 1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jnp.einsum("ijt,j->it", x, v)), rtol=1e-6
        )
        vs = [jax.random.normal(jax.random.fold_in(rng_key, i), (s,))
              for i, s in enumerate(x.shape)]
        full = ttv(x, vs)  # all modes -> scalar
        ref = jnp.einsum("ijt,i,j,t->", x, *vs)
        np.testing.assert_allclose(np.asarray(full), np.asarray(ref), rtol=1e-5)
        # out-of-order modes
        part = ttv(x, [vs[2], vs[0]], modes=[2, 0])
        np.testing.assert_allclose(
            np.asarray(part), np.asarray(jnp.einsum("ijt,t,i->j", x, vs[2], vs[0])),
            rtol=1e-5,
        )


class TestSshopmc:
    """eig_sshopmc — complex shifted power method (`eig_sshopmc.m:93-103`)."""

    def _sym4(self, n=4, seed=0):
        import itertools

        rng = np.random.default_rng(seed)
        a0 = rng.normal(size=(n,) * 4)
        return jnp.asarray(
            sum(a0.transpose(p) for p in itertools.permutations(range(4))) / 24.0,
            jnp.float32,
        )

    def test_real_eigenpair_matches_sshopm(self, rng_key):
        from tritd_tpu.ops import eig_sshopm, eig_sshopmc

        a = self._sym4()
        real = eig_sshopm(a, shift=6.0, max_iters=2000, tol=1e-10)
        # start at the real solution: sshopmc must stay there
        out = eig_sshopmc(
            a, shift=6.0, max_iters=2000, tol=1e-10,
            x0=real["eigvec"].astype(jnp.complex64),
        )
        assert bool(out["converged"])
        np.testing.assert_allclose(
            float(jnp.real(out["eigval"])), float(real["eigval"]), rtol=1e-4
        )
        assert abs(float(jnp.imag(out["eigval"]))) < 1e-4

    def test_residual_is_eigenpair(self, rng_key):
        from tritd_tpu.ops import eig_sshopmc
        from tritd_tpu.ops.symmetric import ttsv

        a = self._sym4(seed=3)
        out = eig_sshopmc(a, shift=4.0, max_iters=5000, tol=1e-12, key=rng_key)
        x, lam = out["eigvec"], out["eigval"]
        resid = ttsv(a.astype(x.dtype), x, 1) - lam * x
        assert float(jnp.linalg.norm(resid)) < 5e-3
