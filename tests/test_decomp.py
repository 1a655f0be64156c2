"""CP-ALS / Tucker algorithm tests (Tensor Toolbox algorithm surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.ops.decomp import (
    cp_als,
    mttkrp,
    tucker_hooi,
    tucker_hosvd,
    tucker_ttm,
)
from tritd_tpu.ops.kruskal import khatrirao, ktensor_full, tenmat


KEY = jax.random.PRNGKey(7)


def _random_cp(key, shape, rank):
    keys = jax.random.split(key, len(shape))
    factors = [jax.random.normal(k, (s, rank)) for k, s in zip(keys, shape)]
    return factors, ktensor_full(factors)


def test_mttkrp_matches_tenmat_khatrirao():
    shape, rank = (5, 4, 6, 3), 3
    factors, _ = _random_cp(KEY, shape, rank)
    x = jax.random.normal(jax.random.fold_in(KEY, 1), shape)
    for mode in range(len(shape)):
        others = [factors[ax] for ax in range(len(shape)) if ax != mode]
        # Tensor Toolbox mttkrp = unfold(X, mode) @ khatrirao(reverse order)
        # with MATLAB's column-major unfolding; our row-major `tenmat`
        # (last mode varying fastest) pairs with the FORWARD operand order.
        kr = khatrirao(*others)
        want = tenmat(x, (mode,)) @ kr
        got = mttkrp(x, factors, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cp_als_recovers_low_rank():
    shape, rank = (12, 10, 8), 3
    _, clean = _random_cp(KEY, shape, rank)
    res = cp_als(clean, rank, max_iters=200, tol=1e-9, key=jax.random.fold_in(KEY, 2))
    x_hat = ktensor_full(res["factors"], res["weights"])
    rre = float(jnp.linalg.norm((x_hat - clean).ravel()) / jnp.linalg.norm(clean.ravel()))
    assert rre < 1e-3
    assert float(res["fit"]) > 0.999


def test_cp_als_fit_matches_reconstruction():
    shape, rank = (9, 7, 5), 2
    x = jax.random.normal(KEY, shape)
    res = cp_als(x, rank, max_iters=30, tol=0.0)
    x_hat = ktensor_full(res["factors"], res["weights"])
    rel = float(jnp.linalg.norm((x - x_hat).ravel()) / jnp.linalg.norm(x.ravel()))
    np.testing.assert_allclose(float(res["fit"]), 1.0 - rel, atol=1e-4)


def test_cp_als_4way():
    shape, rank = (6, 5, 4, 3), 2
    _, clean = _random_cp(KEY, shape, rank)
    res = cp_als(clean, rank, max_iters=300, tol=1e-10, key=jax.random.fold_in(KEY, 3))
    assert float(res["fit"]) > 0.99


def test_tucker_ttm_transpose_roundtrip():
    shape, ranks = (8, 7, 6), (3, 3, 3)
    x = jax.random.normal(KEY, shape)
    hs = tucker_hosvd(x, ranks)
    # orthonormal factors
    for u in hs["factors"]:
        np.testing.assert_allclose(
            np.asarray(u.T @ u), np.eye(u.shape[1]), atol=1e-5
        )
    recon = tucker_ttm(hs["core"], hs["factors"])
    assert recon.shape == shape


def test_hosvd_exact_on_exact_tucker_rank():
    ranks = (2, 3, 2)
    core = jax.random.normal(KEY, ranks)
    us = [
        jnp.linalg.qr(jax.random.normal(jax.random.fold_in(KEY, i), (n, r)))[0]
        for i, (n, r) in enumerate(zip((9, 8, 7), ranks))
    ]
    x = tucker_ttm(core, us)
    hs = tucker_hosvd(x, ranks)
    recon = tucker_ttm(hs["core"], hs["factors"])
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-4)


def test_hooi_improves_or_matches_hosvd():
    shape, ranks = (10, 9, 8), (3, 3, 3)
    x = jax.random.normal(KEY, shape)
    hs = tucker_hosvd(x, ranks)
    hs_recon = tucker_ttm(hs["core"], hs["factors"])
    hs_err = float(jnp.linalg.norm((x - hs_recon).ravel()))
    res = tucker_hooi(x, ranks, max_iters=50, tol=1e-10)
    hooi_recon = tucker_ttm(res["core"], res["factors"])
    hooi_err = float(jnp.linalg.norm((x - hooi_recon).ravel()))
    assert hooi_err <= hs_err * (1 + 1e-5)
    # fit formula consistency (orthonormal factors)
    rel = hooi_err / float(jnp.linalg.norm(x.ravel()))
    np.testing.assert_allclose(float(res["fit"]), 1.0 - rel, atol=1e-4)


def test_cp_als_nvecs_init_deterministic_recovery():
    shape, rank = (20, 15, 30), 3
    _, clean = _random_cp(KEY, shape, rank)
    # nvecs init recovers regardless of key (the random-uniform toolbox
    # default is seed-sensitive and can stall — why init="nvecs" exists).
    for seed in (0, 3, 4):
        res = cp_als(clean, rank, max_iters=100, tol=1e-12,
                     key=jax.random.PRNGKey(seed), init="nvecs")
        assert float(res["fit"]) > 0.9999


def test_cp_als_overcomplete_rank_stays_finite():
    shape = (8, 7, 6)
    _, clean = _random_cp(KEY, shape, 2)
    res = cp_als(clean, 12, max_iters=10, init="nvecs")  # rank > every dim
    assert bool(jnp.isfinite(res["fit"]))
    assert all(bool(jnp.isfinite(u).all()) for u in res["factors"])


def test_cp_als_bad_init_raises():
    x = jax.random.normal(KEY, (4, 4, 4))
    with pytest.raises(ValueError, match="init"):
        cp_als(x, 2, init="bogus")


@pytest.mark.parametrize("rank", [1, 4])
def test_cp_als_rank_edges(rank):
    shape = (6, 5, 4)
    _, clean = _random_cp(jax.random.fold_in(KEY, rank), shape, rank)
    res = cp_als(clean, rank, max_iters=400, tol=1e-11, key=jax.random.fold_in(KEY, 9))
    assert float(res["fit"]) > 0.98
