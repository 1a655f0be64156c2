"""Kruskal utilities and t-SVD/SNN TRPCA competitors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.baselines import prox_tnn, trpca_snn, trpca_tnn
from tritd_tpu.metrics.recon import rre
from tritd_tpu.ops.kruskal import (
    cp_normalize,
    create_problem,
    khatrirao,
    ktensor_full,
    tenmat,
    tenrand,
)


def test_khatrirao_matches_definition(rng_key):
    k1, k2 = jax.random.split(rng_key)
    a = jax.random.normal(k1, (3, 4))
    b = jax.random.normal(k2, (5, 4))
    kr = khatrirao(a, b)
    assert kr.shape == (15, 4)
    for i in range(3):
        for j in range(5):
            np.testing.assert_allclose(
                np.asarray(kr[i * 5 + j]), np.asarray(a[i] * b[j]), rtol=1e-6
            )


def test_ktensor_full_vs_einsum(rng_key):
    ks = jax.random.split(rng_key, 3)
    us = [jax.random.normal(k, (s, 2)) for k, s in zip(ks, (3, 4, 5))]
    w = jnp.array([2.0, -1.0])
    got = ktensor_full(us, w)
    want = jnp.einsum("ir,jr,tr,r->ijt", *us, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_tenmat_roundtrip_entries(rng_key):
    x = jax.random.normal(rng_key, (3, 4, 5))
    m = tenmat(x, (1,))
    assert m.shape == (4, 15)
    # row j holds slice x[:, j, :] flattened (row modes first, rest in order)
    np.testing.assert_allclose(
        np.asarray(m[2]), np.asarray(x[:, 2, :].ravel()), rtol=1e-6
    )


def test_cp_normalize(rng_key):
    ks = jax.random.split(rng_key, 3)
    us = [jax.random.normal(k, (s, 2)) for k, s in zip(ks, (3, 4, 5))]
    nfs, w = cp_normalize(us)
    for u in nfs:
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(u, axis=0)), np.ones(2), rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(ktensor_full(nfs, w)), np.asarray(ktensor_full(us)), rtol=1e-4
    )


def test_create_problem_noise_level(rng_key):
    prob = create_problem(rng_key, (6, 7, 8), rank=2, noise=0.1)
    rel = float(
        jnp.linalg.norm((prob["data"] - prob["clean"]).ravel())
        / jnp.linalg.norm(prob["clean"].ravel())
    )
    np.testing.assert_allclose(rel, 0.1, rtol=1e-4)


def test_tenrand_range(rng_key):
    x = tenrand(rng_key, (4, 5, 6))
    assert float(x.min()) >= 0.0 and float(x.max()) < 1.0


def _tubal_low_rank(key, shape, rank, scale=1.0):
    """Random tensor with low tubal rank: t-product of two factor tensors."""
    k1, k2 = jax.random.split(key)
    n1, n2, n3 = shape
    af = jax.random.normal(k1, (n1, rank, n3))
    bf = jax.random.normal(k2, (rank, n2, n3))
    affft = jnp.fft.fft(af, axis=2)
    bffft = jnp.fft.fft(bf, axis=2)
    xf = jnp.einsum("irt,rjt->ijt", affft, bffft)
    return scale * jnp.real(jnp.fft.ifft(xf, axis=2))


def test_prox_tnn_identity_at_zero_threshold(rng_key):
    x = jax.random.normal(rng_key, (6, 7, 8))
    np.testing.assert_allclose(
        np.asarray(prox_tnn(x, 0.0)), np.asarray(x), atol=1e-4
    )


def test_trpca_tnn_recovers(rng_key):
    x = _tubal_low_rank(rng_key, (20, 21, 22), rank=2)
    k2 = jax.random.fold_in(rng_key, 1)
    hit = jax.random.bernoulli(k2, 0.05, x.shape)
    spikes = jnp.where(hit, 10.0 * jnp.sign(jax.random.normal(k2, x.shape)), 0.0)
    l, s, err_hist = trpca_tnn(x + spikes, origin=x, max_iter=150)
    assert float(rre(l, x)) < 0.05
    hist = np.asarray(err_hist)
    assert hist[-1] < hist[10]


def test_trpca_snn_runs_and_improves(rng_key):
    from tests.test_baselines import low_multilinear_tensor

    x = low_multilinear_tensor(rng_key, (15, 16, 17), rank=2, scale=10.0)
    k2 = jax.random.fold_in(rng_key, 2)
    spikes = jnp.where(jax.random.bernoulli(k2, 0.05, x.shape), 20.0, 0.0)
    l, e, err_hist = trpca_snn(x + spikes, alpha=(1.0, 1.0, 1.0), max_iter=150)
    hist = np.asarray(err_hist)
    assert np.isfinite(hist).all()
    # residual L{1}+E-X converges toward feasibility
    assert hist[-1] < hist[10]


def _random_fctn(key, nway, rank):
    """Exactly-FCTN-structured 4-way tensor."""
    from tritd_tpu.baselines.rnc_fctn import _init_factors, fctn_compose

    gs, _ = _init_factors(key, nway, rank, jnp.float32)
    # center the uniform factors so the composition is not rank-deficient
    gs = tuple(g - 0.5 for g in gs)
    return fctn_compose(gs)


def test_fctn_compose_associativity(rng_key):
    """Composition contracts every bond exactly once: compare against a
    brute-force loop on a tiny instance."""
    from tritd_tpu.baselines.rnc_fctn import _init_factors, fctn_compose

    nway = (2, 3, 2, 3)
    rank = np.triu(np.full((4, 4), 2), 1)
    gs, _ = _init_factors(rng_key, nway, rank, jnp.float32)
    got = np.asarray(fctn_compose(gs))
    g1, g2, g3, g4 = (np.asarray(g) for g in gs)
    want = np.einsum("aqrs,qbtu,rtcv,suvd->abcd", g1, g2, g3, g4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rnc_fctn_completes(rng_key):
    from tritd_tpu.baselines import rnc_fctn

    nway = (6, 7, 6, 7)
    rank = np.triu(np.full((4, 4), 2), 1)
    x = _random_fctn(jax.random.fold_in(rng_key, 1), nway, rank) * 10
    omega = jax.random.bernoulli(jax.random.fold_in(rng_key, 2), 0.7, nway)
    f = jnp.where(omega, x, 0.0)
    xh, gs, e, hist, k = rnc_fctn(
        f, lam=0.05, omega=omega, rank=rank, max_rank=rank,
        rho=0.1, beta=1.0, max_iter=150, origin=x,
        key=jax.random.fold_in(rng_key, 3),
    )
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]
    assert hist[-1] < 0.35
