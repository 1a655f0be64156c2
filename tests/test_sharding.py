"""Distributed tier of the test pyramid (SURVEY §4): sharded iteration must
match the single-device solver on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.data.synthetic import random_tritd, sparse_outliers
from tritd_tpu.parallel import make_mesh, tritd_admm_sharded, tritd_admm_auto
from tritd_tpu.solvers import TriTDConfig, tritd_admm, trim_history

SHAPE = (22, 13, 17)  # n1 NOT divisible by 8 — exercises slab padding


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    x, _ = random_tritd(k1, SHAPE, rank=2)
    o = sparse_outliers(k2, SHAPE, density=0.05, magnitude=4.0)
    return x + o


@pytest.mark.parametrize("n_slab", [2, 8])
def test_sharded_matches_single_device(problem, n_slab):
    cfg = TriTDConfig(rank=2, max_iter=25, tol=0.0)
    mesh = make_mesh(n_slab=n_slab)
    ref = tritd_admm(problem, cfg)
    got = tritd_admm_sharded(problem, cfg, mesh)
    assert int(got.n_iters) == int(ref.n_iters)
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.o), np.asarray(ref.o), rtol=2e-2, atol=2e-3
    )


def test_sharded_full_variant(problem):
    cfg = TriTDConfig(rank=2, max_iter=10, tol=0.0, variant="full")
    mesh = make_mesh(n_slab=4)
    ref = tritd_admm(problem, cfg)
    got = tritd_admm_sharded(problem, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=5e-3, atol=1e-5,
    )


def test_auto_sharding_matches(problem):
    cfg = TriTDConfig(rank=2, max_iter=15, tol=0.0)
    mesh = make_mesh(n_slab=8)
    ref = tritd_admm(problem, cfg)
    got = tritd_admm_auto(problem, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )


def test_auto_sharding_masked_and_origin(problem):
    """The GSPMD path takes the identical protocol surface as the shard_map
    paths (VERDICT r4 #5): masked completion + oracle rre_hist, with inert
    slab padding (mask pads True, origin pads zero)."""
    key = jax.random.PRNGKey(3)
    mask = jax.random.uniform(key, SHAPE) > 0.15
    y = jnp.where(mask, problem, 0.0)
    origin = problem
    cfg = TriTDConfig(rank=2, max_iter=20, tol=0.0, masked=True)
    mesh = make_mesh(n_slab=8)
    ref = tritd_admm(y, cfg, mask=mask, origin=origin)
    got = tritd_admm_auto(y, cfg, mesh, mask=mask, origin=origin)
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(trim_history(got.rre_hist, got.n_iters)),
        np.asarray(trim_history(ref.rre_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.o), np.asarray(ref.o), rtol=2e-2, atol=2e-3
    )


def test_sharded_early_stop(problem):
    cfg = TriTDConfig(rank=2, max_iter=100, tol=1e-3)
    mesh = make_mesh(n_slab=4)
    got = tritd_admm_sharded(problem, cfg, mesh)
    assert int(got.n_iters) < 100


def test_batch_sharded_dp_tp(problem):
    """2-D mesh: independent problems on the data axis, slabs on the slab
    axis. Each batch entry must match its own single-device solve."""
    from tritd_tpu.parallel import tritd_admm_batch_sharded

    cfg = TriTDConfig(rank=2, max_iter=12, tol=0.0)
    mesh = make_mesh(n_slab=4, n_data=2)
    batch = jnp.stack([problem, problem * 0.5])
    got = tritd_admm_batch_sharded(batch, cfg, mesh)
    for idx in range(2):
        ref = tritd_admm(batch[idx], cfg, key=jax.random.split(jax.random.PRNGKey(0), 2)[idx])
        np.testing.assert_allclose(
            np.asarray(got.err_hist[idx][:12]),
            np.asarray(ref.err_hist[:12]),
            rtol=5e-3, atol=1e-5,
        )


@pytest.mark.parametrize("shard_tensor_mode", [1, 3])
def test_sharded_masked_matches_single_device(problem, shard_tensor_mode):
    """Masked completion in the sharded solvers (imputation is local —
    zero extra collectives) must match the single-device masked solve."""
    key = jax.random.PRNGKey(3)
    mask = jax.random.uniform(key, SHAPE) > 0.15
    y = jnp.where(mask, problem, 0.0)
    cfg = TriTDConfig(rank=2, max_iter=20, tol=0.0, masked=True)
    mesh = make_mesh(n_slab=4)
    ref = tritd_admm(y, cfg, mask=mask)
    got = tritd_admm_sharded(
        y, cfg, mesh, mask=mask, shard_tensor_mode=shard_tensor_mode
    )
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.o), np.asarray(ref.o), rtol=2e-2, atol=2e-3
    )


def test_sharded_masked_requires_mask(problem):
    cfg = TriTDConfig(rank=2, max_iter=5, masked=True)
    mesh = make_mesh(n_slab=2)
    with pytest.raises(ValueError, match="requires a mask"):
        tritd_admm_sharded(problem, cfg, mesh)
    with pytest.raises(ValueError, match="masked=False"):
        tritd_admm_sharded(
            problem, TriTDConfig(rank=2, max_iter=5), mesh,
            mask=jnp.ones(SHAPE, bool),
        )


def test_sharded_rre_hist_matches_oracle(problem):
    """rre_hist must be the oracle RRE vs origin (not an alias of
    err_hist), matching the single-device solver; NaN when origin absent."""
    origin = problem * 0.9  # any stand-in "ground truth"
    cfg = TriTDConfig(rank=2, max_iter=15, tol=0.0)
    mesh = make_mesh(n_slab=4)
    ref = tritd_admm(problem, cfg, origin=origin)
    got = tritd_admm_sharded(problem, cfg, mesh, origin=origin)
    np.testing.assert_allclose(
        np.asarray(trim_history(got.rre_hist, got.n_iters)),
        np.asarray(trim_history(ref.rre_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )
    # without origin the history is NaN, never the residual history
    got2 = tritd_admm_sharded(problem, cfg, mesh)
    assert np.isnan(np.asarray(got2.rre_hist)).all()


def test_batch_sharded_masked_and_origin(problem):
    """DP x TP path: per-entry masks and origins thread through."""
    from tritd_tpu.parallel import tritd_admm_batch_sharded

    key = jax.random.PRNGKey(5)
    mask = jax.random.uniform(key, SHAPE) > 0.15
    batch = jnp.stack([problem, problem * 0.5])
    mask_b = jnp.stack([mask, mask])
    y = jnp.where(mask_b, batch, 0.0)
    cfg = TriTDConfig(rank=2, max_iter=10, tol=0.0, masked=True)
    mesh = make_mesh(n_slab=4, n_data=2)
    got = tritd_admm_batch_sharded(
        y, cfg, mesh, mask_batch=mask_b, origin_batch=batch
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    for idx in range(2):
        ref = tritd_admm(y[idx], cfg, key=keys[idx], mask=mask_b[idx], origin=batch[idx])
        np.testing.assert_allclose(
            np.asarray(got.err_hist[idx][:10]),
            np.asarray(ref.err_hist[:10]),
            rtol=5e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.rre_hist[idx][:10]),
            np.asarray(ref.rre_hist[:10]),
            rtol=5e-3, atol=1e-5,
        )


def test_mode3_frame_sharding_matches(problem):
    """Mode-3 (frame) sharding — the sequence-parallel layout — must match
    the single-device solver, including frame padding (n3=17 over 8)."""
    cfg = TriTDConfig(rank=2, max_iter=20, tol=0.0)
    mesh = make_mesh(n_slab=8)
    ref = tritd_admm(problem, cfg)
    got = tritd_admm_sharded(problem, cfg, mesh, shard_tensor_mode=3)
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.o), np.asarray(ref.o), rtol=2e-2, atol=2e-3
    )


def test_sharded_bf16_storage_matches_single_device(problem):
    """Narrow HBM storage (cfg.storage_dtype) in the sharded body: the
    trajectory matches the single-device narrow-storage solver up to float
    reduction order, and the returned tensors widen back to cfg.dtype."""
    cfg = TriTDConfig(rank=2, max_iter=25, tol=0.0, storage_dtype="bfloat16")
    mesh = make_mesh(n_slab=4)
    ref = tritd_admm(problem, cfg)
    got = tritd_admm_sharded(problem, cfg, mesh)
    assert got.o.dtype == jnp.float32
    assert int(got.n_iters) == int(ref.n_iters)
    # bf16 rounding makes per-iteration values coarser than the f32 test
    # above; the trajectories must still track each other closely
    np.testing.assert_allclose(
        np.asarray(trim_history(got.err_hist, got.n_iters)),
        np.asarray(trim_history(ref.err_hist, ref.n_iters)),
        rtol=2e-2, atol=1e-4,
    )


def test_batch_sharded_bf16_storage(problem):
    """DP x TP batch path composes with narrow storage."""
    from tritd_tpu.parallel import tritd_admm_batch_sharded

    cfg = TriTDConfig(rank=2, max_iter=15, tol=0.0, storage_dtype="bfloat16")
    mesh = make_mesh(n_data=2, n_slab=4)
    batch = jnp.stack([problem, problem * 0.5])
    res = tritd_admm_batch_sharded(batch, cfg, mesh)
    assert res.o.dtype == jnp.float32
    hist = np.asarray(res.err_hist)
    assert np.isfinite(hist).all()
    # each entry must match its own single-device narrow-storage solve
    # (the ADMM trajectory is NOT scale-equivariant — lambda_l1 is absolute —
    # so entries are only comparable to their own reference runs)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    for idx in range(2):
        ref = tritd_admm(batch[idx], cfg, key=keys[idx])
        np.testing.assert_allclose(
            hist[idx], np.asarray(ref.err_hist), rtol=2e-2, atol=1e-4
        )
