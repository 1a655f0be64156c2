"""Smoke tests: the demo scripts (SURVEY §4 "demos as integration tests")
run end-to-end on tiny shapes, and sparse CP-ALS recovers a low-rank
sparse-sampled tensor."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "examples")


class TestDemos:
    def test_demo_trpca(self, tmp_path, capsys):
        import demo_trpca

        rc = demo_trpca.main(
            [
                "--dataset", "highway", "--frames", "6", "--max-iter", "3",
                "--methods", "tnn", "--out-dir", str(tmp_path), "--cpu",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "mean_psnr" in out
        assert (tmp_path / "highway_tnn_errHist.npz").exists()
        assert (tmp_path / "highway_tnn_Xhat.npz").exists()

    def test_demo_rc_fctn(self, tmp_path, capsys):
        import demo_rc_fctn

        rc = demo_rc_fctn.main(
            [
                "--dataset", "highway", "--frames", "6", "--max-iter", "3",
                "--out-dir", str(tmp_path), "--cpu",
            ]
        )
        assert rc == 0
        assert "mean_ssim" in capsys.readouterr().out
        assert (tmp_path / "highway_fctn_Xhat.npz").exists()

    def test_demo_toolbox(self, capsys):
        import demo_toolbox

        rc = demo_toolbox.main(["--n", "10", "--rank", "2"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "cp_als through the class face" in out
        assert "matrix-free" in out
        assert "must decrease: True" in out

    def test_demo_rnc_fctn(self, tmp_path, capsys):
        import demo_rnc_fctn

        rc = demo_rnc_fctn.main(
            [
                "--dataset", "highway", "--frames", "6", "--max-iter", "2",
                "--out-dir", str(tmp_path), "--cpu",
            ]
        )
        assert rc == 0
        assert "rnc_fctn" in capsys.readouterr().out
        assert (tmp_path / "highway_rnc_fctn_errHist.npz").exists()


class TestSparseCpAls:
    def test_recovers_lowrank_from_nonzero_fibers(self, rng_key):
        from tritd_tpu.ops import cp_als_sparse, ktensor_full, sp_full

        keys = jax.random.split(rng_key, 3)
        shape, r = (10, 11, 12), 2
        fs = [jax.random.uniform(k, (s, r)) + 0.1 for k, s in zip(keys, shape)]
        dense = ktensor_full(fs)
        # take every entry as a "nonzero" of a sparse tensor (distinct coords)
        coords = jnp.stack(
            jnp.meshgrid(*[jnp.arange(s) for s in shape], indexing="ij"), axis=-1
        ).reshape(-1, 3).astype(jnp.int32)
        vals = dense.ravel()
        res = cp_als_sparse(vals, coords, shape, rank=r, max_iters=60, tol=1e-9)
        assert float(res["fit"]) > 0.999
        recon = ktensor_full(res["factors"], res["weights"])
        np.testing.assert_allclose(
            np.asarray(recon), np.asarray(dense), rtol=0.05, atol=0.01
        )

    def test_matches_dense_cp_als_updates(self, rng_key):
        from tritd_tpu.ops import cp_als, cp_als_sparse, sp_full, sptenrand

        vals, coords, shape = sptenrand(rng_key, (8, 9, 10), nnz=200)
        dense = sp_full(vals, coords, shape)
        # distinct-coords guard: rebuild vals from the dense tensor so both
        # paths see identical data even if sptenrand collided
        init = [
            jax.random.uniform(k, (s, 3))
            for k, s in zip(jax.random.split(rng_key, 3), shape)
        ]
        # re-extract: sparse path must treat duplicates as accumulated
        coords_u = jnp.stack(
            jnp.meshgrid(*[jnp.arange(s) for s in shape], indexing="ij"), axis=-1
        ).reshape(-1, 3).astype(jnp.int32)
        vals_u = dense.ravel()
        res_sp = cp_als_sparse(
            vals_u, coords_u, shape, rank=3, max_iters=5, tol=0.0,
            init_factors=[u for u in init],
        )
        res_d = cp_als(
            dense, rank=3, max_iters=5, tol=0.0, init_factors=[u for u in init]
        )
        np.testing.assert_allclose(
            float(res_sp["fit"]), float(res_d["fit"]), rtol=1e-4, atol=1e-5
        )
