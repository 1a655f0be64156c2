"""Phase-level SOFIA profile on the attached TPU (VERDICT r4 #3).

Two-point-differenced timings (the fixed ~26 ms axon-tunnel RTT cancels —
see docs/BENCH_NOTES.md) of sofia_init's component stages at a benchmark
shape: the epoch loop, one ALS iteration, and the mode-3 Gauss-Seidel scan
/ batched-pinv / masked-Gram pieces in isolation.

Usage: python tools/profile_sofia.py [dataset]   (default: network)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tritd_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def fetch(x):
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x))


def best_call(fn, n=3):
    fetch(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def differenced(make, lo, hi):
    f_lo, f_hi = make(lo), make(hi)
    t_lo, t_hi = best_call(f_lo), best_call(f_hi)
    return (t_hi - t_lo) / (hi - lo), t_lo


def main():
    from tritd_tpu.baselines import sofia as S
    from tritd_tpu.data import load_dataset, uniform_missing_mask
    from tritd_tpu.data.loaders import DATASETS
    from tritd_tpu.utils.config import README_MISSING_RATIO, SOFIA_PRESET

    name = sys.argv[1] if len(sys.argv) > 1 else "network"
    spec = DATASETS[name]
    x_np, spec, _ = load_dataset(name)
    key = jax.random.PRNGKey(0)
    mask = uniform_missing_mask(key, x_np.shape, README_MISSING_RATIO)
    y = jnp.where(mask, jnp.asarray(x_np, jnp.float32), 0.0)
    omega = mask
    p = SOFIA_PRESET
    r, m = p.rank, spec.sofia_period
    n1, n2, n3 = y.shape
    print(f"# shape={y.shape} r={r} m={m}", flush=True)

    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (n1, r), jnp.float32)
    u2 = jax.random.uniform(k2, (n2, r), jnp.float32)
    u3 = jax.random.uniform(k3, (n3, r), jnp.float32)

    # --- whole solve at two epoch counts --------------------------------
    def make_epochs(ne):
        def run():
            _, x_hat, _, _ = S.sofia_init(
                y, omega, r, m, p.lambda1, p.lambda2, p.lambda3,
                max_epoch=ne, tol=0.0, key=key,
            )
            return x_hat
        return run

    per_epoch, t_lo = differenced(make_epochs, 20, 100)
    print(f"epoch_cost_ms={per_epoch*1e3:.2f} (t20={t_lo:.3f}s)", flush=True)

    # --- one ALS iteration (differenced over max_iters) -----------------
    def make_als(iters):
        @jax.jit
        def run():
            out = S._sofia_als_run(
                y, omega, u1, u2, u3, m, p.lambda1, p.lambda2, iters, 0.0
            )
            return out[3]
        return run

    per_als, t_lo = differenced(make_als, 10, 60)
    print(f"als_iter_ms={per_als*1e3:.2f} (t10={t_lo:.3f}s)", flush=True)

    # --- pieces, each in a forced-sequential fori_loop ------------------
    yt = jnp.moveaxis(y, 2, 0)
    ot = jnp.moveaxis(omega.astype(y.dtype), 2, 0)
    w12 = jnp.einsum("ir,jr->ijr", u1, u2)
    rhs_base, gram_base = S._masked_row_systems(yt, ot, w12)

    def piece(label, fn, carry0, lo=20, hi=120):
        def make(reps):
            @jax.jit
            def run():
                return jax.lax.fori_loop(
                    0, reps, lambda i, c: fn(c), carry0
                )
            return run
        per, t_lo = differenced(make, lo, hi)
        print(f"{label}_ms={per*1e3:.3f}", flush=True)
        return per

    piece("mode3_scan",
          lambda u: S._mode3_gauss_seidel(
              u, rhs_base + u[0, 0], gram_base, p.lambda1, p.lambda2, m),
          u3)
    piece("pinv_rows_mode3",
          lambda u: S._pinv_rows(rhs_base + u[0, 0], gram_base) * 0.999 + u * 1e-6,
          u3)

    # gram einsums for each mode, together
    of = omega.astype(y.dtype)

    def gram_all(c):
        w23 = jnp.einsum("jr,tr->jtr", u2, u3 + c[0, 0])
        _, g1 = S._masked_row_systems(y, of, w23)
        w13 = jnp.einsum("ir,tr->itr", u1, u3 + c[0, 0])
        _, g2 = S._masked_row_systems(
            jnp.swapaxes(y, 0, 1), jnp.swapaxes(of, 0, 1), w13)
        w12_ = jnp.einsum("ir,jr->ijr", u1, u2)
        _, g3 = S._masked_row_systems(yt, ot, w12_)
        return c + (jnp.sum(g1) + jnp.sum(g2) + jnp.sum(g3)) * 1e-20

    piece("grams_3modes", gram_all, u3)

    def recon_fit(c):
        xh = jnp.einsum("ir,jr,tr->ijt", u1, u2, u3 + c[0, 0])
        return c + jnp.linalg.norm((of * (y - xh)).ravel()) * 1e-20

    piece("recon_plus_fitnorm", recon_fit, u3)


if __name__ == "__main__":
    main()
