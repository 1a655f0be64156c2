"""Component-level timing of one TriTD-ADMM iteration on the attached TPU.

Decomposes the iteration into its pipeline stages (T build, 3x Gram+RHS,
3x Cholesky solve, reconstruction GEMM, fused elementwise block) and times
each as a 100x lax.fori_loop with forced sequential dependence, fetching one
scalar to host as the fence (CLAUDE.md: block_until_ready does not
synchronize through the axon tunnel).

Usage: python tools/bench_profile.py [n1 n2 n3 [rank]]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tritd_tpu.ops import designs, normal_eq
from tritd_tpu.ops.fold import core_a_from_mat, core_b_from_mat, core_c_from_mat
from tritd_tpu.ops.pallas_kernels import elementwise_block
from tritd_tpu.solvers import TriTDConfig, admm_iteration, init_state

REPS = 100


def timed(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warm-up fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    per_iter_ms = best / REPS * 1e3
    print(f"{name:28s} {per_iter_ms:8.4f} ms/iter   ({1e3/per_iter_ms:8.1f} it/s)")
    return per_iter_ms


def seq(x):
    """Tiny data dependence to stop XLA hoisting loop-invariant work."""
    return 1.0 + jnp.sum(x) * 1e-30


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 else (77, 77, 2016)
    rank = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    cfg = TriTDConfig(rank=rank, max_iter=REPS, tol=0.0)
    print(f"backend={jax.default_backend()} shape={shape} rank={rank} reps={REPS}")

    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, shape, jnp.float32)
    state = init_state(d, cfg, key)
    a, b, c = state.a, state.b, state.c
    o = 0.01 * d
    e = jnp.zeros_like(d)
    y_l = jnp.zeros_like(d)
    y_o = jnp.zeros_like(d)
    mu = jnp.asarray(cfg.mu, jnp.float32)
    t = d - o + y_l / mu
    l = designs.triple_product(a, b, c)

    # --- full iteration ---------------------------------------------------
    @jax.jit
    def full_iter(d, state):
        def body(_i, s):
            return admm_iteration(d, s, cfg)

        return jax.lax.fori_loop(0, REPS, body, state).err_hist

    t_full = timed("full admm_iteration", full_iter, d, state)

    # --- T build (1W + 3R pattern appears in situ; here isolated) ----------
    @jax.jit
    def t_build(d, o, y_l):
        def body(_i, acc):
            tt = d - (o * acc) + y_l / mu
            return seq(tt)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(1.0))

    t_t = timed("T = D - O + Y/mu", t_build, d, o, y_l)

    # --- per-mode Gram+RHS --------------------------------------------------
    comps = {}
    for mode in (1, 2, 3):

        @jax.jit
        def gram_rhs(t, a, b, c, mode=mode):
            def body(_i, acc):
                k, rhs = normal_eq.gram_and_rhs(mode, t * acc, a, b, c)
                return seq(rhs) * seq(k)

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(1.0))

        comps[f"gram+rhs mode {mode}"] = timed(
            f"gram+rhs mode {mode}", gram_rhs, t, a, b, c
        )

    # --- solves --------------------------------------------------------------
    k1, rhs1 = normal_eq.gram_and_rhs(1, t, a, b, c)

    @jax.jit
    def solves(k1, rhs1):
        def body(_i, acc):
            sol = normal_eq.ridge_solve(k1 * acc, rhs1, 1e-3)
            return seq(sol)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(1.0))

    comps["cholesky solve x1"] = timed("cholesky solve x1", solves, k1, rhs1)

    # --- reconstruction -------------------------------------------------------
    @jax.jit
    def recon(a, b, c):
        def body(_i, acc):
            ll = designs.triple_product(a * acc, b, c)
            return seq(ll)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(1.0))

    comps["triple_product"] = timed("triple_product", recon, a, b, c)

    # --- elementwise block -----------------------------------------------------
    @jax.jit
    def elem(d, l, e, y_l, y_o):
        def body(_i, acc):
            o2, e2, yl2, yo2, sl, so = elementwise_block(
                d, l * acc, e, y_l, y_o, mu, mu, cfg.lambda_l1, use_pallas=False
            )
            return seq(o2) * seq(e2) * seq(yl2) * seq(yo2) + sl * 1e-30 + so * 1e-30

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(1.0))

    comps["elementwise block"] = timed("elementwise block", elem, d, l, e, y_l, y_o)

    # --- bf16 RHS variant -------------------------------------------------------
    @jax.jit
    def gram_rhs_bf16(t, a, b, c):
        def body(_i, acc):
            k, rhs = normal_eq.gram_and_rhs(
                1, t * acc, a, b, c, einsum_dtype=jnp.bfloat16
            )
            return seq(rhs) * seq(k)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(1.0))

    timed("gram+rhs mode 1 (bf16)", gram_rhs_bf16, t, a, b, c)

    total = t_t + sum(comps.values())
    print(f"{'sum of parts':28s} {total:8.4f} ms/iter  vs full {t_full:.4f}")


if __name__ == "__main__":
    main()
