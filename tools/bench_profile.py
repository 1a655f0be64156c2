"""Component-level timing of one TriTD-ADMM iteration on the attached TPU.

Decomposes the iteration into its pipeline stages (T build, 3x Gram+RHS,
3x Cholesky solve, reconstruction GEMM, fused elementwise block) and times
each inside a lax.fori_loop with forced sequential dependence.

Timing methodology (round-2 correction): every jit call + host fetch through
the axon tunnel pays a FIXED ~26 ms round trip (measured: a trivial op, a
100-step and a 10,000-step scalar loop all cost ~26 ms end-to-end). Naive
per-call/REPS division therefore reports an RTT artifact, not device time —
round-1 numbers (BENCH_r01, 2,708 it/s on sensor) were dominated by it. Here
every stage is timed at TWO repetition counts and the per-iteration cost is
the DIFFERENCE quotient, which cancels the call overhead exactly.

Usage: python tools/bench_profile.py [n1 n2 n3 [rank]]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tritd_tpu.ops import designs, normal_eq
from tritd_tpu.ops.pallas_kernels import elementwise_block
from tritd_tpu.solvers import TriTDConfig, admm_iteration, init_state

REPS_LO = 100
REPS_HI = 1100


def _best_call(fn, *args, n=3):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warm-up fence
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(name, make_fn, *args):
    """make_fn(reps) -> jitted callable; reports the differenced per-iter
    cost (RTT-free) plus the raw low-rep call time for reference."""
    t_lo = _best_call(make_fn(REPS_LO), *args)
    t_hi = _best_call(make_fn(REPS_HI), *args)
    per_iter_us = (t_hi - t_lo) / (REPS_HI - REPS_LO) * 1e6
    rate = 1e6 / per_iter_us if per_iter_us > 0 else float("inf")
    print(
        f"{name:28s} {per_iter_us:9.2f} us/iter ({rate:10.0f} it/s)"
        f"   [call@{REPS_LO}: {t_lo*1e3:7.2f} ms]"
    )
    return per_iter_us


def seq(x):
    """Tiny data dependence to stop XLA hoisting loop-invariant work."""
    return 1.0 + jnp.sum(x) * 1e-30


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 else (77, 77, 2016)
    rank = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    print(f"backend={jax.default_backend()} shape={shape} rank={rank} "
          f"diff quotient over {REPS_LO}->{REPS_HI} reps")

    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, shape, jnp.float32)
    cfg0 = TriTDConfig(rank=rank, max_iter=REPS_LO, tol=0.0)
    state = init_state(d, cfg0, key)
    a, b, c = state.a, state.b, state.c
    o = 0.01 * d
    e = jnp.zeros_like(d)
    y_l = jnp.zeros_like(d)
    y_o = jnp.zeros_like(d)
    mu = jnp.asarray(cfg0.mu, jnp.float32)
    t = d - o + y_l / mu
    l = designs.triple_product(a, b, c)

    # tunnel RTT reference
    rtt = _best_call(jax.jit(lambda x: x + 1.0), jnp.float32(1.0))
    print(f"{'tunnel RTT (trivial call)':28s} {rtt*1e3:9.2f} ms/call")

    # --- full iteration -----------------------------------------------------
    def make_full(reps):
        cfg = TriTDConfig(rank=rank, max_iter=reps, tol=0.0)

        @jax.jit
        def full_iter(d, st):
            def body(_i, s):
                return admm_iteration(d, s, cfg)

            return jax.lax.fori_loop(0, reps, body, st).err_hist

        return full_iter

    def full_with_state(reps):
        fn = make_full(reps)
        cfg = TriTDConfig(rank=rank, max_iter=reps, tol=0.0)
        st = init_state(d, cfg, key)
        return lambda dd: fn(dd, st)

    t_full = timed("full admm_iteration", full_with_state, d)

    def stage(name, body_fn, *args):
        def make(reps):
            @jax.jit
            def loop(*inner):
                def body(_i, acc):
                    return body_fn(acc, *inner)

                return jax.lax.fori_loop(0, reps, body, jnp.float32(1.0))

            return loop

        return timed(name, make, *args)

    parts = {}
    parts["T build"] = stage(
        "T = D - O + Y/mu",
        lambda acc, d, o, y_l: seq(d - o * acc + y_l / mu),
        d, o, y_l,
    )
    for mode in (1, 2, 3):
        parts[f"gram+rhs {mode}"] = stage(
            f"gram+rhs mode {mode}",
            functools.partial(
                lambda acc, t, a, b, c, mode: (
                    lambda kr: seq(kr[0]) * seq(kr[1])
                )(normal_eq.gram_and_rhs(mode, t * acc, a, b, c)),
                mode=mode,
            ),
            t, a, b, c,
        )
    k1, rhs1 = normal_eq.gram_and_rhs(1, t, a, b, c)
    parts["solve"] = stage(
        "cholesky solve x1",
        lambda acc, k1, rhs1: seq(normal_eq.ridge_solve(k1 * acc, rhs1, 1e-3)),
        k1, rhs1,
    )
    parts["recon"] = stage(
        "triple_product",
        lambda acc, a, b, c: seq(designs.triple_product(a * acc, b, c)),
        a, b, c,
    )

    def elem_body(acc, d, l, e, y_l, y_o):
        o2, e2, yl2, yo2, sl, so = elementwise_block(
            d, l * acc, e, y_l, y_o, mu, mu, cfg0.lambda_l1, use_pallas=False
        )
        return seq(o2) * seq(e2) * seq(yl2) * seq(yo2) + sl * 1e-30 + so * 1e-30

    parts["elementwise"] = stage("elementwise block", elem_body, d, l, e, y_l, y_o)

    def bf16_body(acc, t, a, b, c):
        k, rhs = normal_eq.gram_and_rhs(1, t * acc, a, b, c, einsum_dtype=jnp.bfloat16)
        return seq(rhs) * seq(k)

    stage("gram+rhs mode 1 (bf16)", bf16_body, t, a, b, c)

    total = parts["T build"] + sum(
        v for k, v in parts.items() if k != "T build"
    ) + 2 * parts["solve"]  # 3 solves total; one measured
    print(f"{'sum of parts (3x solve)':28s} {total:9.2f} us/iter  "
          f"vs full {t_full:.2f} us/iter")

    svt_profile(shape)


def svt_profile(shape):
    """Gram-eigh vs SVD SVT throughput at the baseline suite's unfolding
    shapes (VERDICT r2 #2): the mode-1 and TT-cut unfoldings of the given
    tensor shape, plus the two extreme benchmark unfoldings. Differenced
    over repetitions like everything else; parity at these shapes is pinned
    by tests/test_ops.py."""
    from tritd_tpu.ops.svt import svt

    n1, n2, n3 = shape
    # (label, (p, q), extra methods): the square-ish RC-FCTN video
    # bipartitions get the randomized top-k route too (its production
    # route via auto_method; budget matters only above LOWRANK_MIN_DIM).
    mats = {
        f"{n1}x{n2 * n3}": ((n1, n2 * n3), ()),
        f"{n1 * n2}x{n3}": ((n1 * n2, n3), ()),
        "100x50000 (taxi m1)": ((100, 50000), ()),
        "76800x300 (video TTcut)": ((76800, 300), ()),
        "4800x4800 (FCTN video)": ((4800, 4800), ("lowrank:1024", "lowrank:512")),
        "3600x6400 (FCTN video)": ((3600, 6400), ("lowrank:1024", "lowrank:512")),
    }
    print("\nSVT throughput (baseline-suite hot op), gram vs svd vs lowrank:")
    key = jax.random.PRNGKey(0)
    for label, ((p, q), extra) in mats.items():
        # big square shapes: ~1 s/decomposition — difference 1 vs 3 reps
        lo, hi = (1, 3) if min(p, q) >= 2048 else (4, 24)
        u = jax.random.normal(key, (p, 8))
        v = jax.random.normal(jax.random.fold_in(key, 1), (8, q))
        m = (u @ v + 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (p, q))
             ).astype(jnp.float32)
        for method in ("gram", "svd") + extra:
            def make(reps, method=method):
                @jax.jit
                def loop(m):
                    def body(_i, acc):
                        return seq(svt(m * acc, 0.5, method=method))

                    return jax.lax.fori_loop(0, reps, body, jnp.float32(1.0))

                return loop

            t_lo = _best_call(make(lo), m)
            t_hi = _best_call(make(hi), m)
            per = (t_hi - t_lo) / (hi - lo) * 1e3
            print(f"  {label:26s} {method:4s} {per:9.3f} ms/SVT")


if __name__ == "__main__":
    main()
