"""Full-protocol reference-emulator parity harness (VERDICT r4 #1).

Runs each benchmarked solver twice on identical data and inits:
  * the JAX implementation, float64 on CPU (semantics parity is a math
    question, not a device question — x64 removes dtype noise), and
  * the independent MATLAB-semantics float64 numpy emulator
    (tritd_tpu/oracle/matlab_emulator.py: order='F' reshapes, pinv solves,
    the reference's exact control flow),
then compares the WHOLE err_hist trajectory (max abs diff, final values,
iteration counts). Agreement here is measured evidence that the JAX
solvers compute the reference protocols, not a code-reading claim.

Usage:
  python tools/emulator_parity.py --tiny            # fast all-method check,
                                                    # exits non-zero on fail
                                                    # (run by the test suite)
  python tools/emulator_parity.py --dataset chicago --method ttnn
                                                    # one protocol-scale run,
                                                    # writes docs/emulator_parity/<ds>_<m>.json
  python tools/emulator_parity.py --collect         # merge partials into
                                                    # docs/EMULATOR_PARITY_r05.json

Protocol-scale tolerance: both sides are float64, but they use different
LAPACK drivers (numpy/OpenBLAS vs XLA's lapack custom calls) inside
100-iteration fixed-point loops with SVD truncation gates; trajectories
agree to ~1e-9..1e-6 unless a truncation decision sits on a knife edge.
The JSON records the measured gaps; the per-method PASS bars are below.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["JAX_ENABLE_X64"] = "true"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS; the config
# knob wins (same mechanism as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Max allowed max|Δerr_hist| at protocol scale, per method. Rationale: all
# trajectories are float64 on both sides, so residual gaps come from
# different-but-equivalent linear algebra (Cholesky-vs-pinv ridge solves for
# triple; LAPACK driver differences inside SVT loops for the rest), amplified
# by up to 100 contraction-free ADMM iterations. 1e-5 on an O(0.1..1)
# err_hist is ~4 significant digits of agreement across the whole trajectory.
PASS_BAR = {
    "triple": 1e-5,
    "ttnn": 1e-5,
    "ring": 1e-5,
    "fctn": 1e-5,
    "sofia": 1e-4,  # nested while-loops with fit-change early stops: a
                    # marginal inner-iteration-count flip perturbs the
                    # trajectory more than pure arithmetic noise
}

METHODS = ("triple", "ttnn", "ring", "fctn", "sofia")
PARTIAL_DIR = os.path.join("docs", "emulator_parity")


def _compare(name, jax_hist, em_hist, jax_n, em_n, t_jax, t_em, extra=None):
    jax_hist = np.asarray(jax_hist, np.float64)
    em_hist = np.asarray(em_hist, np.float64)
    n = min(len(jax_hist), len(em_hist), jax_n, em_n)
    diff = np.abs(jax_hist[:n] - em_hist[:n])
    row = {
        "method": name,
        "n_iters_jax": int(jax_n),
        "n_iters_emulator": int(em_n),
        "iters_match": bool(jax_n == em_n),
        "max_abs_diff_err_hist": float(diff.max()) if n else None,
        "final_err_jax": float(jax_hist[n - 1]) if n else None,
        "final_err_emulator": float(em_hist[n - 1]) if n else None,
        "seconds_jax": round(t_jax, 3),
        "seconds_emulator": round(t_em, 3),
        "dtype": "float64/float64",
    }
    if extra:
        row.update(extra)
    bar = PASS_BAR[name]
    row["pass_bar"] = bar
    row["pass"] = bool(
        row["iters_match"] and n > 0 and row["max_abs_diff_err_hist"] <= bar
    )
    return row


def _problem(dataset: str, data_seed: int | None = None):
    """Bench-identical problem setup (bench.py::_load): seeded synthetic
    stand-in of the published shape, 10% uniform missing, zero-filled.
    `data_seed` draws a FRESH mixed-family stand-in at the dataset's shape
    instead (same hardening pattern as tools/validate_warm_svt.py
    --data-seeds): trajectory agreement must not be a seed-0 artifact."""
    import jax
    import jax.numpy as jnp

    from tritd_tpu.data import load_dataset, uniform_missing_mask
    from tritd_tpu.utils.config import README_MISSING_RATIO

    x_np, spec, provenance = load_dataset(dataset)
    if data_seed is not None:
        from tritd_tpu.data.loaders import synthetic_traffic

        x_np = synthetic_traffic(
            spec, jax.random.PRNGKey(data_seed), data_seed
        ).astype(np.float64)
        provenance = f"synthetic-seed{data_seed}"
    key = jax.random.PRNGKey(0)
    mask = uniform_missing_mask(key, x_np.shape, README_MISSING_RATIO)
    mask_np = np.asarray(mask)
    y_np = np.where(mask_np, x_np, 0.0)
    return (
        jnp.asarray(x_np, jnp.float64),
        jnp.asarray(y_np, jnp.float64),
        mask,
        x_np.astype(np.float64),
        y_np.astype(np.float64),
        mask_np,
        spec,
        provenance,
    )


def run_triple(x, y, mask, x_np, y_np, mask_np, spec, max_iter):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tritd_tpu.oracle import tritd_admm_em
    from tritd_tpu.solvers import tritd_admm
    from tritd_tpu.solvers.admm import init_factors
    from tritd_tpu.utils.config import COMPLETION_TRITD

    from tritd_tpu.utils.config import VIDEO_TRITD

    base = VIDEO_TRITD if spec.kind == "video" else COMPLETION_TRITD
    cfg = dataclasses.replace(base, dtype="float64", max_iter=max_iter)
    key = jax.random.PRNGKey(0)
    a0, b0, c0 = (
        np.asarray(u)
        for u in init_factors(key, x.shape, cfg.rank, jnp.float64)
    )
    t0 = time.perf_counter()
    res = tritd_admm(y, cfg, key=key, origin=x)
    jn = int(res.n_iters)
    jh = np.asarray(res.err_hist)[:jn]
    jr = np.asarray(res.rre_hist)[:jn]
    t_jax = time.perf_counter() - t0
    t0 = time.perf_counter()
    em = tritd_admm_em(
        y_np, a0, b0, c0, mu=cfg.mu, rho=cfg.rho, lam=cfg.lambda_l1,
        lam2=cfg.lambda2, alpha_c=cfg.alpha_c, max_iter=cfg.max_iter,
        tol=cfg.tol, origin=x_np,
    )
    t_em = time.perf_counter() - t0
    rre_n = min(jn, em["n_iters"])
    extra = {
        "max_abs_diff_rre_hist": float(
            np.abs(jr[:rre_n] - em["rre_hist"][:rre_n]).max()
        ),
    }
    return _compare("triple", jh, em["err_hist"], jn, em["n_iters"],
                    t_jax, t_em, extra)


def run_ttnn(x, y, mask, x_np, y_np, mask_np, spec, max_iter):
    from tritd_tpu.baselines.ttnn import tt_trpca
    from tritd_tpu.oracle import tt_trpca_em

    t0 = time.perf_counter()
    _, _, err_hist, n = tt_trpca(y, origin=x, max_iter=max_iter, svt_method="svd")
    jh = np.asarray(err_hist)
    t_jax = time.perf_counter() - t0
    t0 = time.perf_counter()
    em = tt_trpca_em(y_np, x_np, max_iter=max_iter)
    t_em = time.perf_counter() - t0
    return _compare("ttnn", jh, em["err_hist"], n, max_iter, t_jax, t_em)


def run_ring(x, y, mask, x_np, y_np, mask_np, spec, max_iter):
    from tritd_tpu.baselines.rtrc import rtrc
    from tritd_tpu.oracle import rtrc_em

    mu = 1e-3 if spec.kind == "video" else 1e-1  # `video...m:156` / `:139`
    t0 = time.perf_counter()
    _, _, err_hist, n = rtrc(y, mask, mu=mu, origin=x, max_iter=max_iter,
                             svt_method="svd")
    jh = np.asarray(err_hist)
    t_jax = time.perf_counter() - t0
    t0 = time.perf_counter()
    em = rtrc_em(y_np, mask_np.astype(np.float64), x_np, mu=mu,
                 max_iter=max_iter)
    t_em = time.perf_counter() - t0
    return _compare("ring", jh, em["err_hist"], n, max_iter, t_jax, t_em)


def run_fctn(x, y, mask, x_np, y_np, mask_np, spec, max_iter):
    import math

    from tritd_tpu.baselines.rc_fctn import rc_fctn_driver_traffic
    from tritd_tpu.oracle import rc_fctn_em

    sub = spec.fctn_subdim
    video = spec.kind == "video"
    from tritd_tpu.baselines.rc_fctn import rc_fctn_driver_video

    driver = rc_fctn_driver_video if video else rc_fctn_driver_traffic
    t0 = time.perf_counter()
    _, _, err_hist = driver(
        y, mask, sub, origin=x, max_iter=max_iter, svt_method="svd"
    )
    jh = np.asarray(err_hist)
    t_jax = time.perf_counter() - t0
    i, j, k = y_np.shape
    if video:
        # video split [I, J, sub, K/sub], Ind = observed, lambda = 1.8,
        # f = 0.7 (`video_triple_comparison.m:240-262`)
        shape4 = (i, j, sub, k // sub)
        lam, f_ = 1.8, 0.7
        ind1 = np.reshape(mask_np.astype(np.float64), shape4, order="F")
    else:
        shape4 = (i, j, k // sub, sub)
        lam = 5000.0 / math.sqrt(max(i, j) * (k // sub) * sub)
        f_ = 0.1
        ind1 = np.ones(shape4)  # driver quirk (`traffic...m:157-158`)
    y4 = np.reshape(y_np, shape4, order="F")
    x4 = np.reshape(x_np, shape4, order="F")
    t0 = time.perf_counter()
    em = rc_fctn_em(y4, lam, ind1, x4, f=f_, gamma=1e-3, deta=1e-3,
                    maxit=max_iter)
    t_em = time.perf_counter() - t0
    return _compare("fctn", jh, em["rse_real"], max_iter, max_iter, t_jax, t_em)


def run_sofia(x, y, mask, x_np, y_np, mask_np, spec, max_iter):
    import jax
    import jax.numpy as jnp

    from tritd_tpu.baselines.sofia import sofia_init
    from tritd_tpu.oracle import sofia_init_em
    from tritd_tpu.utils.config import SOFIA_PRESET

    p = SOFIA_PRESET
    m = spec.sofia_period
    max_epoch = min(p.max_epoch, max_iter)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    u_init = tuple(
        np.asarray(jax.random.uniform(kk, (dim, p.rank), jnp.float64))
        for kk, dim in zip((k1, k2, k3), y.shape)
    )
    t0 = time.perf_counter()
    _, _, _, err_hist = sofia_init(
        y, mask, p.rank, m, p.lambda1, p.lambda2, p.lambda3,
        origin=x, max_epoch=max_epoch, tol=p.tol,
        u_init=u_init, dtype=jnp.float64,
    )
    jh = np.asarray(err_hist)
    t_jax = time.perf_counter() - t0
    t0 = time.perf_counter()
    em = sofia_init_em(
        y_np, mask_np, p.rank, m, p.lambda1, p.lambda2, p.lambda3,
        u_init, x_np, max_epoch=max_epoch, tol=p.tol,
    )
    t_em = time.perf_counter() - t0
    return _compare("sofia", jh, em["err_hist"], len(jh), em["n_epochs"],
                    t_jax, t_em)


RUNNERS = {
    "triple": run_triple,
    "ttnn": run_ttnn,
    "ring": run_ring,
    "fctn": run_fctn,
    "sofia": run_sofia,
}


def _tiny_problem():
    """Small non-trivial completion problem: mixed structure + missing."""
    import jax
    import jax.numpy as jnp

    from tritd_tpu.data import uniform_missing_mask
    from tritd_tpu.data.loaders import DatasetSpec, synthetic_traffic

    spec = DatasetSpec("tiny", "traffic", "T", (9, 7, 24),
                       fctn_subdim=4, sofia_period=6)
    x_np = synthetic_traffic(spec, jax.random.PRNGKey(7), 7).astype(np.float64)
    key = jax.random.PRNGKey(0)
    mask = uniform_missing_mask(key, x_np.shape, 0.10)
    mask_np = np.asarray(mask)
    y_np = np.where(mask_np, x_np, 0.0)
    return (
        jnp.asarray(x_np), jnp.asarray(y_np), mask,
        x_np, y_np.astype(np.float64), mask_np, spec, "synthetic",
    )


def _tiny_video_problem():
    """Small video-protocol problem: fully observed (missing 0), video
    presets selected via spec.kind (VIDEO_TRITD, ring mu=1e-3, fctn video
    split/lambda, sofia m=1)."""
    import jax
    import jax.numpy as jnp

    from tritd_tpu.data.loaders import DatasetSpec
    from tritd_tpu.data.synthetic import synthetic_video

    spec = DatasetSpec("tinyvid", "video", "gray_images", (20, 24, 24),
                       fctn_subdim=4, sofia_period=1)
    observed, _bg, _fg = synthetic_video(jax.random.PRNGKey(3), spec.shape)
    x_np = np.asarray(observed, np.float64)
    mask_np = np.ones(x_np.shape, bool)
    return (
        jnp.asarray(x_np), jnp.asarray(x_np), jnp.asarray(mask_np),
        x_np, x_np.copy(), mask_np, spec, "synthetic",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--tiny-video", action="store_true")
    ap.add_argument("--dataset")
    ap.add_argument("--method", choices=METHODS)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--data-seed", type=int, default=None)
    ap.add_argument("--collect", action="store_true")
    ap.add_argument("--out", default=os.path.join("docs", "EMULATOR_PARITY_r05.json"))
    args = ap.parse_args()

    if args.collect:
        rows = []
        for fn in sorted(os.listdir(PARTIAL_DIR)):
            if fn.endswith(".json"):
                with open(os.path.join(PARTIAL_DIR, fn)) as f:
                    rows.append(json.load(f))
        out = {
            "what": "JAX (float64, CPU) vs independent MATLAB-semantics "
                    "float64 numpy emulator; full driver protocols on the "
                    "bench's synthetic stand-in tensors (10% missing, "
                    "zero-filled), identical inits",
            "emulator": "tritd_tpu/oracle/matlab_emulator.py",
            "all_pass": all(r["pass"] for r in rows),
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({"all_pass": out["all_pass"], "n_rows": len(rows)}))
        sys.exit(0 if out["all_pass"] else 1)

    if args.tiny or args.tiny_video:
        prob = _tiny_video_problem() if args.tiny_video else _tiny_problem()
        rows = []
        for m in METHODS:
            row = RUNNERS[m](*prob[:7], max_iter=30)
            rows.append(row)
            print(json.dumps(row), flush=True)
        ok = all(r["pass"] for r in rows)
        print(json.dumps({"tiny_all_pass": ok}))
        sys.exit(0 if ok else 1)

    assert args.dataset and args.method, "--dataset and --method required"
    prob = _problem(args.dataset, args.data_seed)
    row = RUNNERS[args.method](*prob[:7], max_iter=args.max_iter)
    row["dataset"] = args.dataset
    row["shape"] = list(prob[3].shape)
    row["provenance"] = prob[7]
    os.makedirs(PARTIAL_DIR, exist_ok=True)
    seed_tag = "" if args.data_seed is None else f"_seed{args.data_seed}"
    path = os.path.join(
        PARTIAL_DIR, f"{args.dataset}_{args.method}{seed_tag}.json"
    )
    with open(path, "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))
    sys.exit(0 if row["pass"] else 1)


if __name__ == "__main__":
    main()
