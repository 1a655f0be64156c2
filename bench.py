"""Benchmark: TriTD-ADMM completion protocol wall-clock vs the reference.

Runs the traffic-completion protocol (`traffic_triple_comparison.m`) for the
taxi configuration — the headline row of BASELINE.md (reference MATLAB:
53.90 s, RRE 0.338 at 10% missing, r=5) — on whatever accelerator JAX
exposes. Datasets load from data/<name>.mat when present, otherwise a seeded
synthetic low-TriTD-rank stand-in of the published shape (identical compute
profile; RRE then reported against the synthetic truth).

Prints ONE JSON line:
  {"metric": "taxi_completion_walltime", "value": <s>, "unit": "s",
   "vs_baseline": <reference_seconds / our_seconds>}
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tritd_tpu.data import load_dataset, uniform_missing_mask
    from tritd_tpu.metrics.recon import rre
    from tritd_tpu.ops.designs import triple_product
    from tritd_tpu.solvers import tritd_admm
    from tritd_tpu.utils.config import COMPLETION_TRITD, README_MISSING_RATIO

    dataset = "taxi"
    baseline_seconds = 53.90  # BASELINE.md, reference README.md:63

    x_np, spec, provenance = load_dataset(dataset)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(x_np, jnp.float32)
    mask = uniform_missing_mask(key, x.shape, README_MISSING_RATIO)
    y = jnp.where(mask, x, 0.0)

    import numpy as np

    cfg = COMPLETION_TRITD
    run = lambda: tritd_admm(y, cfg, key=key)

    # warm-up (compile) — the reference protocol times the solve, not compile.
    # Timing must FETCH results to host: through the axon TPU tunnel,
    # block_until_ready alone does not synchronize with device completion.
    res = run()
    np.asarray(res.err_hist)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        np.asarray(res.err_hist)
        best = min(best, time.perf_counter() - t0)

    x_hat = triple_product(res.a, res.b, res.c)
    final_rre = float(rre(x_hat, x))
    n_iters = int(res.n_iters)
    iters_per_s = n_iters / best if best > 0 else float("nan")

    print(
        json.dumps(
            {
                "metric": "taxi_completion_walltime",
                "value": round(best, 4),
                "unit": "s",
                "vs_baseline": round(baseline_seconds / best, 2),
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "dataset": dataset,
                    "provenance": provenance,
                    "shape": list(x.shape),
                    "rank": cfg.rank,
                    "n_iters": n_iters,
                    "iters_per_s": round(iters_per_s, 2),
                    "rre_all_entries": round(final_rre, 4),
                    "baseline_rre": 0.338,
                    "baseline_seconds": baseline_seconds,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
