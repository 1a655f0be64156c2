"""On-device validation of the randomized top-k SVT inside RC-FCTN's video
protocol (the numbers quoted in docs/BENCH_NOTES.md).

Runs the highway-shape video solve twice — exact Gram-eigh SVT vs the
production ``"auto"`` route (randomized top-k on the square-ish
bipartitions) — and reports the err_hist agreement and final-X distance.
Round-3 capture on one TPU v5e (2026-08-21):

    lowrank: 110.9s (incl ~100 s compile)  gram: 411.5s
    max |hist_l - hist_g| = 2.0e-05        rel final-X diff = 0.0045

Usage: python tools/validate_lowrank_svt.py [n_iters=50] [method=auto]
(method e.g. "lowrank:512" to validate a non-default budget; foreground —
the axon TPU env does not reach background shells).
"""
import sys
import time

import jax.numpy as jnp
import numpy as np

from tritd_tpu.baselines.rc_fctn import _split_mode3, rc_fctn
from tritd_tpu.data import load_dataset


def main() -> None:
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    method = sys.argv[2] if len(sys.argv) > 2 else "auto"
    t0 = time.perf_counter()
    x_np, spec, _ = load_dataset("highway")
    x = jnp.asarray(x_np, jnp.float32)
    sub = spec.fctn_subdim
    y4 = _split_mode3(x, sub, x.shape[2] // sub)
    ind = _split_mode3(jnp.ones(x.shape, x.dtype), sub, x.shape[2] // sub)
    np.asarray(y4[0, 0, 0, 0])
    print(f"setup {time.perf_counter() - t0:.1f}s", flush=True)

    res = {}
    for label, meth, chunk in ((method, method, 25), ("gram", "gram", 5)):
        t0 = time.perf_counter()
        xh, _, hist = rc_fctn(
            y4, 1.8, ind, origin=y4, f=0.7, max_iter=n_iters,
            svt_method=meth, chunk=chunk,
        )
        hist = np.asarray(hist)
        res[label] = (hist, jnp.asarray(xh))
        print(
            f"{label}: {time.perf_counter() - t0:.1f}s "
            f"err[first,last]={hist[0]:.4g},{hist[-1]:.4g}", flush=True,
        )

    hl, hg = res[method][0], res["gram"][0]
    xl, xg = res[method][1], res["gram"][1]
    print(f"max |hist_{method} - hist_gram| =", float(np.max(np.abs(hl - hg))))
    print(
        "rel final-X diff =",
        float(jnp.linalg.norm((xl - xg).ravel()) / jnp.linalg.norm(xg.ravel())),
    )


if __name__ == "__main__":
    main()
