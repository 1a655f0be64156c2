"""On-device validation of the warm-started SVT ("warm:<K>") inside
RC-FCTN's TRAFFIC protocol at chicago shape (VERDICT r3 #4).

The chicago 4-way reshape (77,77,252,8) has bipartitions 5929x2016 /
19404x616 / 616x19404; only the first has an expensive thin-side eigh
(~160 ms measured), and its retained spectrum under the `>1` gate is >=76%
— NOT low-rank, so the randomized route is invalid. The warm route reuses
the previous refresh's singular basis (stale-basis GEMM projection) and
refreshes the exact Gram-eigh every K-th iteration.

Runs the chicago driver protocol with the exact gram path and with
warm:K for each requested K, reporting err_hist agreement, final-X
distance, and wall time — the same standard the randomized video route met
(tools/validate_lowrank_svt.py).

Usage: python tools/validate_warm_svt.py [--iters 100] [--ks 2,4,8]
       [--out docs/WARM_SVT_r04.json] [--ref-cache /tmp/warm_ref.npz]
Foreground only — the axon TPU env does not reach background shells.

MEASURED QUIRK (r4): compiling a SECOND warm:<K> program in the same
process SIGKILLs the remote tpu_compile_helper (the known big-eigh
fori-loop-recompile OOM, CLAUDE.md) — run one K per process and merge via
--ref-cache (stores the gram reference history/X so later processes skip
the exact solve) + per-K --out files.
"""
import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np

from tritd_tpu.baselines.rc_fctn import _split_mode3, rc_fctn
from tritd_tpu.data import load_dataset


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--ks", default="2,4,8")
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--out", default=None)
    p.add_argument("--ref-cache", default=None,
                   help=".npz path caching the exact-gram reference run")
    a = p.parse_args()

    t0 = time.perf_counter()
    x_np, spec, prov = load_dataset("chicago")
    x = jnp.asarray(x_np, jnp.float32)
    i, j, k = x.shape
    sub = spec.fctn_subdim
    n3, n4 = k // sub, sub
    y4 = _split_mode3(x, n3, n4)
    # driver quirk: Ind all ones (`traffic_triple_comparison.m:158`)
    ind = jnp.ones(y4.shape, x.dtype)
    lam = 5000.0 / float(np.sqrt(max(i, j) * n3 * n4))
    np.asarray(y4[0, 0, 0, 0])
    print(f"setup {time.perf_counter() - t0:.1f}s (provenance={prov})", flush=True)

    def solve(method):
        t0 = time.perf_counter()
        xh, _, hist = rc_fctn(
            y4, lam, ind, origin=y4, f=0.1, max_iter=a.iters,
            svt_method=method, chunk=a.chunk,
        )
        hist = np.asarray(hist)  # host fetch = honest fence
        dt = time.perf_counter() - t0
        print(f"  {method}: {dt:.1f}s err[first,last]={hist[0]:.4g},{hist[-1]:.4g}",
              flush=True)
        return xh, hist, dt

    if a.ref_cache and os.path.exists(a.ref_cache):
        z = np.load(a.ref_cache)
        xg, hg, tg2 = jnp.asarray(z["xg"]), z["hg"], float(z["tg2"])
        assert z["iters"] == a.iters, "ref cache was run at different --iters"
        print(f"  gram (cached): {tg2:.1f}s err[last]={hg[-1]:.4g}", flush=True)
    else:
        xg, hg, tg = solve("gram")
        # second run: jit-cached — the warm rows below are also warm-cache,
        # so time gram warm-cache too for a same-cache-state comparison
        _, _, tg2 = solve("gram")
        if a.ref_cache:
            np.savez(a.ref_cache, xg=np.asarray(xg), hg=hg, tg2=tg2,
                     iters=a.iters)

    rows = []
    for kk in (int(v) for v in a.ks.split(",")):
        meth = f"warm:{kk}"
        try:
            xw, hw, tw = solve(meth)          # cold compile
            _, _, tw2 = solve(meth)           # warm cache
        except Exception as exc:  # noqa: BLE001 — helper OOM: record, go on
            rows.append({"method": meth, "error": repr(exc)[:300]})
            print(f"  -> {meth} FAILED: {exc!r}", flush=True)
            continue
        adiff = np.abs(hw - hg)
        k_worst = int(np.argmax(adiff))
        rows.append({
            "method": meth,
            "seconds_cold": round(tw, 1),
            "seconds_warm_cache": round(tw2, 1),
            "max_abs_hist_diff": float(adiff.max()),
            "argmax_hist_diff_iter": k_worst,
            "hist_gram_at_argmax": float(hg[k_worst]),
            "max_rel_hist_diff": float(np.max(adiff / np.maximum(hg, 1e-12))),
            "rel_final_x_diff": float(
                jnp.linalg.norm((xw - xg).ravel()) / jnp.linalg.norm(xg.ravel())
            ),
            "speedup_vs_gram": round(tg2 / tw2, 2),
        })
        print(f"  -> max|dhist|={rows[-1]['max_abs_hist_diff']:.2e} "
              f"relX={rows[-1]['rel_final_x_diff']:.4f} "
              f"speedup={rows[-1]['speedup_vs_gram']}", flush=True)

    result = {
        "protocol": {
            "dataset": "chicago", "shape4": list(y4.shape), "lam": lam,
            "iters": a.iters, "provenance": prov,
            "gram_seconds_warm_cache": round(tg2, 1),
            "err_last_gram": float(hg[-1]),
        },
        "rows": rows,
    }
    print(json.dumps(result, indent=1))
    if a.out:
        with open(a.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
