"""Demo: tensor robust PCA competitors (SNN / TNN / TTNN) on a video tensor.

Mirrors the reference's executable verification script
`other_methods/Low-rank-...-master/Demo_TRPCA.m` (SURVEY §4: "demos as
integration tests"): normalize a grayscale video tensor to [0,1], optionally
corrupt a fraction `rhos` of entries with uniform noise (the committed demo
uses rhos=0, `Demo_TRPCA.m:18-21`), run each enabled method, save
`<name>_<method>_{Xhat,O,errHist}` artifacts plus video exports, and report
per-frame PSNR of the clipped reconstruction (`Demo_TRPCA.m:43-48`).

Run: python examples/demo_trpca.py [--dataset highway] [--frames 60]
     [--max-iter 30] [--rhos 0.1] [--methods snn tnn ttnn]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="highway")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--max-iter", type=int, default=30)
    p.add_argument("--rhos", type=float, default=0.0,
                   help="corruption density (Demo_TRPCA.m:18, committed 0)")
    p.add_argument("--methods", nargs="+", default=["snn", "tnn", "ttnn"],
                   choices=["snn", "tnn", "ttnn"])
    p.add_argument("--out-dir", default="demo_out")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tritd_tpu.baselines import trpca_snn, trpca_tnn, tt_trpca
    from tritd_tpu.cli.figures import tensor2video
    from tritd_tpu.data import load_dataset
    from tritd_tpu.metrics.image import psnr
    from tritd_tpu.utils.artifacts import save_artifact

    x_np, _spec, provenance = load_dataset(args.dataset)
    x0 = jnp.asarray(x_np[..., : args.frames], jnp.float32)
    x0 = x0 / jnp.max(jnp.abs(x0))  # `Demo_TRPCA.m:14` normalization
    max_p = float(jnp.max(jnp.abs(x0)))
    n1, n2, n3 = x0.shape
    print(f"dataset={args.dataset} ({provenance}), shape={x0.shape}")

    key = jax.random.PRNGKey(42)  # `rand('seed', 42)`
    xn = x0
    if args.rhos > 0:
        k1, k2 = jax.random.split(key)
        hit = jax.random.bernoulli(k1, args.rhos, x0.shape)
        xn = jnp.where(hit, jax.random.uniform(k2, x0.shape), x0)

    for method in args.methods:
        t0 = time.perf_counter()
        if method == "snn":
            # `Demo_TRPCA.m` SNN block: alpha=[7 9 2.6], mu=1e-3, rho=1.2
            x_hat, e, err_hist = trpca_snn(
                xn, alpha=(7.0, 9.0, 2.6), mu=1e-3, rho=1.2,
                max_iter=args.max_iter,
            )
        elif method == "tnn":
            x_hat, e, err_hist = trpca_tnn(
                xn, origin=x0, max_iter=args.max_iter
            )
        else:
            x_hat, e, err_hist, _ = tt_trpca(
                xn, lam=50.0, f=5.0, origin=x0, max_iter=args.max_iter
            )
        x_hat = np.asarray(x_hat)
        elapsed = time.perf_counter() - t0

        save_artifact(args.out_dir, args.dataset, method, "Xhat", x_hat)
        save_artifact(args.out_dir, args.dataset, method, "O", np.asarray(e))
        save_artifact(
            args.out_dir, args.dataset, method, "errHist", np.asarray(err_hist)
        )
        tensor2video(x_hat, f"{args.out_dir}/{args.dataset}_{method}_Xhat")
        tensor2video(np.asarray(e), f"{args.out_dir}/{args.dataset}_{method}_O")

        # `Demo_TRPCA.m:43-48`: clip to [0, maxP], per-frame PSNR at 255 scale
        x_clip = jnp.clip(jnp.asarray(x_hat), 0.0, max_p)
        psnrs = [
            float(psnr(255.0 * x0[:, :, i], 255.0 * x_clip[:, :, i]))
            for i in range(n3)
        ]
        print(json.dumps({
            "method": method,
            "seconds": round(elapsed, 3),
            "mean_psnr": round(float(np.mean(psnrs)), 3),
            "final_err": float(np.asarray(err_hist)[-1])
            if np.asarray(err_hist).size else None,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
