"""Demo: RNC-FCTN (PAM on explicit FCTN factors) on a video tensor.

Mirrors `other_methods/IPI_RTC_FCTN-main/Demo_RNC_FCTN.m` (SURVEY §4): load
a grayscale video, normalize, reshape to 4-way [I, J, 1, K]
(`Demo_RNC_FCTN.m:11`), observe at `sample_ratio` (committed value 1.0,
`:15`), and run the PAM solver with the demo's rank schedule. At
sample_ratio < 1 the reference's 2-direction interpolated warm start
(`:33-55`) replaces the zero-filled data tensor
(tritd_tpu.baselines.rnc_fctn.interpolate_init); at 1 it is the identity
and is skipped.

Run: python examples/demo_rnc_fctn.py [--dataset highway] [--frames 40]
     [--max-iter 20]
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
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--max-iter", type=int, default=20)
    p.add_argument("--sample-ratio", type=float, default=1.0)
    p.add_argument("--out-dir", default="demo_out")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tritd_tpu.baselines import rnc_fctn
    from tritd_tpu.data import load_dataset
    from tritd_tpu.metrics.image import quality
    from tritd_tpu.utils.artifacts import save_artifact

    x_np, _spec, provenance = load_dataset(args.dataset)
    x = jnp.asarray(x_np[..., : args.frames], jnp.float32)
    x = x / jnp.max(jnp.abs(x))
    i, j, k = x.shape
    x4 = x.reshape(i, j, 1, k)
    print(f"dataset={args.dataset} ({provenance}), 4-way shape={x4.shape}")

    key = jax.random.PRNGKey(0)
    omega = jax.random.uniform(key, x4.shape) <= args.sample_ratio
    f_obs = jnp.where(omega, x4, 0.0)
    if args.sample_ratio < 1.0:
        from tritd_tpu.baselines.rnc_fctn import interpolate_init

        f_obs = interpolate_init(f_obs, omega)

    t0 = time.perf_counter()
    x_hat4, _gs, e4, rse_hist, n_iters = rnc_fctn(
        f_obs, lam=1.0, omega=omega, origin=x4,
        max_iter=args.max_iter, key=key,
    )
    elapsed = time.perf_counter() - t0
    x_hat = jnp.clip(x_hat4.reshape(i, j, k), 0.0, 1.0)

    save_artifact(args.out_dir, args.dataset, "rnc_fctn", "Xhat", np.asarray(x_hat))
    save_artifact(
        args.out_dir, args.dataset, "rnc_fctn", "errHist", np.asarray(rse_hist)
    )

    rse = float(
        jnp.linalg.norm((x_hat - x).ravel()) / jnp.linalg.norm(x.ravel())
    )
    mean_psnr, mean_ssim = quality(255.0 * x, 255.0 * x_hat)
    print(json.dumps({
        "method": "rnc_fctn",
        "seconds": round(elapsed, 3),
        "n_iters": int(n_iters),
        "rse": round(rse, 5),
        "mean_psnr": round(float(mean_psnr), 3),
        "mean_ssim": round(float(mean_ssim), 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
