"""Demo: RC-FCTN robust tensor completion on a video tensor.

Mirrors `other_methods/IPI_RTC_FCTN-main/Demo_RC_FCTN.m` (SURVEY §4): load a
grayscale video, normalize to [0,1], reshape to 4-way [I, J, 1, K]
(`Demo_RC_FCTN.m:13`), draw a uniform observation set at `sample_ratio`
(committed value 1.0, `:22`), run RC_FCTN with lambda = 5/sqrt(max(I,J)*n3*n4)
and the demo's (gamma, deta, f) grid point (1e-4, 1e-3, 0.7) (`:30-41`), and
report RSE + per-frame PSNR/SSIM of the reconstruction.

Run: python examples/demo_rc_fctn.py [--dataset highway] [--frames 60]
     [--max-iter 30] [--sample-ratio 1.0]
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
    p.add_argument("--sample-ratio", type=float, default=1.0)
    p.add_argument("--out-dir", default="demo_out")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tritd_tpu.baselines import rc_fctn
    from tritd_tpu.data import load_dataset
    from tritd_tpu.metrics.image import quality
    from tritd_tpu.utils.artifacts import save_artifact

    x_np, _spec, provenance = load_dataset(args.dataset)
    x = jnp.asarray(x_np[..., : args.frames], jnp.float32)
    x = x / jnp.max(jnp.abs(x))
    i, j, k = x.shape
    # `Demo_RC_FCTN.m:13`: X = reshape(double(gray_images), [I J 1 K])
    x4 = x.reshape(i, j, 1, k)
    print(f"dataset={args.dataset} ({provenance}), 4-way shape={x4.shape}")

    key = jax.random.PRNGKey(0)
    obs = jax.random.uniform(key, x4.shape) <= args.sample_ratio
    f_obs = jnp.where(obs, x4, 0.0)

    # `Demo_RC_FCTN.m:34`: lambda = lamb/sqrt(max(I,J)*n3*n4), lamb=5
    lam = 5.0 / float(jnp.sqrt(max(i, j) * 1 * k))
    t0 = time.perf_counter()
    x_hat4, s4, err_hist = rc_fctn(
        f_obs, lam, obs.astype(x4.dtype), origin=x4,
        f=0.7, gamma=1e-4, deta=1e-3, max_iter=args.max_iter,
    )
    elapsed = time.perf_counter() - t0
    x_hat = jnp.clip(x_hat4.reshape(i, j, k), 0.0, 1.0)

    save_artifact(args.out_dir, args.dataset, "fctn", "Xhat", np.asarray(x_hat))
    save_artifact(
        args.out_dir, args.dataset, "fctn", "O", np.asarray(s4.reshape(i, j, k))
    )
    save_artifact(
        args.out_dir, args.dataset, "fctn", "errHist", np.asarray(err_hist)
    )

    rse = float(
        jnp.linalg.norm((x_hat - x).ravel()) / jnp.linalg.norm(x.ravel())
    )
    mean_psnr, mean_ssim = quality(255.0 * x, 255.0 * x_hat)
    print(json.dumps({
        "method": "rc_fctn",
        "seconds": round(elapsed, 3),
        "rse": round(rse, 5),
        "mean_psnr": round(float(mean_psnr), 3),
        "mean_ssim": round(float(mean_ssim), 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
