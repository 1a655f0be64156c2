"""Real-TPU evidence for the sharded program (VERDICT r3 #3).

All prior multi-chip evidence (dryrun, shard sweep, Gloo probe, HLO byte
audit) ran on virtual CPU meshes — correct for this environment, but the
shard_map/psum program had never been compiled or executed on actual TPU
hardware. This tool runs, on the ONE attached chip:

1. ``tritd_admm_sharded`` (explicit shard_map + psum, mode-1 slabs) on a
   1-device TPU mesh at taxi and chicago benchmark shapes — proves the
   collective program lowers and runs on real TPU; err_hist is checked
   against the single-device solver and wall-clock recorded (best-of-3,
   host-fetch fenced — `block_until_ready` does not fence the axon tunnel).
2. ``tritd_admm_auto`` (GSPMD input-sharding route) likewise.
3. An AOT compile of the 8-way DP x TP program against a v5e-8 topology via
   ``jax.experimental.topologies`` — executed only if the installed JAX +
   TPU plugin expose AOT topology descriptions; otherwise the exact blocker
   is recorded in the artifact (the honest alternative to skipping
   silently).

Usage: python tools/tpu_sharded_run.py [--iters 100] [--out docs/TPU_SHARDED_r04.json]
Foreground only — the axon TPU env does not reach background shells.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tritd_tpu.data import load_dataset, uniform_missing_mask
from tritd_tpu.parallel import make_mesh, tritd_admm_auto, tritd_admm_sharded
from tritd_tpu.solvers import tritd_admm
from tritd_tpu.utils.config import COMPLETION_TRITD


def run_path(label, fn, n_reps=3):
    t0 = time.perf_counter()
    res = fn()
    hist = np.asarray(res.err_hist)  # host fetch = honest fence
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        res = fn()
        np.asarray(res.err_hist)
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best:.3f}s (first call {compile_s:.1f}s)", flush=True)
    return hist, best, compile_s


def one_dataset(name: str, iters: int) -> dict:
    import dataclasses

    x_np, spec, prov = load_dataset(name)
    x = jnp.asarray(x_np, jnp.float32)
    key = jax.random.PRNGKey(0)
    mask = uniform_missing_mask(key, x.shape, 0.10)
    y = jnp.where(mask, x, 0.0)
    cfg = dataclasses.replace(COMPLETION_TRITD, max_iter=iters, tol=0.0)
    mesh = make_mesh(n_slab=1)  # the one real chip
    print(f"{name} {x.shape} (provenance={prov}) on mesh {dict(mesh.shape)}:",
          flush=True)

    h_ref, t_ref, _ = run_path("single-device", lambda: tritd_admm(y, cfg, key=key))
    h_sh, t_sh, c_sh = run_path(
        "shard_map+psum (n_slab=1)",
        lambda: tritd_admm_sharded(y, cfg, mesh, key=key),
    )
    h_auto, t_auto, c_auto = run_path(
        "GSPMD auto", lambda: tritd_admm_auto(y, cfg, mesh, key=key)
    )
    row = {
        "dataset": name, "shape": list(x.shape), "provenance": prov,
        "iters": iters,
        "seconds": {"single": round(t_ref, 4), "shard_map": round(t_sh, 4),
                    "gspmd_auto": round(t_auto, 4)},
        "first_call_seconds": {"shard_map": round(c_sh, 1),
                               "gspmd_auto": round(c_auto, 1)},
        "max_abs_hist_diff": {
            "shard_map": float(np.max(np.abs(h_sh - h_ref))),
            "gspmd_auto": float(np.max(np.abs(h_auto - h_ref))),
        },
        "err_last": float(h_ref[-1]),
    }
    print(f"  max|dhist| shard_map={row['max_abs_hist_diff']['shard_map']:.2e} "
          f"auto={row['max_abs_hist_diff']['gspmd_auto']:.2e}", flush=True)
    return row


def aot_v5e8() -> dict:
    """Try to AOT-lower + compile the 8-way DP x TP batched program for a
    v5e-8 topology. Returns an artifact dict either way."""
    from tritd_tpu.parallel.sharded_admm import tritd_admm_batch_sharded

    out: dict = {"target": "v5e:2x4 (8 devices)"}
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
        devs = np.array(topo.devices).reshape(2, 4)
        mesh = jax.sharding.Mesh(devs, ("data", "slab"))
        import dataclasses

        from tritd_tpu.solvers import TriTDConfig

        cfg = TriTDConfig(rank=5, max_iter=25, tol=0.0)
        shape = (2, 100, 100, 500)  # DP=2 batch of taxi-shaped problems

        def step(d_batch):
            res = tritd_admm_batch_sharded(
                d_batch, cfg, mesh, key=jax.random.PRNGKey(0)
            )
            return res.err_hist

        arg = jax.ShapeDtypeStruct(shape, jnp.float32)
        t0 = time.perf_counter()
        lowered = jax.jit(step).lower(arg)
        compiled = lowered.compile()
        out.update(
            ok=True,
            lower_compile_seconds=round(time.perf_counter() - t0, 1),
            n_devices=len(topo.devices),
        )
        try:
            mem = compiled.memory_analysis()
            out["memory_analysis"] = str(mem)
        except Exception as exc:  # noqa: BLE001
            out["memory_analysis"] = f"unavailable: {exc!r}"
        try:
            out["hlo_bytes"] = len(compiled.as_text())
        except Exception:
            pass
    except Exception as exc:  # noqa: BLE001
        out.update(ok=False, blocker=repr(exc))
    return out


def main() -> None:
    from tritd_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--out", default=None)
    p.add_argument("--datasets", default="taxi,chicago")
    a = p.parse_args()

    result = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "rows": [one_dataset(n, a.iters) for n in a.datasets.split(",")],
        "aot_v5e8": aot_v5e8(),
    }
    print(json.dumps(result, indent=1))
    if a.out:
        with open(a.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
