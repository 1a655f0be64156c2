"""Multi-process distributed tier (SURVEY §2.5 / VERDICT r1 missing #2):
the shard_map program must run ACROSS PROCESS BOUNDARIES, not just across
virtual devices of one process.

Spawns 2 subprocesses x 4 virtual CPU devices each (jax.distributed over a
local coordinator, collectives on Gloo) and checks the 8-way distributed
err/rre histories against the in-process single-device solver."""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_matches_single_device(tmp_path):
    # bounded by subprocess.communicate(timeout=...) below
    port = _free_port()
    out = tmp_path / "proc0.npz"
    shape, rank, max_iter = "22,13,17", 2, 25
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tritd_tpu.parallel.distributed",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2",
                "--process-id", str(pid),
                "--local-devices", "4",
                "--platform", "cpu",
                "--shape", shape,
                "--rank", str(rank),
                "--max-iter", str(max_iter),
            ]
            + (["--out", str(out)] if pid == 0 else []),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for proc in procs:
        stdout, _ = proc.communicate(timeout=570)
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    assert out.exists(), logs[0]

    with np.load(out) as f:
        assert int(f["n_processes"]) == 2
        assert int(f["n_devices"]) == 8
        got_err = f["err_hist"]
        got_rre = f["rre_hist"]

    # in-process reference on the identical problem/key
    import jax

    from tritd_tpu.data.synthetic import random_tritd, sparse_outliers
    from tritd_tpu.solvers import TriTDConfig, tritd_admm

    key = jax.random.PRNGKey(0)
    x, _ = random_tritd(key, (22, 13, 17), rank=rank)
    o = sparse_outliers(jax.random.fold_in(key, 1), (22, 13, 17), 0.05, 4.0)
    ref = tritd_admm(
        x + o, TriTDConfig(rank=rank, max_iter=max_iter, tol=0.0),
        key=key, origin=x,
    )
    np.testing.assert_allclose(
        got_err, np.asarray(ref.err_hist), rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        got_rre, np.asarray(ref.rre_hist), rtol=2e-3, atol=1e-5
    )
