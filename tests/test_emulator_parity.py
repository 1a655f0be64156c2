"""Reference-emulator trajectory parity (VERDICT r4 #1), tiny shapes.

The real evidence runs at protocol scale via tools/emulator_parity.py
(docs/EMULATOR_PARITY_r05.json). Here the same harness runs its --tiny
mode in a subprocess — a subprocess because the comparison wants float64
on BOTH sides (jax_enable_x64 is process-global and the rest of the suite
runs float32): 30 iterations of all five solver protocols on a 9x7x24
mixed-structure completion problem, full err_hist trajectories compared
against the independent MATLAB-semantics emulator
(tritd_tpu/oracle/matlab_emulator.py).
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tiny_full_protocol_parity_all_methods():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "emulator_parity.py"),
         "--tiny"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    rows = [json.loads(line) for line in proc.stdout.splitlines()
            if line.startswith("{") and '"method"' in line]
    assert {r["method"] for r in rows} == {
        "triple", "ttnn", "ring", "fctn", "sofia"
    }
    for r in rows:
        assert r["pass"], r
        assert r["iters_match"], r
        # x64-vs-x64 agreement should be near machine epsilon at tiny shape,
        # far below the protocol-scale pass bar
        assert r["max_abs_diff_err_hist"] < 1e-10, r


def test_tiny_video_protocol_parity_all_methods():
    """Same harness under the VIDEO presets (VIDEO_TRITD, ring mu=1e-3,
    fctn video split/lambda/f, sofia m=1) on a fully observed video-like
    tensor — the second driver protocol's semantics, end to end."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "emulator_parity.py"),
         "--tiny-video"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    rows = [json.loads(line) for line in proc.stdout.splitlines()
            if line.startswith("{") and '"method"' in line]
    assert {r["method"] for r in rows} == {
        "triple", "ttnn", "ring", "fctn", "sofia"
    }
    for r in rows:
        assert r["pass"] and r["iters_match"], r
        assert r["max_abs_diff_err_hist"] < 1e-10, r


def test_emulator_triple_matches_golden_conventions():
    """The oracle package's column-major primitives agree with the pinned
    golden fixtures (tests/test_golden.py literals came from an identical
    derivation in tools/gen_golden.py — this guards the oracle copy)."""
    from tritd_tpu.oracle.matlab_emulator import (
        m_build_f,
        m_triple_product,
        m_unfold,
    )

    x = np.zeros((2, 3, 2))
    for i in range(2):
        for j in range(3):
            for t in range(2):
                x[i, j, t] = 100 * i + 10 * j + t
    from test_golden import BUILD_F, TRIPLE_PRODUCT, UNFOLD_2

    np.testing.assert_allclose(m_unfold(x, 2), UNFOLD_2)
    r = 2
    a = np.zeros((2, r, r))
    b = np.zeros((r, 2, r))
    c = np.zeros((r, r, 2))
    for i in range(2):
        for p in range(r):
            for q in range(r):
                a[i, p, q] = 1 + i + 2 * p + 3 * q
    for q in range(r):
        for j in range(2):
            for s in range(r):
                b[q, j, s] = 1 + 2 * q + j + 4 * s
    for q in range(r):
        for s in range(r):
            for t in range(2):
                c[q, s, t] = 1 + 3 * q + s + 2 * t
    np.testing.assert_allclose(m_build_f(b, c), BUILD_F)
    np.testing.assert_allclose(m_triple_product(a, b, c), TRIPLE_PRODUCT)
