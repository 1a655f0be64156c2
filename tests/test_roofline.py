"""Roofline accounting models (utils/roofline.py, VERDICT r4 #2)."""

import math

from tritd_tpu.utils.roofline import (
    HBM_PEAK_GBPS,
    annotate,
    model_for,
    svt_admm_model,
    tritd_model,
)


def test_tritd_model_scales_with_tensor_size():
    small = tritd_model((10, 10, 10), 5)
    big = tritd_model((20, 10, 10), 5)
    assert big["flops_per_iter"] > small["flops_per_iter"]
    # bytes dominated by the 14 data-sized passes
    n = 20 * 10 * 10
    assert big["hbm_bytes_per_iter"] == 14 * n * 4
    assert big["working_set_bytes"] == 7 * n * 4


def test_svt_model_counts_every_cut():
    # chicago TT cuts: (77, 77*2016) and (77*77, 2016); the thin sides are
    # 77 and 2016, so the eigh term is dominated by 2016^3
    m = svt_admm_model((77, 77, 2016), "tt", "gram")
    assert m["flops_per_iter"] > 10 * 2016**3
    # warm:8 amortizes the eigh 8x -> strictly fewer flops than exact gram
    w = svt_admm_model((77, 77, 2016), "tt", "warm:8")
    assert w["flops_per_iter"] < m["flops_per_iter"]


def test_annotate_hbm_bound_and_vmem_residency():
    # chicago (47.8 MB/tensor): working set >> VMEM -> hbm-bound
    row = {}
    annotate(row, tritd_model((77, 77, 2016), 5), 1.26e-3, "device_rate")
    r = row["roofline"]
    assert r["roofline_bound"] == "hbm"
    assert 0 < r["pct_hbm_peak"] <= 100
    assert r["achieved_gbps"] < HBM_PEAK_GBPS
    # taxi: the r4-measured device rate (151.6 us/iter) implies traffic
    # beyond HBM peak -> residency/fusion beats the byte model, so the HBM
    # roof must not be reported as binding
    row2 = {}
    annotate(row2, tritd_model((100, 100, 500), 5), 151.6e-6, "device_rate")
    r2 = row2["roofline"]
    assert r2["roofline_bound"] == "vmem-resident(compute)"
    assert r2["pct_hbm_peak"] > 100
    # sensor (54*4*1440 ~ 1.2 MB/tensor): structurally VMEM-resident
    # regardless of the measured rate
    row3 = {}
    annotate(row3, tritd_model((54, 4, 1440), 5), 1e-3, "device_rate")
    assert row3["roofline"]["roofline_bound"] == "vmem-resident(compute)"


def test_model_for_dispatch():
    assert model_for("sofia", (23, 23, 2016), None) is None
    for method in ("triple", "ttnn", "ring"):
        m = model_for(method, (23, 23, 2016), "gram")
        assert m["flops_per_iter"] > 0 and m["hbm_bytes_per_iter"] > 0
    # fctn models the 4-way reshape
    m4 = model_for("fctn", (77, 77, 2016), "gram", fctn_subdim=8)
    assert m4["flops_per_iter"] > 0
    # bf16 storage halves the byte model
    f32 = model_for("triple", (77, 77, 2016), None, elem_bytes=4)
    bf16 = model_for("triple", (77, 77, 2016), None, elem_bytes=2)
    assert math.isclose(
        f32["hbm_bytes_per_iter"], 2 * bf16["hbm_bytes_per_iter"]
    )


def test_annotate_none_model():
    row = {}
    annotate(row, None, 1.0, "walltime/n_iters")
    assert row["roofline"] is None
