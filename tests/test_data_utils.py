"""Data loaders, synthetic protocol fixtures, artifacts, checkpointing,
figures, and CLI smoke tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.data import (
    DATASETS,
    load_dataset,
    make_completion_problem,
    uniform_missing_mask,
)
from tritd_tpu.solvers import TriTDConfig, tritd_admm, init_state
from tritd_tpu.utils import artifacts, checkpoint
from tritd_tpu.utils.config import COMPLETION_TRITD, VIDEO_TRITD


def test_uniform_mask_exact_count(rng_key):
    mask = uniform_missing_mask(rng_key, (10, 10, 10), 0.15)
    assert int((~mask).sum()) == 150  # exactly round(0.15*1000), like randperm


def test_completion_problem_protocol(rng_key):
    prob = make_completion_problem(
        rng_key, (12, 13, 14), rank=2, missing_ratio=0.2, outlier_density=0.05
    )
    # zero-fill at missing entries
    assert float(jnp.abs(jnp.where(~prob["mask"], prob["y"], 0.0)).max()) == 0.0
    obs = prob["mask"]
    np.testing.assert_allclose(
        np.asarray(prob["y"])[np.asarray(obs)],
        np.asarray(prob["x"] + prob["outliers"])[np.asarray(obs)],
        rtol=1e-5,
    )


def test_dataset_registry_constants():
    """Driver constants captured per SURVEY: taxi truncation + per-dataset
    FCTN subdims + SOFIA periods (`traffic_triple_comparison.m:9,24,79-86`)."""
    assert DATASETS["taxi"].truncate_frames == 500
    assert DATASETS["sensor"].fctn_subdim == 6
    assert DATASETS["network"].fctn_subdim == 16
    assert DATASETS["taxi"].fctn_subdim == 10
    assert DATASETS["chicago"].fctn_subdim == 8
    assert DATASETS["sensor"].sofia_period == 144
    assert DATASETS["taxi"].sofia_period == 7


def test_load_dataset_synthetic_fallback(tmp_path):
    x, spec, provenance = load_dataset("sensor", str(tmp_path))
    assert provenance == "synthetic"
    assert x.shape == spec.shape
    assert x.dtype == np.float64


def test_seasonal_cp_generator():
    """Mixed-family stand-in component (VERDICT r3 #7): unit RMS, seeded-
    deterministic, and actually seasonal — each temporal factor is a
    harmonic of the requested period, so the mode-3 energy spectrum must
    peak at the harmonic bins, giving SOFIA's CP+seasonal model structure
    it can fit."""
    import jax

    from tritd_tpu.data.synthetic import seasonal_cp

    key = jax.random.PRNGKey(3)
    shape, period = (12, 10, 288), 144
    x = seasonal_cp(key, shape, rank=3, period=period)
    assert x.shape == shape
    np.testing.assert_allclose(float(np.sqrt(np.mean(np.asarray(x) ** 2))), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(seasonal_cp(key, shape, rank=3, period=period)), np.asarray(x)
    )
    # n3=288 spans exactly 2 periods -> harmonics r=1..3 live in FFT bins
    # 2r; those 3 bins must dominate the temporal spectrum.
    spec = np.abs(np.fft.rfft(np.asarray(x), axis=2)) ** 2
    energy = spec.sum(axis=(0, 1))
    harmonic_bins = [2, 4, 6]
    assert energy[harmonic_bins].sum() > 0.8 * energy[1:].sum()


def test_traffic_fallback_is_mixed_family(tmp_path):
    """The traffic stand-in contains a seasonal component at the dataset's
    SOFIA period: sensor (period 144, n3=1440 = 10 periods) must show a
    spectral peak at bin 10 vs its immediate neighbors."""
    x, spec, _ = load_dataset("sensor", str(tmp_path))
    energy = (np.abs(np.fft.rfft(x, axis=2)) ** 2).sum(axis=(0, 1))
    assert energy[10] > 5.0 * max(energy[9], energy[11])


def test_load_dataset_mat(tmp_path):
    import scipy.io as sio

    t = np.random.default_rng(0).normal(size=(6, 7, 8))
    sio.savemat(os.path.join(tmp_path, "sensor.mat"), {"T": t})
    x, spec, provenance = load_dataset("sensor", str(tmp_path))
    assert provenance == "mat"
    np.testing.assert_allclose(x, t)


def test_load_dataset_mat73(tmp_path):
    """The v7.3 (HDF5) ingest path: a save_mat73 file carries the real MAT
    userblock header (scipy defers to the HDF reader) and column-major
    array layout; load_dataset must read it back exactly."""
    import scipy.io as sio

    from tritd_tpu.data import save_mat73

    t = np.random.default_rng(1).normal(size=(6, 7, 8))
    path = os.path.join(tmp_path, "sensor.mat")
    save_mat73(path, {"T": t})
    with pytest.raises(NotImplementedError):  # genuine v7.3 header
        sio.loadmat(path)
    x, _, provenance = load_dataset("sensor", str(tmp_path))
    assert provenance == "mat"
    np.testing.assert_allclose(x, t)


def test_synthetic_video_standin_is_low_rank_plus_sparse():
    """The video stand-in must preserve low-TriTD-rank background structure
    (VERDICT r1 weak #2: abs()/clip rectification destroyed it) and be
    deterministic across processes (crc32 seeding, not salted hash())."""
    from tritd_tpu.data import DATASETS, synthetic_video_truth
    from tritd_tpu.solvers import TriTDConfig, tritd_admm

    spec = DATASETS["highway"]
    small = type(spec)(
        name="highway", kind="video", mat_variable="gray_images",
        shape=(32, 40, 24),
    )
    observed, bg, fg_mask = synthetic_video_truth(small)
    observed2, bg2, _ = synthetic_video_truth(small)
    np.testing.assert_array_equal(np.asarray(observed), np.asarray(observed2))
    frac = float(np.asarray(fg_mask).mean())
    assert 0.005 < frac < 0.05  # sparse, CDnet-object-like
    assert float(bg.min()) >= 39.0 and float(bg.max()) <= 216.0
    # the robust solver must actually recover the background well — the
    # whole point of the stand-in fix
    res = tritd_admm(observed, TriTDConfig(rank=6, max_iter=60), origin=bg)
    from tritd_tpu.ops.designs import triple_product

    l = triple_product(res.a, res.b, res.c)
    rre_bg = float(
        np.linalg.norm(np.asarray(l - bg)) / np.linalg.norm(np.asarray(bg))
    )
    assert rre_bg < 0.1, f"video stand-in not recoverable: RRE {rre_bg}"


def test_load_dataset_taxi_truncation(tmp_path):
    import scipy.io as sio

    t = np.zeros((4, 4, 600))
    sio.savemat(os.path.join(tmp_path, "taxi.mat"), {"T": t})
    x, _, _ = load_dataset("taxi", str(tmp_path))
    assert x.shape == (4, 4, 500)


def test_artifact_roundtrip(tmp_path):
    hist = np.arange(5.0)
    artifacts.save_artifact(str(tmp_path), "sensor", "triple", "errHist", hist)
    got = artifacts.load_artifact(str(tmp_path), "sensor", "triple", "errHist")
    np.testing.assert_allclose(got, hist)
    path = artifacts.artifact_path(str(tmp_path), "sensor", "triple", "errHist")
    assert path.endswith("sensor_triple_errHist.npz")


def test_checkpoint_roundtrip(tmp_path, rng_key):
    d = jax.random.normal(rng_key, (6, 7, 8))
    cfg = TriTDConfig(rank=2, max_iter=10)
    state = init_state(d, cfg, rng_key)
    path = checkpoint.save_state(str(tmp_path / "state.npz"), state)
    loaded = checkpoint.load_state(path)
    for name in state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(loaded, name)), np.asarray(getattr(state, name))
        )


def test_np_savable_raw_void_bf16():
    """Legacy raw-void bf16 npz fields are repaired via a bf16 view, not a
    TypeError-raising astype (r2 advisor)."""
    want = np.arange(6, dtype=np.float32).reshape(2, 3)
    as_bf16 = np.asarray(jnp.asarray(want, jnp.bfloat16))
    raw_void = as_bf16.view(np.dtype("V2"))  # what old npz round-trips gave
    got = checkpoint._np_savable(raw_void)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want)


def test_checkpoint_manager(tmp_path, rng_key):
    d = jax.random.normal(rng_key, (6, 7, 8))
    cfg = TriTDConfig(rank=2, max_iter=10)
    state = init_state(d, cfg, rng_key)
    mgr = checkpoint.CheckpointManager(str(tmp_path), every=2)
    assert mgr.maybe_save(state) is None  # k=0
    state = state._replace(k=jnp.asarray(2, jnp.int32))
    assert mgr.maybe_save(state) is not None
    assert mgr.latest().endswith("step_000002.npz")


def test_checkpoint_legacy_without_t_backfills(tmp_path, rng_key):
    """Checkpoints written before the carried field `t` existed must still
    resume: load_state reconstructs t = d - o + y_l/mu_l exactly."""
    d = jax.random.normal(rng_key, (6, 7, 8))
    cfg = TriTDConfig(rank=2, max_iter=10)
    state = init_state(d, cfg, rng_key)
    arrays = {
        name: np.asarray(getattr(state, name))
        for name in state._fields
        if name != "t"
    }
    path = str(tmp_path / "legacy.npz")
    np.savez_compressed(path, **arrays)

    with pytest.raises(ValueError, match="carried field 't'"):
        checkpoint.load_state(path)

    loaded = checkpoint.load_state(path, cfg.jnp_dtype(), d=d)
    np.testing.assert_allclose(
        np.asarray(loaded.t), np.asarray(state.t), rtol=1e-6
    )


def test_checkpoint_t_recast_to_einsum_dtype(tmp_path, rng_key):
    """Resuming under an einsum_dtype config recasts `t` so the while_loop
    carry dtypes match what admm_iteration produces."""
    d = jax.random.normal(rng_key, (6, 7, 8))
    cfg = TriTDConfig(rank=2, max_iter=10)
    state = init_state(d, cfg, rng_key)
    path = checkpoint.save_state(str(tmp_path / "state.npz"), state)
    cfg_bf16 = TriTDConfig(rank=2, max_iter=10, einsum_dtype="bfloat16")
    loaded = checkpoint.load_state(
        path, cfg_bf16.jnp_dtype(), einsum_dtype=cfg_bf16.jnp_einsum_dtype()
    )
    assert loaded.t.dtype == jnp.bfloat16


def test_presets_match_reference_constants():
    assert COMPLETION_TRITD.mu == 1e-3
    assert COMPLETION_TRITD.rho == 1.25
    assert COMPLETION_TRITD.lambda_l1 == 1.8
    assert COMPLETION_TRITD.lambda2 == 1e-3
    assert VIDEO_TRITD.mu == 1e-2
    assert VIDEO_TRITD.rho == 1.2
    assert VIDEO_TRITD.lambda2 == 1e-2


def test_figures_grid_and_video(tmp_path, rng_key):
    from tritd_tpu.cli.figures import foreground_grid, mat2gray, tensor2video

    x = np.abs(np.asarray(jax.random.normal(rng_key, (16, 20, 4)))) * 100
    artifacts.save_raw(str(tmp_path), "highway", x)
    artifacts.save_artifact(str(tmp_path), "highway", "triple", "Xhat", x)
    fig = foreground_grid(
        str(tmp_path), datasets=("highway",), methods=("Observed", "triple"),
        frame_ids=(2,), save_path=str(tmp_path / "grid.png"),
    )
    assert os.path.exists(tmp_path / "grid.png")
    g = mat2gray(x)
    assert g.min() == 0.0 and g.max() == 1.0
    out = tensor2video(x, str(tmp_path / "vid.gif"))
    assert os.path.exists(out)


def test_cli_completion_smoke(tmp_path, monkeypatch, rng_key):
    """End-to-end driver smoke: tiny synthetic dataset through the CLI."""
    import scipy.io as sio

    from tritd_tpu.cli import run_completion

    t = np.asarray(
        jax.random.normal(rng_key, (8, 9, 10))
    ) * 10
    sio.savemat(os.path.join(tmp_path, "sensor.mat"), {"T": t})
    rows = run_completion.main([
        "--datasets", "sensor", "--methods", "triple", "--max-iter", "10",
        "--data-dir", str(tmp_path), "--out-dir", str(tmp_path / "results"),
    ])
    assert len(rows) == 1
    assert rows[0]["provenance"] == "mat"
    assert np.isfinite(rows[0]["rre"])
    assert os.path.exists(
        artifacts.artifact_path(str(tmp_path / "results"), "sensor", "triple", "errHist")
    )


def test_check_parity_logic():
    """The --verify-parity core (VERDICT r3 #6): synthetic rows fail loudly,
    mat completion rows check |RRE - published| <= gap, mat video rows check
    seconds beat published, unknown cells fail."""
    from tritd_tpu.utils.published import PUBLISHED_RRE, check_parity

    pub = PUBLISHED_RRE["triple"]["sensor"]
    ok_row = {"dataset": "sensor", "method": "triple", "provenance": "mat",
              "rre": pub + 0.02, "seconds": 1.0}
    assert check_parity([ok_row]) == []
    bad_rre = dict(ok_row, rre=pub + 0.2)
    assert "RRE" in check_parity([bad_rre])[0]
    better_is_still_off = dict(ok_row, rre=pub - 0.2)  # two-sided gap
    assert check_parity([better_is_still_off])
    synth = dict(ok_row, provenance="synthetic")
    assert "synthetic" in check_parity([synth])[0]
    video_ok = {"dataset": "highway", "method": "triple", "provenance": "mat",
                "seconds": 5.0}
    video_bad = dict(video_ok, seconds=500.0)
    assert check_parity([video_ok]) == []
    assert "does not beat" in check_parity([video_bad])[0]
    unknown = {"dataset": "sensor", "method": "nope", "provenance": "mat",
               "rre": 0.1}
    assert "no published cell" in check_parity([unknown])[0]
    assert check_parity([])  # zero rows is a failure, not a silent pass
    # protocol enforcement (r4 review): a non-published protocol cannot
    # "pass" — 10 iterations trivially beats every published wall-clock
    assert any("max_iter=10" in m for m in check_parity([ok_row], max_iter=10))
    assert any(
        "missing_ratio=0.15" in m
        for m in check_parity([ok_row], missing_ratio=0.15)
    )
    assert check_parity([ok_row], max_iter=100, missing_ratio=0.10) == []
    # the missing-ratio gate is PER ROW KIND (r4 review): video rows demand
    # the published missing-rate-0 protocol, completion rows 0.10
    assert check_parity([video_ok], max_iter=100, missing_ratio=0.0) == []
    assert any("!= 0" in m for m in check_parity([video_ok], missing_ratio=0.10))
    mixed = check_parity([ok_row, video_ok], missing_ratio=0.10)
    assert len(mixed) == 1 and "!= 0" in mixed[0]


def test_cli_verify_parity_fixture_mat(tmp_path, rng_key):
    """CLI integration: --verify-parity exits nonzero on a fixture .mat
    (real-format provenance, but a random tensor whose RRE cannot match the
    published sensor number) and on synthetic fallbacks — the standing
    real-data blocker stays a loud one-command check."""
    import pytest
    import scipy.io as sio

    from tritd_tpu.cli import run_completion

    t = np.asarray(jax.random.normal(rng_key, (8, 9, 10))) * 10
    sio.savemat(os.path.join(tmp_path, "sensor.mat"), {"T": t})
    protocol = ["--max-iter", "100", "--missing-ratio", "0.10"]
    args = [
        "--datasets", "sensor", "--methods", "triple", *protocol,
        "--data-dir", str(tmp_path), "--out-dir", str(tmp_path / "results"),
        "--verify-parity",
    ]
    with pytest.raises(SystemExit) as exc:
        run_completion.main(args)
    assert exc.value.code == 1
    # generous gap -> the same fixture run passes the mechanical check
    rows = run_completion.main(args + ["--parity-gap", "10.0"])
    assert rows and rows[0]["provenance"] == "mat"
    # a non-published protocol must fail regardless of gap (r4 review)
    with pytest.raises(SystemExit):
        run_completion.main([
            "--datasets", "sensor", "--methods", "triple", "--max-iter", "5",
            "--missing-ratio", "0.10",
            "--data-dir", str(tmp_path), "--out-dir", str(tmp_path / "r3"),
            "--verify-parity", "--parity-gap", "10.0",
        ])
    # synthetic fallback (empty data dir) must fail regardless of gap
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        run_completion.main([
            "--datasets", "sensor", "--methods", "triple", *protocol,
            "--data-dir", str(empty), "--out-dir", str(tmp_path / "r2"),
            "--verify-parity", "--parity-gap", "10.0",
        ])


def test_cli_video_smoke(tmp_path, rng_key):
    import scipy.io as sio

    from tritd_tpu.cli import run_video

    g = np.abs(np.asarray(jax.random.normal(rng_key, (12, 14, 8)))) * 120
    sio.savemat(os.path.join(tmp_path, "highway.mat"), {"gray_images": g})
    rows = run_video.main([
        "--datasets", "highway", "--method", "triple", "--max-iter", "10",
        "--data-dir", str(tmp_path), "--out-dir", str(tmp_path / "results"),
    ])
    assert len(rows) == 1
    assert np.isfinite(rows[0]["psnr"])
    for what in ("errHist", "Xhat", "O"):
        assert os.path.exists(
            artifacts.artifact_path(str(tmp_path / "results"), "highway", "triple", what)
        )


def test_checkpointed_solver_matches_and_resumes(tmp_path, rng_key):
    """Segmented checkpointed execution == uninterrupted solve; killing the
    run mid-way and resuming reproduces the same final state."""
    from tritd_tpu.data.synthetic import random_tritd, sparse_outliers
    from tritd_tpu.solvers import tritd_admm, tritd_admm_checkpointed

    x, _ = random_tritd(rng_key, (10, 11, 12), rank=2)
    o = sparse_outliers(jax.random.fold_in(rng_key, 1), (10, 11, 12), 0.05, 4.0)
    d = x + o
    cfg = TriTDConfig(rank=2, max_iter=40, tol=0.0)
    ref = tritd_admm(d, cfg)

    full_dir = str(tmp_path / "full")
    got = tritd_admm_checkpointed(d, cfg, full_dir, every=15)
    # vs the monolithic solver: same math in a differently-compiled program;
    # float rounding diverges over chaotic ADMM iterations, so compare the
    # early trajectory tightly and the tail loosely
    np.testing.assert_allclose(
        np.asarray(got.err_hist)[:8], np.asarray(ref.err_hist)[:8],
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.err_hist), np.asarray(ref.err_hist), rtol=0.15
    )

    # simulate a crash: run a shorter budget, then resume to completion.
    # Same compiled segment program -> the resumed trajectory must match the
    # uninterrupted segmented run EXACTLY.
    crash_dir = str(tmp_path / "crash")
    cfg_short = TriTDConfig(rank=2, max_iter=20, tol=0.0)
    tritd_admm_checkpointed(d, cfg_short, crash_dir, every=10)
    resumed = tritd_admm_checkpointed(d, cfg, crash_dir, every=10, resume=True)
    assert int(resumed.n_iters) == 40
    full_by_tens = tritd_admm_checkpointed(
        d, cfg, str(tmp_path / "full10"), every=10
    )
    np.testing.assert_allclose(
        np.asarray(resumed.err_hist), np.asarray(full_by_tens.err_hist),
        rtol=0, atol=0,
    )


def test_checkpointed_resume_bf16_storage(tmp_path, rng_key):
    """Crash/resume under cfg.storage_dtype="bfloat16": the checkpoint
    round-trips the narrow fields and the resumed trajectory matches the
    uninterrupted segmented run exactly (save/load is bitwise)."""
    from tritd_tpu.data.synthetic import random_tritd, sparse_outliers
    from tritd_tpu.solvers import tritd_admm_checkpointed

    shape = (10, 11, 12)
    x, _ = random_tritd(rng_key, shape, rank=2)
    o = sparse_outliers(jax.random.fold_in(rng_key, 2), shape, 0.05, 4.0)
    d = x + o
    cfg = TriTDConfig(rank=2, max_iter=30, tol=0.0, storage_dtype="bfloat16")

    full = tritd_admm_checkpointed(d, cfg, str(tmp_path / "full16"), every=10)
    cfg_short = TriTDConfig(rank=2, max_iter=15, tol=0.0, storage_dtype="bfloat16")
    tritd_admm_checkpointed(d, cfg_short, str(tmp_path / "crash16"), every=10)
    resumed = tritd_admm_checkpointed(
        d, cfg, str(tmp_path / "crash16"), every=10, resume=True
    )
    assert int(resumed.n_iters) == 30
    np.testing.assert_array_equal(
        np.asarray(resumed.err_hist), np.asarray(full.err_hist)
    )
    assert resumed.o.dtype == jnp.float32  # results widen back
