"""Metric-suite tests: RRE against the driver's evaluate(), PSNR/SSIM
against independent oracles, foreground F1/PWC/mAP semantics, Otsu
graythresh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.metrics import (
    average_precision,
    evaluate,
    foreground_scores,
    graythresh_matlab_double,
    mean_average_precision,
    psnr,
    quality,
    relative_change,
    rre,
    ssim_frame,
)


def test_evaluate_matches_driver_semantics(rng_key):
    """rmse = ||X_hat[mask] - gt[mask]||_2 (unnormalized), nrmse = rmse/||gt[mask]||."""
    k1, k2 = jax.random.split(rng_key)
    x_hat = jax.random.normal(k1, (5, 6, 7))
    gt = jax.random.normal(k2, (5, 6, 7))
    mask = jax.random.bernoulli(rng_key, 0.5, (5, 6, 7))
    rmse, nrmse = evaluate(x_hat, gt, mask)
    sel = np.asarray(mask)
    want_rmse = np.linalg.norm(np.asarray(x_hat)[sel] - np.asarray(gt)[sel])
    want_nrmse = want_rmse / np.linalg.norm(np.asarray(gt)[sel])
    np.testing.assert_allclose(float(rmse), want_rmse, rtol=1e-5)
    np.testing.assert_allclose(float(nrmse), want_nrmse, rtol=1e-5)


def test_rre_identity():
    x = jnp.ones((3, 3, 3))
    assert float(rre(x, x)) == 0.0
    assert abs(float(rre(2 * x, x)) - 1.0) < 1e-6


def test_relative_change():
    a = jnp.full((4,), 2.0)
    b = jnp.full((4,), 1.0)
    np.testing.assert_allclose(float(relative_change(a, b)), 1.0)


def test_psnr_reference_formula(rng_key):
    x = jax.random.uniform(rng_key, (16, 16)) * 255
    y = x + 10.0
    want = 10 * np.log10(255**2 / 100.0)  # mse = 100
    np.testing.assert_allclose(float(psnr(x, y)), want, rtol=1e-5)


def test_ssim_identical_is_one(rng_key):
    x = jax.random.uniform(rng_key, (32, 32)) * 255
    assert abs(float(ssim_frame(x, x)) - 1.0) < 1e-5


def test_ssim_decreases_with_noise(rng_key):
    x = jax.random.uniform(rng_key, (32, 32)) * 255
    noisy1 = x + 5 * jax.random.normal(jax.random.fold_in(rng_key, 1), x.shape)
    noisy2 = x + 50 * jax.random.normal(jax.random.fold_in(rng_key, 1), x.shape)
    s1 = float(ssim_frame(x, noisy1))
    s2 = float(ssim_frame(x, noisy2))
    assert 0.0 < s2 < s1 < 1.0


def test_ssim_against_scipy_oracle(rng_key):
    """Independent Wang-SSIM implementation using scipy convolution."""
    from scipy.ndimage import convolve

    x = np.asarray(jax.random.uniform(rng_key, (24, 28)) * 255, np.float64)
    y = x + np.asarray(
        10 * jax.random.normal(jax.random.fold_in(rng_key, 2), x.shape), np.float64
    )
    # gaussian window 11x11 sigma 1.5
    half = 5
    coords = np.arange(11) - half
    g = np.exp(-(coords**2) / (2 * 1.5**2))
    w = np.outer(g, g)
    w /= w.sum()

    def filt(img):
        full = convolve(img, w, mode="constant")
        return full[half:-half, half:-half]

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = filt(x), filt(y)
    s1 = filt(x * x) - mu1**2
    s2 = filt(y * y) - mu2**2
    s12 = filt(x * y) - mu1 * mu2
    want = np.mean(
        ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
        / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    )
    got = float(ssim_frame(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_quality_averages_over_frames(rng_key):
    x = jax.random.uniform(rng_key, (16, 16, 4)) * 255
    p, s = quality(x, x)
    assert np.isinf(float(p)) or float(p) > 100
    np.testing.assert_allclose(float(s), 1.0, atol=1e-5)


def test_foreground_scores_confusion_convention():
    """CDnet ignore convention: non-ROI (170) counts toward TP and TN."""
    gt = np.zeros((4, 4, 1))
    gt[0, 0, 0] = 255   # true foreground
    gt[1, 1, 0] = 170   # non-ROI
    fg = np.zeros((4, 4, 1))
    fg[0, 0, 0] = 100   # predicted on the true fg
    fg[1, 1, 0] = 100   # predicted on the non-ROI pixel
    fg[2, 2, 0] = 100   # false positive
    s = foreground_scores(fg, gt, threshold=50)
    assert s.tp == 2          # fg pixel + non-ROI pixel (gt|ns)
    assert s.fp == 2          # non-ROI + background predictions (~gt)
    assert s.fn == 0
    assert s.tn == 13         # all 13 unpredicted pixels are (~gt)|ns
    assert s.pwc == 100 * 2 / 16


def test_graythresh_bimodal():
    img = np.concatenate([np.zeros(500), np.ones(500) * 0.8])
    level = graythresh_matlab_double(img)
    assert 0.1 < level < 0.8


def test_graythresh_saturation_quirk():
    """Values > 1 saturate at bin 255 (MATLAB double-image semantics)."""
    img = np.concatenate([np.zeros(100), np.full(100, 200.0)])
    level = graythresh_matlab_double(img)
    assert 0.3 < level <= 1.0


def test_average_precision_perfect_ranking():
    """perfcurve+trapz semantics: the curve starts at the first positive's
    recall (1/P), so even a perfect ranking loses the initial [0, 1/P]
    strip — here 3 positives -> AP = 2/3, exactly as the reference's
    `trapz(recall, precision)` would give."""
    labels = np.array([0, 0, 1, 1, 1])
    scores = np.array([0.1, 0.2, 0.8, 0.9, 0.7])
    ap = average_precision(labels, scores)
    np.testing.assert_allclose(ap, 2.0 / 3.0, rtol=1e-6)
    # a worse ranking scores strictly lower
    worse = average_precision(labels, np.array([0.9, 0.8, 0.1, 0.85, 0.7]))
    assert worse < ap


def test_mean_average_precision_runs(rng_key):
    fg = np.abs(np.asarray(jax.random.normal(rng_key, (8, 8, 3)))) * 60
    gt = np.where(fg > 60, 255.0, 0.0)
    m = mean_average_precision(fg, gt)
    assert 0.0 <= m <= 1.0


def test_msam_zero_orthogonal_and_scale_invariant():
    """`MSIQA.m` SAM3D semantics: 0 deg for identical fibers, 90 for
    orthogonal, invariant to positive scaling (VERDICT r4 #9)."""
    from tritd_tpu.metrics.image import msam, msiqa

    rng = np.random.default_rng(0)
    x = rng.random((4, 5, 6)) + 0.1
    assert float(msam(x, x)) < 1e-3
    assert float(msam(x, 3.7 * x)) < 1e-2
    a = np.zeros((1, 1, 2)); b = np.zeros((1, 1, 2))
    a[..., 0] = 1.0; b[..., 1] = 1.0
    np.testing.assert_allclose(float(msam(a, b)), 90.0, atol=1e-4)
    # msiqa needs frames >= the 11x11 SSIM window
    x2 = rng.random((16, 16, 6)) + 0.1
    p, s, m = msiqa(255 * x2, 255 * np.clip(x2 + 0.01, None, 1.1))
    assert np.isfinite(float(p)) and np.isfinite(float(s))
    assert 0 <= float(m) < 90
