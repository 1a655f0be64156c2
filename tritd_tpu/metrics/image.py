"""PSNR / SSIM image-quality metrics for the video benchmark.

Reference: `quality_ybz.m:1-34` loops psnr_index/ssim_index over frames and
averages. psnr_index (`psnr_index.m:1-5`) is 10*log10(255^2 / mse) — the
dynamic range is hard-coded to [0, 255]. ssim_index is the standard Wang
et al. 2004 implementation: 11x11 Gaussian window sigma=1.5, K=(0.01, 0.03),
L=255, 'valid' convolution.

Implemented as jit'd JAX (frame-vmapped convs on the VPU/MXU); numerically
matches the MATLAB within float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def psnr(x: jnp.ndarray, y: jnp.ndarray, peak: float = 255.0) -> jnp.ndarray:
    """10*log10(peak^2 / mse) per `psnr_index.m:4` (mse over all entries)."""
    mse = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(peak**2 / mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """fspecial('gaussian', size, sigma) — normalized 2-D Gaussian."""
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    g1 = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g2 = jnp.outer(g1, g1)
    return g2 / jnp.sum(g2)


def _filter2_valid(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """filter2(window, img, 'valid') for a 2-D image."""
    img4 = img[None, None, :, :]
    w4 = window[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        img4, w4, window_strides=(1, 1), padding="VALID"
    )
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("k1", "k2", "peak", "win_size", "sigma"))
def ssim_frame(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    k1: float = 0.01,
    k2: float = 0.03,
    peak: float = 255.0,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM of one 2-D frame, Wang et al. defaults (`ssim_index.m`)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    window = _gaussian_window(win_size, sigma)
    c1 = (k1 * peak) ** 2
    c2 = (k2 * peak) ** 2
    mu1 = _filter2_valid(img1, window)
    mu2 = _filter2_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2_valid(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2_valid(img2 * img2, window) - mu2_sq
    sigma12 = _filter2_valid(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def quality(x: jnp.ndarray, x_hat: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean PSNR, mean SSIM) over mode-3 frames — `quality_ybz.m:22-33`.

    Accepts (H, W, T) tensors (higher-way tensors should be reshaped to
    3-way first, as `quality_ybz.m:19-22` does)."""
    frames1 = jnp.moveaxis(x, -1, 0)
    frames2 = jnp.moveaxis(x_hat, -1, 0)
    psnrs = jax.vmap(lambda a, b: psnr(a, b))(frames1, frames2)
    ssims = jax.vmap(lambda a, b: ssim_frame(a, b))(frames1, frames2)
    return jnp.mean(psnrs), jnp.mean(ssims)


def msam(x: jnp.ndarray, x_hat: jnp.ndarray) -> jnp.ndarray:
    """Mean Spectral Angle Mapper, degrees — `MSIQA.m:49-71` (SAM3D/SAM):
    per spatial pixel, the angle between the two mode-3 fibers, averaged
    over pixels (VERDICT r4 #9). SAM is scale-invariant, so the
    reference's /255 is a no-op and omitted. Vectorized over pixels instead
    of the reference's double loop; arccos input clamped to [-1, 1] (MATLAB
    acosd would go complex at 1+eps rounding). Degenerate zero fibers give
    NaN, propagated through the mean like the reference's."""
    a = x.astype(jnp.float32)
    b = x_hat.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    cosv = dot / jnp.sqrt(na * nb)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0)))
    return jnp.mean(ang)


def msiqa(x: jnp.ndarray, x_hat: jnp.ndarray):
    """(psnr, ssim, msam) triple — the full `MSIQA.m:1-47` output surface
    on equal-shaped [0, 255]-range tensors."""
    p, s = quality(x, x_hat)
    return p, s, msam(x, x_hat)
