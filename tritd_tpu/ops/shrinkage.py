"""Elementwise proximal/shrinkage operators (VPU-bound, fused by XLA).

Reference counterparts:
  * `fast_robust_triple_tensor/soft_threshold.m:1-2`
  * weighted variant `fast_robust_triple_tensor/test.m:96-101`
  * `other_methods/IPI_RTC_FCTN-main/lib/prox_l1.m:12`
  * SOFIA `thres_soft.m`, `huber.m` (k=2 clip), `biweight.m`
"""

from __future__ import annotations

import jax.numpy as jnp


def soft_threshold(x: jnp.ndarray, lam: jnp.ndarray | float) -> jnp.ndarray:
    """sign(x) * max(|x| - lam, 0)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)


def weighted_soft_threshold(
    x: jnp.ndarray, tau: jnp.ndarray | float, w: jnp.ndarray
) -> jnp.ndarray:
    """sign(x) * max(|x| - tau * w, 0) — per-element thresholds.

    Used by the nonconvex-robust variant's A/O updates
    (`fast_robust_triple_tensor/test.m:77-101`)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - tau * w, 0.0)


def lp_reweight(
    x: jnp.ndarray, epsilon: float, p: float, theta: float
) -> jnp.ndarray:
    """W = 1 / (|x| + epsilon)^(theta - p) — the l_p-style reweighting of the
    nonconvex variant (`fast_robust_triple_tensor/test.m:86`)."""
    return 1.0 / jnp.power(jnp.abs(x) + epsilon, theta - p)


def prox_l1(b: jnp.ndarray, lam: jnp.ndarray | float) -> jnp.ndarray:
    """Proximal operator of lam*||.||_1 written in the max/min form of
    `other_methods/IPI_RTC_FCTN-main/lib/prox_l1.m:12` (identical to
    :func:`soft_threshold`)."""
    return jnp.maximum(0.0, b - lam) + jnp.minimum(0.0, b + lam)


def huber_clip(x: jnp.ndarray, k: float = 2.0) -> jnp.ndarray:
    """Huber psi-function clip to [-k, k] (SOFIA `huber.m`)."""
    return jnp.clip(x, -k, k)


def biweight(x: jnp.ndarray, k: float = 4.685) -> jnp.ndarray:
    """Tukey biweight psi-function (SOFIA `biweight.m`)."""
    inside = jnp.abs(x) <= k
    return jnp.where(inside, x * (1.0 - (x / k) ** 2) ** 2, 0.0)
