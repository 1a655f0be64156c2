"""Fused elementwise ADMM block: Pallas kernel (interpret mode on CPU)
against the jnp reference, including the rre-inert zero-padding and
non-aligned shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tritd_tpu.ops.pallas_kernels import elementwise_block

SHAPES = [(17, 23, 31), (8, 128, 4), (5, 7, 11)]


@pytest.mark.parametrize("shape", SHAPES)
def test_pallas_matches_jnp(rng_key, shape):
    ks = jax.random.split(rng_key, 5)
    d, l, e, y_l, y_o = (jax.random.normal(k, shape) for k in ks)
    args = (d, l, e, y_l, y_o, 0.5, 0.7, 1.8)
    ref = elementwise_block(*args, use_pallas=False)
    got = elementwise_block(*args, use_pallas=True, interpret=True)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref[i]), rtol=1e-6, atol=1e-6
        )
    # scalar reductions: reduction-order float noise only
    for i in (4, 5):
        np.testing.assert_allclose(float(got[i]), float(ref[i]), rtol=1e-5)


def test_block_semantics_match_reference_equations(rng_key):
    """The jnp block must equal the reference's update equations verbatim."""
    ks = jax.random.split(rng_key, 5)
    shape = (6, 7, 8)
    d, l, e, y_l, y_o = (jax.random.normal(k, shape) for k in ks)
    mu_l, mu_o, lam = 0.3, 0.9, 1.8
    o, e_new, yl_new, yo_new, nl, no = elementwise_block(
        d, l, e, y_l, y_o, mu_l, mu_o, lam, use_pallas=False
    )
    r1 = d - l + y_l / mu_l
    r2 = e - y_o / mu_o
    o_ref = (mu_l * r1 + mu_o * r2) / (mu_l + mu_o)
    shifted = o_ref + y_o / mu_o
    e_ref = jnp.sign(shifted) * jnp.maximum(jnp.abs(shifted) - lam / mu_o, 0.0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e_new), np.asarray(e_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(yl_new), np.asarray(y_l + mu_l * (d - l - o_ref)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(nl), float(jnp.sum((d - l - o_ref) ** 2)), rtol=1e-5
    )
