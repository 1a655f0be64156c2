"""Native C++ runtime kernels vs their JAX counterparts."""

import numpy as np
import pytest

from tritd_tpu.runtime import native
from tritd_tpu.ops.prox import capped_simplex_projection as jax_csp
from tritd_tpu.ops.prox import flsa as jax_flsa


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("no C++ toolchain — native runtime unavailable")
    return True


def test_native_library_builds(have_native):
    assert native.available()


def test_capped_simplex_native_vs_jax(have_native):
    rng = np.random.default_rng(0)
    for n, s in ((40, 7.0), (100, 25.5), (10, 0.0), (10, 10.0), (17, 3.1)):
        v = rng.normal(size=n) * 2.0
        got = native.capped_simplex_projection(v, s)
        assert (got >= -1e-12).all() and (got <= 1 + 1e-12).all()
        np.testing.assert_allclose(got.sum(), np.clip(s, 0, n), atol=1e-8)
        want = np.asarray(jax_csp(v, s))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_flsa_native_vs_jax(have_native):
    rng = np.random.default_rng(1)
    v = rng.normal(size=60).cumsum()  # random walk — nontrivial TV structure
    for lam1, lam2 in ((0.0, 0.5), (0.2, 1.0), (1.0, 0.1)):
        got = native.flsa(v, lam1, lam2)
        want = np.asarray(jax_flsa(v, lam1, lam2, iters=5000))
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_flsa_native_objective_optimal(have_native):
    """Native (exact Condat) FLSA objective must be <= the iterative JAX
    solution's objective (both should be near the optimum)."""
    rng = np.random.default_rng(2)
    v = rng.normal(size=80) * 3
    lam1, lam2 = 0.3, 0.7

    def obj(x):
        return (
            0.5 * np.sum((x - v) ** 2)
            + lam1 * np.abs(x).sum()
            + lam2 * np.abs(np.diff(x)).sum()
        )

    x_native = native.flsa(v, lam1, lam2)
    x_jax = np.asarray(jax_flsa(v, lam1, lam2, iters=5000))
    assert obj(x_native) <= obj(x_jax) + 1e-4


def test_native_soft_threshold(have_native):
    v = np.array([-3.0, -0.5, 0.0, 0.2, 2.0])
    np.testing.assert_allclose(
        native.soft_threshold(v, 1.0), [-2.0, 0.0, 0.0, 0.0, 1.0]
    )
