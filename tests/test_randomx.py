"""The specialized Beta sampler is exactly Beta-distributed (KS vs scipy)."""

import numpy as np
import pytest
from scipy.stats import kstest

import jax
import jax.numpy as jnp

from bnpc_tpu.ops.randomx import beta_binary, mt_gamma


@pytest.mark.parametrize("shape_param", [1.25, 1.5, 2.0])
def test_mt_gamma_matches_scipy(shape_param):
    g = np.asarray(mt_gamma(jax.random.key(0), shape_param, (200_000,)))
    ks = kstest(g, "gamma", args=(shape_param,))
    assert ks.pvalue > 0.01, (shape_param, ks)


@pytest.mark.parametrize("p,q", [(0.25, 0.25), (0.5, 1.0), (1.0, 2.0)])
def test_beta_binary_per_class(p, q):
    rng = np.random.default_rng(3)
    n, m = 600, 400
    xm = (rng.random((n, m)) < 0.4).astype(np.float32)
    xm0 = ((rng.random((n, m)) < 0.4) * (1 - xm)).astype(np.float32)
    draws = np.asarray(
        beta_binary(jax.random.key(1), p, q, jnp.asarray(xm),
                    jnp.asarray(xm0))
    )
    from scipy.stats import beta as beta_dist

    for a, b, sel in [
        (p, q, (xm == 0) & (xm0 == 0)),
        (p + 1, q, xm == 1),
        (p, q + 1, xm0 == 1),
    ]:
        vals = draws[sel][:60_000].astype(np.float64)
        # f32 quantizes the extreme tails (Beta with a,b < 1 puts percents
        # of mass within one ulp of 0/1); the model clips to
        # [TMIN, 1-TMIN] = [1e-5, ...] anyway, so compare the INTERIOR via
        # the conditional probability transform.
        lo, hi = 1e-3, 1 - 1e-3
        interior = vals[(vals > lo) & (vals < hi)]
        cdf = beta_dist(a, b).cdf
        u = (cdf(interior) - cdf(lo)) / (cdf(hi) - cdf(lo))
        ks = kstest(u, "uniform")
        assert ks.pvalue > 0.005, (a, b, ks)


def test_beta_binary_moments():
    p, q = 0.25, 0.25
    n, m = 1000, 200
    xm = jnp.ones((n, m), jnp.float32)
    xm0 = jnp.zeros((n, m), jnp.float32)
    draws = np.asarray(beta_binary(jax.random.key(2), p, q, xm, xm0))
    a, b = p + 1, q
    mean = a / (a + b)
    var = a * b / ((a + b) ** 2 * (a + b + 1))
    assert abs(draws.mean() - mean) < 5e-4
    assert abs(draws.var() - var) < 5e-4


@pytest.mark.parametrize("a,b", [(0.25, 0.25), (3.25, 10.25), (40.0, 2.5)])
def test_beta_general_array_shapes(a, b):
    from scipy.stats import beta as beta_dist

    from bnpc_tpu.ops.randomx import beta_general

    draws = np.asarray(beta_general(
        jax.random.key(4), jnp.full((200_000,), a), jnp.full((200_000,), b)
    )).astype(np.float64)
    lo, hi = 1e-3, 1 - 1e-3
    interior = draws[(draws > lo) & (draws < hi)]
    cdf = beta_dist(a, b).cdf
    u = (cdf(interior) - cdf(lo)) / (cdf(hi) - cdf(lo))
    ks = kstest(u, "uniform")
    assert ks.pvalue > 0.005, (a, b, ks)
