"""Truncated-normal ops vs scipy (SURVEY.md section 4, item 1)."""

import numpy as np

import jax
import jax.numpy as jnp

from bnpc_tpu.ops import truncnorm
from tests import oracle


def test_logpdf_matches_scipy():
    rng = np.random.default_rng(0)
    loc = rng.uniform(0.05, 0.95, size=200)
    std = rng.choice([0.1, 0.25, 0.5], size=200)
    a = (1e-5 - loc) / std
    b = (1 - 1e-5 - loc) / std
    x = rng.uniform(1e-5, 1 - 1e-5, size=200)
    got = np.asarray(truncnorm.logpdf(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(loc), jnp.asarray(std),
    ))
    want = oracle.truncnorm_logpdf(x, a, b, loc, std)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_logpdf_one_sided_intervals():
    # Right-half interval (a > 0) exercises the mirrored mass computation.
    got = float(truncnorm.logpdf(2.5, 1.0, 4.0, 0.0, 1.0))
    want = float(oracle.truncnorm_logpdf(2.5, 1.0, 4.0, 0.0, 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rvs_bounds_and_moments():
    key = jax.random.key(0)
    loc, std = 0.3, 0.25
    a = (0.0 - loc) / std
    b = (1.0 - loc) / std
    x = np.asarray(truncnorm.rvs(key, a, b, loc, std, shape=(50_000,)))
    assert (x >= 0).all() and (x <= 1).all()
    from scipy.stats import truncnorm as sp
    mean, var = sp.stats(a, b, loc=loc, scale=std, moments="mv")
    np.testing.assert_allclose(x.mean(), mean, atol=4 * np.sqrt(var / x.size))
    np.testing.assert_allclose(x.var(), var, rtol=0.05)


def test_rvs_shaped_per_coordinate():
    key = jax.random.key(1)
    loc = jnp.asarray([[0.1, 0.5], [0.9, 0.2]])
    std = jnp.full((2, 2), 0.1)
    a = (1e-5 - loc) / std
    b = (1 - 1e-5 - loc) / std
    x = np.asarray(truncnorm.rvs(key, a, b, loc, std))
    assert x.shape == (2, 2)
    assert (x > 0).all() and (x < 1).all()
