"""Likelihood kernels vs NumPy/SciPy oracles (SURVEY.md section 4, item 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bnpc_tpu.config import ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.state import cluster_stats

from tests import oracle


@pytest.fixture
def small_problem():
    rng = np.random.default_rng(0)
    n, m, k = 17, 23, 6
    data = rng.integers(0, 2, size=(n, m)).astype(float)
    data[rng.random((n, m)) < 0.15] = np.nan
    theta = np.clip(rng.random((k, m)), 1e-5, 1 - 1e-5).astype(np.float32)
    return data, theta


def test_ll_matrix_matches_oracle(small_problem):
    data, theta = small_problem
    fp, fn = 0.01, 0.2
    packed = pack_data(data)
    c1, c0 = lk.log_prob_tables(jnp.asarray(theta), fp, fn)
    got = np.asarray(lk.ll_matrix(packed, c1, c0))
    want = oracle.bernoulli_mixture_ll(data, theta, fp, fn)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ll_row_matches_matrix(small_problem):
    data, theta = small_problem
    packed = pack_data(data)
    c1, c0 = lk.log_prob_tables(jnp.asarray(theta), 0.05, 0.3)
    full = np.asarray(lk.ll_matrix(packed, c1, c0))
    for i in [0, 5, 16]:
        row = np.asarray(lk.ll_row(packed.xm[i], packed.xm0[i], c1, c0))
        np.testing.assert_allclose(row, full[i], rtol=1e-5, atol=1e-5)


def test_ll_from_stats_equals_gather(small_problem):
    data, theta = small_problem
    n, k = data.shape[0], theta.shape[0]
    rng = np.random.default_rng(1)
    assign = rng.integers(0, k, size=n)
    packed = pack_data(data)
    c1, c0 = lk.log_prob_tables(jnp.asarray(theta), 0.01, 0.2)
    n1, n0 = cluster_stats(packed, jnp.asarray(assign), k)
    got = float(lk.ll_from_stats(n1, n0, c1, c0))
    want = oracle.bernoulli_mixture_ll(data, theta, 0.01, 0.2)[
        np.arange(n), assign
    ].sum()
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_new_cluster_ll(small_problem):
    data, _ = small_problem
    cfg = ModelConfig(n_cells=data.shape[0], n_muts=data.shape[1],
                      k_max=data.shape[0], p=0.25, q=0.25)
    packed = pack_data(data)
    got = np.asarray(lk.new_cluster_ll(packed, cfg, 0.01, 0.2))
    want = oracle.new_cluster_ll(data, 0.25, 0.25, 0.01, 0.2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_beta_mix_consts():
    cfg = ModelConfig(n_cells=4, n_muts=3, k_max=4, p=0.25, q=0.25)
    m0, m1 = cfg.beta_mix
    o0, o1 = oracle.beta_mix_consts(0.25, 0.25)
    assert abs(m0 - o0) < 1e-12 and abs(m1 - o1) < 1e-12
    # Uniform prior: B(1,2)=B(2,1) -> 0.5/0.5
    cfg_u = ModelConfig(n_cells=4, n_muts=3, k_max=4, p=1.0, q=1.0)
    assert cfg_u.beta_mix == pytest.approx((0.5, 0.5))


def test_log_prior_full(small_problem):
    data, theta = small_problem
    n, m = data.shape
    k = theta.shape[0]
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25)
    rng = np.random.default_rng(2)
    assign = rng.integers(0, k, size=n)
    sizes = np.bincount(assign, minlength=n)
    params = np.clip(rng.random((n, m)), 1e-5, 1 - 1e-5).astype(np.float32)
    alpha = 5.3

    got = float(lk.log_prior_full(
        cfg, jnp.asarray(sizes, jnp.int32), jnp.asarray(params),
        jnp.float32(alpha), jnp.float32(0.01), jnp.float32(0.2),
    ))
    live = sizes > 0
    want = oracle.log_prior_full(
        sizes[live], params[live], alpha, n, 0.25, 0.25,
        cfg.dp_a_shape, cfg.dp_a_loc,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_crp_prior_terms():
    n, alpha = 50, 7.1
    sizes = jnp.asarray([1, 5, 44])
    got = np.asarray(lk.crp_size_log_prior(sizes, n, alpha))
    want = oracle.crp_log_prior(np.array([1.0, 5.0, 44.0]), n, alpha)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)
    got_new = float(lk.crp_new_log_prior(n, jnp.float32(alpha)))
    np.testing.assert_allclose(got_new, oracle.crp_log_prior(alpha, n, alpha),
                               rtol=1e-5, atol=5e-5)
