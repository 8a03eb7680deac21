"""Non-assignment moves: parameter MH, alpha resampling, error-rate MH.

All three are rewritten against per-cluster sufficient statistics so they are
O(k_max * m) regardless of the number of cells.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bnpc_tpu.config import EPSILON, ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.ops import distributions as dist
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.ops import mh
from bnpc_tpu.ops import truncnorm
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import CRPState

_NO_AXIS = MutAxis()


def update_parameters(key, state: CRPState, n1, n0, cfg: ModelConfig,
                      ax: MutAxis = _NO_AXIS):
    """MH-update every live cluster's parameter row at once.

    Reference: update_parameters loops clusters (libs/CRP.py:302-311); the
    clusters are conditionally independent so one vectorized sweep over
    [k_max, m] is mathematically identical. Returns (state, declined,
    accepted) where the counts cover live slots only, matching the
    reference's MH telemetry.
    """
    live = state.cluster_size > 0
    res = mh.mh_cluster_params(
        key, state.params, n1, n0, state.fp, state.fn, cfg, ax=ax
    )
    params = jnp.where(live[:, None], res.params, state.params)
    declined = jnp.sum(jnp.where(live, res.declined, 0))
    n_live = jnp.sum(live)
    # Under mutation sharding cfg.n_muts is the PADDED column count while
    # `declined` is masked to real columns — count the real columns from the
    # shard masks so acceptance telemetry is not inflated by phantom accepts.
    if ax.mask is not None:
        m_real = ax.psum(jnp.sum(ax.mask)).astype(jnp.int32)
    else:
        m_real = cfg.n_muts
    accepted = n_live * m_real - declined
    return state._replace(params=params), declined, accepted


def update_dp_alpha(key, state: CRPState, cfg: ModelConfig) -> CRPState:
    """Escobar & West (1995) auxiliary-variable resampling of alpha.

    Reference: update_DP_alpha (libs/CRP.py:386-410). Two reference quirks are
    reproduced deliberately: the Gamma draw treats ``b - log(eta)`` as the
    numpy *scale* parameter (libs/CRP.py:401-407), and the result is clamped
    to >= 1 + eps (libs/CRP.py:409).
    """
    k_eta, k_pi, k_gamma = jax.random.split(key, 3)
    n = float(cfg.n_cells)
    k = state.n_clusters.astype(jnp.float32)
    a_g, b_g = cfg.dp_a_shape, cfg.dp_a_loc

    eta = jax.random.beta(k_eta, state.dp_alpha + 1.0, n)
    log_eta = jnp.log(eta)
    w = (a_g + k - 1.0) / (n * (b_g - log_eta))
    pi_eta = w / (1.0 + w)

    use_high = jax.random.uniform(k_pi) < pi_eta
    shape = a_g + k - jnp.where(use_high, 0.0, 1.0)
    new_alpha = jax.random.gamma(k_gamma, shape) * (b_g - log_eta)
    alpha = jnp.maximum(1.0 + EPSILON, new_alpha).astype(jnp.float32)
    return state._replace(dp_alpha=alpha)


def _full_ll_at_rates(params, n1, n0, fp, fn, ax=_NO_AXIS):
    c1, c0 = lk.log_prob_tables(params, fp, fn)
    return lk.ll_from_stats(n1, n0, c1, c0, ax)


def _mh_error_rate(key, old, prior_mean, prior_sd, ll_fn):
    """Single scalar truncated-normal MH step (libs/CRP_learning_errors.py:66-111)."""
    k_std, k_prop, k_u = jax.random.split(key, 3)
    sds = jnp.array([0.5, 1.0, 1.5]) * prior_sd
    std = sds[jax.random.randint(k_std, (), 0, 3)]
    a = (0.0 - old) / std
    b = (1.0 - old) / std
    new = truncnorm.rvs(k_prop, a, b, old, std)

    new_p_target = truncnorm.logpdf(new, a, b, old, std)
    a_rev = (0.0 - new) / std
    b_rev = (1.0 - new) / std
    old_p_target = truncnorm.logpdf(old, a_rev, b_rev, new, std)

    A = (
        ll_fn(new) - ll_fn(old)
        + dist.truncnorm_prior_logpdf(new, prior_mean, prior_sd)
        - dist.truncnorm_prior_logpdf(old, prior_mean, prior_sd)
        + old_p_target - new_p_target
    )
    accept = jnp.log(jax.random.uniform(k_u)) < A
    return jnp.where(accept, new, old).astype(jnp.float32), accept


def update_error_rates(key, state: CRPState, n1, n0, cfg: ModelConfig,
                       ax: MutAxis = _NO_AXIS):
    """MH on FP then FN (libs/CRP_learning_errors.py:52-55; FN's likelihood
    sees the freshly updated FP, as in the reference's sequential update).

    The reference's get_ll_full_error is O(n*m) per evaluation
    (libs/CRP_learning_errors.py:58-63); with sufficient statistics it is
    O(k_max*m).
    """
    k_fp, k_fn = jax.random.split(key)
    fp, fp_acc = _mh_error_rate(
        k_fp, state.fp, cfg.fp, cfg.fp_sd,
        lambda e: _full_ll_at_rates(state.params, n1, n0, e, state.fn, ax),
    )
    fn, fn_acc = _mh_error_rate(
        k_fn, state.fn, cfg.fn, cfg.fn_sd,
        lambda e: _full_ll_at_rates(state.params, n1, n0, fp, e, ax),
    )
    return state._replace(fp=fp, fn=fn), fp_acc, fn_acc
