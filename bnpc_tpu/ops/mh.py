"""Metropolis-Hastings machinery for cluster parameters.

Vectorized over arbitrary leading axes: the reference loops over clusters and
calls MH_cluster_params per cluster (libs/CRP.py:302-344); here every slot (or
both split-merge launch clusters) updates in one shot, since clusters are
conditionally independent given the assignment. Math is identical per
coordinate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bnpc_tpu.config import TMIN, TMAX, ModelConfig
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.ops import truncnorm
from bnpc_tpu.ops import distributions as dist
from bnpc_tpu.parallel.axis import MutAxis

_NO_AXIS = MutAxis()

# MH proposal std-dev multiset (libs/CRP.py:65).
PARAM_PROPOSAL_SD = jnp.array([0.1, 0.25, 0.5], dtype=jnp.float32)


class MHParamsResult(NamedTuple):
    params: jnp.ndarray       # same shape as input
    trans_logprob: jnp.ndarray  # [...] sum over mutation axis (0 if not asked)
    declined: jnp.ndarray     # [...] per-row count of declined coordinates


def log_A(new_params, old_params, n1, n0, a, b, std, fp, fn,
          cfg: ModelConfig, clip: bool):
    """MH log-acceptance per coordinate (libs/CRP.py:347-383).

    n1/n0 are the per-(row, mutation) counts of observed 1s/0s among the
    cells attached to that row's cluster; the likelihood-ratio term of the
    reference (a sum over member cells, libs/CRP.py:360-368) is exactly
    n1 * c1(theta) + n0 * c0(theta).
    """
    new_p_target = truncnorm.logpdf(new_params, a, b, old_params, std)
    a_rev = (TMIN - new_params) / std
    b_rev = (TMAX - new_params) / std
    old_p_target = truncnorm.logpdf(old_params, a_rev, b_rev, new_params, std)

    c1n, c0n = lk.log_prob_tables(new_params, fp, fn)
    c1o, c0o = lk.log_prob_tables(old_params, fp, fn)
    new_ll = n1 * c1n + n0 * c0n
    old_ll = n1 * c1o + n0 * c0o

    A = new_ll - old_ll + old_p_target - new_p_target
    if not cfg.beta_prior_uniform:
        A += dist.beta_logpdf(new_params, cfg.p, cfg.q, 0.0)
        A -= dist.beta_logpdf(old_params, cfg.p, cfg.q, 0.0)
    if clip:
        A = jnp.minimum(A, 0.0)
    return A


def draw_proposal_std(key, shape):
    """Per-coordinate std drawn from {0.1, 0.25, 0.5} (libs/CRP.py:328)."""
    idx = jax.random.randint(key, shape, 0, PARAM_PROPOSAL_SD.shape[0])
    return PARAM_PROPOSAL_SD[idx]


def mh_cluster_params(key, params, n1, n0, fp, fn, cfg: ModelConfig,
                      trans_prob: bool = False,
                      ax: MutAxis = _NO_AXIS) -> MHParamsResult:
    """One truncated-normal random-walk MH sweep over every coordinate.

    Reference: MH_cluster_params (libs/CRP.py:314-344). `params` may carry any
    leading shape ([k_max, m], [2, m], [m], ...); n1/n0 must match.

    When ``trans_prob`` is set, also returns the summed log transition
    probability of the *realized* move: accepted coordinates contribute
    min(A, 0), declined ones log(1 - e^A) (libs/CRP.py:340-342, with the
    clip=True path of _get_log_A).
    """
    k_std, k_prop, k_u = jax.random.split(ax.fold_key(key), 3)
    std = draw_proposal_std(k_std, params.shape)
    a = (TMIN - params) / std
    b = (TMAX - params) / std
    proposal = truncnorm.rvs(k_prop, a, b, params, std).astype(jnp.float32)

    A = log_A(proposal, params, n1, n0, a, b, std, fp, fn, cfg,
              clip=trans_prob)
    log_u = jnp.log(jax.random.uniform(k_u, params.shape))
    decline = log_u >= A

    new_params = jnp.where(decline, params, proposal)
    declined = ax.psum(
        jnp.sum(ax.apply_mask(decline.astype(jnp.float32)), axis=-1)
    ).astype(jnp.int32)

    if trans_prob:
        # Deliberate deviation: the reference computes log(1 - e^A)
        # unclamped (libs/CRP.py:340-342), which is -inf when A rounds to 0.
        # The min(A, -1e-10) clamp yields ~log(1e-10) instead; it perturbs a
        # declined-coordinate term only when A is within 1e-10 of 0
        # (probability ~0 under continuous proposals), so split-merge
        # acceptance ratios are statistically unaffected.
        contrib = jnp.where(
            decline,
            jnp.log(-jnp.expm1(jnp.minimum(A, -1e-10))),
            A,
        )
        trans = ax.psum(jnp.sum(ax.apply_mask(contrib), axis=-1))
    else:
        trans = jnp.zeros(params.shape[:-1], dtype=params.dtype)

    return MHParamsResult(new_params, trans, declined)


def realized_trans_logprob(target, source, n1, n0, a, b, std, fp, fn,
                           cfg: ModelConfig, ax: MutAxis = _NO_AXIS):
    """Summed log transition probability of an MH sweep moving `source` ->
    `target` per coordinate, treating each coordinate's move as accepted.

    Used by the split-merge reverse-path densities (libs/CRP.py:668-682,
    777-797), where the reference evaluates _get_log_A(target, source, ...,
    trans_prob=True) and nansums it.
    """
    A = log_A(target, source, n1, n0, a, b, std, fp, fn, cfg, clip=True)
    return ax.psum(jnp.sum(ax.apply_mask(A), axis=-1))
