"""Bernoulli-mixture likelihood as matmul-friendly log-probability tables.

The reference evaluates, for every (cell i, cluster k):

    ll[i, k] = sum_j  m[i,j] * log( theta[k,j] * BernFN(x[i,j])
                                    + (1 - theta[k,j]) * BernFP(x[i,j]) )

with BernFN(x) = (1-FN)^x FN^(1-x), BernFP(x) = (1-FP)^(1-x) FP^x
(libs/CRP.py:197-213). Because x is binary, the log term takes exactly two
values per (k, j):

    c1[k,j] = log(theta*(1-FN) + (1-theta)*FP)      # x == 1
    c0[k,j] = log(theta*FN     + (1-theta)*(1-FP))  # x == 0

so the full matrix is two MXU matmuls over the masked indicator planes:

    ll = xm @ c1.T + xm0 @ c0.T

and all likelihood-weighted sums over cells reduce to the per-cluster
sufficient statistics (N1, N0) from bnpc_tpu.state.cluster_stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bnpc_tpu.config import ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.ops import distributions as dist
from bnpc_tpu.parallel.axis import MutAxis

_NO_AXIS = MutAxis()

# The log-likelihood accumulations must run in true float32: on TPU the MXU
# would otherwise use bf16 inputs and lose ~3 decimal digits on sums of
# thousands of log terms. HIGHEST forces f32 (or better) accumulation.
_PRECISION = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.dot(a, b, precision=_PRECISION,
                   preferred_element_type=jnp.float32)


def log_prob_tables(params, fp, fn):
    """(c1, c0) tables for parameter array `params` (any shape)."""
    c1 = jnp.log(params * (1.0 - fn) + (1.0 - params) * fp)
    c0 = jnp.log(params * fn + (1.0 - params) * (1.0 - fp))
    return c1, c0


def ll_matrix(data: PackedData, c1, c0, ax: MutAxis = _NO_AXIS):
    """[n, k_max] log-likelihood of every cell under every slot's parameters.

    ONE dot over the concatenated indicator planes: materializing
    xm @ c1.T and xm0 @ c0.T separately costs an extra full pass over the
    [n, k] output, which is bandwidth-bound at [n, n] scale (measured
    2.43 -> 1.39 ms for the newborn lf matrix at n = 5,000)."""
    xcat = jnp.concatenate([data.xm, data.xm0], axis=1)
    ccat = jnp.concatenate([c1, c0], axis=-1)
    return ax.psum(_mm(xcat, ccat.T))


def ll_row(xm_row, xm0_row, c1, c0, ax: MutAxis = _NO_AXIS):
    """[k] log-likelihood of one cell against all slots (two matvecs)."""
    return ax.psum(_mm(c1, xm_row) + _mm(c0, xm0_row))


def ll_col(c1_row, c0_row, xm, xm0, ax: MutAxis = _NO_AXIS):
    """[n] log-likelihood of EVERY cell under one parameter row's tables
    (the transpose companion of ll_row; same matvec, roles swapped)."""
    return ax.psum(_mm(xm, c1_row) + _mm(xm0, c0_row))


def ll_from_stats(n1, n0, c1, c0, ax: MutAxis = _NO_AXIS):
    """Total log-likelihood given per-slot sufficient statistics.

    Equals the reference's get_ll_full (libs/CRP.py:237-238) when
    (n1, n0) = cluster_stats(data, assignment): each cell's contribution is
    counted once under its own cluster's parameter row. Free slots contribute
    0 because their statistics are 0.
    """
    return ax.psum(jnp.sum(n1 * c1 + n0 * c0))


def ll_per_mut_from_stats(n1_row, n0_row, c1_row, c0_row):
    """Per-mutation log-likelihood vector for one cluster (length m)."""
    return n1_row * c1_row + n0_row * c0_row


def new_cluster_ll(data: PackedData, cfg: ModelConfig, fp, fn):
    """[n] prior-predictive log-likelihood of each cell opening a new cluster.

    Reference: get_lpost_single_new_cluster without the CRP prior term
    (libs/CRP.py:230-234): theta is replaced by the Beta-mixture constants,
    giving scalars d1/d0 and a rank-1 evaluation from the per-cell counts.
    """
    mix0, mix1 = cfg.beta_mix
    d1 = jnp.log(mix1 * (1.0 - fn) + mix0 * fp)
    d0 = jnp.log(mix1 * fn + mix0 * (1.0 - fp))
    return data.rs1 * d1 + data.rs0 * d0


def crp_size_log_prior(size, n, alpha):
    """log CRP weight of joining a cluster of `size` (libs/CRP.py:83-85)."""
    return jnp.log(size.astype(jnp.float32)) - jnp.log(n - 1.0 + alpha)


def crp_new_log_prior(n, alpha):
    """log CRP weight of opening a new cluster (libs/CRP.py:191-194, index -1)."""
    return jnp.log(alpha) - jnp.log(n - 1.0 + alpha)


def log_prior_full(cfg: ModelConfig, cluster_size, params, dp_alpha, fp, fn,
                   ax: MutAxis = _NO_AXIS):
    """Joint log-prior (reference: get_lprior_full, libs/CRP.py:241-251 and
    the learning-model override libs/CRP_learning_errors.py:47-49).
    """
    live = cluster_size > 0
    n = float(cfg.n_cells)
    lp = dist.gamma_logpdf_loc(dp_alpha, cfg.dp_a_shape, cfg.dp_a_loc)
    lp += jnp.sum(
        jnp.where(live, crp_size_log_prior(jnp.maximum(cluster_size, 1), n, dp_alpha), 0.0)
    )
    if not cfg.beta_prior_uniform:
        lpdf = ax.apply_mask(
            dist.beta_logpdf(params, cfg.p, cfg.q, cfg.log_beta_norm)
        )
        lp += ax.psum(jnp.sum(jnp.where(live[:, None], lpdf, 0.0)))
    if cfg.learn_errors:
        lp += dist.truncnorm_prior_logpdf(fp, cfg.fp, cfg.fp_sd)
        lp += dist.truncnorm_prior_logpdf(fn, cfg.fn, cfg.fn_sd)
    return lp
