"""Small log-density helpers shared by the samplers."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from bnpc_tpu.ops import truncnorm


def gamma_logpdf_loc(x, shape, loc, scale=1.0):
    """Gamma(shape, scale) log-density with a location shift.

    The reference constructs its alpha prior as ``scipy.stats.gamma(a, b)``
    which binds ``b`` as *loc* (libs/CRP.py:55), i.e. the density of
    ``loc + Gamma(shape, 1)``. Reproduced exactly.
    """
    y = (x - loc) / scale
    return jnp.where(
        y > 0,
        (shape - 1.0) * jnp.log(jnp.maximum(y, 1e-300)) - y - gammaln(shape)
        - jnp.log(scale),
        -jnp.inf,
    )


def beta_logpdf(x, p, q, log_beta_norm):
    return (p - 1.0) * jnp.log(x) + (q - 1.0) * jnp.log1p(-x) - log_beta_norm


def truncnorm_prior_logpdf(x, mean, sd):
    """Truncated-normal prior on [0, 1] as used for FP/FN rates
    (libs/CRP_learning_errors.py:22-32)."""
    a = (0.0 - mean) / sd
    b = (1.0 - mean) / sd
    return truncnorm.logpdf(x, a, b, mean, sd)
