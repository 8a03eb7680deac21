"""Truncated-normal sampling and log-density in pure JAX.

The reference leans on ``scipy.stats.truncnorm`` for the random-walk proposals
of cluster parameters (libs/CRP.py:314-357) and error rates
(libs/CRP_learning_errors.py:66-91). Everything here is elementwise and
vmappable; bounds ``a``/``b`` are in standardized units, matching scipy's
convention: the support is [loc + a*scale, loc + b*scale].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random
from jax.scipy.special import log_ndtr, ndtr, ndtri

_HALF_LOG_2PI = 0.9189385332046727


def _log_gauss_mass(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """log(Phi(b) - Phi(a)), numerically stable for either-sided intervals."""
    # Work in the left tail: if the interval lies in the right half, mirror it.
    flip = a > 0
    a_ = jnp.where(flip, -b, a)
    b_ = jnp.where(flip, -a, b)
    la, lb = log_ndtr(a_), log_ndtr(b_)
    # log(e^lb - e^la) = lb + log1p(-e^(la - lb))
    return lb + jnp.log1p(-jnp.exp(jnp.minimum(la - lb, -1e-12)))


def logpdf(x, a, b, loc, scale):
    """Elementwise truncnorm.logpdf(x, a, b, loc, scale)."""
    z = (x - loc) / scale
    return -0.5 * z * z - _HALF_LOG_2PI - jnp.log(scale) - _log_gauss_mass(a, b)


def rvs(key, a, b, loc, scale, shape=None):
    """Draw truncated-normal variates by inverse-CDF.

    Accurate for the regime used by the samplers (the mean sits inside the
    interval and scales are O(0.1)); probabilities are clamped away from
    {0, 1} so ndtri never returns inf.
    """
    if shape is None:
        shape = jnp.broadcast_shapes(
            jnp.shape(a), jnp.shape(b), jnp.shape(loc), jnp.shape(scale)
        )
    u = random.uniform(key, shape)
    pa, pb = ndtr(a), ndtr(b)
    p = jnp.clip(pa + u * (pb - pa), 1e-12, 1.0 - 1e-12)
    x = loc + scale * ndtri(p)
    # Keep draws strictly inside the truncation interval.
    return jnp.clip(x, loc + a * scale, loc + b * scale)
