"""Plain-NumPy/SciPy oracles implementing the reference math from the papers
and the SURVEY.md equations. These are *independent* renderings of the same
formulas (not transliterations of library code) used to validate the JAX
kernels coordinate-by-coordinate.
"""

import numpy as np
from scipy.special import betaln, gammaln
from scipy.stats import beta as beta_dist
from scipy.stats import truncnorm as sp_truncnorm

TMIN = 1e-5
TMAX = 1 - TMIN


def bernoulli_mixture_ll(x, theta, fp, fn):
    """log( theta * BernFN(x) + (1-theta) * BernFP(x) ), NaN-masked sum over
    the mutation axis. x: [n, m] with NaN; theta: [m] or [k, m]."""
    x = np.asarray(x, dtype=float)
    theta = np.atleast_2d(theta)
    out = np.zeros((x.shape[0], theta.shape[0]))
    for k in range(theta.shape[0]):
        bern_fn = (1 - fn) ** x * fn ** (1 - x)
        bern_fp = (1 - fp) ** (1 - x) * fp ** x
        ll = np.log(theta[k] * bern_fn + (1 - theta[k]) * bern_fp)
        out[:, k] = np.nansum(ll, axis=1)
    return out


def beta_mix_consts(p, q):
    l0 = betaln(p, q + 1)
    l1 = betaln(p + 1, q)
    m = max(l0, l1)
    e0, e1 = np.exp(l0 - m), np.exp(l1 - m)
    return e0 / (e0 + e1), e1 / (e0 + e1)


def new_cluster_ll(x, p, q, fp, fn):
    mix0, mix1 = beta_mix_consts(p, q)
    ll_fp = mix0 * ((1 - fp) ** (1 - x) * fp ** x)
    ll_fn = mix1 * ((1 - fn) ** x * fn ** (1 - x))
    return np.nansum(np.log(ll_fn + ll_fp), axis=1)


def crp_log_prior(n_i, n, a):
    return np.log(n_i) - np.log(n - 1 + a)


def log_prior_full(cluster_sizes, params_live, dp_alpha, n, p, q,
                   dp_shape, dp_loc):
    from scipy.stats import gamma as gamma_dist

    lp = gamma_dist(dp_shape, dp_loc).logpdf(dp_alpha)
    lp += np.sum(crp_log_prior(np.asarray(cluster_sizes, float), n, dp_alpha))
    if not (p == 1 and q == 1):
        lp += np.sum(beta_dist(p, q).logpdf(params_live))
    return lp


def truncnorm_logpdf(x, a, b, loc, scale):
    return sp_truncnorm.logpdf(x, a, b, loc=loc, scale=scale)


def mh_log_A(new, old, x_cells, a, b, std, fp, fn, p, q):
    """Reference _get_log_A math (libs/CRP.py:347-378) via scipy."""
    new_p = sp_truncnorm.logpdf(new, a, b, loc=old, scale=std)
    a_rev = (TMIN - new) / std
    b_rev = (TMAX - new) / std
    old_p = sp_truncnorm.logpdf(old, a_rev, b_rev, loc=new, scale=std)

    bern_fn = (1 - fn) ** x_cells * fn ** (1 - x_cells)
    bern_fp = (1 - fp) ** (1 - x_cells) * fp ** x_cells
    new_ll = np.nansum(np.log(new * bern_fn + (1 - new) * bern_fp), axis=0)
    old_ll = np.nansum(np.log(old * bern_fn + (1 - old) * bern_fp), axis=0)

    if p == 1 and q == 1:
        prior = 0.0
    else:
        prior = beta_dist(p, q).logpdf(new) - beta_dist(p, q).logpdf(old)
    return new_ll - old_ll + prior + old_p - new_p


def lugsail_psrf(chains, steps=None):
    """Independent rendering of Vats & Knudson 2018 eq. 5 with lugsail
    batch means (libs/utils.py:427-461)."""
    t_il, s_i, n_i = [], [], []
    for trace, burn in chains:
        d = np.asarray(trace)[burn:steps]
        if d.size < 9:
            return np.inf
        n_ii = d.size
        b = int(np.sqrt(n_ii))
        mean = d.mean()

        def tau(bb):
            a = d.size // bb
            bm = d[: a * bb].reshape(a, bb).mean(axis=1)
            return bb / (a - 1) * np.sum((bm - mean) ** 2)

        t_il.append(2 * tau(b) - tau(b // 3))
        s_i.append(d.var(ddof=1))
        n_i.append(n_ii)
    t_l, s, n = np.mean(t_il), np.mean(s_i), np.round(np.mean(n_i))
    return np.sqrt((((n - 1) * s + t_l) / n) / s)
