"""Fast exact samplers specialized to this model's structure.

``jax.random.beta`` with array-valued shape parameters costs ~21 ms for the
[5,000 x 200] newborn-row field on TPU v5e — 85% of a whole fused Gibbs
sweep — because the generic gamma sampler runs a data-dependent while_loop.
The model only ever needs Beta(p + x, q + x0) with BINARY x/x0 (the data
planes, bnpc_tpu/data.py), i.e. per element one of three fixed parameter
pairs. That structure admits an exact, fixed-round, branch-free sampler:

  * Gamma(k) for k = p+1, q+1 in (1, 2] via Marsaglia-Tsang (2000) squeeze,
    vectorized over a FIXED number of rejection rounds with first-accept
    semantics (acceptance per round is >95% for k in (1,2]);
  * the small-shape boost Gamma(a) =d Gamma(a+1) * U^(1/a) applied ONLY
    where the data bit is 0 — reusing the same Gamma(a+1) field is valid
    because each element consumes exactly one of the two branches;
  * Beta(a, b) = Ga / (Ga + Gb).

Measured: 22.9 ms -> ~1 ms for the full newborn field; exactness asserted
by KS tests against scipy in tests/test_randomx.py.

Exactness bound (fixed rounds vs the reference's unbounded rejection): with
per-round acceptance >= 0.95, a draw falls back to the distribution's mode
scale `d` with probability <= 0.05^R (~6e-6 at the default R = 4, ~1.6e-8
at R = 6). That is a total-variation error <= 0.05^R per Gamma component;
the newborn-row field consumes ~2*n*m components per sweep (~2e6 at
headline scale), so on the order of a dozen mode-patched values enter ONE
[n, m] proposal field per sweep. The field only parameterizes newborn-
cluster PROPOSALS of the transition kernel, so the per-step kernel
perturbation is bounded by the same 0.05^R in TV — orders of magnitude
below f32 rounding in the likelihood sums. A KS test cannot see 6e-6
contamination at 1e6 samples (tests/test_randomx.py bounds the bulk
distribution, not this tail). Set BNPC_TPU_MT_ROUNDS to trade throughput
for a smaller fallback rate (each round costs RNG + transcendentals on the
~0.9 ms newborn-field budget, BASELINE.md).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DEFAULT_ROUNDS = int(os.environ.get("BNPC_TPU_MT_ROUNDS", "4"))


def mt_gamma(key, shape_param: float, shape, rounds: int = _DEFAULT_ROUNDS):
    """Gamma(shape_param) for a STATIC scalar shape_param > 1/3, via
    fixed-round Marsaglia-Tsang rejection with first-accept semantics.
    Never-accepted elements (p <= 0.05^rounds, see module docstring) fall
    back to the mode scale d."""
    d = shape_param - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    g = jnp.full(shape, d, jnp.float32)  # never-accepted fallback
    accepted = jnp.zeros(shape, bool)
    for r in range(rounds):
        kx, ku, key = jax.random.split(key, 3)
        x = jax.random.normal(kx, shape, jnp.float32)
        v = (1.0 + c * x) ** 3
        u = jax.random.uniform(ku, shape, jnp.float32)
        ok = (v > 0.0) & (
            jnp.log(u)
            < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0, v, 1.0))
        )
        g = jnp.where(~accepted & ok, d * v, g)
        accepted |= ok
    return g


def mt_gamma_boosted(key, a, rounds: int = 6):
    """Gamma(a) for ARRAY-valued a > 0: fixed-round Marsaglia-Tsang at
    shape a+1 (acceptance >96% for any shape >= 1), then the small-shape
    boost Gamma(a) = Gamma(a+1) * U^(1/a)."""
    a = jnp.asarray(a, jnp.float32)
    d = a + 1.0 - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    g = d  # never-accepted fallback (~4e-9 rate)
    accepted = jnp.zeros(a.shape, bool)
    k_boost, key = jax.random.split(key)
    for r in range(rounds):
        kx, ku, key = jax.random.split(key, 3)
        x = jax.random.normal(kx, a.shape, jnp.float32)
        v = (1.0 + c * x) ** 3
        u = jax.random.uniform(ku, a.shape, jnp.float32)
        ok = (v > 0.0) & (
            jnp.log(u)
            < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0, v, 1.0))
        )
        g = jnp.where(~accepted & ok, d * v, g)
        accepted |= ok
    u_boost = jax.random.uniform(k_boost, a.shape, jnp.float32)
    return g * u_boost ** (1.0 / a)


def beta_general(key, a, b):
    """Exact Beta(a, b) for array-valued parameters via two boosted gammas.
    Drop-in for jax.random.beta, which runs a data-dependent while_loop
    (latency-bound: ~ms even for a [200]-element draw on a tunneled TPU)."""
    k_a, k_b = jax.random.split(key)
    ga = mt_gamma_boosted(k_a, a)
    gb = mt_gamma_boosted(k_b, b)
    denom = ga + gb
    return jnp.where(denom > 0.0, ga / denom, 0.5)


def beta_binary(key, p: float, q: float, xm, xm0):
    """Exact Beta(p + xm, q + xm0) field for binary xm/xm0 planes.

    Matches the reference's newborn-row draw np.random.beta(p + x, q + x0)
    (libs/CRP.py:183-188) in distribution; see module docstring for the
    construction.
    """
    k_a, k_b, k_ua, k_ub = jax.random.split(key, 4)
    shape = xm.shape
    ga1 = mt_gamma(k_a, p + 1.0, shape)
    gb1 = mt_gamma(k_b, q + 1.0, shape)
    ua = jax.random.uniform(k_ua, shape, jnp.float32)
    ub = jax.random.uniform(k_ub, shape, jnp.float32)
    # Boost where the data bit is 0: Gamma(a) = Gamma(a+1) * U^(1/a).
    ga = ga1 * jnp.where(xm == 1.0, 1.0, ua ** (1.0 / p))
    gb = gb1 * jnp.where(xm0 == 1.0, 1.0, ub ** (1.0 / q))
    denom = ga + gb
    return jnp.where(denom > 0.0, ga / denom, 0.5)
