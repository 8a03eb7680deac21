"""Static model / MCMC configuration.

These dataclasses are frozen and hashable so they can be closed over by (or
passed as static arguments to) jit-compiled functions. Everything that the
reference keeps as Python object state (libs/CRP.py:27-65, libs/MCMC.py:27-50)
but that never changes during sampling lives here; the mutable sampler state
lives in :class:`bnpc_tpu.state.CRPState`.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
from scipy.special import gammaln as _gammaln

# Numerical constants mirrored from the reference (libs/CRP.py:10-14) so that
# clipping/clamping behaviour is identical.
EPSILON = float(np.finfo(np.float64).resolution)  # 1e-15
LOG_EPSILON = math.log(EPSILON)
TMIN = 1e-5
TMAX = 1.0 - TMIN


def _log_beta_fn(p: float, q: float) -> float:
    return float(_gammaln(p) + _gammaln(q) - _gammaln(p + q))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static description of the DPMM.

    Mirrors the constructor arguments of the reference models
    (libs/CRP.py:27-65 and libs/CRP_learning_errors.py:18-32) plus the
    TPU-specific capacity knobs.

    Attributes:
      n_cells / n_muts: data shape.
      k_max: cluster-slot capacity. The reference allows up to ``n`` clusters
        (ids recycled in [0, n), libs/CRP.py:297-299); a fixed capacity keeps
        shapes static for XLA. ``k_max == n_cells`` reproduces the reference
        exactly; smaller values trade the (astronomically unlikely) tail of
        the CRP prior for speed and memory.
      p, q: Beta(p, q) cluster-parameter prior (reference default 0.25, 0.25
        via the ``-pp`` flag, run_BnpC.py:89-92).
      mix0, mix1: normalized Beta-mixture constants used for the prior
        predictive of a brand-new cluster (libs/CRP.py:42-44).
      dp_a_shape / dp_a_loc_scale: the Gamma prior on the CRP concentration.
        NOTE the reference constructs ``scipy.stats.gamma(a, b)`` which binds
        ``b`` as the *location* (libs/CRP.py:55), so the prior is
        Gamma(shape=a, loc=b, scale=1) with mean a + b; and the Escobar-West
        resampling step uses ``b - log(eta)`` as the numpy *scale* parameter
        (libs/CRP.py:401-407). Both quirks are reproduced deliberately so the
        stationary distribution over alpha matches the reference.
      fp / fn: error rates; fixed values for the fixed-error model, prior
        means (= initial values) for the learning model.
      learn_errors: whether FP/FN are resampled (CRP_errors_learning).
      fp_sd / fn_sd: truncated-normal prior std-devs for the learning model.
    """

    n_cells: int
    n_muts: int
    k_max: int
    p: float = 1.0
    q: float = 1.0
    dp_a_shape: float = -1.0
    dp_a_loc: float = -1.0
    fp: float = EPSILON
    fn: float = EPSILON
    learn_errors: bool = False
    fp_sd: float = 0.0005
    fn_sd: float = 0.05
    # RNG draw width for slot-axis randomness (0 -> k_max). The live-width
    # fast path (mcmc.make_step_fn) runs most steps with a NARROW k_max
    # while drawing slot-shaped randomness at the FULL width and slicing,
    # so narrow and wide step bodies consume bit-identical random streams
    # and can be swapped by a lax.cond without changing the sampled chain.
    k_rng: int = 0

    def __post_init__(self):
        if self.dp_a_shape < 0 or self.dp_a_loc < 0:
            # Reference default: Gamma(sqrt(n), 1) (libs/CRP.py:51-52).
            object.__setattr__(self, "dp_a_shape", math.sqrt(self.n_cells))
            object.__setattr__(self, "dp_a_loc", 1.0)
        if not (0 < self.k_max <= self.n_cells):
            raise ValueError(
                f"k_max must be in (0, n_cells]; got {self.k_max} for "
                f"n={self.n_cells}"
            )

    @property
    def rng_k(self) -> int:
        """Slot count at which slot-axis randomness is drawn (>= k_max)."""
        return self.k_rng or self.k_max

    # -- Derived constants (computed on demand; cheap, pure) ----------------

    @property
    def beta_prior_uniform(self) -> bool:
        # libs/CRP.py:37-40
        return self.p == 1.0 and self.q == 1.0

    @property
    def log_beta_norm(self) -> float:
        """log B(p, q), the Beta prior normalizer."""
        return _log_beta_fn(self.p, self.q)

    @property
    def beta_mix(self) -> tuple[float, float]:
        """Normalized (mix0, mix1) = (B(p, q+1), B(p+1, q)) / sum.

        Reference: libs/CRP.py:42-44 (computed via Gamma functions there;
        identical values, computed in log-space here for stability).
        """
        l0 = _log_beta_fn(self.p, self.q + 1.0)
        l1 = _log_beta_fn(self.p + 1.0, self.q)
        hi = max(l0, l1)
        e0, e1 = math.exp(l0 - hi), math.exp(l1 - hi)
        s = e0 + e1
        return (e0 / s, e1 / s)

    @property
    def dp_a_init(self) -> float:
        """Initial alpha = prior mean = shape + loc (scale 1). libs/CRP.py:56."""
        return self.dp_a_shape + self.dp_a_loc


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    """Move-mixture probabilities and split-merge settings.

    Mirrors libs/MCMC.py:27-50 / run_BnpC.py:125-148 defaults.
    """

    sm_prob: float = 0.33
    dpa_prob: float = 0.5
    error_prob: float = 0.1
    sm_split_ratio: float = 0.75
    sm_steps: int = 5
    fix_assign: bool = False
    # TPU-specific: how many cluster rows of the parameter trace to keep per
    # recorded step (the reference grows this axis dynamically,
    # libs/MCMC.py:266-282; we use a static cap and compact live slots into it).
    trace_k: int = 0  # 0 -> min(k_max, 64) chosen at runtime
    # Opt-in APPROXIMATE blocked Gibbs sweep (models/gibbs._blocked_impl):
    # 0 (default) = exact reference semantics; N > 0 = decide N cells per
    # frozen-size block (birth blocks replay exactly). SURVEY.md pivot 3's
    # reserved approximation — deviates from the reference sampler.
    gibbs_block: int = 0
    # Share the per-step move-type selection across vmapped chains so the
    # split-merge/Gibbs lax.cond stays a real branch (vmap otherwise lowers
    # it to select, executing BOTH moves for every chain every step). The
    # randomness inside each move stays per-chain; only the kernel schedule
    # is common — each chain's stationary distribution is unchanged, but
    # chains are no longer strictly independent processes (the reference
    # draws move types per chain, libs/MCMC.py:320-342). Opt-in.
    coupled_moves: bool = False
