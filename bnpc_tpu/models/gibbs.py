"""Sequential per-cell Gibbs sweep as a lax.scan.

Reference: update_assignments_Gibbs (libs/CRP.py:254-288). The per-cell order
dependence (through cluster sizes, occupancy, and clusters born mid-sweep) is
real, so the sweep stays sequential over a random permutation — but the scan
body is engineered for TPU latency:

  * The full [n, k_max] log-likelihood matrix L is computed ONCE per sweep as
    two MXU matmuls (parameters are fixed within a sweep except for newborn
    clusters); the scan body only gathers a row of L.
  * ALL randomness is hoisted out of the scan: the categorical draw becomes
    argmax over precomputed per-cell Gumbel noise, and the Beta-posterior
    parameter rows of potential newborn clusters (libs/CRP.py:183-188) are
    drawn vectorized for every cell up front — the scan body contains zero
    threefry invocations.
  * When a new cluster is actually born (rare), one lax.cond patches the
    parameter row and refreshes L's column for that slot with a single
    [n, m] x [m] matvec, so cells later in the permutation see the newborn
    cluster exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bnpc_tpu.config import TMIN, TMAX, ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import CRPState

_NO_AXIS = MutAxis()

NEG_INF = -jnp.inf


def gibbs_sweep(key, state: CRPState, data: PackedData,
                cfg: ModelConfig, ax: MutAxis = _NO_AXIS) -> CRPState:
    n, k_max = cfg.n_cells, cfg.k_max
    k_perm, k_gumbel, k_beta = jax.random.split(key, 3)

    perm = jax.random.permutation(k_perm, n)

    # Per-sweep constants: alpha is fixed within a sweep, so the new-cluster
    # posterior is precomputed for all cells at once (libs/CRP.py:258).
    alpha = state.dp_alpha
    log_denom = jnp.log(n - 1.0 + alpha)
    new_post = lk.new_cluster_ll(data, cfg, state.fp, state.fn) \
        + jnp.log(alpha) - log_denom

    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    ll0 = lk.ll_matrix(data, c1, c0, ax)  # [n, k_max]

    # Hoisted randomness (identical across mutation shards for the scalar
    # decisions; per-mutation for the Beta rows).
    gumbel = jax.random.gumbel(k_gumbel, (n, k_max + 1))
    fresh = jnp.clip(
        jax.random.beta(
            ax.fold_key(k_beta), cfg.p + data.xm, cfg.q + data.xm0
        ),
        TMIN, TMAX,
    ).astype(jnp.float32)  # [n, m] newborn row per cell
    f1, f0 = lk.log_prob_tables(fresh, state.fp, state.fn)

    def step(carry, cell):
        assignment, params, size, ll = carry

        # Remove the cell from its cluster (libs/CRP.py:262-266).
        old = assignment[cell]
        size = size.at[old].add(-1)
        live = size > 0

        # Posterior over live slots + the new-cluster option.
        log_size = jnp.log(jnp.maximum(size, 1).astype(jnp.float32))
        post_old = jnp.where(live, ll[cell] + log_size - log_denom, NEG_INF)
        has_free = jnp.any(~live)
        post_new = jnp.where(has_free, new_post[cell], NEG_INF)
        logits = jnp.concatenate([post_old, post_new[None]])

        choice = jnp.argmax(logits + gumbel[cell]).astype(jnp.int32)
        is_new = choice == k_max
        free = jnp.argmax(size == 0).astype(jnp.int32)
        target = jnp.where(is_new, free, choice).astype(jnp.int32)

        # Newborn cluster: patch the parameter row (a fresh Beta-posterior
        # draw, libs/CRP.py:291-294) and refresh L's column for this slot so
        # later cells in the permutation score against it.
        def birth(params, ll):
            params = params.at[free].set(fresh[cell])
            col = lk.ll_row(f1[cell], f0[cell],
                            data.xm, data.xm0, ax)  # [n]
            return params, ll.at[:, free].set(col)

        params, ll = jax.lax.cond(
            is_new, birth, lambda p, l: (p, l), params, ll
        )

        size = size.at[target].add(1)
        assignment = assignment.at[cell].set(target)
        return (assignment, params, size, ll), None

    init = (state.assignment, state.params, state.cluster_size, ll0)
    (assignment, params, size, _), _ = jax.lax.scan(step, init, perm)
    return state._replace(
        assignment=assignment, params=params, cluster_size=size
    )
