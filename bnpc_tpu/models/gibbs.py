"""Sequential per-cell Gibbs sweep as a lax.scan.

Reference: update_assignments_Gibbs (libs/CRP.py:254-288). The per-cell order
dependence (through cluster sizes, occupancy, and clusters born mid-sweep) is
real, so the sweep stays sequential over a random permutation — but each step
is two [k_max, m] matvecs plus a masked categorical, and the per-cell
log-likelihood tables c1/c0 are carried and updated only when a new cluster is
born (one row). Cluster parameters are fixed within a sweep except for fresh
Beta-posterior rows of newborn clusters, exactly as in the reference.
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
    k_perm, k_scan = jax.random.split(key)

    perm = jax.random.permutation(k_perm, n)
    cell_keys = jax.random.split(k_scan, n)

    # Per-sweep constants: alpha is fixed within a sweep, so the new-cluster
    # posterior is precomputed for all cells at once (libs/CRP.py:258).
    alpha = state.dp_alpha
    log_denom = jnp.log(n - 1.0 + alpha)
    new_post = lk.new_cluster_ll(data, cfg, state.fp, state.fn) \
        + jnp.log(alpha) - log_denom

    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)

    def step(carry, xs):
        assignment, params, size, c1, c0 = carry
        cell, ck = xs
        k_cat, k_beta = jax.random.split(ck)

        xm_row = data.xm[cell]
        xm0_row = data.xm0[cell]

        # Remove the cell from its cluster (libs/CRP.py:262-266).
        old = assignment[cell]
        size = size.at[old].add(-1)
        live = size > 0

        # Posterior over live slots + the new-cluster option.
        ll = lk.ll_row(xm_row, xm0_row, c1, c0, ax)
        log_size = jnp.log(jnp.maximum(size, 1).astype(jnp.float32))
        post_old = jnp.where(live, ll + log_size - log_denom, NEG_INF)
        has_free = jnp.any(~live)
        post_new = jnp.where(has_free, new_post[cell], NEG_INF)
        logits = jnp.concatenate([post_old, post_new[None]])

        choice = jax.random.categorical(k_cat, logits)
        is_new = choice == k_max
        free = jnp.argmax(size == 0).astype(jnp.int32)
        target = jnp.where(is_new, free, choice).astype(jnp.int32)

        # Fresh Beta-posterior parameters for a newborn cluster
        # (init_new_cluster -> _init_cl_params_new, libs/CRP.py:183-188, 291-294).
        # Drawn unconditionally (cheap, keeps the scan branch-free) and written
        # to the free slot only when the new-cluster option was selected.
        fresh = jnp.clip(
            jax.random.beta(ax.fold_key(k_beta), cfg.p + xm_row,
                            cfg.q + xm0_row),
            TMIN, TMAX,
        ).astype(jnp.float32)
        row = jnp.where(is_new, fresh, params[free])
        params = params.at[free].set(row)
        r1, r0 = lk.log_prob_tables(row, state.fp, state.fn)
        c1 = c1.at[free].set(r1)
        c0 = c0.at[free].set(r0)

        size = size.at[target].add(1)
        assignment = assignment.at[cell].set(target)
        return (assignment, params, size, c1, c0), None

    init = (state.assignment, state.params, state.cluster_size, c1, c0)
    (assignment, params, size, _, _), _ = jax.lax.scan(
        step, init, (perm, cell_keys)
    )
    return state._replace(
        assignment=assignment, params=params, cluster_size=size
    )
