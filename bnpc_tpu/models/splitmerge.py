"""Non-conjugate Jain-Neal split-merge move with restricted Gibbs launch scans.

Reference: libs/CRP.py:417-820. The reference mutates Python scratch state
(`rg_assignment`, `rg_params_split`, `rg_params_merge`) over data-dependent
cell subsets; here the move is a pure function over fixed-shape masked arrays:

  * the cells participating in the move are a boolean mask over all n cells;
  * the restricted 2-way assignment `rg` is an int vector over all n cells
    (entries outside the move are ignored);
  * restricted Gibbs scans are lax.scans over all n positions with
    non-participating positions passed through;
  * all cell subsets enter the math only through masked matvec sufficient
    statistics, so every likelihood term is O(m) or one [n, m] x [m, 2]
    matmul.

Deliberate deviation: the reference's sequential reverse-path scan for merges
iterates cells in its internal scratch-array order (libs/CRP.py:806-818,
anchor-swap included); we iterate in ascending cell-id order. Both are fixed
orders of the same restricted conditionals; statistics parity is unaffected.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from bnpc_tpu.config import TMIN, TMAX, ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.ops import distributions as dist
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.ops import mh
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import CRPState, first_free_slot

_NO_AXIS = MutAxis()

NEG_INF = -jnp.inf


class _MoveCtx(NamedTuple):
    """Everything fixed for the duration of one split-merge proposal."""

    is_split: jnp.ndarray     # bool
    cells: jnp.ndarray        # [n] bool — cells taking part in the move
    s_mask: jnp.ndarray       # [n] bool — cells minus the two anchors
    anchor_i: jnp.ndarray     # int32 cell id (reference: cells[0])
    anchor_j: jnp.ndarray     # int32 cell id (reference: cells[-1])
    cl_a: jnp.ndarray         # int32 cluster of anchor_i
    cl_b: jnp.ndarray         # int32 cluster of anchor_j (== cl_a for splits)
    n_move: jnp.ndarray       # f32 |cells|
    ltrans_size: jnp.ndarray  # f32 forward size-proposal log-prob term
    inv_sum_others: jnp.ndarray  # f32 sum of 1/size over non-chosen clusters


class _RGState(NamedTuple):
    rg: jnp.ndarray            # [n] int32 in {0, 1}
    params_split: jnp.ndarray  # [2, m] f32
    params_merge: jnp.ndarray  # [m] f32


def _gumbel_top2(key, logits):
    g = jax.random.gumbel(key, logits.shape)
    z = logits + g
    first = jnp.argmax(z)
    second = jnp.argmax(z.at[first].set(NEG_INF))
    return first.astype(jnp.int32), second.astype(jnp.int32)


def _masked_counts(mask_f32, data: PackedData):
    """(n1, n0) each [m]: observed 1/0 counts over the cells in `mask`."""
    n1 = mask_f32 @ data.xm
    n0 = mask_f32 @ data.xm0
    return n1, n0


def _beta_posterior_row(key, cfg, n1, n0):
    from bnpc_tpu.ops.randomx import beta_general

    draw = beta_general(key, cfg.p + n1, cfg.q + n0)
    return jnp.clip(draw, TMIN, TMAX).astype(jnp.float32)


def _side_masks(ctx: _MoveCtx, rg):
    """f32 cell masks of launch side 0 (incl anchor i) and side 1 (incl j)."""
    n = rg.shape[0]
    idx = jnp.arange(n)
    side0 = (ctx.s_mask & (rg == 0)) | (idx == ctx.anchor_i)
    side1 = (ctx.s_mask & (rg == 1)) | (idx == ctx.anchor_j)
    return side0.astype(jnp.float32), side1.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Proposal setup (do_split_move / do_merge_move, libs/CRP.py:434-524)
# ---------------------------------------------------------------------------


def _setup(key, state: CRPState, cfg: ModelConfig, is_split) -> _MoveCtx:
    n = cfg.n_cells
    idx = jnp.arange(n)
    size_f = state.cluster_size.astype(jnp.float32)
    live = state.cluster_size > 0
    k_cl, k_anchor_i, k_anchor_j = jax.random.split(key, 3)

    # ---- split branch: one size-weighted cluster with >= 2 cells --------
    # Rejection-resampling until a multi-cell cluster is hit (libs/CRP.py:441-445)
    # equals direct sampling from p ~ size restricted to size >= 2.
    split_logits = jnp.where(state.cluster_size >= 2, jnp.log(jnp.maximum(size_f, 1.0)), NEG_INF)
    split_cl = jax.random.categorical(k_cl, split_logits).astype(jnp.int32)
    split_members = state.assignment == split_cl
    member_logits = jnp.where(split_members, 0.0, NEG_INF)
    sp_ai, sp_aj = _gumbel_top2(k_anchor_i, member_logits)
    sp_size = size_f[split_cl]
    # Eq. 3 second term (libs/CRP.py:453-456).
    sp_ltrans = (
        jnp.log(sp_size / n) - jnp.log(sp_size) - jnp.log(sp_size - 1.0)
    )
    slot_idx = jnp.arange(cfg.k_max)
    sp_inv_others = jnp.sum(
        jnp.where(live & (slot_idx != split_cl),
                  1.0 / jnp.maximum(size_f, 1.0), 0.0)
    )

    # ---- merge branch: two inverse-size-weighted clusters ---------------
    inv = jnp.where(live, 1.0 / jnp.maximum(size_f, 1.0), 0.0)
    inv_sum = jnp.sum(inv)
    merge_logits = jnp.where(live, jnp.log(jnp.maximum(inv, 1e-30)), NEG_INF)
    mg_ca, mg_cb = _gumbel_top2(k_cl, merge_logits)
    members_a = state.assignment == mg_ca
    members_b = state.assignment == mg_cb
    mg_ai = jax.random.categorical(
        k_anchor_i, jnp.where(members_a, 0.0, NEG_INF)
    ).astype(jnp.int32)
    mg_aj = jax.random.categorical(
        k_anchor_j, jnp.where(members_b, 0.0, NEG_INF)
    ).astype(jnp.int32)
    # Eq. 6 second term (libs/CRP.py:505-507): both probabilities from the
    # same unrenormalized inverse-size distribution, as in the reference.
    mg_ltrans = (
        jnp.log(inv[mg_ca] / inv_sum) + jnp.log(inv[mg_cb] / inv_sum)
        - jnp.log(size_f[mg_ca]) - jnp.log(size_f[mg_cb])
    )

    cells = jnp.where(is_split, split_members, members_a | members_b)
    anchor_i = jnp.where(is_split, sp_ai, mg_ai)
    anchor_j = jnp.where(is_split, sp_aj, mg_aj)
    s_mask = cells & (idx != anchor_i) & (idx != anchor_j)
    return _MoveCtx(
        is_split=is_split,
        cells=cells,
        s_mask=s_mask,
        anchor_i=anchor_i,
        anchor_j=anchor_j,
        cl_a=jnp.where(is_split, split_cl, mg_ca),
        cl_b=jnp.where(is_split, split_cl, mg_cb),
        n_move=jnp.sum(cells).astype(jnp.float32),
        ltrans_size=jnp.where(is_split, sp_ltrans, mg_ltrans),
        inv_sum_others=sp_inv_others,
    )


# ---------------------------------------------------------------------------
# Launch state (run_rg_nc steps 3.x, libs/CRP.py:527-567)
# ---------------------------------------------------------------------------


def _rg_init(key, ctx: _MoveCtx, state: CRPState, data: PackedData,
             cfg: ModelConfig, ax: MutAxis = _NO_AXIS) -> _RGState:
    k_i, k_j, k_m = jax.random.split(ax.fold_key(key), 3)
    mix0, _ = cfg.beta_mix
    mask = data.mask

    # Likelihood-based initial split: score every cell against the anchors'
    # own (noise-imputed) genotypes (libs/CRP.py:547-561).
    def anchor_theta(a):
        return jnp.where(mask[a] > 0, data.x[a], mix0)

    th_i = anchor_theta(ctx.anchor_i)
    th_j = anchor_theta(ctx.anchor_j)
    ci1, ci0 = lk.log_prob_tables(th_i, state.fp, state.fn)
    cj1, cj0 = lk.log_prob_tables(th_j, state.fp, state.fn)
    ll_i = ax.psum(data.xm @ ci1 + data.xm0 @ ci0)
    ll_j = ax.psum(data.xm @ cj1 + data.xm0 @ cj0)
    rg = jnp.where(ll_j > ll_i, 1, 0).astype(jnp.int32)

    side0, side1 = _side_masks(ctx, rg)
    n1_0, n0_0 = _masked_counts(side0, data)
    n1_1, n0_1 = _masked_counts(side1, data)
    params_split = jnp.stack([
        _beta_posterior_row(k_i, cfg, n1_0, n0_0),
        _beta_posterior_row(k_j, cfg, n1_1, n0_1),
    ])

    cells_f = ctx.cells.astype(jnp.float32)
    n1_m, n0_m = _masked_counts(cells_f, data)
    params_merge = _beta_posterior_row(k_m, cfg, n1_m, n0_m)
    return _RGState(rg, params_split, params_merge)


def _visit_order(k_perm, s_mask, rg_launch, ll2, dz, random_order=True):
    """Visit order for a restricted scan, plus co-sorted visit-order payloads.

    The order is a uniform random permutation with the move's cells FIRST
    (their relative order is uniform over S — exactly the reference's
    distribution, libs/CRP.py:616), built as ONE variadic `lax.sort` keyed by
    (not-in-S, 64 random bits): a [n] gather on TPU runs element-at-a-time on
    the scalar unit (~8 ns/elem measured) while the sort is ~1.5 ns/elem, and
    the payload operands give the replay its visit-order launch sides and
    log-lik columns — and the rg kernel its sequential dz/launch streams —
    for free. Because S-cells sort first, "movable" in visit order is simply
    `position < s_count` — no mask gather anywhere.

    Returns (order, lau_v, ll0_v, ll1_v, dz_v).
    """
    n = s_mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    s_not = (~s_mask).astype(jnp.uint32)
    if random_order:
        bits = jax.random.bits(k_perm, (2, n), dtype=jnp.uint32)
        k1, k2 = bits[0], bits[1]
    else:
        k1 = iota.astype(jnp.uint32)
        k2 = jnp.zeros((n,), jnp.uint32)
    _, _, _, order, lau_v, ll0_v, ll1_v, dz_v = jax.lax.sort(
        (s_not, k1, k2, iota, rg_launch.astype(jnp.float32),
         ll2[:, 0], ll2[:, 1], dz),
        num_keys=3, is_stable=True)
    return order, lau_v, ll0_v, ll1_v, dz_v


def _trans_prob_replay(ctx: _MoveCtx, lau_v, fin_v, ll0_v, ll1_v, s_count,
                       dp_alpha):
    """Chosen-log-probability sum of a completed restricted scan, vectorized.

    The scan's count evolution is deterministic given its launch and final
    side vectors: when cell order[t] is visited, the side-1 count over
    S \\ {cell} is (# earlier-visited s-cells, at their FINAL side 1) +
    (# later-visited s-cells, still at their LAUNCH side 1). So the
    sequential accumulation of libs/CRP.py:622-630 collapses to prefix/suffix
    sums in visit order — the same trick as the merge reverse path below.

    All inputs are already in visit order (from _visit_order's payloads plus
    one gather for the final sides); movable == position < s_count.
    """
    n = lau_v.shape[0]
    in_s = (jnp.arange(n) < s_count).astype(jnp.float32)       # visit order
    fin = fin_v.astype(jnp.float32) * in_s
    lau = lau_v * in_s
    prefix_fin = jnp.cumsum(fin) - fin
    suffix_lau = jnp.cumsum(lau[::-1])[::-1] - lau
    s1 = prefix_fin + suffix_lau
    n_j = s1 + 1.0
    n_i = ctx.n_move - s1 - 2.0
    log_denom = jnp.log(ctx.n_move - 1.0 + dp_alpha)
    lp0 = ll0_v + jnp.log(n_i) - log_denom
    lp1 = ll1_v + jnp.log(n_j) - log_denom
    mx = jnp.maximum(lp0, lp1)
    lse = mx + jnp.log(jnp.exp(lp0 - mx) + jnp.exp(lp1 - mx))
    chosen = jnp.where(fin_v > 0, lp1, lp0) - lse
    # where, not multiply: non-movable positions can hold nan/-inf rows.
    return jnp.sum(jnp.where(in_s > 0.0, chosen, 0.0))


def _rg_scan_assign(key, ctx: _MoveCtx, rg, params_split, state: CRPState,
                    data: PackedData, cfg: ModelConfig, trans_prob: bool,
                    random_order: bool = True, ax: MutAxis = _NO_AXIS,
                    impl: str = "scan"):
    """Sequential restricted 2-way Gibbs over the non-anchor cells.

    Reference: _rg_scan_assign (libs/CRP.py:609-632). Returns (rg, sum of
    chosen log-probabilities) — the sum is only meaningful when `trans_prob`.

    The 2-way draw reduces to one scalar comparison per cell: with hoisted
    Gumbel noise, side 1 wins iff

        dz[cell] + log(n_j) - log(n_i) > 0,
        dz = (ll2[:,1]+g1) - (ll2[:,0]+g0)

    (the CRP denominator and the 2-way normalization are side-independent
    shifts, so they cancel; the reference's explicit normalize-then-sample,
    libs/CRP.py:622-628, draws from the identical distribution). The side
    counts are integers, so the logs are table lookups, and the chosen-
    probability sum of the trans_prob path is replayed vectorized afterwards
    (_trans_prob_replay). impl="pallas" runs the whole scan as scalar SMEM
    work in one kernel (bnpc_tpu/ops/pallas_rg.py); impl="scan" is the
    equivalent chunked lax.scan (bit-identical in interpreter mode,
    tests/test_pallas_rg.py).
    """
    n = cfg.n_cells
    k_perm, k_gumbel = jax.random.split(key)

    # All randomness hoisted: per-cell Gumbel noise replaces the in-scan
    # categorical draw (identical distribution, zero threefry in the body).
    gumbel = jax.random.gumbel(k_gumbel, (n, 2))

    # Launch params are constant during the scan, so the [n, 2] table is one
    # matmul (reference precomputes it too, libs/CRP.py:610).
    c1, c0 = lk.log_prob_tables(params_split, state.fp, state.fn)  # [2, m]
    ll2 = ax.psum(data.xm @ c1.T + data.xm0 @ c0.T)  # [n, 2]

    z = ll2 + gumbel
    dz = z[:, 1] - z[:, 0]

    # Visit the move's cells FIRST: the effective trip count is |S|, not n,
    # and the replay's and kernel's visit-order inputs come out of the same
    # sort.
    order, lau_v, ll0_v, ll1_v, dz_v = _visit_order(
        k_perm, ctx.s_mask, rg, ll2, dz, random_order)

    # Fused count log-table: dtab[s1] = log(n_j) - log(n_i) with n_j = s1+1
    # and n_i = n_move-s1-2 (+inf where side i would empty, forcing side 1 —
    # matching the reference's lp0 = ll0 + log(0) = -inf, libs/CRP.py:622).
    s1r = jnp.arange(n + 2, dtype=jnp.float32)
    dtab = jnp.log(s1r + 1.0) \
        - jnp.log(jnp.maximum(ctx.n_move - s1r - 2.0, 0.0))
    s_count = jnp.sum(ctx.s_mask).astype(jnp.int32)
    count1_init = jnp.sum(jnp.where(ctx.s_mask, rg, 0)).astype(jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)

    if impl == "pallas":
        from bnpc_tpu.ops.pallas_rg import rg_scan

        out_v = rg_scan(dz_v, lau_v.astype(jnp.int32), dtab, s_count,
                        count1_init)
        fin_v = jnp.where(pos < s_count, out_v, lau_v.astype(jnp.int32))
        # Scatter back to cell order: sorting (order, fin_v) by the
        # visit-order keys IS the scatter rg[order[t]] = fin_v[t] (one sort
        # beats a [n] scatter ~5x on the TPU scalar unit).
        _, fin_cell = jax.lax.sort((order, fin_v), num_keys=1)
        rg_new = jnp.where(ctx.s_mask, fin_cell, rg)
    else:
        chunk = min(256, n)
        n_chunks = -(-n // chunk)
        # Pad with an anchor id: anchors are never in S, so padding is a
        # no-op; chunks with no movable cell are lax.cond-skipped.
        order_c = jnp.concatenate([
            order,
            jnp.full((n_chunks * chunk - n,), ctx.anchor_i,
                     dtype=order.dtype),
        ]).reshape(n_chunks, chunk)
        # Movable positions are exactly the first s_count (S-cells sort
        # first in _visit_order), so a chunk has work iff it starts before
        # s_count — no mask gather.
        chunk_has = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk) < s_count

        def body(carry, cell):
            rg, count1 = carry
            in_s = ctx.s_mask[cell]
            cur = jnp.where(in_s, rg[cell], 0)
            s1 = count1 - cur
            margin = dz[cell] + dtab[s1]
            draw = (margin > 0.0).astype(jnp.int32)
            new = jnp.where(in_s, draw, rg[cell])
            rg = rg.at[cell].set(new)
            count1 = s1 + jnp.where(in_s, new, 0)
            return (rg, count1), None

        def chunk_body(carry, xs):
            order_chunk, has = xs
            carry = jax.lax.cond(
                has,
                lambda c: jax.lax.scan(body, c, order_chunk, unroll=4)[0],
                lambda c: c,
                carry,
            )
            return carry, None

        (rg_new, _), _ = jax.lax.scan(
            chunk_body, (rg, count1_init), (order_c, chunk_has)
        )

    if trans_prob:
        # The kernel path already has the final sides by visit position;
        # the scan path gathers them (it updates rg in cell order).
        fin_vis = fin_v if impl == "pallas" else rg_new[order]
        acc = _trans_prob_replay(ctx, lau_v, fin_vis, ll0_v, ll1_v,
                                 s_count, state.dp_alpha)
        return rg_new, acc
    return rg_new, jnp.float32(0.0)


def _rg_scan_split(key, ctx, rgs: _RGState, state, data, cfg,
                   trans_prob: bool, ax: MutAxis = _NO_AXIS,
                   impl: str = "scan"):
    """One launch scan of the split configuration (libs/CRP.py:570-606)."""
    k_assign, k_par = jax.random.split(key)
    rg, prob_cl = _rg_scan_assign(
        k_assign, ctx, rgs.rg, rgs.params_split, state, data, cfg, trans_prob,
        ax=ax, impl=impl,
    )
    side0, side1 = _side_masks(ctx, rg)
    n1 = jnp.stack([side0 @ data.xm, side1 @ data.xm])
    n0 = jnp.stack([side0 @ data.xm0, side1 @ data.xm0])
    res = mh.mh_cluster_params(
        k_par, rgs.params_split, n1, n0, state.fp, state.fn, cfg,
        trans_prob=trans_prob, ax=ax,
    )
    return rgs._replace(rg=rg, params_split=res.params), \
        prob_cl + jnp.sum(res.trans_logprob)


def _rg_scan_merge(key, ctx, rgs: _RGState, state, data, cfg,
                   trans_prob: bool, ax: MutAxis = _NO_AXIS):
    """One launch scan of the merge configuration (libs/CRP.py:581-587)."""
    cells_f = ctx.cells.astype(jnp.float32)
    n1, n0 = _masked_counts(cells_f, data)
    res = mh.mh_cluster_params(
        key, rgs.params_merge, n1, n0, state.fp, state.fn, cfg,
        trans_prob=trans_prob, ax=ax,
    )
    return rgs._replace(params_merge=res.params), res.trans_logprob


# ---------------------------------------------------------------------------
# MH ratio pieces (libs/CRP.py:641-820)
# ---------------------------------------------------------------------------


def _ll_sides(ctx, rgs: _RGState, state, data, ax: MutAxis = _NO_AXIS):
    """(ll_i + ll_j under split params, ll_all under merge params) —
    eqs. 11/12 (libs/CRP.py:716-733)."""
    side0, side1 = _side_masks(ctx, rgs.rg)
    c1s, c0s = lk.log_prob_tables(rgs.params_split, state.fp, state.fn)
    n1_0, n0_0 = _masked_counts(side0, data)
    n1_1, n0_1 = _masked_counts(side1, data)
    ll_split = ax.psum(
        jnp.sum(n1_0 * c1s[0] + n0_0 * c0s[0])
        + jnp.sum(n1_1 * c1s[1] + n0_1 * c0s[1])
    )
    cells_f = ctx.cells.astype(jnp.float32)
    n1_m, n0_m = _masked_counts(cells_f, data)
    c1m, c0m = lk.log_prob_tables(rgs.params_merge, state.fp, state.fn)
    ll_all = ax.psum(jnp.sum(n1_m * c1m + n0_m * c0m))
    return ll_split, ll_all


def _split_counts(ctx, rg):
    """(n_i, n_j) of the current split config, anchors included."""
    n_j = jnp.sum(jnp.where(ctx.s_mask, rg, 0)).astype(jnp.float32) + 1.0
    n_i = ctx.n_move - n_j
    return n_i, n_j


def _beta_prior_sum(cfg, x, ax: MutAxis = _NO_AXIS):
    return ax.psum(jnp.sum(
        ax.apply_mask(dist.beta_logpdf(x, cfg.p, cfg.q, cfg.log_beta_norm))
    ))


def _reverse_split_prob(key, ctx, rgs: _RGState, state, data, cfg,
                        ax: MutAxis = _NO_AXIS):
    """Probability of regenerating the *original* split from the launch state
    (merge move reverse path; _rg_get_split_prob, libs/CRP.py:777-820).
    """
    k_std, _ = jax.random.split(ax.fold_key(key))
    std = mh.draw_proposal_std(k_std, rgs.params_split.shape)
    # NOTE: bounds 0/1 here, not TMIN/TMAX — reference quirk (libs/CRP.py:779-780).
    a = (0.0 - rgs.params_split) / std
    b = (1.0 - rgs.params_split) / std

    # Parameter transition terms use the LAUNCH sides (rg before overwrite).
    side0, side1 = _side_masks(ctx, rgs.rg)
    n1_0, n0_0 = _masked_counts(side0, data)
    n1_1, n0_1 = _masked_counts(side1, data)
    target_i = state.params[ctx.cl_a]
    target_j = state.params[ctx.cl_b]
    prob_param_i = mh.realized_trans_logprob(
        target_i, rgs.params_split[0], n1_0, n0_0, a[0], b[0], std[0],
        state.fp, state.fn, cfg, ax=ax,
    )
    prob_param_j = mh.realized_trans_logprob(
        target_j, rgs.params_split[1], n1_1, n0_1, a[1], b[1], std[1],
        state.fp, state.fn, cfg, ax=ax,
    )

    # Assignment reverse probabilities: each movable cell is sequentially
    # forced to its original side under the original cluster parameters.
    # Unlike the forward scans there is no sampling, so the count evolution
    # is deterministic and the whole "scan" collapses to prefix/suffix sums:
    # at (ascending) position i the side-1 count over S \ {i} is
    #   sum_{j<i in S} orig[j] + sum_{j>i in S} launch[j].
    orig = jnp.where(state.assignment == ctx.cl_a, 0, 1).astype(jnp.int32)
    c1, c0 = lk.log_prob_tables(
        jnp.stack([target_i, target_j]), state.fp, state.fn
    )
    ll2 = ax.psum(data.xm @ c1.T + data.xm0 @ c0.T)
    log_denom = jnp.log(ctx.n_move - 1.0 + state.dp_alpha)

    in_s = ctx.s_mask.astype(jnp.float32)
    orig_in = orig.astype(jnp.float32) * in_s
    launch_in = rgs.rg.astype(jnp.float32) * in_s
    prefix_orig = jnp.cumsum(orig_in) - orig_in
    suffix_launch = jnp.cumsum(launch_in[::-1])[::-1] - launch_in
    s1 = prefix_orig + suffix_launch
    n_j = s1 + 1.0
    n_i = ctx.n_move - s1 - 2.0
    logpost = (
        ll2 + jnp.log(jnp.stack([n_i, n_j], axis=1)) - log_denom
    )  # [n, 2]
    logp = logpost - jax.scipy.special.logsumexp(logpost, axis=1,
                                                 keepdims=True)
    chosen = jnp.take_along_axis(logp, orig[:, None], axis=1)[:, 0]
    # where, not multiply: at a non-movable position the forced side count
    # can be 0 (chosen = -inf) and -inf * 0 would poison the sum with nan.
    prob_assign = jnp.sum(jnp.where(in_s > 0.0, chosen, 0.0))
    return prob_param_i + prob_param_j + prob_assign


# ---------------------------------------------------------------------------
# The full move
# ---------------------------------------------------------------------------


# The rg kernel keeps NO [n]-sized array in scalar memory since round 5:
# its dz/launch/output streams are visit-order sequential and chunk-staged
# through HBM DMA, and the fused count log-table is window-staged per chunk
# (the side-1 count moves by <= 1 per cell, so a 2C-wide window covers every
# lookup — ops/pallas_rg.py). SMEM usage is constant (~40 KB), so the old
# cell caps are gone (round 4: 196,608 with the whole table in SMEM;
# round 3: 50,000 with five [n] SMEM arrays). Verified bit-exact on v5e at
# 1,048,576 cells (benchmarks/smem_probe.py).


def rg_pallas_available(ax: MutAxis = _NO_AXIS, n_cells: int = 0) -> bool:
    """Whether the restricted-scan kernel can run here: a TPU backend.

    There is no cell-count cap (round 5 — SMEM usage is constant, see the
    note above; ``n_cells`` is kept for call-site symmetry). A sharded
    MutAxis is fine too (round 5): every kernel input — dz from the psummed
    [n, 2] launch log-lik, the launch sides, the count log-table and the
    scalar counts — is replicated across the mutation shards before the
    kernel (exactly like the lazy/stream sweep kernels' psummed Z), so each
    chip runs the identical serial scalar scan and produces the identical
    side vector. Only vmapped chains are excluded (the batched SMEM state
    does not fit the scalar formulation — split_merge falls back with a
    warning)."""
    import os

    if os.environ.get("BNPC_TPU_PALLAS", "") == "0":
        return False
    return jax.default_backend() == "tpu"


def split_merge(key, state: CRPState, data: PackedData, cfg: ModelConfig,
                sm_split_ratio: float, sm_steps: int,
                ax: MutAxis = _NO_AXIS, impl: str = "auto"):
    """One split-merge proposal. Returns (state, counts[2, 2]) where
    counts[0] = (accepted, declined) split deltas and counts[1] the merge
    deltas (feeding MH_counter rows 1/2, libs/MCMC.py:320-328).

    `impl` selects the restricted-scan backend: "auto" = the safe chunked
    lax.scan everywhere; "auto_single" = the Pallas kernel when available
    (unbatched chains on TPU only); "scan"/"pallas" force one.
    """
    if impl == "auto":
        impl = "scan"
    elif impl == "auto_single":
        impl = "pallas" if rg_pallas_available(ax, cfg.n_cells) else "scan"
    if impl == "pallas":
        from bnpc_tpu.models.gibbs import _is_batched

        if _is_batched(state.assignment):
            import warnings

            warnings.warn(
                "bnpc_tpu: the Pallas restricted-scan kernel cannot run"
                " under vmapped chains; falling back to the scan"
                " implementation.",
                stacklevel=2,
            )
            impl = "scan"
    n = cfg.n_cells
    (k_move, k_setup, k_init, k_scans, k_final, k_accept) = \
        jax.random.split(key, 6)

    n_clusters = state.n_clusters
    forced_split = n_clusters == 1
    # Reference forces a merge at K == n (all singletons, libs/CRP.py:424);
    # with a capacity cap a split is likewise impossible at K == k_max.
    forced_merge = n_clusters >= cfg.k_max
    want_split = jax.random.uniform(k_move) < sm_split_ratio
    is_split = forced_split | (want_split & ~forced_merge)

    ctx = _setup(k_setup, state, cfg, is_split)
    rgs = _rg_init(k_init, ctx, state, data, cfg, ax=ax)

    # Launch scans (libs/CRP.py:535-537): each iteration refreshes both the
    # split and the merge configuration.
    def scan_body(rgs, kk):
        k1, k2 = jax.random.split(kk)
        rgs, _ = _rg_scan_split(k1, ctx, rgs, state, data, cfg, False, ax=ax,
                                impl=impl)
        rgs, _ = _rg_scan_merge(k2, ctx, rgs, state, data, cfg, False, ax=ax)
        return rgs, None

    rgs, _ = jax.lax.scan(
        scan_body, rgs, jax.random.split(k_scans, sm_steps)
    )

    k_f1, k_f2 = jax.random.split(k_final)

    # ---------------- split acceptance (libs/CRP.py:641-653) --------------
    def split_branch():
        # Final scan to the proposal state, with transition probabilities
        # (eq. 15 forward term).
        rgs2, gs_split = _rg_scan_split(k_f1, ctx, rgs, state, data, cfg,
                                        True, ax=ax, impl=impl)
        # Reverse: merge-launch -> original single cluster (eq. 15).
        std = mh.draw_proposal_std(ax.fold_key(k_f2),
                                   rgs.params_merge.shape)
        a = (TMIN - rgs2.params_merge) / std
        b = (TMAX - rgs2.params_merge) / std
        cells_f = ctx.cells.astype(jnp.float32)
        n1_m, n0_m = _masked_counts(cells_f, data)
        gs_merge = mh.realized_trans_logprob(
            state.params[ctx.cl_a], rgs2.params_merge, n1_m, n0_m,
            a, b, std, state.fp, state.fn, cfg, ax=ax,
        )
        trans_ratio = gs_merge - gs_split

        n_i, n_j = _split_counts(ctx, rgs2.rg)
        # Eq. 7 prior ratio (libs/CRP.py:695-713).
        lprior = (
            jnp.log(state.dp_alpha) - gammaln(ctx.n_move)
            + gammaln(n_j) + gammaln(n_i)
        )
        if not cfg.beta_prior_uniform:
            lprior += _beta_prior_sum(cfg, rgs2.params_split, ax) \
                - _beta_prior_sum(cfg, state.params[ctx.cl_a], ax)

        ll_split, ll_all = _ll_sides(ctx, rgs2, state, data, ax)
        ll_ratio = ll_split - ll_all

        # Eq. 5 size-proposal ratio (libs/CRP.py:757-764).
        norm = ctx.inv_sum_others + 1.0 / n_i + 1.0 / n_j
        rev = -jnp.log(n_i * norm) - jnp.log(n_j * norm)
        size_ratio = rev - ctx.ltrans_size

        A = trans_ratio + lprior + ll_ratio + size_ratio
        # Degenerate launch: every movable cell on one side (libs/CRP.py:647-648).
        s_count = ctx.n_move - 2.0
        degenerate = (s_count > 0) & ((n_j - 1.0 == 0.0) | (n_j - 1.0 == s_count))
        accept = (~degenerate) & (jnp.log(jax.random.uniform(k_accept)) < A)

        # Apply: side 1 moves to a fresh slot (libs/CRP.py:466-481).
        new_slot = first_free_slot(state.cluster_size)
        idx = jnp.arange(n)
        side1 = (ctx.s_mask & (rgs2.rg == 1)) | (idx == ctx.anchor_j)
        move_to_new = accept & side1
        assignment = jnp.where(move_to_new, new_slot, state.assignment)
        n_moved = jnp.sum(move_to_new).astype(jnp.int32)
        cluster_size = state.cluster_size.at[ctx.cl_a].add(
            jnp.where(accept, -n_moved, 0)
        ).at[new_slot].add(jnp.where(accept, n_moved, 0))
        params = state.params.at[ctx.cl_a].set(
            jnp.where(accept, rgs2.params_split[0], state.params[ctx.cl_a])
        )
        params = params.at[new_slot].set(
            jnp.where(accept, rgs2.params_split[1], state.params[new_slot])
        )
        new_state = state._replace(
            assignment=assignment, params=params, cluster_size=cluster_size
        )
        counts = jnp.zeros((2, 2), jnp.int32).at[0, 0].set(
            accept.astype(jnp.int32)
        ).at[0, 1].set(1 - accept.astype(jnp.int32))
        return new_state, counts

    # ---------------- merge acceptance (libs/CRP.py:656-665) --------------
    def merge_branch():
        # Forward: one more merge scan with transition probabilities (eq. 16).
        rgs2, gs_merge = _rg_scan_merge(k_f1, ctx, rgs, state, data, cfg,
                                        True, ax=ax)
        gs_split = _reverse_split_prob(k_f2, ctx, rgs2, state, data, cfg,
                                       ax=ax)
        trans_ratio = gs_split - gs_merge

        # Eq. 8 prior ratio over the ORIGINAL clusters (libs/CRP.py:736-754);
        # by this point the reference has overwritten rg with the original
        # membership, so n_i/n_j are the original cluster sizes.
        n_i = state.cluster_size[ctx.cl_a].astype(jnp.float32)
        n_j = state.cluster_size[ctx.cl_b].astype(jnp.float32)
        lprior = (
            gammaln(ctx.n_move) - jnp.log(state.dp_alpha)
            - gammaln(n_i) - gammaln(n_j)
        )
        if not cfg.beta_prior_uniform:
            lprior += _beta_prior_sum(cfg, rgs2.params_merge, ax) \
                - _beta_prior_sum(cfg, state.params[ctx.cl_a], ax) \
                - _beta_prior_sum(cfg, state.params[ctx.cl_b], ax)

        # Eq. 12 with the original sides under the launch split params.
        idx = jnp.arange(n)
        orig_rg = jnp.where(state.assignment == ctx.cl_a, 0, 1).astype(jnp.int32)
        side0 = (ctx.s_mask & (orig_rg == 0)) | (idx == ctx.anchor_i)
        side1 = (ctx.s_mask & (orig_rg == 1)) | (idx == ctx.anchor_j)
        c1s, c0s = lk.log_prob_tables(rgs2.params_split, state.fp, state.fn)
        n1_0, n0_0 = _masked_counts(side0.astype(jnp.float32), data)
        n1_1, n0_1 = _masked_counts(side1.astype(jnp.float32), data)
        ll_split = ax.psum(
            jnp.sum(n1_0 * c1s[0] + n0_0 * c0s[0])
            + jnp.sum(n1_1 * c1s[1] + n0_1 * c0s[1])
        )
        cells_f = ctx.cells.astype(jnp.float32)
        n1_m, n0_m = _masked_counts(cells_f, data)
        c1m, c0m = lk.log_prob_tables(rgs2.params_merge, state.fp, state.fn)
        ll_all = ax.psum(jnp.sum(n1_m * c1m + n0_m * c0m))
        ll_ratio = ll_all - ll_split

        # Eq. 6 size ratio (libs/CRP.py:767-774); the log(|S| - 1) term is
        # dropped when |S| <= 1, mirroring the FloatingPointError fallback.
        s_count = ctx.n_move - 2.0
        rev = -jnp.log(float(n)) - jnp.where(
            s_count - 1.0 > 0.0, jnp.log(jnp.maximum(s_count - 1.0, 1e-30)), 0.0
        )
        size_ratio = rev - ctx.ltrans_size

        A = trans_ratio + lprior + ll_ratio + size_ratio
        accept = jnp.log(jax.random.uniform(k_accept)) < A

        members_b = state.assignment == ctx.cl_b
        assignment = jnp.where(accept & members_b, ctx.cl_a, state.assignment)
        nb = state.cluster_size[ctx.cl_b]
        cluster_size = state.cluster_size.at[ctx.cl_a].add(
            jnp.where(accept, nb, 0)
        ).at[ctx.cl_b].set(
            jnp.where(accept, 0, nb)
        )
        params = state.params.at[ctx.cl_a].set(
            jnp.where(accept, rgs2.params_merge, state.params[ctx.cl_a])
        )
        new_state = state._replace(
            assignment=assignment, params=params, cluster_size=cluster_size
        )
        counts = jnp.zeros((2, 2), jnp.int32).at[1, 0].set(
            accept.astype(jnp.int32)
        ).at[1, 1].set(1 - accept.astype(jnp.int32))
        return new_state, counts

    return jax.lax.cond(is_split, split_branch, merge_branch)
