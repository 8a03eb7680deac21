"""Split-merge restricted-scan Pallas kernel == chunked lax.scan, bit-for-bit.

Both backends of _rg_scan_assign consume identical hoisted randomness and
compute the identical scalar margin expression, so they must agree exactly
(interpreter mode on CPU). The trans-prob replay is additionally checked
against an explicit Python re-derivation of the reference's sequential
normalize-then-accumulate formula (libs/CRP.py:609-632).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bnpc_tpu.config import ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.models import splitmerge as sm
from bnpc_tpu.ops import pallas_rg
from bnpc_tpu.state import init_state

from tests.test_moves import check_state_invariants, make_problem


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(
        pallas_rg, "rg_scan",
        functools.partial(pallas_rg.rg_scan, interpret=True),
    )


def _setup(seed, n=24, m=16):
    data, _ = make_problem(n=n, m=m, k_clones=3, seed=seed)
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    state = init_state(jax.random.key(seed), cfg, packed, mode="random")
    return cfg, packed, state


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_split_merge_pallas_matches_scan(seed, interpret_kernel):
    cfg, packed, state = _setup(seed)
    key = jax.random.key(100 + seed)
    out_scan, counts_scan = sm.split_merge(
        key, state, packed, cfg, 0.75, 3, impl="scan")
    out_pl, counts_pl = sm.split_merge(
        key, state, packed, cfg, 0.75, 3, impl="pallas")

    np.testing.assert_array_equal(np.asarray(out_scan.assignment),
                                  np.asarray(out_pl.assignment))
    np.testing.assert_array_equal(np.asarray(out_scan.cluster_size),
                                  np.asarray(out_pl.cluster_size))
    np.testing.assert_array_equal(np.asarray(counts_scan),
                                  np.asarray(counts_pl))
    live = np.asarray(out_scan.cluster_size) > 0
    np.testing.assert_allclose(np.asarray(out_scan.params)[live],
                               np.asarray(out_pl.params)[live], rtol=1e-6)
    check_state_invariants(out_pl, cfg)


def _reference_replay(ctx, order, rg_launch, ll2, dz, n_move, alpha):
    """Python re-derivation of the reference's sequential restricted scan:
    per visited cell, normalize the 2-way log-posterior, take the realized
    draw (side 1 iff the hoisted margin is positive), accumulate its
    normalized log-probability."""
    s_mask = np.asarray(ctx.s_mask)
    order = np.asarray(order)
    rg = np.asarray(rg_launch).copy()
    ll2 = np.asarray(ll2)
    dz = np.asarray(dz)
    log_denom = np.log(n_move - 1.0 + alpha)
    acc = 0.0
    count1 = int(rg[s_mask].sum())
    for cell in order:
        if not s_mask[cell]:
            continue
        s1 = count1 - rg[cell]
        n_j, n_i = s1 + 1.0, n_move - s1 - 2.0
        with np.errstate(divide="ignore"):
            lp = ll2[cell] + np.log(np.array([n_i, n_j])) - log_denom
        lp = lp - np.logaddexp(lp[0], lp[1])
        margin = dz[cell] + np.log(n_j) - (np.log(n_i) if n_i > 0 else -np.inf)
        draw = int(margin > 0)
        acc += lp[draw]
        rg[cell] = draw
        count1 = s1 + draw
    return rg, acc


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_trans_prob_replay_matches_sequential(seed):
    """_rg_scan_assign(trans_prob=True) equals an explicit sequential replay
    of draw-and-accumulate (the scan draws; the replay re-derives the
    chosen-probability sum from the final side vector)."""
    cfg, packed, state = _setup(seed, n=30, m=12)
    n = cfg.n_cells
    rng = np.random.default_rng(seed)

    # Construct a ctx: cells = two clusters' members, anchors inside.
    a = np.asarray(state.assignment)
    ids, counts = np.unique(a, return_counts=True)
    big = ids[np.argsort(-counts)[:2]]
    cells = np.isin(a, big)
    members = np.where(cells)[0]
    anchor_i, anchor_j = members[0], members[-1]
    s_mask = cells.copy()
    s_mask[[anchor_i, anchor_j]] = False
    ctx = sm._MoveCtx(
        is_split=jnp.asarray(False),
        cells=jnp.asarray(cells),
        s_mask=jnp.asarray(s_mask),
        anchor_i=jnp.int32(anchor_i),
        anchor_j=jnp.int32(anchor_j),
        cl_a=jnp.int32(big[0]),
        cl_b=jnp.int32(big[-1]),
        n_move=jnp.float32(cells.sum()),
        ltrans_size=jnp.float32(0.0),
        inv_sum_others=jnp.float32(0.0),
    )
    rg_launch = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    params_split = jnp.clip(
        jnp.asarray(rng.random((2, cfg.n_muts)).astype(np.float32)),
        1e-6, 1 - 1e-6)

    key = jax.random.key(77 + seed)
    rg_out, acc = sm._rg_scan_assign(
        key, ctx, rg_launch, params_split, state, packed, cfg,
        trans_prob=True)

    # Recompute the hoisted quantities exactly as _rg_scan_assign does:
    # the visit order comes from the code under test's own _visit_order
    # (one variadic lax.sort keyed by (not-in-S, random bits)).
    k_perm, k_gumbel = jax.random.split(key)
    gumbel = jax.random.gumbel(k_gumbel, (n, 2))
    from bnpc_tpu.ops import likelihood as lk
    c1, c0 = lk.log_prob_tables(params_split, state.fp, state.fn)
    ll2 = packed.xm @ c1.T + packed.xm0 @ c0.T
    z = ll2 + gumbel
    dz = z[:, 1] - z[:, 0]
    order, _, _, _, _ = sm._visit_order(k_perm, ctx.s_mask, rg_launch, ll2,
                                        dz)

    rg_ref, acc_ref = _reference_replay(
        ctx, order, rg_launch, ll2, dz, float(ctx.n_move),
        float(state.dp_alpha))
    np.testing.assert_array_equal(np.asarray(rg_out)[s_mask], rg_ref[s_mask])
    np.testing.assert_allclose(float(acc), acc_ref, rtol=1e-5, atol=1e-5)


def test_two_cell_move_no_scan_work(interpret_kernel):
    """A move whose cluster has exactly the two anchors: s_count == 0, the
    kernel loop body never runs, and the move still completes validly."""
    n, m = 6, 8
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2, (n, m)).astype(float)
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    # Three 2-cell clusters.
    assign = np.array([0, 0, 1, 1, 2, 2], dtype=np.int32)
    state = init_state(jax.random.key(0), cfg, packed, assign=assign)
    for seed in range(4):
        key = jax.random.key(seed)
        out_scan, _ = sm.split_merge(key, state, packed, cfg, 0.75, 2,
                                     impl="scan")
        out_pl, _ = sm.split_merge(key, state, packed, cfg, 0.75, 2,
                                   impl="pallas")
        np.testing.assert_array_equal(np.asarray(out_scan.assignment),
                                      np.asarray(out_pl.assignment))
        check_state_invariants(out_pl, cfg)
