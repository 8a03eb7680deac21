"""Opt-in blocked (approximate) Gibbs sweep — models/gibbs._blocked_impl.

SURVEY.md pivot 3 reserved a blocked/chromatic sweep as an opt-in
approximation (default OFF; the default sampler keeps the reference's
strictly sequential semantics, libs/CRP.py:254-299). Contract pinned here:

  * block=1 is BIT-IDENTICAL to the exact scan implementation;
  * a block whose frozen-size pass decides a birth is replayed with the
    exact per-cell semantics (so birth-heavy sweeps degenerate to exact);
  * the stationary partition distribution at an adversarially small
    problem (5 cells, block=2 — the within-block size drift is at its
    proportionally worst) stays within Monte-Carlo noise of the exact
    sampler's.
"""

import numpy as np
import pytest

import jax

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.models import gibbs
from bnpc_tpu.state import init_state

from tests.test_moves import check_state_invariants, make_problem


def _assert_states_equal(a, b):
    """Partition evolution bit-exact; newborn params to f32 round-off (the
    blocked impl draws them per cell like the lazy kernel, the scan impl
    vmapped — 1-ulp differences in the Beta transform, same accepted
    channel as kernel-vs-scan in test_pallas/test_sharding)."""
    np.testing.assert_array_equal(np.asarray(a.assignment),
                                  np.asarray(b.assignment))
    np.testing.assert_array_equal(np.asarray(a.cluster_size),
                                  np.asarray(b.cluster_size))
    live = np.asarray(a.cluster_size) > 0
    np.testing.assert_allclose(np.asarray(a.params)[live],
                               np.asarray(b.params)[live],
                               rtol=2e-6, atol=1e-7)


def test_block1_bit_identical():
    """block=1 makes the frozen-size pass vacuous: every cell sees exact
    sizes, every birth replays exactly — the partition evolution is
    bit-identical to scan_cond (params to f32 round-off, see
    _assert_states_equal)."""
    data, _ = make_problem(n=26, m=12, k_clones=3, seed=2)
    cfg = ModelConfig(n_cells=26, n_muts=12, k_max=26, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    for seed in range(4):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key(50 + seed)
        want, v_want = gibbs.gibbs_sweep(key, state, packed, cfg,
                                         impl="scan_cond", return_veto=True)
        got, v_got = gibbs.gibbs_sweep(key, state, packed, cfg,
                                       impl="blocked", block=1,
                                       return_veto=True)
        _assert_states_equal(want, got)
        assert bool(v_want) == bool(v_got)
        check_state_invariants(got, cfg)


def test_birth_block_replays_exactly():
    """With block >= n there is ONE block; from a separate-clusters-ish
    random init the sweep's first block decides a birth, so the whole sweep
    replays exactly and must equal the scan bit-for-bit."""
    data, _ = make_problem(n=24, m=16, k_clones=3, seed=7)
    cfg = ModelConfig(n_cells=24, n_muts=16, k_max=24, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    exercised = 0
    for seed in range(6):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key(900 + seed)
        want = gibbs.gibbs_sweep(key, state, packed, cfg, impl="scan_cond")
        got = gibbs.gibbs_sweep(key, state, packed, cfg,
                                impl="blocked", block=32)
        was_free = np.asarray(state.cluster_size) == 0
        birthed = bool(
            (was_free & (np.asarray(want.cluster_size) > 0)).any())
        if birthed:
            _assert_states_equal(want, got)
            exercised += 1
    assert exercised >= 1, "no seed birthed — replay path untested"


def test_blocked_runs_under_step_fn():
    """gibbs_block plumbs through MCMCConfig -> make_step_fn -> the full
    step mixture; invariants hold over a scanned run."""
    from bnpc_tpu import mcmc

    data, _ = make_problem(n=30, m=14, k_clones=3, seed=4)
    cfg = ModelConfig(n_cells=30, n_muts=14, k_max=30, p=0.25, q=0.25,
                      fp=0.01, fn=0.1, learn_errors=True,
                      fp_sd=0.005, fn_sd=0.05)
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.5, error_prob=0.5,
                          sm_steps=2, gibbs_block=8)
    packed = pack_data(data)
    trace_k = mcmc.resolve_trace_k(cfg, mcmc_cfg)
    step = mcmc.make_step_fn(cfg, mcmc_cfg, packed, trace_k)
    state = init_state(jax.random.key(0), cfg, packed, mode="random")
    keys = jax.random.split(jax.random.key(1), 25)
    out, rows = jax.lax.scan(step, state, keys)
    check_state_invariants(out, cfg)
    assert np.isfinite(np.asarray(rows.ml)).all()


def test_blocked_sharded_matches_sharded_scan():
    """Under a SHARDED MutAxis the blocked sweep psums Z and birth columns
    before deciding. Sharded-vs-UNSHARDED bit-parity is impossible whenever
    a birth occurs (MutAxis.fold_key deliberately decorrelates the newborn
    Beta draws across shards), so the sharded plumbing is pinned two ways:

      * block=1 makes the blocked sweep exact, so inside the SAME shard_map
        it must match the scan impl bit-for-bit (both consume the same
        folded keys and the same psummed matrices) — including births;
      * a birth-free block=8 sweep (no newborn draws, hence no folded-key
        divergence channel) must match the unsharded blocked sweep exactly.
    """
    from jax.sharding import PartitionSpec as P

    from bnpc_tpu.parallel import sharded
    from bnpc_tpu.parallel.axis import MutAxis

    data, _ = make_problem(n=24, m=32, k_clones=2, seed=3)
    cfg = ModelConfig(n_cells=24, n_muts=32, k_max=24, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    mesh = sharded.make_mesh(1, 8)
    specs = jax.tree.map(
        lambda s: P(*[a for a in s if a != sharded.CHAINS]),
        sharded.state_specs(), is_leaf=lambda x: isinstance(x, P))

    def sharded_sweep(impl, block, state, key):
        def body(st, data_local):
            ax = MutAxis(sharded.MUTS)
            return gibbs.gibbs_sweep(key, st, data_local, cfg, ax=ax,
                                     impl=impl, block=block)

        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(specs, sharded.data_specs()),
                           out_specs=specs)
        return fn(state, packed)

    # (1) block=1 == exact: sharded blocked matches sharded scan, births
    # included (exercised below).
    births = 0
    for seed in range(3):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key(55 + seed)
        want = sharded_sweep("scan_cond", 0, state, key)
        got = sharded_sweep("blocked", 1, state, key)
        _assert_states_equal(want, got)
        check_state_invariants(got, cfg)
        was_free = np.asarray(state.cluster_size) == 0
        births += int(
            (was_free & (np.asarray(want.cluster_size) > 0)).sum())
    assert births >= 1, "no birth exercised the sharded birth path"

    # (2) birth-free block=8: sharded == unsharded (first seed whose
    # unsharded sweep births nothing; asserted found to keep it honest).
    for seed in range(16):
        state = init_state(jax.random.key(40 + seed), cfg, packed,
                           mode="assign",
                           assign=np.repeat([0, 1], 12).astype(np.int32))
        key = jax.random.key(99 + seed)
        want = gibbs.gibbs_sweep(key, state, packed, cfg,
                                 impl="blocked", block=8)
        was_free = np.asarray(state.cluster_size) == 0
        if not (was_free & (np.asarray(want.cluster_size) > 0)).any():
            got = sharded_sweep("blocked", 8, state, key)
            _assert_states_equal(want, got)
            break
    else:
        raise AssertionError("every seed birthed — no birth-free sweep")


@pytest.mark.slow
def test_blocked_stationary_tv():
    """Stationary partition-posterior TV between the blocked (block=2) and
    exact samplers on the enumerable 5-cell problem. block=2 at n=5 is the
    proportionally WORST within-block drift (each decision can miss 1 of 4
    other cells' moves); production blocks are O(n/100).

    Calibration 2026-08-19, 13.5k retained samples, seeds {17,18,19}:
    exact-vs-exact (pure MC noise) TV 0.017-0.029; blocked-vs-blocked
    0.026-0.029 (same as noise); blocked-vs-exact 0.028-0.055 — i.e. a
    real but small stationary bias of ~0.02-0.03 TV beyond noise at this
    adversarial setting (the documented cost of the opt-in approximation;
    it shrinks as O(block/n)). This seeded run is deterministic on the CPU
    backend: TV = 0.0394, top-partition gap = 0.0324; tolerances leave
    ~30% headroom for platform numerics."""
    from collections import Counter

    from bnpc_tpu.mcmc import MCMCRunner

    geno = np.array([[1, 1, 0, 0], [0, 0, 1, 1]])
    ta = np.array([0, 0, 0, 1, 1])
    data = geno[ta].astype(float)
    data[0, 1] = np.nan

    steps, burn = 15000, 1500
    n, m = data.shape
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)

    def run(gibbs_block):
        mc = MCMCConfig(sm_prob=0.33, dpa_prob=0.0, error_prob=0.0,
                        sm_steps=3, gibbs_block=gibbs_block)
        runner = MCMCRunner(cfg, mc, pack_data(data), block_size=5000)
        res = runner.run((steps, burn), seed=17, n_chains=1)[0]
        return res.assignments[burn:]

    def canon(assign):
        lab, out = {}, []
        for a in assign:
            if a not in lab:
                lab[a] = len(lab)
            out.append(lab[a])
        return tuple(out)

    def freqs(assigns):
        c = Counter(canon(a) for a in assigns)
        tot = sum(c.values())
        return {k: v / tot for k, v in c.items()}

    fe = freqs(run(0))
    fb = freqs(run(2))
    keys = set(fe) | set(fb)
    tv = 0.5 * sum(abs(fe.get(k, 0) - fb.get(k, 0)) for k in keys)
    assert tv < 0.055, f"TV distance {tv:.4f}"
    for k in sorted(keys, key=lambda k: -fe.get(k, 0))[:6]:
        assert abs(fe.get(k, 0) - fb.get(k, 0)) < 0.045, \
            (k, fe.get(k, 0), fb.get(k, 0))
