"""Live-width fast path (k-bucket) — bit-parity with the wide step.

mcmc.make_step_fn dispatches each step by occupancy: a NARROW body sliced to
_KB slots when every live slot sits below _KB and fewer than _KB clusters
exist, the full-width body otherwise, and a full-width REPLAY when the
narrow body flags a capacity-vetoed Gibbs birth. The contract is that the
chain is bit-identical to always-wide execution: slot-axis randomness is
drawn at full width and sliced (cfg.k_rng), and dead slots are masked out
of every term. These tests shrink _KB to exercise every dispatch arm at
toy sizes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bnpc_tpu import mcmc
from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.models import gibbs
from bnpc_tpu.state import init_state

from tests.test_moves import make_problem


def _problem(n=24, m=10, seed=0):
    data, _ = make_problem(n=n, m=m, k_clones=3, seed=seed)
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.1, learn_errors=True,
                      fp_sd=0.005, fn_sd=0.05)
    mcmc_cfg = MCMCConfig(sm_prob=0.4, dpa_prob=0.5, error_prob=0.5,
                          sm_steps=2, trace_k=8)
    return cfg, mcmc_cfg, pack_data(data)


def test_sweep_keys_full_width_prefix():
    """Narrow configs (k_rng > k_max) draw the SAME slot noise columns and
    the SAME aux column as the wide config — the foundation of the
    narrow/wide bit-parity."""
    n = 24
    cfg_w = ModelConfig(n_cells=n, n_muts=10, k_max=n, p=0.25, q=0.25)
    import dataclasses

    cfg_n = dataclasses.replace(cfg_w, k_max=8, k_rng=n)
    key = jax.random.key(3)
    st = None  # unused by _sweep_keys
    from bnpc_tpu.parallel.axis import MutAxis

    perm_w, gum_w, kb_w = gibbs._sweep_keys(key, st, cfg_w, MutAxis())
    perm_n, gum_n, kb_n = gibbs._sweep_keys(key, st, cfg_n, MutAxis())
    np.testing.assert_array_equal(np.asarray(perm_w), np.asarray(perm_n))
    np.testing.assert_array_equal(np.asarray(gum_w[:, :8]),
                                  np.asarray(gum_n[:, :8]))
    np.testing.assert_array_equal(np.asarray(gum_w[:, -1]),
                                  np.asarray(gum_n[:, -1]))
    assert jax.random.key_data(kb_w).tolist() == \
        jax.random.key_data(kb_n).tolist()


def test_bucketed_step_matches_wide(monkeypatch):
    """Chains stepped through the bucketed dispatcher equal always-wide
    execution bit-for-bit across seeds, including steps where the narrow
    guard fails (occupancy high) and steps where a veto forces the wide
    replay."""
    monkeypatch.setattr(mcmc, "_KB", 8)
    monkeypatch.setattr(mcmc, "_KB_ON", True)
    cfg, mcmc_cfg, packed = _problem()
    trace_k = mcmc.resolve_trace_k(cfg, mcmc_cfg)
    assert trace_k == 8
    bucketed = mcmc.make_step_fn(cfg, mcmc_cfg, packed, trace_k,
                                 gibbs_impl="auto_single")
    wide = mcmc._make_step_body(cfg, mcmc_cfg, packed, trace_k,
                                mcmc._NO_AXIS, "auto_single", False)

    narrow_steps = 0
    for seed in range(4):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        keys = jax.random.split(jax.random.key(100 + seed), 30)
        st_b, rows_b = jax.lax.scan(bucketed, state, keys)
        st_w, rows_w = jax.lax.scan(wide, state, keys)
        np.testing.assert_array_equal(np.asarray(st_b.assignment),
                                      np.asarray(st_w.assignment))
        np.testing.assert_array_equal(np.asarray(st_b.cluster_size),
                                      np.asarray(st_w.cluster_size))
        live = np.asarray(st_w.cluster_size) > 0
        np.testing.assert_array_equal(np.asarray(st_b.params)[live],
                                      np.asarray(st_w.params)[live])
        for f in ("ml", "map_", "dp_alpha", "fp", "fn", "assignment",
                  "params", "mh_counts"):
            np.testing.assert_array_equal(
                np.asarray(getattr(rows_b, f)),
                np.asarray(getattr(rows_w, f)), err_msg=f)
        # Track how often the narrow guard could fire (sanity: the test
        # exercises BOTH arms across these seeds).
        k_hist = (np.asarray(rows_w.assignment).max(axis=1) < 8) & \
            ((np.asarray(rows_w.params) != 0).any(-1).sum(-1) < 8)
        narrow_steps += int(k_hist.sum())
    assert narrow_steps > 0, "narrow arm never eligible — shrink the data"


def test_veto_flag_fires_and_is_consistent():
    """gibbs_sweep(return_veto=True): the flag marks exactly the sweeps in
    which some cell's new-cluster option won without a free slot. On a
    crowded small-capacity state it fires within a few seeds, and all
    implementations (scan_cond, scan_dense, lazy kernel, stream kernel in
    interpreter mode) agree on both the flag and the sampled state."""
    n, m = 24, 10
    data, _ = make_problem(n=n, m=m, k_clones=6, seed=5)
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=6, p=0.25, q=0.25,
                      fp=0.001, fn=0.05)
    packed = pack_data(data)

    fired = 0
    for seed in range(8):
        # Start from ~6 clusters: capacity is full or nearly full, so a
        # sweep that wants a fresh cluster must hit the veto.
        assign = np.arange(n) % 6
        state = init_state(jax.random.key(seed), cfg, packed,
                           assign=assign.astype(np.int32))
        key = jax.random.key(400 + seed)
        st_c, v_c = gibbs.gibbs_sweep(key, state, packed, cfg,
                                      impl="scan_cond", return_veto=True)
        st_d, v_d = gibbs.gibbs_sweep(key, state, packed, cfg,
                                      impl="scan_dense", return_veto=True)
        st_p, v_p = gibbs.gibbs_sweep(key, state, packed, cfg,
                                      impl="pallas", interpret=True,
                                      return_veto=True)
        st_s, v_s = gibbs.gibbs_sweep(key, state, packed, cfg,
                                      impl="pallas_stream", interpret=True,
                                      return_veto=True)
        assert bool(v_c) == bool(v_d) == bool(v_p) == bool(v_s)
        np.testing.assert_array_equal(np.asarray(st_c.assignment),
                                      np.asarray(st_p.assignment))
        np.testing.assert_array_equal(np.asarray(st_c.assignment),
                                      np.asarray(st_s.assignment))
        np.testing.assert_array_equal(np.asarray(st_c.assignment),
                                      np.asarray(st_d.assignment))
        fired += int(bool(v_c))
    assert fired >= 1, "veto never fired — loosen the crowding"


def test_bucket_gate_conditions(monkeypatch):
    """The bucket only engages when _KB_ON, on the unbatched route with
    k_max > _KB and a compatible trace width — and is OFF by default
    (measured slower than always-wide at every shape tried; mcmc._KB_ON)."""
    cfg, mcmc_cfg, packed = _problem()
    trace_k = mcmc.resolve_trace_k(cfg, mcmc_cfg)

    def bucketed(f):
        return "make_step_fn" in f.__qualname__

    import dataclasses

    big = dataclasses.replace(cfg, n_cells=300, k_max=200)
    big_packed = pack_data(np.zeros((300, 10)))
    # Default: OFF even on the eligible route.
    assert not mcmc._KB_ON
    assert not bucketed(mcmc.make_step_fn(big, mcmc_cfg, big_packed, 8,
                                          gibbs_impl="auto_single"))

    monkeypatch.setattr(mcmc, "_KB_ON", True)
    # k_max (24) <= _KB (128): plain body.
    assert not bucketed(mcmc.make_step_fn(cfg, mcmc_cfg, packed, trace_k,
                                          gibbs_impl="auto_single"))
    # vmap route never buckets; the unbatched route does.
    assert not bucketed(mcmc.make_step_fn(big, mcmc_cfg, big_packed, 8,
                                          gibbs_impl="auto"))
    assert bucketed(mcmc.make_step_fn(big, mcmc_cfg, big_packed, 8,
                                      gibbs_impl="auto_single"))
    # An over-wide trace or an explicit k_rng disables it.
    assert not bucketed(mcmc.make_step_fn(big, mcmc_cfg, big_packed, 150,
                                          gibbs_impl="auto_single"))
