"""Fused Pallas Gibbs sweep == scan implementation, bit-for-bit.

Both implementations consume identical hoisted randomness, so on the same
inputs they must produce the same assignment, cluster sizes, and parameters
(up to f32 noise in newborn rows). Runs in Pallas interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax

from bnpc_tpu.config import ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.models.gibbs import gibbs_sweep
from bnpc_tpu.state import init_state

from tests.test_moves import check_state_invariants, make_problem


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_scan(seed):
    data, _ = make_problem(n=20, m=12, k_clones=2, seed=seed)
    cfg = ModelConfig(n_cells=20, n_muts=12, k_max=20, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    state = init_state(jax.random.key(seed), cfg, packed, mode="random")
    key = jax.random.key(100 + seed)

    out_scan = gibbs_sweep(key, state, packed, cfg, impl="scan_cond")
    out_pl = gibbs_sweep(key, state, packed, cfg, impl="pallas",
                         interpret=True)

    np.testing.assert_array_equal(
        np.asarray(out_scan.assignment), np.asarray(out_pl.assignment)
    )
    np.testing.assert_array_equal(
        np.asarray(out_scan.cluster_size), np.asarray(out_pl.cluster_size)
    )
    # Parameter rows of live slots match (newborn rows come from the same
    # pre-drawn fresh array).
    live = np.asarray(out_scan.cluster_size) > 0
    np.testing.assert_allclose(
        np.asarray(out_scan.params)[live], np.asarray(out_pl.params)[live],
        rtol=1e-6, atol=1e-6,
    )
    check_state_invariants(out_pl, cfg)


def test_pallas_multiple_sweeps_stay_valid():
    data, true_assign = make_problem(n=16, m=24, k_clones=2, seed=7)
    cfg = ModelConfig(n_cells=16, n_muts=24, k_max=16, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    state = init_state(jax.random.key(0), cfg, packed, mode="random")
    for i in range(5):
        state = gibbs_sweep(jax.random.key(i), state, packed, cfg,
                            impl="pallas", interpret=True)
        check_state_invariants(state, cfg)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dense_matches_cond(seed):
    """The branch-free dense sweep equals the cond-patching sweep."""
    data, _ = make_problem(n=24, m=16, k_clones=2, seed=seed)
    cfg = ModelConfig(n_cells=24, n_muts=16, k_max=24, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    state = init_state(jax.random.key(seed), cfg, packed, mode="random")
    key = jax.random.key(200 + seed)
    a = gibbs_sweep(key, state, packed, cfg, impl="scan_cond")
    b = gibbs_sweep(key, state, packed, cfg, impl="scan_dense")
    np.testing.assert_array_equal(np.asarray(a.assignment),
                                  np.asarray(b.assignment))
    np.testing.assert_array_equal(np.asarray(a.cluster_size),
                                  np.asarray(b.cluster_size))
    live = np.asarray(a.cluster_size) > 0
    np.testing.assert_allclose(np.asarray(a.params)[live],
                               np.asarray(b.params)[live], rtol=1e-6)
