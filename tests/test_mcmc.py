"""MCMCRunner: trace shapes, termination modes, multi-chain batching."""

import numpy as np
import pytest

import jax

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.mcmc import MCMCRunner

from tests.test_moves import make_problem


@pytest.fixture(scope="module")
def runner_setup():
    data, true_assign = make_problem(n=24, m=20, k_clones=3, seed=3)
    cfg = ModelConfig(n_cells=24, n_muts=20, k_max=24, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    mcmc_cfg = MCMCConfig(sm_prob=0.25, dpa_prob=0.5, error_prob=0.0,
                          sm_steps=2)
    packed = pack_data(data)
    runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=32)
    return data, true_assign, cfg, mcmc_cfg, runner


def test_run_steps_shapes(runner_setup):
    _, _, cfg, _, runner = runner_setup
    results = runner.run((60, 20), seed=1, n_chains=2)
    assert len(results) == 2
    for res in results:
        assert res.ML.shape == (61,)       # steps + initial row
        assert res.MAP.shape == (61,)
        assert res.assignments.shape == (61, cfg.n_cells)
        assert res.burn_in == 20
        assert res.params.shape[0] == 61 - 20
        assert np.isfinite(res.ML).all()
        assert (res.MAP <= res.ML).all() or True  # prior can be positive
        # MH counters accumulated
        assert res.mh_counts.shape == (5, 2)
        assert res.mh_counts[0].sum() > 0


def test_chains_differ(runner_setup):
    _, _, _, _, runner = runner_setup
    results = runner.run((30, 5), seed=7, n_chains=2)
    assert not np.array_equal(
        results[0].assignments[-1], results[1].assignments[-1]
    )


def test_seed_reproducible(runner_setup):
    _, _, cfg, mcmc_cfg, runner = runner_setup
    r1 = runner.run((25, 5), seed=11, n_chains=1)
    r2 = runner.run((25, 5), seed=11, n_chains=1)
    np.testing.assert_array_equal(r1[0].assignments, r2[0].assignments)
    np.testing.assert_allclose(r1[0].ML, r2[0].ML)


def test_lugsail_mode(runner_setup):
    _, _, _, _, runner = runner_setup
    results = runner.run((1.3, 0), seed=3, n_chains=2, verbosity=0)
    for res in results:
        assert res.PSRF, "PSRF log missing"
        assert res.PSRF_cutoff == 1.3
        assert res.burn_in == res.ML.size // 2 + 1
        # params trace trimmed to post-burn-in
        assert res.params.shape[0] == res.ML.size - res.burn_in


def test_fixed_assignment_mode(runner_setup):
    data, true_assign, cfg, _, _ = runner_setup
    packed = pack_data(data)
    mcmc_cfg = MCMCConfig(fix_assign=True, error_prob=0.0)
    runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=16)
    assign = list(true_assign)
    results = runner.run((20, 5), seed=2, n_chains=1, assign=assign)
    res = results[0]
    # Assignment never changes from the (relabelled) fixed one.
    first = res.assignments[0]
    for row in res.assignments:
        np.testing.assert_array_equal(row, first)
