"""Edge-case robustness: degenerate rows, tiny matrices, capacity caps."""

import numpy as np
import pytest

import jax

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.mcmc import MCMCRunner
from bnpc_tpu.state import init_state

from tests.test_moves import check_state_invariants


def _run(data, k_max=None, steps=12, **model_kw):
    n, m = data.shape
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=k_max or n,
                      p=0.25, q=0.25, fp=0.01, fn=0.1, **model_kw)
    mcmc_cfg = MCMCConfig(sm_prob=0.3, dpa_prob=0.5, error_prob=0.0,
                          sm_steps=2)
    runner = MCMCRunner(cfg, mcmc_cfg, pack_data(data), block_size=steps)
    return runner.run((steps, 2), seed=5, n_chains=1)[0], cfg


def test_all_missing_row():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, size=(12, 8)).astype(float)
    data[3, :] = np.nan  # cell with zero observations
    res, cfg = _run(data)
    assert np.isfinite(res.ML).all()
    assert res.assignments.shape == (13, 12)


def test_all_missing_column():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, size=(10, 6)).astype(float)
    data[:, 2] = np.nan  # never-observed mutation
    res, _ = _run(data)
    assert np.isfinite(res.ML).all()


def test_duplicate_cells_cluster_together():
    data = np.tile(np.array([[1.0, 0, 1, 0, 1, 1, 0, 0]]), (8, 1))
    data = np.concatenate(
        [data, np.tile(np.array([[0.0, 1, 0, 1, 0, 0, 1, 1]]), (8, 1))]
    )
    res, _ = _run(data, steps=30)
    # Two perfectly separated duplicate groups: the sampler finds the exact
    # 2-cluster partition in (at least) some of the final posterior samples.
    from sklearn.metrics import adjusted_rand_score

    truth = [0] * 8 + [1] * 8
    aris = [adjusted_rand_score(truth, row) for row in res.assignments[-10:]]
    assert max(aris) == 1.0, aris


def test_tiny_matrix():
    data = np.array([[1.0, 0], [0, 1], [1, 1]])
    res, _ = _run(data, steps=10)
    assert np.isfinite(res.ML).all()


def test_capacity_cap_respected():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 2, size=(20, 10)).astype(float)
    res, cfg = _run(data, k_max=4, steps=15)
    for row in res.assignments:
        assert row.max() < 4
        assert np.unique(row).size <= 4


def test_homozygous_and_missing_tokens(tmp_path):
    """2 -> 1 and 3 -> NaN through the whole loader path."""
    from bnpc_tpu import io

    f = tmp_path / "d.csv"
    f.write_text("2 0 1\n3 1 0\n1 2 3\n0 0 2\n")
    data = io.load_data(f, transpose=False)
    assert data[0, 0] == 1.0 and np.isnan(data[1, 0])
    assert data[2, 1] == 1.0 and np.isnan(data[2, 2])
    assert data[3, 2] == 1.0


def test_no_nans_under_debug_nans():
    """SURVEY.md section 5: the reference uses np.seterr as a sanitizer; the
    TPU equivalent is jax.debug_nans over the full step (all moves on)."""
    import jax
    from bnpc_tpu.mcmc import make_step_fn, resolve_trace_k

    rng = np.random.default_rng(0)
    n, m = 20, 16
    geno = rng.integers(0, 2, size=(3, m))
    a = rng.integers(0, 3, size=n)
    data = geno[a].astype(float)
    data[rng.random((n, m)) < 0.1] = np.nan
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.2, learn_errors=True,
                      fp_sd=0.01, fn_sd=0.1)
    mc = MCMCConfig(sm_prob=0.5, dpa_prob=0.5, error_prob=0.5, sm_steps=2)
    packed = pack_data(data)
    st = init_state(jax.random.key(0), cfg, packed, mode="random")
    step = make_step_fn(cfg, mc, packed, resolve_trace_k(cfg, mc))
    try:
        jax.config.update("jax_debug_nans", True)
        for i in range(4):
            st, row = step(st, jax.random.key(i))
        assert np.isfinite(float(row.ml))
    finally:
        jax.config.update("jax_debug_nans", False)
