"""Statistical parity vs the ACTUAL reference implementation.

Runs the reference code at /root/reference (with the numpy bottleneck shim)
and this framework on the same small dataset, then compares posterior
summaries: mean cluster count, co-clustering similarity, mean log-likelihood.
RNG streams necessarily differ, so the comparison is distributional with
generous-but-meaningful tolerances (SURVEY.md section 7, hard part 3:
structure/statistics parity, not bitwise parity).
"""

import os
import sys

import numpy as np
import pytest

import jax

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "bn_shim")


def make_data(n=24, m=16, k_clones=3, seed=21):
    rng = np.random.default_rng(seed)
    while True:
        geno = rng.integers(0, 2, size=(k_clones, m))
        assign = rng.integers(0, k_clones, size=n)
        if np.unique(assign).size == k_clones and \
                np.abs(geno[None] - geno[:, None]).sum(-1).max() > m // 3:
            break
    data = geno[assign].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.1)] = 0
    data[rng.random((n, m)) < 0.05] = np.nan
    return data


def run_reference(data, steps=1500, seed=7, fn=0.1, fp=0.01):
    sys.path.insert(0, SHIM)
    sys.path.insert(0, REF)
    try:
        np.random.seed(seed)
        from libs.CRP import CRP
        from libs.MCMC import Chain_steps

        model = CRP(data, DP_alpha=[-1, -1], param_beta=[0.25, 0.25],
                    FN_error=fn, FP_error=fp)
        model.init()
        params = {
            "sm_prob": 0.33, "dpa_prob": 0.25, "error_prob": 0.0,
            "sm_ratios": [0.75, 0.25], "sm_steps": 3,
            "param_proposal_sd": np.array([0.1, 0.25, 0.5]),
        }
        chain = Chain_steps(model, 1, steps, steps // 3, params, verbosity=0)
        chain.run()
        return chain.results
    finally:
        sys.path.remove(SHIM)
        sys.path.remove(REF)
        np.seterr(all="warn")


def run_ours(data, steps=1500, seed=7, fn=0.1, fp=0.01):
    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner

    n, m = data.shape
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=fp, fn=fn)
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.0,
                          sm_steps=3)
    runner = MCMCRunner(cfg, mcmc_cfg, pack_data(data), block_size=500)
    results = runner.run((steps, steps // 3), seed=seed, n_chains=1)
    return results[0].as_dict()


def _summaries(res):
    bi = res["burn_in"]
    assign = np.asarray(res["assignments"])[bi:]
    k = np.array([np.unique(a).size for a in assign])
    sim_sum = np.zeros((assign.shape[1], assign.shape[1]))
    for a in assign:
        sim_sum += a[:, None] == a[None, :]
    return {
        "mean_k": k.mean(),
        "sim": sim_sum / assign.shape[0],
        "mean_ml": np.asarray(res["ML"])[bi:].mean(),
        "mean_alpha": np.asarray(res["DP_alpha"])[bi:].mean(),
    }


@pytest.mark.slow
def test_posterior_parity_with_reference():
    data = make_data()
    ref = _summaries(run_reference(data))
    ours = _summaries(run_ours(data))

    # Cluster-count posterior mean within half a cluster.
    assert abs(ref["mean_k"] - ours["mean_k"]) < 0.75, \
        (ref["mean_k"], ours["mean_k"])
    # Mean log-likelihood at stationarity within 3% (both ~O(-150)).
    assert abs(ref["mean_ml"] - ours["mean_ml"]) \
        < 0.03 * abs(ref["mean_ml"]), (ref["mean_ml"], ours["mean_ml"])
    # Co-clustering structure: same partition backbone.
    diff = np.abs(ref["sim"] - ours["sim"])
    assert diff.mean() < 0.08, diff.mean()
    assert diff.max() < 0.5, diff.max()
    # Alpha posterior in the same regime (heavily quirk-dependent; both
    # implementations reproduce the reference's scale-vs-rate Gamma draw).
    assert abs(np.log(ref["mean_alpha"]) - np.log(ours["mean_alpha"])) < 0.6, \
        (ref["mean_alpha"], ours["mean_alpha"])


@pytest.mark.slow
def test_posterior_parity_example_scale():
    """Mid-scale distributional parity at the reference's golden shape
    (VERDICT round 3, missing item 3): the actual 100x100 example_data
    (5 clones, FP 0.1%, FN 10%, 10% missing) through BOTH samplers with the
    full move mixture at realistic K ~ 5. Calibrated 2026-08-19 over two
    seeds: k 5.15/5.24 vs 5.12/5.17, ml within 0.6%, co-clustering diff
    mean 0.001-0.002 / max 0.03-0.06, alpha log-diff < 0.01 — tolerances
    are ~4x the observed spread."""
    from bnpc_tpu.io import load_data

    data = load_data("/root/reference/example_data/data.csv")
    assert data.shape == (100, 100)
    ref = _summaries(run_reference(data, steps=2000, fn=0.1, fp=0.001))
    ours = _summaries(run_ours(data, steps=2000, fn=0.1, fp=0.001))

    assert abs(ref["mean_k"] - ours["mean_k"]) < 0.5, \
        (ref["mean_k"], ours["mean_k"])
    assert abs(ref["mean_ml"] - ours["mean_ml"]) \
        < 0.015 * abs(ref["mean_ml"]), (ref["mean_ml"], ours["mean_ml"])
    diff = np.abs(ref["sim"] - ours["sim"])
    assert diff.mean() < 0.02, diff.mean()
    assert diff.max() < 0.25, diff.max()
    assert abs(np.log(ref["mean_alpha"]) - np.log(ours["mean_alpha"])) \
        < 0.3, (ref["mean_alpha"], ours["mean_alpha"])
