"""Stationary-distribution parity: full partition-posterior comparison.

On a 5-cell matrix the posterior over set partitions is small enough to
estimate empirically. Both samplers (the ACTUAL reference code and ours) run
long chains with identical model settings; the total-variation distance
between their partition frequency distributions must vanish to within
Monte-Carlo noise. Calibration run (30k steps each): TV = 0.015, with every
top-8 partition probability matching to < 0.01 and the cluster-count
distribution matching to < 0.01.
"""

import os
import sys
from collections import Counter

import numpy as np
import pytest

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "bn_shim")

STEPS = 15000
BURN = 1500


def _tiny_data():
    geno = np.array([[1, 1, 0, 0], [0, 0, 1, 1]])
    ta = np.array([0, 0, 0, 1, 1])
    data = geno[ta].astype(float)
    data[0, 1] = np.nan
    return data


def _canon(assign):
    lab, out = {}, []
    for a in assign:
        if a not in lab:
            lab[a] = len(lab)
        out.append(lab[a])
    return tuple(out)


def _freqs(assigns):
    c = Counter(_canon(a) for a in assigns)
    tot = sum(c.values())
    return {k: v / tot for k, v in c.items()}


def _run_reference(data):
    sys.path.insert(0, SHIM)
    sys.path.insert(0, REF)
    try:
        np.random.seed(17)
        from libs.CRP import CRP
        from libs.MCMC import Chain_steps

        model = CRP(data, DP_alpha=[-1, -1], param_beta=[0.25, 0.25],
                    FN_error=0.1, FP_error=0.01)
        model.init()
        params = {
            "sm_prob": 0.33, "dpa_prob": 0.0, "error_prob": 0.0,
            "sm_ratios": [0.75, 0.25], "sm_steps": 3,
            "param_proposal_sd": np.array([0.1, 0.25, 0.5]),
        }
        chain = Chain_steps(model, 1, STEPS, BURN, params, verbosity=0)
        chain.run()
        return chain.results["assignments"][BURN:]
    finally:
        sys.path.remove(SHIM)
        sys.path.remove(REF)
        np.seterr(all="warn")


def _run_ours(data):
    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner

    n, m = data.shape
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    mc = MCMCConfig(sm_prob=0.33, dpa_prob=0.0, error_prob=0.0, sm_steps=3)
    runner = MCMCRunner(cfg, mc, pack_data(data), block_size=5000)
    res = runner.run((STEPS, BURN), seed=17, n_chains=1)[0]
    return res.assignments[BURN:]


@pytest.mark.slow
def test_partition_posterior_matches_reference():
    data = _tiny_data()
    fr = _freqs(_run_reference(data))
    fo = _freqs(_run_ours(data))

    keys = set(fr) | set(fo)
    tv = 0.5 * sum(abs(fr.get(k, 0) - fo.get(k, 0)) for k in keys)
    assert tv < 0.05, f"TV distance {tv:.4f}"

    # Every high-probability partition individually agrees.
    for k in sorted(keys, key=lambda k: -fr.get(k, 0))[:6]:
        assert abs(fr.get(k, 0) - fo.get(k, 0)) < 0.025, \
            (k, fr.get(k, 0), fo.get(k, 0))

    # Cluster-count posterior agrees.
    def k_dist(freqs):
        d = Counter()
        for part, p in freqs.items():
            d[len(set(part))] += p
        return d

    kr, ko = k_dist(fr), k_dist(fo)
    for k in set(kr) | set(ko):
        assert abs(kr.get(k, 0) - ko.get(k, 0)) < 0.03, (k, kr, ko)
