#!/usr/bin/env python3
"""Measure the reference implementation's CPU wall-clock per MCMC step.

Runs the *actual* reference code at /root/reference (with a numpy-backed
bottleneck shim, since bottleneck is not installed) on synthetic matrices and
writes benchmarks/reference_baseline.json. The headline config is 5,000 cells
x 200 mutations (BASELINE.md).

Usage: python benchmarks/measure_reference.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"

sys.path.insert(0, os.path.join(HERE, "bn_shim"))
sys.path.insert(0, REF)


def make_data(n, m, k_clones=10, seed=0, missing=0.1):
    rng = np.random.default_rng(seed)
    geno = rng.integers(0, 2, size=(k_clones, m))
    assign = rng.integers(0, k_clones, size=n)
    data = geno[assign].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.1)] = 0
    data[(data == 0) & (rng.random((n, m)) < 0.001)] = 1
    data[rng.random((n, m)) < missing] = np.nan
    return data


def time_reference_steps(data, steps, learn_errors=False, sm_prob=0.33,
                         seed=1):
    np.random.seed(seed)
    if learn_errors:
        from libs.CRP_learning_errors import CRP_errors_learning

        model = CRP_errors_learning(
            data, DP_alpha=[-1, -1], param_beta=[0.25, 0.25],
            FP_mean=0.01, FP_sd=0.01, FN_mean=0.2, FN_sd=0.1,
        )
    else:
        from libs.CRP import CRP

        model = CRP(
            data, DP_alpha=[-1, -1], param_beta=[0.25, 0.25],
            FN_error=0.1, FP_error=0.001,
        )
    model.init()

    from libs.MCMC import Chain_steps

    params = {
        "sm_prob": sm_prob, "dpa_prob": 0.25, "error_prob": 0.25,
        "sm_ratios": [0.75, 0.25], "sm_steps": 3,
        "param_proposal_sd": np.array([0.1, 0.25, 0.5]),
    }
    chain = Chain_steps(model, 1, max(steps, 10), 0, params, verbosity=0)
    chain.do_step()  # warm-up (numpy allocator, first cluster churn)
    t0 = time.perf_counter()
    for s in range(steps):
        chain.do_step()
        chain.update_results(s + 1, False)
    dt = time.perf_counter() - t0
    return dt / steps


def main():
    quick = "--quick" in sys.argv
    out = {}

    configs = [
        ("100x100", 100, 100, 20 if quick else 50),
        ("1000x100", 1000, 100, 3 if quick else 10),
        ("5000x200", 5000, 200, 2 if quick else 3),
    ]
    for name, n, m, steps in configs:
        data = make_data(n, m)
        sps = time_reference_steps(data, steps)
        out[name] = {
            "secs_per_step": sps,
            "steps_per_sec": 1.0 / sps,
            "steps_timed": steps,
        }
        print(f"reference {name}: {sps:.4f} s/step "
              f"({1.0 / sps:.3f} steps/s)", flush=True)

    path = os.path.join(HERE, "reference_baseline.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
