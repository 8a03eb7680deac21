#!/usr/bin/env python3
"""Headline benchmark: MCMC steps/sec at 5,000 cells x 200 mutations.

Runs the full default move mixture (Gibbs sweep / split-merge at 0.33,
alpha updates at 0.25, cluster-parameter MH every step, error-rate MH at
0.25 with learned errors) on one chain on the available accelerator and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

vs_baseline compares against the reference implementation measured on this
machine's CPU (benchmarks/reference_baseline.json; see
benchmarks/measure_reference.py). BASELINE.md records the measured numbers.
"""

import json
import os
import sys
import time

import numpy as np

# Default reference CPU throughput for the 5000x200 config, measured with
# benchmarks/measure_reference.py on this image (2026-08-16).
REFERENCE_STEPS_PER_SEC = 0.0885


def make_data(n, m):
    """The headline dataset (seed 0, 10 clones, 10% missing) — delegates to
    the ONE shared generator in benchmarks/accuracy_bench.py so the
    headline, accuracy, and probe benchmarks all run the same matrix."""
    from benchmarks.accuracy_bench import make_data as _gen

    return _gen(n, m, 10, 0.1, seed=0)[0]


def main():
    import jax

    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner

    n, m = 5000, 200
    if "--small" in sys.argv:  # fast smoke mode
        n, m = 500, 100

    data = make_data(n, m)

    cfg = ModelConfig(
        n_cells=n, n_muts=m, k_max=min(n, 256), p=0.25, q=0.25,
        fp=0.01, fn=0.2, learn_errors=True, fp_sd=0.01, fn_sd=0.1,
    )
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3)
    packed = pack_data(data)
    runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=16)

    states = runner.init_chains(jax.random.key(0), 1)
    keys = jax.random.split(jax.random.key(1), 1)

    # Warm-up with the SAME block length as the timed run (one compile),
    # and let the cluster count settle off the random init.
    timed_steps = 256
    states, rows, keys = runner.run_block(states, keys, timed_steps)
    jax.block_until_ready(rows.ml)

    # Median of three timed blocks: the tunneled device's relay throughput
    # varies run-to-run, and a single window can catch a degraded phase.
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        states, rows, keys = runner.run_block(states, keys, timed_steps)
        jax.block_until_ready(rows.ml)
        rates.append(timed_steps / (time.perf_counter() - t0))

    steps_per_sec = float(np.median(rates))

    baseline = REFERENCE_STEPS_PER_SEC
    bl_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "reference_baseline.json",
    )
    if os.path.exists(bl_path):
        with open(bl_path) as fh:
            bl = json.load(fh)
        key = f"{n}x{m}"
        if key in bl:
            baseline = bl[key]["steps_per_sec"]

    print(json.dumps({
        "metric": f"MCMC steps/sec at {n} cells x {m} muts "
                  "(full move mixture, 1 chain)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
