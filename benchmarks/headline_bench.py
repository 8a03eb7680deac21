#!/usr/bin/env python3
"""Controlled headline measurement: 5,000 x 200 at k_max 128 vs 256.

VERDICT r4 weak item 1: three different numbers circulated for the headline
shape (649 / 726.1 / 575.9 / 680.8) with no stated k_max and no controlled
comparison. This script measures, in ONE process and therefore one
relay-health window:

  1. k_max=128            — no k-bucket (k_max <= 128 never builds one);
  2. k_max=256 (bucket)   — the round-4 default: live-width k-bucket
                            dispatch, narrow 128-slot body at stationarity;
  3. k_max=256 always-wide — the k-bucket disabled: every step runs the
                            full 256-slot body. This measured FASTER than
                            arm 2 at every shape tried, so it is the
                            round-5 default and THE bench.py config
                            (mcmc._KB_ON gates the bucket off).

plus the narrow-arm eligibility of (2) measured from the assignment trace
(the fraction of steps whose live slots all sit below 128 with fewer than
128 clusters — the lax.cond predicate of mcmc.make_step_fn), and the veto
risk proxy (max live slot index seen). Prints one JSON line per arm.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/headline_bench.py
       [--steps 256] [--reps 5]
"""

import argparse
import json
import time

import numpy as np


def make_headline_data():
    """Exactly bench.py's data — imported, not copied, so the controlled
    comparison stays controlled if bench.py's recipe ever changes."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench.make_data(5000, 200)


def measure(packed, k_max, timed_steps, reps, force_wide=False):
    import jax

    import bnpc_tpu.mcmc as mcmc
    from bnpc_tpu.config import MCMCConfig, ModelConfig

    cfg = ModelConfig(
        n_cells=5000, n_muts=200, k_max=k_max, p=0.25, q=0.25,
        fp=0.01, fn=0.2, learn_errors=True, fp_sd=0.01, fn_sd=0.1,
    )
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3)

    old_kb = mcmc._KB
    old_on = mcmc._KB_ON
    # The bucket is off by default since round 5 (measured slower); the
    # "bucket" arm here forces it on to keep quantifying that cost.
    mcmc._KB_ON = not force_wide
    if force_wide:
        # k_max <= _KB skips the bucket entirely: every step runs the wide
        # body, exactly the round-3 structure.
        mcmc._KB = k_max
    try:
        runner = mcmc.MCMCRunner(cfg, mcmc_cfg, packed, block_size=16)
        states = runner.init_chains(jax.random.key(0), 1)
        keys = jax.random.split(jax.random.key(1), 1)

        # Warm-up at the timed block length + settle off the random init.
        states, rows, keys = runner.run_block(states, keys, timed_steps)
        jax.block_until_ready(rows.ml)

        rates = []
        last_rows = rows
        for _ in range(reps):
            t0 = time.perf_counter()
            states, last_rows, keys = runner.run_block(
                states, keys, timed_steps)
            jax.block_until_ready(last_rows.ml)
            rates.append(timed_steps / (time.perf_counter() - t0))
    finally:
        mcmc._KB = old_kb
        mcmc._KB_ON = old_on

    # Narrow-arm eligibility from the final timed block's assignment trace.
    from bnpc_tpu.utils import transfer

    assigns = transfer.to_host(last_rows.assignment)[0]  # [steps, n]
    assigns = assigns.astype(np.int32)
    max_slot = assigns.max(axis=1)
    n_cl = np.array([np.unique(a).size for a in assigns])
    narrow_ok = (max_slot < 128) & (n_cl < 128)
    return {
        "k_max": k_max,
        "bucket": (not force_wide) and k_max > 128,
        "steps_per_sec": round(float(np.median(rates)), 1),
        "rates": [round(r, 1) for r in rates],
        "narrow_eligible_frac": round(float(narrow_ok.mean()), 4),
        "max_live_slot": int(max_slot.max()),
        "mean_clusters": round(float(n_cl.mean()), 1),
    }


def main():
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    packed = pack_data(make_headline_data())
    for k_max, force_wide in ((128, False), (256, False), (256, True)):
        r = measure(packed, k_max, args.steps, args.reps,
                    force_wide=force_wide)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
