#!/usr/bin/env python3
"""Accuracy-vs-wallclock benchmarks (driver configs 4/5, BASELINE.md).

Runs the full sampler on simulated clone-structured matrices with known
truth and reports steps/sec, final ARI, genotype accuracy, and
time-to-ARI>=0.95 estimated from the trace. Writes
benchmarks/accuracy_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_data(n, m, k_clones, missing, seed=0):
    rng = np.random.default_rng(seed)
    geno = rng.integers(0, 2, size=(k_clones, m))
    assign = rng.integers(0, k_clones, size=n)
    data = geno[assign].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.1)] = 0
    data[(data == 0) & (rng.random((n, m)) < 0.001)] = 1
    data[rng.random((n, m)) < missing] = np.nan
    return data, assign, geno


def run_config(name, n, m, k_clones, missing, n_chains, steps, seed=1,
               gibbs_block=0, k_max=None):
    import jax
    from sklearn.metrics import adjusted_rand_score

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner

    data, truth, geno = make_data(n, m, k_clones, missing)
    cfg = ModelConfig(n_cells=n, n_muts=m,
                      k_max=min(n, 256) if k_max is None else k_max,
                      p=0.25, q=0.25, fp=0.01, fn=0.2, learn_errors=True,
                      fp_sd=0.01, fn_sd=0.1)
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3, gibbs_block=gibbs_block)
    # block_size divides `steps` so the timed run reuses ONE compiled block
    # pipeline (a remainder block would compile a second program mid-run).
    block = 100 if steps % 100 == 0 else 64
    runner = MCMCRunner(cfg, mcmc_cfg, pack_data(data), block_size=block)

    # Warm-up compile of every program the timed run will execute: the
    # block pipeline at its exact shape and the initial-row summarizer —
    # and one full trace fetch through the chunked transfer path, because
    # the relay's FIRST device->host transfer of a process can stall for
    # tens of seconds regardless of size (CLAUDE.md relay notes); that
    # stall is tunnel pathology, not framework cost, and must not land in
    # the timed region.
    from bnpc_tpu.utils import transfer

    st = runner.init_chains(jax.random.key(0), n_chains)
    ks = jax.random.split(jax.random.key(0), n_chains)
    _, warm_rows, _k = runner.run_block(st, ks, block)
    transfer.finish_fetch(transfer.start_fetch(warm_rows))
    jax.block_until_ready(runner._summarize_states(st).ml)

    t0 = time.perf_counter()
    results = runner.run((steps, steps // 3), seed=seed, n_chains=n_chains)
    jax.block_until_ready(results[0].ML[0])
    wall = time.perf_counter() - t0

    steps_per_sec = steps * n_chains / wall
    per_step_secs = wall / steps

    from bnpc_tpu.diagnostics import effective_sample_size

    ml_ess = sum(
        effective_sample_size(res.ML[res.burn_in:]) for res in results
    )
    aris = []
    t95 = None
    for res in results:
        chain_ari = [
            adjusted_rand_score(truth, a) for a in res.assignments[::10]
        ]
        aris.append(chain_ari[-1])
        crossed = [i for i, a in enumerate(chain_ari) if a >= 0.95]
        if crossed:
            t_c = crossed[0] * 10 * per_step_secs
            t95 = t_c if t95 is None else min(t95, t_c)

    return {
        "config": name,
        "n_chains": n_chains,
        "steps": steps,
        "wall_secs": round(wall, 2),
        "chain_steps_per_sec": round(steps / wall, 3),
        "total_steps_per_sec": round(steps_per_sec, 3),
        "final_ARI": [round(a, 4) for a in aris],
        "time_to_ARI95_secs": None if t95 is None else round(t95, 2),
        "ML_ESS_per_sec": round(ml_ess / wall, 3),
    }


def main():
    quick = "--quick" in sys.argv
    if "--blocked" in sys.argv:
        # Blocked-vs-exact accuracy at the scales the --blocked_gibbs flag
        # targets (VERDICT r4 item 5): same data, same seed, same steps —
        # only the sweep implementation differs, so the ARI / ESS-per-sec
        # columns isolate the approximation's cost/benefit.
        steps = 200 if quick else 600
        out = []
        for n, m, blocks in (
            (5000, 200, (0, 512)),
            (50000, 200, (0, 512, 2048)),
            (131072, 200, (0, 512, 2048)),
        ):
            if quick and n > 50000:
                continue
            for blk in blocks:
                tag = "exact" if blk == 0 else f"blocked[{blk}]"
                out.append(run_config(
                    f"{n}x{m} {tag}", n, m, 15, 0.1, 1, steps,
                    gibbs_block=blk, k_max=128))
                print(json.dumps(out[-1]), flush=True)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "blocked_accuracy_results.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=2)
        return
    out = [
        run_config("4x chains 1000x100 20%missing", 1000, 100, 10, 0.2,
                   4, 100 if quick else 600),
        run_config("5000x200 single chain", 5000, 200, 10, 0.1,
                   1, 64 if quick else 400),
    ]
    for r in out:
        print(json.dumps(r), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "accuracy_results.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
