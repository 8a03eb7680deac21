#!/usr/bin/env python3
"""Attribute the accuracy-bench e2e gap: in-block rate vs full run() rate
for the exact 5000x200 k_max=128 accuracy-bench config, same process.

The accuracy bench measured 96.8 steps/s end-to-end while the headline
in-block rate is 722 (k256) / 772 (k128). This probe times, in ONE
session: (a) run_block at the bench's block=100, (b) run_block at 256,
(c) the full runner.run() path, and (d) the final-collect D2H fetch in
isolation — so the gap decomposes into compute vs per-block overhead vs
trace-fetch (relay) cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.accuracy_bench import make_data


def main():
    import jax

    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner

    n, m = 5000, 200
    data, truth, geno = make_data(n, m, 15, 0.1)
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=128, p=0.25, q=0.25,
                      fp=0.01, fn=0.2, learn_errors=True,
                      fp_sd=0.01, fn_sd=0.1)
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3, gibbs_block=0)
    runner = MCMCRunner(cfg, mcmc_cfg, pack_data(data), block_size=100)

    from bnpc_tpu.utils import transfer

    st = runner.init_chains(jax.random.key(0), 1)
    ks = jax.random.split(jax.random.key(0), 1)
    st, warm_rows, ks = runner.run_block(st, ks, 100)
    transfer.finish_fetch(transfer.start_fetch(warm_rows))
    jax.block_until_ready(runner._summarize_states(st).ml)

    # (a) in-block at block=100 (the bench's block size), median of 3
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, rows, ks = runner.run_block(st, ks, 100)
        jax.block_until_ready(rows.ml)
        rates.append(100 / (time.perf_counter() - t0))
    print(f"in-block b=100: {np.median(rates):.1f} steps/s "
          f"(arms {[round(r,1) for r in rates]})", flush=True)

    # (b) per-block D2H fetch cost at this shape (what append() pays)
    t0 = time.perf_counter()
    fetched = transfer.finish_fetch(transfer.start_fetch(rows))
    t_fetch = time.perf_counter() - t0
    nbytes = sum(x.nbytes for x in jax.tree.leaves(fetched))
    print(f"block-rows fetch: {t_fetch*1e3:.0f} ms for {nbytes/1e6:.2f} MB",
          flush=True)

    # (c) full run() e2e — the accuracy bench's timed region
    t0 = time.perf_counter()
    results = runner.run((600, 200), seed=1, n_chains=1)
    jax.block_until_ready(results[0].ML[0])
    wall = time.perf_counter() - t0
    print(f"run() e2e: {600/wall:.1f} steps/s (wall {wall:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
