#!/usr/bin/env python3
"""Time each phase of _TraceBuffer.append during a real run() to find the
~0.8 s/block e2e overhead (in-block 701 steps/s vs run() 104 at 5k/k128).
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

    from bnpc_tpu import mcmc as M
    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.utils import transfer

    n, m = 5000, 200
    data, truth, geno = make_data(n, m, 15, 0.1)
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=128, p=0.25, q=0.25,
                      fp=0.01, fn=0.2, learn_errors=True,
                      fp_sd=0.01, fn_sd=0.1)
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3, gibbs_block=0)
    runner = M.MCMCRunner(cfg, mcmc_cfg, pack_data(data), block_size=100)

    st = runner.init_chains(jax.random.key(0), 1)
    ks = jax.random.split(jax.random.key(0), 1)
    st, warm_rows, ks = runner.run_block(st, ks, 100)
    transfer.finish_fetch(transfer.start_fetch(warm_rows))
    jax.block_until_ready(runner._summarize_states(st).ml)

    orig_append = M._TraceBuffer.append

    def timed_append(self, rows, live_k=None):
        t0 = time.perf_counter()
        if live_k is not None:
            w = max(int(x) for x in live_k)
        else:
            p = rows.params
            w = None
            if isinstance(p, jax.Array) and p.shape[1] and p.shape[2] > 8:
                w = int(M._block_live_k(p))
        t1 = time.perf_counter()
        orig_append(self, rows, live_k=live_k)
        t2 = time.perf_counter()
        print(f"  append: live_k sync {1e3*(t1-t0):7.1f} ms  "
              f"rest {1e3*(t2-t1):7.1f} ms  w={w}", flush=True)

    M._TraceBuffer.append = timed_append

    t0 = time.perf_counter()
    results = runner.run((600, 200), seed=1, n_chains=1)
    jax.block_until_ready(results[0].ML[0])
    wall = time.perf_counter() - t0
    print(f"run() e2e: {600/wall:.1f} steps/s (wall {wall:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
