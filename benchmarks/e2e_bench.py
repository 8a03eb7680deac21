#!/usr/bin/env python3
"""End-to-end MCMCRunner.run() throughput — sampling PLUS trace collection
off the tunneled device (the number a CLI user actually experiences,
unlike bench.py's in-block rate).

Trace D2H is the historical e2e bottleneck; the compact wire dtypes
(mcmc._trace_dtypes) and the live-width params slicing (_TraceBuffer.append)
are what closed the gap to the in-block rate. Repeats run() in one process:
trial 0 pays jit compile + relay warm-up, later trials are the steady state.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/e2e_bench.py \
        [--n 5000] [--m 200] [--steps 2000] [--chains 1] [--trials 3]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--chains", type=int, default=1)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--block_size", type=int, default=100)
    args = ap.parse_args()

    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    import bnpc_tpu.data as bd
    from bnpc_tpu.mcmc import MCMCRunner

    n, m = args.n, args.m
    rng = np.random.default_rng(0)
    base = rng.integers(0, 10, n)
    geno = rng.random((10, m)) < 0.3
    data = geno[base].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.1)] = 0
    data[rng.random((n, m)) < 0.1] = np.nan

    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=128)
    packed = bd.pack_data(data)
    runner = MCMCRunner(cfg, MCMCConfig(), packed,
                        block_size=args.block_size)
    print(f"n={n}, m={m}, steps={args.steps}, chains={args.chains}, "
          f"backend={jax.default_backend()}")
    res = None
    for trial in range(args.trials):
        t0 = time.perf_counter()
        res = runner.run((args.steps, args.steps // 2), seed=3,
                         n_chains=args.chains, verbosity=0)
        dt = time.perf_counter() - t0
        total = args.chains * args.steps
        print(f"  trial {trial}: {total / dt:.1f} chain-steps/s e2e "
              f"({dt:.1f} s)", flush=True)
    print(f"params trace (post-burn-in, live-width): {res[0].params.shape}")


if __name__ == "__main__":
    main()
