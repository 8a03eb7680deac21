#!/usr/bin/env python3
"""Scaling sweep: steps/sec vs problem size on one chip.

Measures the full default move mixture (same configuration as bench.py) at
a ladder of (cells, muts, k_max) sizes, printing one JSON line per config
with the resolved Gibbs implementation (fused Pallas kernel vs scan
fallback). Grounds the BASELINE.md scaling table.

Usage: python benchmarks/scale_bench.py [--configs NxMxK,NxMxK,...]
"""

import argparse
import json
import time

import numpy as np

DEFAULT_CONFIGS = [
    (5000, 200, 256),
    (10000, 500, 128),
    (10000, 500, 256),
    (20000, 200, 128),
    (26000, 200, 128),
]


def make_data(n, m, clones=20, seed=0):
    rng = np.random.default_rng(seed)
    geno = rng.integers(0, 2, size=(clones, m))
    assign = rng.integers(0, clones, size=n)
    data = geno[assign].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.1)] = 0
    data[(data == 0) & (rng.random((n, m)) < 0.001)] = 1
    data[rng.random((n, m)) < 0.1] = np.nan
    return data


def measure(n, m, k_max, timed_steps=64, reps=3, gibbs_block=0):
    import jax

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner
    from bnpc_tpu.models.gibbs import pallas_available

    try:
        from bnpc_tpu.models.gibbs import resolve_stream
    except ImportError:
        def resolve_stream(cfg):
            return False

    cfg = ModelConfig(
        n_cells=n, n_muts=m, k_max=k_max, p=0.25, q=0.25,
        fp=0.01, fn=0.2, learn_errors=True, fp_sd=0.01, fn_sd=0.1,
    )
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3, gibbs_block=gibbs_block)
    packed = pack_data(make_data(n, m))
    runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=16)

    states = runner.init_chains(jax.random.key(0), 1)
    keys = jax.random.split(jax.random.key(1), 1)

    # Warm-up at the timed block length (one compile) + settle clusters.
    states, rows, keys = runner.run_block(states, keys, timed_steps)
    jax.block_until_ready(rows.ml)

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        states, rows, keys = runner.run_block(states, keys, timed_steps)
        jax.block_until_ready(rows.ml)
        rates.append(timed_steps / (time.perf_counter() - t0))

    if gibbs_block:
        impl = f"blocked[{gibbs_block}]"
    elif pallas_available(cfg):
        impl = "pallas_stream" if resolve_stream(cfg) else "pallas"
    else:
        impl = "scan"
    return {
        "config": f"{n}x{m} k_max={k_max}",
        "steps_per_sec": round(float(np.median(rates)), 2),
        "impl": impl,
    }


def main():
    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default=None,
                    help="comma list of NxMxK, e.g. 20000x200x128")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--blocked", type=int, default=0,
                    help="gibbs_block for the approximate blocked sweep "
                         "(0 = exact)")
    args = ap.parse_args()

    configs = DEFAULT_CONFIGS
    if args.configs:
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in args.configs.split(",")]

    for n, m, k in configs:
        print(json.dumps(measure(n, m, k, timed_steps=args.steps,
                                 gibbs_block=args.blocked)),
              flush=True)


if __name__ == "__main__":
    main()
