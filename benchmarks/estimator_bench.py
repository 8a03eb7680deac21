"""Posterior-estimator (MPEAR consensus) scaling benchmark.

VERDICT round-2 item 4: the sampler reaches 10,000 cells (86.5 steps/s at
10,000 x 500) but the posterior estimator must keep up — estimation should
cost less than sampling. This benchmark times every stage of
estimators.latents_posterior on a synthetic posterior trace at a given n
and prints a per-stage breakdown.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/estimator_bench.py \
        [--n 10000] [--steps 1000] [--cpu]
"""

import argparse
import time

import numpy as np


def synthetic_trace(n, steps, m=60, k=12, trace_k=32, seed=0):
    """Posterior-like assignments/params: k stable clones + per-step churn."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, k, size=n)
    assigns = np.tile(base, (steps, 1))
    # 2% of cells flip cluster per sample (posterior uncertainty).
    flip = rng.random((steps, n)) < 0.02
    assigns[flip] = rng.integers(0, k, size=int(flip.sum()))
    params = rng.random((steps, trace_k, m)).astype(np.float32)
    return assigns.astype(np.int32), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bnpc_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    import jax

    from bnpc_tpu import estimators

    assigns, params = synthetic_trace(args.n, args.steps)
    stamps = [("start", time.perf_counter())]

    # Warm-up device attach + co-clustering compile outside the timing.
    # (Only small shapes: at large n the exact path's [n, n] buffer must
    # never be built — that is the point of the matrix-free path.)
    jax.block_until_ready(
        estimators._coclustering_device(assigns[:64, :512])
    )
    jax.block_until_ready(
        estimators._sim_to_cols_device(assigns[:64, :512], np.arange(16))
    )
    stamps = [("start", time.perf_counter())]

    assign = estimators.mpear_assignment(assigns)
    stamps.append(("mpear_assignment (similarity + tree "
                   "+ exact scoring)", time.perf_counter()))

    assign2, geno = estimators.consensus_genotypes(assigns, params,
                                                   assign=assign)
    stamps.append(("consensus genotypes", time.perf_counter()))

    total = stamps[-1][1] - stamps[0][1]
    print(f"\nn={args.n}, steps={args.steps}, "
          f"backend={jax.default_backend()}")
    for (name, t1), (_, t0) in zip(stamps[1:], stamps[:-1]):
        print(f"  {name:36s} {t1 - t0:7.2f} s")
    print(f"  {'TOTAL':36s} {total:7.2f} s")
    print(f"consensus clusters: {np.unique(assign).size}")


if __name__ == "__main__":
    main()
