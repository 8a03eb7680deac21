#!/usr/bin/env python3
"""ESS/sec: sampling efficiency of bnpc_tpu vs the reference (VERDICT r1 #6).

Runs BOTH systems on the same synthetic 1,000 x 100 matrix for the same
number of full-move-mixture MCMC steps, then compares the effective sample
size per wall-clock second of the post-burn-in log-likelihood trace
(Geyer initial-positive-sequence ESS, bnpc_tpu/diagnostics.py). This answers
the question steps/sec cannot: whether the TPU steps mix as well as the
reference's per step.

At the 5,000 x 200 headline config the reference would need >1 h for a
meaningful trace; there we report our measured ESS/sec against the
reference's *upper bound* (its steps/sec — i.e. ESS/step = 1).

Usage: python benchmarks/ess_bench.py [--quick]
Writes benchmarks/ess_results.json and updates nothing else.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "bn_shim"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(HERE))

from measure_reference import make_data  # noqa: E402

FP, FN = 0.001, 0.1


def run_reference(data, steps, burn_in, seed=1):
    np.random.seed(seed)
    from libs.CRP import CRP
    from libs.MCMC import Chain_steps

    model = CRP(data, DP_alpha=[-1, -1], param_beta=[0.25, 0.25],
                FN_error=FN, FP_error=FP)
    model.init()
    params = {
        "sm_prob": 0.33, "dpa_prob": 0.25, "error_prob": 0.0,
        "sm_ratios": [0.75, 0.25], "sm_steps": 3,
        "param_proposal_sd": np.array([0.1, 0.25, 0.5]),
    }
    chain = Chain_steps(model, 1, steps, burn_in, params, verbosity=0)
    chain.do_step()  # allocator warm-up
    t0 = time.perf_counter()
    for s in range(steps):
        chain.do_step()
        chain.update_results(s + 1, s < burn_in)
    dt = time.perf_counter() - t0
    ml = np.asarray(chain.results["ML"][: steps + 1], dtype=float)
    return ml, dt


def run_ours(data, steps, burn_in, seed=1):
    import jax

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner

    n, m = data.shape
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=min(n, 256),
                      p=0.25, q=0.25, fp=FP, fn=FN)
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.0,
                          sm_steps=3)
    packed = pack_data(data)
    block = 100
    runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=block)
    # Warm the compiled programs on the same shapes before timing.
    runner.run((block, 1), seed=seed, n_chains=1, verbosity=0)
    t0 = time.perf_counter()
    res = runner.run((steps, burn_in), seed=seed, n_chains=1, verbosity=0)[0]
    dt = time.perf_counter() - t0
    return np.asarray(res.ML, dtype=float), dt


def summarize(name, ml, dt, steps, burn_in):
    from bnpc_tpu.diagnostics import effective_sample_size

    tail = ml[burn_in:]
    ess = effective_sample_size(tail)
    row = {
        "steps": steps,
        "burn_in": burn_in,
        "sampling_secs": dt,
        "steps_per_sec": steps / dt,
        "ess": ess,
        "ess_per_step": ess / tail.size,
        "ess_per_sec": ess / dt,
        "final_ml": float(ml[-1]),
    }
    print(f"{name}: {row['steps_per_sec']:.3f} steps/s, "
          f"ESS {ess:.1f}/{tail.size} post-burn-in samples "
          f"({row['ess_per_step']:.3f}/step) -> "
          f"{row['ess_per_sec']:.3f} ESS/sec", flush=True)
    return row


def _agg(rows, key):
    vals = np.array([r[key] for r in rows], dtype=float)
    k = vals.size
    mean = float(vals.mean())
    sd = float(vals.std(ddof=1)) if k > 1 else 0.0
    half = 1.96 * sd / np.sqrt(k) if k > 1 else 0.0
    return {"mean": mean, "sd": sd, "ci95_half": half,
            "values": vals.tolist()}


def main_multiseed():
    """--seeds K mode (VERDICT round 2, next-round item 3): K independent
    seeds per system at 1,000 x 100, reporting mean +- 95% CI of ESS/step
    so the 'equivalent mixing' claim carries an interval instead of a point
    estimate from one noisy trace. --system reference|ours|both lets the
    CPU-bound reference half run separately from the TPU half."""
    def arg(name, default):
        if name in sys.argv:
            return sys.argv[sys.argv.index(name) + 1]
        return default

    seeds = int(arg("--seeds", "5"))
    steps = int(arg("--steps", "900"))
    system = arg("--system", "both")
    burn_in = steps // 3
    data = make_data(1000, 100)

    path = os.path.join(HERE, "ess_multiseed.json")
    out = {}
    if os.path.exists(path):
        with open(path) as fh:
            out.update(json.load(fh))
    out.update({"config": "1000x100, fixed errors, full move mixture, "
                          "1 chain",
                "steps": steps, "burn_in": burn_in, "seeds": seeds})

    if system in ("both", "reference"):
        rows = []
        for seed in range(1, seeds + 1):
            ml, dt = run_reference(data, steps, burn_in, seed=seed)
            rows.append(summarize(f"reference seed {seed}", ml, dt,
                                  steps, burn_in))
        out["reference_runs"] = rows
        out["reference_ess_per_step"] = _agg(rows, "ess_per_step")
        out["reference_ess_per_sec"] = _agg(rows, "ess_per_sec")

    if system in ("both", "ours"):
        rows = []
        for seed in range(1, seeds + 1):
            ml, dt = run_ours(data, steps, burn_in, seed=seed)
            rows.append(summarize(f"bnpc_tpu seed {seed}", ml, dt,
                                  steps, burn_in))
        out["bnpc_tpu_runs"] = rows
        out["bnpc_tpu_ess_per_step"] = _agg(rows, "ess_per_step")
        out["bnpc_tpu_ess_per_sec"] = _agg(rows, "ess_per_sec")

    for name in ("reference", "bnpc_tpu"):
        agg = out.get(f"{name}_ess_per_step")
        if agg:
            print(f"{name}: ESS/step {agg['mean']:.4f} "
                  f"+- {agg['ci95_half']:.4f} (95% CI, {seeds} seeds)")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}")


def main_headline():
    """--headline: multi-seed ESS at the 5,000 x 200 headline config (ours
    only — the reference needs >1 h per seed there; its ESS/sec is bounded
    above by its steps/sec). Merges into ess_multiseed.json."""
    def arg(name, default):
        if name in sys.argv:
            return sys.argv[sys.argv.index(name) + 1]
        return default

    seeds = int(arg("--seeds", "5"))
    steps = int(arg("--steps", "900"))
    burn_in = steps // 3
    data = make_data(5000, 200)

    path = os.path.join(HERE, "ess_multiseed.json")
    out = {}
    if os.path.exists(path):
        with open(path) as fh:
            out.update(json.load(fh))

    rows = []
    for seed in range(1, seeds + 1):
        ml, dt = run_ours(data, steps, burn_in, seed=seed)
        rows.append(summarize(f"bnpc_tpu 5000x200 seed {seed}", ml, dt,
                              steps, burn_in))
    out["headline_config"] = (f"5000x200, fixed errors, full move mixture, "
                              f"1 chain, {steps} steps, {seeds} seeds")
    out["headline_runs"] = rows
    out["headline_ess_per_step"] = _agg(rows, "ess_per_step")
    out["headline_ess_per_sec"] = _agg(rows, "ess_per_sec")
    for key in ("headline_ess_per_step", "headline_ess_per_sec"):
        agg = out[key]
        print(f"{key}: {agg['mean']:.4f} +- {agg['ci95_half']:.4f} "
              f"(95% CI, {seeds} seeds)")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}")


def main():
    if "--headline" in sys.argv:
        main_headline()
        return
    if "--seeds" in sys.argv:
        main_multiseed()
        return
    quick = "--quick" in sys.argv
    steps = 150 if quick else 400
    burn_in = steps // 3
    out = {"config": "1000x100, fixed errors, full move mixture, 1 chain",
           "steps": steps, "burn_in": burn_in}

    data = make_data(1000, 100)
    ml_ref, dt_ref = run_reference(data, steps, burn_in)
    out["reference_cpu"] = summarize("reference CPU", ml_ref, dt_ref,
                                     steps, burn_in)
    ml_tpu, dt_tpu = run_ours(data, steps, burn_in)
    out["bnpc_tpu"] = summarize("bnpc_tpu", ml_tpu, dt_tpu, steps, burn_in)
    out["ess_per_sec_ratio"] = (
        out["bnpc_tpu"]["ess_per_sec"] / out["reference_cpu"]["ess_per_sec"]
    )
    print(f"ESS/sec ratio (ours / reference): "
          f"{out['ess_per_sec_ratio']:.1f}x")

    if not quick:
        # Headline config: our measured ESS/sec vs the reference's upper
        # bound (every step an independent sample at its measured steps/s).
        data5 = make_data(5000, 200)
        ml5, dt5 = run_ours(data5, steps, burn_in)
        out["bnpc_tpu_5000x200"] = summarize("bnpc_tpu 5000x200", ml5, dt5,
                                             steps, burn_in)
        base = json.load(open(os.path.join(HERE,
                                           "reference_baseline.json")))
        ub = base["5000x200"]["steps_per_sec"]
        out["reference_5000x200_ess_per_sec_upper_bound"] = ub
        print(f"5000x200: ours {out['bnpc_tpu_5000x200']['ess_per_sec']:.3f}"
              f" ESS/sec vs reference upper bound {ub:.4f} (ESS/step=1)")

    path = os.path.join(HERE, "ess_results.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
