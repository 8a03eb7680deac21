"""Capture a jax.profiler trace of one run_block at the headline config and
aggregate per-op device time (the isolated-dispatch floor makes wall timings
of single ops useless on the tunneled device; see CLAUDE.md).

Writes the trace under /tmp/bnpc_trace and prints the top device ops by
total self time plus the implied steps/s.
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax

from bnpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.mcmc import MCMCRunner

n, m = 5000, 200
rng = np.random.default_rng(0)
geno = rng.integers(0, 2, size=(10, m))
assign = rng.integers(0, 10, size=n)
data = geno[assign].astype(float)
data[(data == 1) & (rng.random((n, m)) < 0.1)] = 0
data[(data == 0) & (rng.random((n, m)) < 0.001)] = 1
data[rng.random((n, m)) < 0.1] = np.nan

cfg = ModelConfig(n_cells=n, n_muts=m, k_max=min(n, 256), p=0.25, q=0.25,
                  fp=0.01, fn=0.2, learn_errors=True, fp_sd=0.01, fn_sd=0.1)
mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25, sm_steps=3)
packed = pack_data(data)
runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=16)

states = runner.init_chains(jax.random.key(0), 1)
keys = jax.random.split(jax.random.key(1), 1)
steps = 256
states, rows, keys = runner.run_block(states, keys, steps)
jax.block_until_ready(rows.ml)

outdir = "/tmp/bnpc_trace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    t0 = time.perf_counter()
    states, rows, keys = runner.run_block(states, keys, steps)
    jax.block_until_ready(rows.ml)
    dt = time.perf_counter() - t0
print(f"block wall: {dt*1e3:.1f} ms  -> {steps/dt:.1f} steps/s")

# Aggregate device events from the trace proto (xplane) via the json dump.
paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
if not paths:
    print("no trace json found", glob.glob(f"{outdir}/**", recursive=True))
    sys.exit(1)
with gzip.open(paths[0], "rt") as fh:
    trace = json.load(fh)

# Find TPU device-op track PIDs (process names containing "TPU" and thread
# names like XLA Ops / TensorFlow Ops).
pid_names = {}
tid_names = {}
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev["pid"]] = ev["args"].get("name", "")
    if ev.get("ph") == "M" and ev.get("name") == "thread_name":
        tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

agg = {}
total = 0.0
for ev in trace["traceEvents"]:
    if ev.get("ph") != "X":
        continue
    pname = pid_names.get(ev["pid"], "")
    tname = tid_names.get((ev["pid"], ev.get("tid")), "")
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    if "XLA Op" not in tname and "Ops" not in tname:
        continue
    dur = ev.get("dur", 0) / 1e3  # ms
    name = ev["name"]
    agg[name] = agg.get(name, 0.0) + dur
    total += dur

print(f"\ntotal device op time: {total:.1f} ms "
      f"({total/steps*1e3:.1f} us/step)")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms:9.2f} ms  {ms/steps*1e3:8.1f} us/step  {name[:110]}")
