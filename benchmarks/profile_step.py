"""Per-component step timing at the headline config (5,000 x 200, TPU).

Times each MCMC step component in isolation (fused Pallas Gibbs sweep,
split-merge, sufficient-stats + parameter MH, trace summarize) and the full
composed step, after warming to stationarity. Used to find the next
optimization lever; results recorded in BASELINE.md / CLAUDE.md perf notes.
"""
import time
import numpy as np, jax, jax.numpy as jnp
from bnpc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.models.gibbs import gibbs_sweep
from bnpc_tpu.models.splitmerge import split_merge
from bnpc_tpu.models.updates import update_parameters, update_error_rates
from bnpc_tpu.mcmc import summarize, resolve_trace_k, make_step_fn
from bnpc_tpu.state import init_state, cluster_stats

n, m, k_max = 5000, 200, 256
rng = np.random.default_rng(0)
geno = rng.integers(0, 2, size=(10, m))
assign = rng.integers(0, 10, size=n)
data = geno[assign].astype(float)
data[rng.random((n, m)) < 0.1] = np.nan
cfg = ModelConfig(n_cells=n, n_muts=m, k_max=k_max, p=0.25, q=0.25,
                  fp=0.01, fn=0.2, learn_errors=True, fp_sd=0.01, fn_sd=0.1)
mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25, sm_steps=3)
packed = pack_data(data)
state = init_state(jax.random.key(0), cfg, packed, mode="random")
sweep = jax.jit(lambda k, s: gibbs_sweep(k, s, packed, cfg, impl="pallas"))
for i in range(30):
    state = sweep(jax.random.fold_in(jax.random.key(9), i), state)
jax.block_until_ready(state)
print("live:", int((np.asarray(state.cluster_size) > 0).sum()))

key = jax.random.key(42)
def timeit(name, fn, batches=4, reps=15):
    out = fn(jax.random.key(99), state); jax.block_until_ready(out)
    ts = []
    for b in range(batches):
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(jax.random.fold_in(key, b*reps+i), state)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/reps*1e3)
    print(f"{name}: median {np.median(ts):.2f} ms  ({' '.join(f'{t:.1f}' for t in ts)})")

timeit("pallas sweep", sweep)
timeit("split-merge", jax.jit(lambda k, s: split_merge(k, s, packed, cfg, 0.75, 3, impl="auto_single")))
def par(k, s):
    n1, n0 = cluster_stats(packed, s.assignment, cfg.k_max)
    return update_parameters(k, s, n1, n0, cfg)
timeit("stats+params MH", jax.jit(par))
trace_k = resolve_trace_k(cfg, mcmc_cfg)
timeit("summarize", jax.jit(lambda k, s: summarize(s, packed, cfg, trace_k)))
step = jax.jit(make_step_fn(cfg, mcmc_cfg, packed, trace_k, gibbs_impl="auto_single"))
timeit("FULL step", lambda k, s: step(s, k)[0])
