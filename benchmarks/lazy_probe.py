#!/usr/bin/env python3
"""Probe for the lazy-birth sweep redesign: measures (a) the device cost of
each per-sweep precompute at the headline shape, and (b) how many cluster
births actually happen per Gibbs sweep at stationarity.

The current fused sweep precomputes a [n, m] newborn Beta field, its log
tables, and a [n, n] cross-likelihood matmul every sweep — but only the
handful of cells that actually BIRTH a cluster ever consume a column. This
script quantifies how much a birth-lazy design can save.

Run on TPU: PYTHONPATH=.:/root/.axon_site python benchmarks/lazy_probe.py
"""

import time

import numpy as np


def timeit(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.mcmc import MCMCRunner
    from bnpc_tpu.models import gibbs
    from bnpc_tpu.ops import likelihood as lk
    from bnpc_tpu.ops.randomx import beta_binary

    n, m = 5000, 200
    rng = np.random.default_rng(0)
    geno = rng.integers(0, 2, size=(10, m))
    assign = rng.integers(0, 10, size=n)
    data_np = geno[assign].astype(float)
    data_np[(data_np == 1) & (rng.random((n, m)) < 0.1)] = 0
    data_np[(data_np == 0) & (rng.random((n, m)) < 0.001)] = 1
    data_np[rng.random((n, m)) < 0.1] = np.nan

    cfg = ModelConfig(
        n_cells=n, n_muts=m, k_max=min(n, 256), p=0.25, q=0.25,
        fp=0.01, fn=0.2, learn_errors=True, fp_sd=0.01, fn_sd=0.1,
    )
    mcmc_cfg = MCMCConfig(sm_prob=0.33, dpa_prob=0.25, error_prob=0.25,
                          sm_steps=3)
    packed = pack_data(data_np)
    runner = MCMCRunner(cfg, mcmc_cfg, packed, block_size=16)

    # Warm to stationarity.
    states = runner.init_chains(jax.random.key(0), 1)
    keys = jax.random.split(jax.random.key(1), 1)
    states, rows, keys = runner.run_block(states, keys, 256)
    jax.block_until_ready(rows.ml)
    state = jax.tree.map(lambda x: x[0], states)
    print("post-warmup clusters:",
          int(jnp.sum(state.cluster_size > 0)))

    # ---- component timings ----------------------------------------------
    key = jax.random.key(7)

    @jax.jit
    def beta_field(k):
        return beta_binary(k, cfg.p, cfg.q, packed.xm, packed.xm0)

    @jax.jit
    def fresh_tables(fresh):
        return lk.log_prob_tables(fresh, state.fp, state.fn)

    @jax.jit
    def lf2_matmul(f1, f0):
        nb = -(-n // 128)
        pad_rows = [(0, nb * 128 - n), (0, 0)]
        return lk.ll_matrix(packed, jnp.pad(f1, pad_rows),
                            jnp.pad(f0, pad_rows))

    @jax.jit
    def ll0_matmul(params):
        c1, c0 = lk.log_prob_tables(params, state.fp, state.fn)
        return lk.ll_matrix(packed, c1, c0)

    @jax.jit
    def gumbel_field(k):
        return jax.random.gumbel(k, (n, cfg.k_max + 1))

    @jax.jit
    def newpost(fp, fn):
        return lk.new_cluster_ll(packed, cfg, fp, fn)

    @jax.jit
    def one_col(f1r, f0r):
        return lk.ll_col(f1r, f0r, packed.xm, packed.xm0)

    fresh = beta_field(key)
    f1, f0 = fresh_tables(fresh)

    print(f"beta_binary [n,m] field : {timeit(beta_field, key):8.3f} ms")
    print(f"fresh log tables [n,m]  : {timeit(fresh_tables, fresh):8.3f} ms")
    print(f"lf2 [n,n] matmul        : {timeit(lf2_matmul, f1, f0):8.3f} ms")
    print(f"ll0 [n,k] matmul        : {timeit(ll0_matmul, state.params):8.3f} ms")
    print(f"gumbel [n,k+1] field    : {timeit(gumbel_field, key):8.3f} ms")
    print(f"new_cluster_ll [n]      : {timeit(newpost, state.fp, state.fn):8.3f} ms")
    print(f"single ll_col matvec    : {timeit(one_col, f1[0], f0[0]):8.3f} ms")

    @jax.jit
    def sweep(k, st):
        return gibbs.gibbs_sweep(k, st, packed, cfg, impl="auto_single")

    print(f"full fused sweep        : {timeit(sweep, key, state, reps=10):8.3f} ms")

    # ---- births per sweep at stationarity --------------------------------
    # Counter-instrumented replica of the scan step's decision rule (same
    # hoisted randomness; models/gibbs.py _scan_impl).
    def counting_sweep(k, st):
        perm, gumbel, fresh_ = gibbs._hoisted_randomness(
            k, st, packed, cfg, gibbs._NO_AXIS)
        alpha = st.dp_alpha
        log_denom = jnp.log(n - 1.0 + alpha)
        new_post = lk.new_cluster_ll(packed, cfg, st.fp, st.fn) \
            + jnp.log(alpha) - log_denom
        k_max = cfg.k_max
        c1_, c0_ = lk.log_prob_tables(st.params, st.fp, st.fn)
        ll0 = lk.ll_matrix(packed, c1_, c0_)
        f1_, f0_ = lk.log_prob_tables(fresh_, st.fp, st.fn)
        z0 = ll0 + gumbel[:, :k_max]
        aux = new_post + gumbel[:, k_max]

        def step(carry, cell):
            assignment, params, size, z, births = carry
            old = assignment[cell]
            size = size.at[old].add(-1)
            live = size > 0
            prior = jnp.log(jnp.maximum(size, 1).astype(jnp.float32)) \
                - log_denom
            post_old = jnp.where(live, z[cell] + prior, gibbs.NEG_INF)
            has_free = jnp.any(~live)
            post_new = jnp.where(has_free, aux[cell], gibbs.NEG_INF)
            logits = jnp.concatenate([post_old, post_new[None]])
            choice = jnp.argmax(logits).astype(jnp.int32)
            is_new = choice == k_max
            free = jnp.argmax(size == 0).astype(jnp.int32)
            target = jnp.where(is_new, free, choice).astype(jnp.int32)

            def birth(params, z):
                params = params.at[free].set(fresh_[cell])
                col = lk.ll_col(f1_[cell], f0_[cell], packed.xm, packed.xm0)
                return params, z.at[:, free].set(
                    col + jnp.take(gumbel, free, axis=1))

            params, z = jax.lax.cond(
                is_new, birth, lambda p, zz: (p, zz), params, z)
            size = size.at[target].add(1)
            assignment = assignment.at[cell].set(target)
            births = births + is_new.astype(jnp.int32)
            return (assignment, params, size, z, births), None

        init = (st.assignment, st.params, st.cluster_size, z0,
                jnp.int32(0))
        (assignment, params, size, _, births), _ = jax.lax.scan(
            step, init, perm)
        return st._replace(assignment=assignment, params=params,
                           cluster_size=size), births

    counting_sweep = jax.jit(counting_sweep)
    birth_counts = []
    st = state
    for i in range(30):
        k = jax.random.fold_in(jax.random.key(3), i)
        st, births = counting_sweep(k, st)
        birth_counts.append(int(births))
    print("births/sweep over 30 stationary sweeps:",
          birth_counts)
    print(f"mean {np.mean(birth_counts):.1f}  median "
          f"{np.median(birth_counts):.0f}  max {np.max(birth_counts)}")


if __name__ == "__main__":
    main()
