"""On-device (compiled Mosaic) parity check: Pallas kernels vs scan impls.

The interpreter-mode tests (tests/test_pallas.py, tests/test_pallas_rg.py)
pin bit-exactness of the kernel LOGIC, but two behaviors depend on Mosaic
hardware semantics the interpreter does not exercise (ADVICE round 2):

  * the rg kernel's +/-inf scalar arithmetic (logtab[0] = -inf forcing
    side 1 when a restricted-Gibbs side empties, ops/pallas_rg.py), and
  * the sweep kernel's pl.when-guarded SMEM free-slot write-then-read
    ordering on cluster birth (ops/pallas_gibbs.py).

This script runs both kernels COMPILED on the real TPU across many seeds
(small n so birth/forced-side paths fire often) and asserts the sampled
assignments match the scan implementations exactly, and parameters to f32
tolerance (the TPU log approximation is ~2e-6; categorical flips would
show up as assignment mismatches).

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/tpu_kernel_parity.py
"""

import numpy as np


def main():
    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bnpc_tpu.config import ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.models.gibbs import gibbs_sweep
    from bnpc_tpu.models.splitmerge import split_merge
    from bnpc_tpu.state import init_state

    assert jax.default_backend() == "tpu", jax.default_backend()

    n, m = 24, 16
    rng = np.random.default_rng(0)
    geno = rng.integers(0, 2, size=(3, m))
    assign = rng.integers(0, 3, size=n)
    data = geno[assign].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.2)] = 0
    data[rng.random((n, m)) < 0.1] = np.nan
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.2)
    packed = pack_data(data)

    sweep_scan = jax.jit(
        lambda k, s: gibbs_sweep(k, s, packed, cfg, impl="scan_cond"))
    sweep_pl = jax.jit(
        lambda k, s: gibbs_sweep(k, s, packed, cfg, impl="pallas"))
    sweep_st = jax.jit(
        lambda k, s: gibbs_sweep(k, s, packed, cfg, impl="pallas_stream"))
    sm_scan = jax.jit(
        lambda k, s: split_merge(k, s, packed, cfg, 0.9, 3, impl="scan"))
    sm_pl = jax.jit(
        lambda k, s: split_merge(k, s, packed, cfg, 0.9, 3, impl="pallas"))

    births = 0
    mismatch_seeds = []
    for seed in range(30):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key(1000 + seed)

        a = sweep_scan(key, state)
        b = sweep_pl(key, state)
        asn_a = np.asarray(a.assignment)
        asn_b = np.asarray(b.assignment)
        if not np.array_equal(asn_a, asn_b):
            mismatch_seeds.append(("sweep", seed))
            continue
        np.testing.assert_array_equal(np.asarray(a.cluster_size),
                                      np.asarray(b.cluster_size))
        live = np.asarray(a.cluster_size) > 0
        np.testing.assert_allclose(
            np.asarray(a.params)[live], np.asarray(b.params)[live],
            rtol=1e-5, atol=1e-5)
        c = sweep_st(key, state)
        if not np.array_equal(asn_a, np.asarray(c.assignment)):
            mismatch_seeds.append(("sweep_stream", seed))
            continue
        np.testing.assert_array_equal(np.asarray(a.cluster_size),
                                      np.asarray(c.cluster_size))
        # Count births (slots occupied after that were free before): the
        # pl.when SMEM write-then-read path under test.
        before = np.asarray(state.cluster_size) > 0
        births += int((~before & live).sum())

        sa, ca = sm_scan(key, state)
        sb, cb = sm_pl(key, state)
        if not np.array_equal(np.asarray(sa.assignment),
                              np.asarray(sb.assignment)):
            mismatch_seeds.append(("splitmerge", seed))
            continue
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))

    assert births >= 10, f"only {births} births exercised — raise seeds"
    assert not mismatch_seeds, mismatch_seeds
    print(f"tpu_kernel_parity OK: 30 seeds, {births} birth events, "
          "sweep (resident + stream) + restricted-scan kernels match the "
          "scan impls on device")


if __name__ == "__main__":
    main()
