"""On-device (compiled Mosaic) parity for the SHARDED kernel paths.

tests/test_sharding.py pins the sharded-MutAxis kernel enablement in Pallas
interpret mode on a CPU mesh; this probe closes the remaining gap (round-5
review): nothing compiled the Mosaic kernels INSIDE shard_map on real TPU
hardware, so a lowering/DMA failure specific to that composition (the
round-4/5 enablement that keeps muts-sharded meshes on the kernel path)
would first surface in a production multichip run.

Only one tunneled chip is available, so the mesh here is 1x1 with a real
"muts" axis — MutAxis(name="muts") is live (psum over the size-1 axis,
fold_key at index 0), which exercises exactly the same kernel selection,
shard_map lowering, and Mosaic compilation as a multi-shard mesh; only the
cross-chip ICI traffic itself is out of reach on this machine (the
multi-shard structure is covered by the CPU-mesh interpret tests and the
driver's 8-device dryrun).

Asserts the compiled sweep kernels (resident + stream) and the split-merge
restricted-scan kernel, each under shard_map with a sharded MutAxis, match
the scan impls run under the SAME shard_map bit-for-bit on assignments and
counts (same psummed inputs, same folded randomness).

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/tpu_sharded_parity.py
"""

import numpy as np


def main():
    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    from jax.sharding import PartitionSpec as P

    from bnpc_tpu.config import ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.models import splitmerge as sm_mod
    from bnpc_tpu.models.gibbs import gibbs_sweep, pallas_available
    from bnpc_tpu.models.splitmerge import rg_pallas_available
    from bnpc_tpu.parallel import sharded
    from bnpc_tpu.parallel.axis import MutAxis
    from bnpc_tpu.state import init_state

    assert jax.default_backend() == "tpu", jax.default_backend()

    n, m = 24, 32
    rng = np.random.default_rng(0)
    geno = rng.integers(0, 2, size=(3, m))
    assign = rng.integers(0, 3, size=n)
    data = geno[assign].astype(float)
    data[(data == 1) & (rng.random((n, m)) < 0.2)] = 0
    data[rng.random((n, m)) < 0.1] = np.nan
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.2)
    packed = pack_data(data)
    mesh = sharded.make_mesh(1, 1)

    # The production guards must keep the kernel path for this axis.
    ax_probe = MutAxis(sharded.MUTS)
    assert pallas_available(cfg, ax_probe)
    assert rg_pallas_available(ax_probe, n)

    state_sp = jax.tree.map(
        lambda s: P(*[a for a in s if a != sharded.CHAINS]),
        sharded.state_specs(), is_leaf=lambda x: isinstance(x, P))

    # Keys cross the shard_map boundary as raw uint32 key data (replicated)
    # and are re-wrapped inside, so one compiled program serves all seeds.
    def sweep_fn(impl):
        def body(kd, st, data_local):
            key = jax.random.wrap_key_data(kd)
            ax = MutAxis(sharded.MUTS)
            return gibbs_sweep(key, st, data_local, cfg, ax=ax, impl=impl)

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None), state_sp, sharded.data_specs()),
            out_specs=state_sp,
            check_vma=False,
        ))

    def sm_fn(impl):
        def body(kd, st, data_local):
            key = jax.random.wrap_key_data(kd)
            ax = MutAxis(sharded.MUTS)
            return sm_mod.split_merge(
                key, st, data_local, cfg, 0.9, 3, ax=ax, impl=impl)

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None), state_sp, sharded.data_specs()),
            out_specs=(state_sp, P(None, None)),
            check_vma=False,
        ))

    fns = {name: sweep_fn(name)
           for name in ("scan_cond", "pallas", "pallas_stream")}
    sms = {name: sm_fn(name) for name in ("scan", "pallas")}

    births = accepted = 0
    mismatches = []
    for seed in range(12):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key_data(jax.random.key(1000 + seed))

        want = fns["scan_cond"](key, state, packed)
        asn_want = np.asarray(want.assignment)
        for impl in ("pallas", "pallas_stream"):
            got = fns[impl](key, state, packed)
            if not np.array_equal(asn_want, np.asarray(got.assignment)):
                mismatches.append((impl, seed))
                continue
            np.testing.assert_array_equal(
                np.asarray(want.cluster_size), np.asarray(got.cluster_size))
            live = np.asarray(got.cluster_size) > 0
            np.testing.assert_allclose(
                np.asarray(want.params)[live], np.asarray(got.params)[live],
                rtol=1e-5, atol=1e-5)
        before = np.asarray(state.cluster_size) > 0
        births += int((~before & (np.asarray(want.cluster_size) > 0)).sum())

        sw, cw = sms["scan"](key, state, packed)
        sp_, cp = sms["pallas"](key, state, packed)
        if not np.array_equal(np.asarray(sw.assignment),
                              np.asarray(sp_.assignment)):
            mismatches.append(("splitmerge", seed))
            continue
        np.testing.assert_array_equal(np.asarray(cw), np.asarray(cp))
        accepted += int(np.asarray(cw)[:, 0].sum())

    assert births >= 3, f"only {births} births exercised — raise seeds"
    assert accepted >= 1, "no accepted split-merge exercised the rg kernel"
    assert not mismatches, mismatches
    print(f"tpu_sharded_parity OK: 12 seeds, {births} births, {accepted} "
          "accepted split-merges; sweep (resident + stream) + restricted-"
          "scan kernels compiled inside shard_map match the scan impls")


if __name__ == "__main__":
    main()
