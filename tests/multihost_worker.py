"""Worker process for the real 2-process jax.distributed test.

Launched by tests/test_multihost.py::test_two_process_distributed_run as
``python multihost_worker.py <process_id> <port>``. Each process owns 2
virtual CPU devices; the pair forms a 4-device global mesh over which one
sharded MCMC block runs (1 chain per global device — the unbatched,
kernel-capable shard_map structure of parallel/sharded.make_sharded_block).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bnpc_tpu.parallel import multihost

    # The real wiring under test: jax.distributed.initialize via our shim.
    assert multihost.initialize(
        f"localhost:{port}", num_processes=2, process_id=pid
    ) is True
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bnpc_tpu.config import MCMCConfig, ModelConfig
    from bnpc_tpu.data import pack_data
    from bnpc_tpu.parallel import sharded
    from bnpc_tpu.state import init_state

    n, m = 12, 8
    rng = np.random.default_rng(0)  # identical data on both processes
    data = rng.integers(0, 2, size=(n, m)).astype(float)
    data[rng.random((n, m)) < 0.1] = np.nan
    cfg = ModelConfig(n_cells=n, n_muts=m, k_max=n, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    mcmc_cfg = MCMCConfig(sm_prob=0.4, dpa_prob=0.5, error_prob=0.0,
                          sm_steps=2)
    packed = pack_data(data)

    mesh = sharded.make_mesh(4, 1)  # spans BOTH processes' devices
    n_chains = 4

    keys = jax.random.split(jax.random.key(0), n_chains)
    states_host = jax.vmap(
        lambda k: init_state(k, cfg, packed, mode="random")
    )(keys)
    step_keys_host = jax.vmap(lambda k: jax.random.split(k, 3))(keys)

    # Host values are identical on every process; device_put scatters each
    # process's addressable shards onto the global mesh.
    def put(x, spec):
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    states = jax.tree.map(
        lambda x, s: put(x, s), states_host, sharded.state_specs(),
        is_leaf=lambda x: isinstance(x, P),
    )
    step_keys = jax.device_put(
        jax.random.key_data(step_keys_host),
        NamedSharding(mesh, P("chains", None, None)),
    )
    step_keys = jax.random.wrap_key_data(step_keys)

    block = sharded.make_sharded_block(mesh, cfg, mcmc_cfg, packed)
    out_states, rows = block(states, step_keys)
    jax.block_until_ready(out_states)

    # Each process validates its local (addressable) chain shards.
    ml_local = np.concatenate(
        [np.asarray(s.data) for s in rows.ml.addressable_shards]
    )
    assert ml_local.shape == (2, 3), ml_local.shape
    assert np.isfinite(ml_local).all()

    asn_local = np.concatenate(
        [np.asarray(s.data) for s in out_states.assignment.addressable_shards]
    )
    size_local = np.concatenate(
        [np.asarray(s.data)
         for s in out_states.cluster_size.addressable_shards]
    )
    for c in range(asn_local.shape[0]):
        np.testing.assert_array_equal(
            size_local[c], np.bincount(asn_local[c], minlength=cfg.k_max)
        )

    # A cross-process collective over the mesh proves DCN-style comms work.
    total = jax.jit(
        lambda x: jnp.sum(x),
        out_shardings=NamedSharding(mesh, P()),
    )(rows.ml)
    assert np.isfinite(float(total))

    print(f"MULTIHOST_OK pid={pid} ml_mean={ml_local.mean():.4f}",
          flush=True)


if __name__ == "__main__":
    main()
