"""Multi-host (DCN) execution support.

The sampler's communication pattern is ideal for multi-host scaling: chains
never talk during sampling (SURVEY.md §2.3), so a multi-host mesh simply
spreads the chain axis across hosts' chips — collectives only appear if the
mutation axis is also sharded (psum over ICI within each host's slice).

This module is a thin, documented wiring of `jax.distributed`. It is
exercised FOR REAL by tests/test_multihost.py::test_two_process_distributed_run:
two OS processes initialize against a localhost coordinator (CPU backend,
Gloo collectives), build a global mesh spanning both processes' devices,
and run a sharded MCMC block with a cross-process reduction.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Returns True when running multi-process; False for single-host runs
    (no-op). Call before any other JAX API, then build the mesh over
    `jax.devices()` as usual — `parallel.sharded.make_mesh` and
    `MCMCRunner._maybe_shard` work unchanged on the global device list.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1
