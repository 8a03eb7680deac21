"""Multi-chip execution: chains x mutations sharding via shard_map.

Two composable levels (SURVEY.md section 2.3):

  * **Chain data-parallelism** — chains are a batch axis with zero
    cross-chain communication during sampling (the reference runs one chain
    per process, libs/MCMC.py:113-120); sharding the batch axis over the mesh
    gives linear scaling for free.
  * **Mutation-axis model parallelism** — the data planes, parameter columns
    and every per-mutation random draw live shard-local; the only
    communication is one `psum` per likelihood reduction, riding the ICI.
    This is what makes 100k-mutation matrices tractable: the O(n * k * m)
    likelihood work and the O(k * m) parameter state are both split m-ways.

The sampler kernels themselves are shard-agnostic — they take a
:class:`bnpc_tpu.parallel.axis.MutAxis` that turns the m-axis reductions into
psums — so the sharded step is literally the single-chip step wrapped in
`shard_map`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.mcmc import make_step_fn, resolve_trace_k
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import CRPState

CHAINS = "chains"
MUTS = "muts"


def make_mesh(n_chain_shards: int, n_mut_shards: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_chain_shards * n_mut_shards
    if devices.size < need:
        raise ValueError(
            f"need {need} devices for a {n_chain_shards}x{n_mut_shards} mesh,"
            f" have {devices.size}"
        )
    grid = devices[:need].reshape(n_chain_shards, n_mut_shards)
    return Mesh(grid, (CHAINS, MUTS))


def pad_muts(data: PackedData, shards: int) -> tuple[PackedData, int]:
    """Pad the mutation axis to a multiple of `shards` with unobserved
    (all-zero-mask) columns; returns (padded data, padded m)."""
    m = data.xm.shape[1]
    m_pad = -(-m // shards) * shards
    if m_pad == m:
        return data, m
    pad = [(0, 0), (0, m_pad - m)]
    return PackedData(
        xm=jnp.pad(data.xm, pad),
        xm0=jnp.pad(data.xm0, pad),
        rs1=data.rs1,
        rs0=data.rs0,
    ), m_pad


def _local_mut_mask(m_pad: int, m_real: int, n_shards: int) -> jnp.ndarray:
    """[m_local] validity mask for this shard's mutation columns."""
    m_local = m_pad // n_shards
    start = jax.lax.axis_index(MUTS) * m_local
    cols = start + jnp.arange(m_local)
    return (cols < m_real).astype(jnp.float32)


def state_specs() -> CRPState:
    """PartitionSpecs for a chain-batched CRPState pytree."""
    return CRPState(
        assignment=P(CHAINS, None),
        params=P(CHAINS, None, MUTS),
        cluster_size=P(CHAINS, None),
        dp_alpha=P(CHAINS),
        fp=P(CHAINS),
        fn=P(CHAINS),
    )


def data_specs() -> PackedData:
    return PackedData(
        xm=P(None, MUTS), xm0=P(None, MUTS), rs1=P(None), rs0=P(None)
    )


def place_data(mesh: Mesh, data: PackedData) -> PackedData:
    """Commit the packed data planes to the mesh's data sharding ONCE.

    The block functions take the data as a jit ARGUMENT, not a closure
    constant (a closed-over array is baked into the lowered program — see
    make_sharded_block). But an argument with no committed layout is
    re-laid-out to the shard_map in_spec sharding on EVERY call, a
    per-block redistribution of the whole [n, m] planes on a real mesh.
    Placing them once here makes every subsequent call a no-op layout
    match.
    """
    specs = data_specs()
    if MUTS not in mesh.axis_names:
        specs = _drop_muts(specs)
    return jax.device_put(
        data,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda x: isinstance(x, P)),
    )


def _drop_muts(specs):
    """Replace the MUTS mesh axis with None in a pytree of PartitionSpecs
    (for meshes that have no mutation axis)."""
    return jax.tree.map(
        lambda s: P(*[None if a == MUTS else a for a in s]),
        specs, is_leaf=lambda x: isinstance(x, P),
    )


def make_sharded_block(mesh: Mesh, cfg: ModelConfig, mcmc_cfg: MCMCConfig,
                       data: PackedData, chain_exec: str = "auto"):
    """Jitted (states, step_keys) -> (states, TraceRows) over the mesh.

    `data` must already be padded with :func:`pad_muts` to the mesh's
    mutation-shard count; states carry a leading chain axis divisible by the
    chain-shard count. Trace rows come back with the full (padded) mutation
    axis on the params plane — slice to the real m on the host.

    Per-device chain execution (`chain_exec`): the shard_map body sees the
    LOCAL chain shard, so when the fused Pallas kernels are available on this
    backend (TPU, unsharded mutation axis — models/gibbs.pallas_available)
    the chains are run UNBATCHED — directly for a local count of 1 (chains
    sharded 1:1 over chips, the natural mesh), else serially via a lax.scan
    over the local chain axis — so every chip takes the fused-kernel fast
    path instead of the vmapped scan fallback (measured 985 vs 254 total
    chain-steps/s at 4 x 1,000 x 100 on one v5e chip). "vmap" forces the
    batched body, "sequential" forces the serial one; "auto" picks
    sequential when the kernels are available, the local count is 1, or the
    state is large (same rule as MCMCRunner.chain_exec).
    """
    have_muts = MUTS in mesh.axis_names
    n_mut_shards = mesh.shape[MUTS] if have_muts else 1
    m_pad = data.xm.shape[1]
    m_real = cfg.n_muts
    import dataclasses

    cfg_pad = (
        cfg if m_pad == m_real
        else dataclasses.replace(cfg, n_muts=m_pad)
    )
    trace_k = resolve_trace_k(cfg, mcmc_cfg)

    def body(data_local: PackedData, states: CRPState, keys):
        # A size-1 (or absent) mutation axis needs no collectives; an
        # unsharded MutAxis also unlocks the fused Pallas kernels.
        if n_mut_shards > 1:
            ax = MutAxis(
                name=MUTS,
                mask=(
                    _local_mut_mask(m_pad, m_real, n_mut_shards)
                    if m_pad != m_real else None
                ),
            )
        else:
            ax = MutAxis()

        n_local = states.assignment.shape[0]
        if chain_exec == "auto":
            from bnpc_tpu.models.gibbs import pallas_available

            sequential = (
                n_local == 1
                or pallas_available(cfg_pad, ax)
                or cfg.n_cells * cfg.k_max >= 600_000
            )
        else:
            sequential = chain_exec == "sequential"

        if sequential:
            step = make_step_fn(cfg_pad, mcmc_cfg, data_local, trace_k,
                                ax=ax, gibbs_impl="auto_single")

            if n_local == 1:
                st1 = jax.tree.map(lambda x: x[0], states)
                st1, rows1 = jax.lax.scan(step, st1, keys[0])
                return (jax.tree.map(lambda x: x[None], st1),
                        jax.tree.map(lambda x: x[None], rows1))

            # Serial per-chain execution: scan over the LOCAL chain axis,
            # each iteration running one chain's whole block unbatched (the
            # chain body is traced/compiled once).
            def one_chain(_, st_keys):
                st, chain_keys = st_keys
                st, rows = jax.lax.scan(step, st, chain_keys)
                return None, (st, rows)

            _, (states, rows) = jax.lax.scan(one_chain, None, (states, keys))
            return states, rows

        step = make_step_fn(cfg_pad, mcmc_cfg, data_local, trace_k, ax=ax)

        def one_chain(state, chain_keys):
            return jax.lax.scan(step, state, chain_keys)

        return jax.vmap(one_chain)(states, keys)

    from bnpc_tpu.mcmc import TraceRow

    out_specs = (
        state_specs(),
        TraceRow(
            ml=P(CHAINS, None), map_=P(CHAINS, None),
            dp_alpha=P(CHAINS, None), fp=P(CHAINS, None), fn=P(CHAINS, None),
            assignment=P(CHAINS, None, None),
            params=P(CHAINS, None, None, MUTS),
            mh_counts=P(CHAINS, None, None, None),
        ),
    )
    in_specs = (data_specs(), state_specs(), P(CHAINS, None))
    if not have_muts:
        in_specs = _drop_muts(in_specs)
        out_specs = _drop_muts(out_specs)
    # check_vma=False: scalar scan carries inside the kernels start as
    # replicated literals and become chain-varying; the strict
    # varying-manual-axes tracker rejects that. Replication of the scalar
    # outputs is guaranteed by construction (psums + replicated keys).
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    # Data rides through the jit boundary as an ARGUMENT (not a closure):
    # closed-over concrete arrays are embedded in the lowered program as
    # constants, which ships the whole [n, m] matrix in every compile
    # request and recompiles per dataset (see mcmc.MCMCRunner pipes).
    # Committed to the mesh sharding ONCE so calls don't re-lay it out.
    placed = place_data(mesh, data)

    def block(states, keys):
        return jitted(placed, states, keys)

    # Un-jitted, data-first body for callers that fold this block into
    # their own jitted pipeline (mcmc.MCMCRunner._pipe_sharded).
    block.raw = sharded
    return block


def shard_chain_states(mesh: Mesh, states: CRPState, keys):
    """Place chain-batched states on the mesh's chain axis (DP only)."""
    st = jax.device_put(
        states,
        jax.tree.map(lambda s: NamedSharding(mesh, s), state_specs(),
                     is_leaf=lambda x: isinstance(x, P)),
    )
    ks = jax.device_put(keys, NamedSharding(mesh, P(CHAINS)))
    return st, ks
