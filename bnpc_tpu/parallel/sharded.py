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

from functools import partial

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


def make_sharded_block(mesh: Mesh, cfg: ModelConfig, mcmc_cfg: MCMCConfig,
                       data: PackedData):
    """Jitted (states, step_keys) -> (states, TraceRows) over the mesh.

    `data` must already be padded with :func:`pad_muts` to the mesh's
    mutation-shard count; states carry a leading chain axis divisible by the
    chain-shard count. Trace rows come back with the full (padded) mutation
    axis on the params plane — slice to the real m on the host.
    """
    n_mut_shards = mesh.shape[MUTS]
    m_pad = data.xm.shape[1]
    m_real = cfg.n_muts
    import dataclasses

    cfg_pad = (
        cfg if m_pad == m_real
        else dataclasses.replace(cfg, n_muts=m_pad)
    )
    trace_k = resolve_trace_k(cfg, mcmc_cfg)

    def body(data_local: PackedData, states: CRPState, keys):
        ax = MutAxis(
            name=MUTS,
            mask=(
                _local_mut_mask(m_pad, m_real, n_mut_shards)
                if m_pad != m_real else None
            ),
        )
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
    # check_vma=False: scalar scan carries inside the kernels start as
    # replicated literals and become chain-varying; the strict
    # varying-manual-axes tracker rejects that. Replication of the scalar
    # outputs is guaranteed by construction (psums + replicated keys).
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(data_specs(), state_specs(), P(CHAINS, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(partial(sharded, data))


def shard_chain_states(mesh: Mesh, states: CRPState, keys):
    """Place chain-batched states on the mesh's chain axis (DP only)."""
    st = jax.device_put(
        states,
        jax.tree.map(lambda s: NamedSharding(mesh, s), state_specs(),
                     is_leaf=lambda x: isinstance(x, P)),
    )
    ks = jax.device_put(keys, NamedSharding(mesh, P(CHAINS)))
    return st, ks
