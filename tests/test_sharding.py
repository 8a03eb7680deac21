"""Multi-chip sharding on a virtual 8-device CPU mesh (SURVEY.md section 4,
item 5): mutation-axis psum correctness and the full sharded MCMC step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.parallel import sharded
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import init_state

from tests.test_moves import check_state_invariants, make_problem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_ll_matrix_matches_unsharded():
    rng = np.random.default_rng(0)
    n, m, k = 10, 32, 5
    data = rng.integers(0, 2, size=(n, m)).astype(float)
    data[rng.random((n, m)) < 0.2] = np.nan
    theta = np.clip(rng.random((k, m)), 1e-5, 1 - 1e-5).astype(np.float32)

    packed = pack_data(data)
    c1, c0 = lk.log_prob_tables(jnp.asarray(theta), 0.01, 0.2)
    want = np.asarray(lk.ll_matrix(packed, c1, c0))

    mesh = sharded.make_mesh(2, 4)

    def body(data_local, c1_local, c0_local):
        ax = MutAxis(sharded.MUTS)
        return lk.ll_matrix(data_local, c1_local, c0_local, ax)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sharded.data_specs(), P(None, sharded.MUTS),
                  P(None, sharded.MUTS)),
        out_specs=P(None, None),
    ))
    got = np.asarray(fn(packed, c1, c0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_sharded_full_step():
    """Full MCMC step (Gibbs/split-merge + alpha + params + errors) sharded
    over a 2x4 (chains x muts) mesh; padding path exercised (m=30 -> 32)."""
    data, _ = make_problem(n=16, m=30, k_clones=2, seed=9)
    cfg = ModelConfig(n_cells=16, n_muts=30, k_max=16, p=0.25, q=0.25,
                      fp=0.01, fn=0.2, learn_errors=True,
                      fp_sd=0.005, fn_sd=0.05)
    mcmc_cfg = MCMCConfig(sm_prob=0.5, dpa_prob=0.5, error_prob=0.5,
                          sm_steps=2)
    packed = pack_data(data)

    mesh = sharded.make_mesh(2, 4)
    padded, m_pad = sharded.pad_muts(packed, 4)
    assert m_pad == 32

    block = sharded.make_sharded_block(mesh, cfg, mcmc_cfg, padded)

    n_chains = 4
    keys = jax.random.split(jax.random.key(0), n_chains)
    states = jax.vmap(
        lambda k: init_state(k, cfg, packed, mode="random")
    )(keys)
    # Pad parameter columns to the sharded width.
    states = states._replace(
        params=jnp.pad(states.params, [(0, 0), (0, 0), (0, m_pad - 30)],
                       constant_values=0.5)
    )

    step_keys = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
    out_states, rows = block(states, step_keys)
    jax.block_until_ready(out_states)

    ml = np.asarray(rows.ml)
    assert ml.shape == (n_chains, 3)
    assert np.isfinite(ml).all()
    # Chains differ and states remain valid.
    for c in range(n_chains):
        single = jax.tree.map(lambda x: np.asarray(x)[c], out_states)
        from bnpc_tpu.state import CRPState
        st = CRPState(*[np.asarray(x) for x in single])
        assignment = st.assignment
        np.testing.assert_array_equal(
            np.asarray(st.cluster_size),
            np.bincount(assignment, minlength=cfg.k_max),
        )
    assert not np.array_equal(
        np.asarray(out_states.assignment[0]),
        np.asarray(out_states.assignment[1]),
    )


def _chains_mesh_problem(n_chains, seed=11):
    data, _ = make_problem(n=14, m=12, k_clones=2, seed=seed)
    cfg = ModelConfig(n_cells=14, n_muts=12, k_max=14, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    mcmc_cfg = MCMCConfig(sm_prob=0.4, dpa_prob=0.5, error_prob=0.0,
                          sm_steps=2)
    packed = pack_data(data)
    keys = jax.random.split(jax.random.key(seed), n_chains)
    states = jax.vmap(
        lambda k: init_state(k, cfg, packed, mode="random")
    )(keys)
    step_keys = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
    return cfg, mcmc_cfg, packed, states, step_keys


def test_runner_data_committed_to_mesh():
    """The packed data the block pipes receive as a jit ARGUMENT must carry
    the mesh sharding already (parallel/sharded.place_data): an uncommitted
    argument is re-laid-out to the shard_map in_spec sharding on every
    block dispatch — a per-block redistribution of the [n, m] planes on a
    real mesh (round-5 review finding)."""
    from jax.sharding import NamedSharding

    from bnpc_tpu.mcmc import MCMCRunner

    data, _ = make_problem(n=16, m=32, k_clones=2, seed=5)
    cfg = ModelConfig(n_cells=16, n_muts=32, k_max=16, p=0.25, q=0.25,
                      fp=0.01, fn=0.2)
    mcmc_cfg = MCMCConfig(sm_prob=0.4, dpa_prob=0.5, error_prob=0.0,
                          sm_steps=2)
    packed = pack_data(data)

    # Muts-sharded mesh: xm/xm0 split along the mutation axis.
    mesh = sharded.make_mesh(2, 4)
    runner = MCMCRunner(cfg, mcmc_cfg, packed, mesh=mesh)
    want = NamedSharding(mesh, P(None, sharded.MUTS))
    assert runner._sh_data.xm.sharding.is_equivalent_to(want, 2)
    assert runner._sh_data.xm0.sharding.is_equivalent_to(want, 2)

    # Chains-only mesh (virtual 8 CPU devices -> auto chain mesh): data is
    # replicated, but the layout must still be committed to THAT mesh.
    runner2 = MCMCRunner(cfg, mcmc_cfg, packed)
    if runner2._sh_data is not None:
        m2 = runner2._chain_mesh
        want2 = NamedSharding(m2, P(None, None))
        assert runner2._sh_data.xm.sharding.is_equivalent_to(want2, 2)


def test_chains_mesh_local_one_runs_unbatched():
    """Chains sharded 1:1 over the devices: the shard_map body sees a local
    chain count of 1 and runs the kernel-capable UNBATCHED step (VERDICT
    round 2, next-round item 1). Results must equal per-chain unbatched
    scans of the same step function."""
    from bnpc_tpu.mcmc import make_step_fn, resolve_trace_k

    cfg, mcmc_cfg, packed, states, step_keys = _chains_mesh_problem(8)
    mesh = sharded.make_mesh(8, 1)
    block = sharded.make_sharded_block(mesh, cfg, mcmc_cfg, packed)
    out_states, rows = block(states, step_keys)

    trace_k = resolve_trace_k(cfg, mcmc_cfg)
    step = make_step_fn(cfg, mcmc_cfg, packed, trace_k)
    for c in range(8):
        st_c = jax.tree.map(lambda x: x[c], states)
        want_st, want_rows = jax.lax.scan(step, st_c, step_keys[c])
        np.testing.assert_array_equal(
            np.asarray(out_states.assignment[c]),
            np.asarray(want_st.assignment),
        )
        np.testing.assert_allclose(
            np.asarray(rows.ml[c]), np.asarray(want_rows.ml),
            rtol=1e-5, atol=1e-4,
        )


def test_chains_mesh_sequential_matches_vmap_body():
    """Local chain count > 1: the serial (chain-scan, kernel-capable) body
    and the vmapped body consume identical keys and must produce identical
    chains."""
    cfg, mcmc_cfg, packed, states, step_keys = _chains_mesh_problem(8, seed=5)
    mesh = sharded.make_mesh(4, 1)  # 8 chains -> 2 per device
    blk_seq = sharded.make_sharded_block(mesh, cfg, mcmc_cfg, packed,
                                         chain_exec="sequential")
    blk_vmap = sharded.make_sharded_block(mesh, cfg, mcmc_cfg, packed,
                                          chain_exec="vmap")
    st_s, rows_s = blk_seq(states, step_keys)
    st_v, rows_v = blk_vmap(states, step_keys)
    np.testing.assert_array_equal(np.asarray(st_s.assignment),
                                  np.asarray(st_v.assignment))
    np.testing.assert_allclose(np.asarray(rows_s.ml), np.asarray(rows_v.ml),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_s.params),
                               np.asarray(st_v.params), rtol=1e-5, atol=1e-5)


def test_sharded_lazy_kernel_matches_sharded_scan():
    """The lazy Pallas sweep under a SHARDED MutAxis (interpret mode): Z and
    birth columns are psummed BEFORE the kernel, so inside the same
    shard_map the kernel sweep must match the scan sweep bit-for-bit (they
    consume identical hoisted randomness and identical psummed matrices).
    Covers both lazy tiers (resident and chunk-streaming)."""
    from bnpc_tpu.models.gibbs import gibbs_sweep

    data, _ = make_problem(n=24, m=32, k_clones=2, seed=3)
    cfg = ModelConfig(n_cells=24, n_muts=32, k_max=24, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    mesh = sharded.make_mesh(1, 8)

    def run(impl, seed):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key(100 + seed)

        def body(st, data_local):
            ax = MutAxis(sharded.MUTS)
            return gibbs_sweep(key, st, data_local, cfg, ax=ax, impl=impl,
                               interpret=True)

        specs = jax.tree.map(
            lambda s: P(*[a for a in s if a != sharded.CHAINS]),
            sharded.state_specs(), is_leaf=lambda x: isinstance(x, P))
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, sharded.data_specs()),
            out_specs=specs,
        )
        return fn(state, packed)

    births = 0
    for seed in range(4):
        want = run("scan_cond", seed)
        for impl in ("pallas", "pallas_stream"):
            got = run(impl, seed)
            np.testing.assert_array_equal(np.asarray(want.assignment),
                                          np.asarray(got.assignment))
            np.testing.assert_array_equal(np.asarray(want.cluster_size),
                                          np.asarray(got.cluster_size))
            live = np.asarray(got.cluster_size) > 0
            np.testing.assert_allclose(np.asarray(want.params)[live],
                                       np.asarray(got.params)[live],
                                       rtol=1e-6)
            check_state_invariants(got, cfg)
        start = init_state(jax.random.key(seed), cfg, packed, mode="random")
        was_free = np.asarray(start.cluster_size) == 0
        births += int((was_free & (np.asarray(want.cluster_size) > 0)).sum())
    assert births >= 1, "no birth exercised the sharded patch path"


def test_sharded_rg_kernel_matches_sharded_scan(monkeypatch):
    """The split-merge restricted-scan Pallas kernel under a SHARDED MutAxis
    (interpret mode): every kernel input is replicated across the mutation
    shards before the kernel (dz comes from the psummed [n, 2] launch
    log-lik), so inside the same shard_map the kernel move must match the
    scan move bit-for-bit — the round-5 enablement that keeps split-merge on
    the kernel path for muts-sharded meshes (VERDICT r4 item 4)."""
    import functools

    from bnpc_tpu.models import splitmerge as sm_mod
    from bnpc_tpu.ops import pallas_rg

    monkeypatch.setattr(
        pallas_rg, "rg_scan",
        functools.partial(pallas_rg.rg_scan, interpret=True),
    )

    data, _ = make_problem(n=24, m=32, k_clones=3, seed=7)
    cfg = ModelConfig(n_cells=24, n_muts=32, k_max=24, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    mesh = sharded.make_mesh(1, 8)

    def run(impl, seed):
        state = init_state(jax.random.key(seed), cfg, packed, mode="random")
        key = jax.random.key(200 + seed)

        def body(st, data_local):
            ax = MutAxis(sharded.MUTS)
            new_st, counts = sm_mod.split_merge(
                key, st, data_local, cfg, 0.75, 3, ax=ax, impl=impl)
            return new_st, counts

        specs = jax.tree.map(
            lambda s: P(*[a for a in s if a != sharded.CHAINS]),
            sharded.state_specs(), is_leaf=lambda x: isinstance(x, P))
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, sharded.data_specs()),
            out_specs=(specs, P(None, None)),
            check_vma=False,
        )
        return fn(state, packed)

    accepted = 0
    for seed in range(4):
        want, counts_want = run("scan", seed)
        got, counts_got = run("pallas", seed)
        np.testing.assert_array_equal(np.asarray(want.assignment),
                                      np.asarray(got.assignment))
        np.testing.assert_array_equal(np.asarray(want.cluster_size),
                                      np.asarray(got.cluster_size))
        np.testing.assert_array_equal(np.asarray(counts_want),
                                      np.asarray(counts_got))
        live = np.asarray(got.cluster_size) > 0
        np.testing.assert_allclose(np.asarray(want.params)[live],
                                   np.asarray(got.params)[live], rtol=1e-6)
        check_state_invariants(got, cfg)
        accepted += int(np.asarray(counts_want)[:, 0].sum())
    assert accepted >= 1, "no accepted move exercised the sharded rg kernel"
