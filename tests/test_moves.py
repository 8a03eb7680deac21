"""Sampler move kernels: invariants and statistical behaviour."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bnpc_tpu.config import ModelConfig
from bnpc_tpu.data import pack_data
from bnpc_tpu.models.gibbs import gibbs_sweep
from bnpc_tpu.models.splitmerge import split_merge
from bnpc_tpu.models.updates import (
    update_dp_alpha, update_error_rates, update_parameters,
)
from bnpc_tpu.state import cluster_stats, init_state


def make_problem(n=30, m=24, k_clones=3, seed=0, missing=0.1):
    """Simulated clone-structured noisy binary matrix."""
    rng = np.random.default_rng(seed)
    genotypes = rng.integers(0, 2, size=(k_clones, m))
    true_assign = rng.integers(0, k_clones, size=n)
    data = genotypes[true_assign].astype(float)
    # Noise: FN 10%, FP 1%
    flip_fn = (data == 1) & (rng.random((n, m)) < 0.1)
    flip_fp = (data == 0) & (rng.random((n, m)) < 0.01)
    data[flip_fn] = 0
    data[flip_fp] = 1
    data[rng.random((n, m)) < missing] = np.nan
    return data, true_assign


def check_state_invariants(state, cfg):
    assignment = np.asarray(state.assignment)
    size = np.asarray(state.cluster_size)
    assert (assignment >= 0).all() and (assignment < cfg.k_max).all()
    np.testing.assert_array_equal(
        size, np.bincount(assignment, minlength=cfg.k_max)
    )
    params = np.asarray(state.params)
    assert (params >= 1e-5 - 1e-7).all() and (params <= 1 - 1e-5 + 1e-7).all()


@pytest.fixture
def setup():
    data, true_assign = make_problem()
    cfg = ModelConfig(n_cells=30, n_muts=24, k_max=30, p=0.25, q=0.25,
                      fp=0.01, fn=0.1)
    packed = pack_data(data)
    key = jax.random.key(42)
    state = init_state(key, cfg, packed, mode="random")
    return data, true_assign, cfg, packed, state


def test_init_modes(setup):
    data, _, cfg, packed, _ = setup
    for mode in ["random", "together", "separate"]:
        st = init_state(jax.random.key(1), cfg, packed, mode=mode)
        check_state_invariants(st, cfg)
    st = init_state(jax.random.key(1), cfg, packed,
                    assign=[0, 1] * 15)
    check_state_invariants(st, cfg)
    assert int(st.n_clusters) == 2


def test_gibbs_sweep_invariants(setup):
    _, _, cfg, packed, state = setup
    sweep = jax.jit(lambda k, s: gibbs_sweep(k, s, packed, cfg))
    for i in range(5):
        state = sweep(jax.random.key(i), state)
        check_state_invariants(state, cfg)


def test_gibbs_recovers_clones(setup):
    """After some sweeps + param updates, ARI vs truth should be high."""
    from sklearn.metrics import adjusted_rand_score

    data, true_assign, cfg, packed, state = setup

    @jax.jit
    def step(key, state):
        k1, k2 = jax.random.split(key)
        state = gibbs_sweep(k1, state, packed, cfg)
        n1, n0 = cluster_stats(packed, state.assignment, cfg.k_max)
        state, _, _ = update_parameters(k2, state, n1, n0, cfg)
        return state

    for i in range(40):
        state = step(jax.random.key(100 + i), state)
    ari = adjusted_rand_score(true_assign, np.asarray(state.assignment))
    assert ari > 0.85, f"ARI {ari}"


def test_update_parameters_moves_toward_truth(setup):
    """Single known cluster: MH updates should pull params toward the
    empirical mutation frequencies."""
    data, _, cfg, packed, _ = setup
    state = init_state(jax.random.key(0), cfg, packed, mode="together")
    n1, n0 = cluster_stats(packed, state.assignment, cfg.k_max)
    freq = np.asarray(n1[0] / (n1[0] + n0[0]))

    key = jax.random.key(7)
    upd = jax.jit(lambda k, s: update_parameters(k, s, n1, n0, cfg))
    declined_total = 0
    for i in range(60):
        key, sub = jax.random.split(key)
        state, dec, acc = upd(sub, state)
        declined_total += int(dec)
    est = np.asarray(state.params[0])
    assert np.abs(est - freq).mean() < 0.15
    # Some but not all proposals decline (sampler health).
    assert 0 < declined_total < 60 * cfg.n_muts


def test_update_dp_alpha_distribution(setup):
    _, _, cfg, packed, state = setup
    upd = jax.jit(lambda k, s: update_dp_alpha(k, s, cfg))
    vals = []
    for i in range(200):
        state = upd(jax.random.key(i), state)
        vals.append(float(state.dp_alpha))
    vals = np.array(vals)
    assert (vals >= 1.0).all()
    assert vals.std() > 0.01  # actually moving


def test_update_error_rates(setup):
    data, _, cfg0, packed, _ = setup
    cfg = ModelConfig(n_cells=30, n_muts=24, k_max=30, p=0.25, q=0.25,
                      fp=0.001, fn=0.25, learn_errors=True,
                      fp_sd=0.0005, fn_sd=0.05)
    state = init_state(jax.random.key(0), cfg, packed, mode="together")
    n1, n0 = cluster_stats(packed, state.assignment, cfg.k_max)
    upd = jax.jit(lambda k, s: update_error_rates(k, s, n1, n0, cfg))
    fps, fns = [], []
    for i in range(100):
        state, fp_acc, fn_acc = upd(jax.random.key(i), state)
        fps.append(float(state.fp))
        fns.append(float(state.fn))
    assert all(0 < v < 1 for v in fps + fns)
    assert np.std(fns) > 0  # FN rate is actually resampled


def test_split_merge_invariants(setup):
    _, _, cfg, packed, state = setup
    sm = jax.jit(lambda k, s: split_merge(k, s, packed, cfg, 0.75, 3))
    accepts = 0
    for i in range(30):
        state, counts = sm(jax.random.key(i), state)
        check_state_invariants(state, cfg)
        counts = np.asarray(counts)
        assert counts.sum() == 1  # exactly one proposal per call
        accepts += counts[:, 0].sum()
    # With a random init some proposals should be accepted.
    assert accepts >= 1


def test_split_merge_forced_split_from_one_cluster(setup):
    _, _, cfg, packed, _ = setup
    state = init_state(jax.random.key(3), cfg, packed, mode="together")
    sm = jax.jit(lambda k, s: split_merge(k, s, packed, cfg, 0.75, 3))
    for i in range(20):
        state, counts = sm(jax.random.key(50 + i), state)
        check_state_invariants(state, cfg)
        counts = np.asarray(counts)
        if int(np.asarray(state.n_clusters)) == 1:
            # From K=1 only splits can be proposed.
            assert counts[1].sum() == 0
