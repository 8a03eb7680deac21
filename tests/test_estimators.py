"""Vectorized consensus_genotypes == the reference's per-step loop semantics.

The oracle below is a direct transliteration of the loop algorithm
(libs/utils.py:146-192 semantics, as shipped in round 1); the shipped
implementation is vectorized over steps and must agree to float tolerance on
every branch (criteria 1+2, criterion-1 fallback, weighted-average fallback),
and must refuse traces whose live-cluster count exceeds the trace capacity.
"""

import numpy as np
import pytest

from bnpc_tpu import estimators as est


def _loop_consensus_params(assignments, params_full, assign):
    steps = assignments.shape[0]
    clusters = np.unique(assign)
    params = np.zeros((clusters.size, params_full.shape[2]))
    for ci, cluster in enumerate(clusters):
        member = assign == cluster
        cells = np.nonzero(member)[0]
        others = np.nonzero(~member)[0]
        sub = assignments[:, cells]
        if cells.size == 1:
            same_cluster = np.ones(steps, dtype=bool)
        else:
            same_cluster = (sub == sub[:, [0]]).all(axis=1)
        cl_ids = np.array([np.argmax(np.bincount(row)) for row in sub])
        other_ids = assignments[:, others]
        no_others = np.array([
            cl_ids[s] not in other_ids[s] for s in range(steps)
        ])
        if same_cluster.any():
            use = same_cluster & no_others
            step_idx = np.nonzero(use if use.any() else same_cluster)[0]
            for s in step_idx:
                all_ids = np.sort(
                    np.append(np.unique(other_ids[s]), cl_ids[s])
                )
                rnk = int(np.searchsorted(all_ids, cl_ids[s]))
                params[ci] += params_full[s][rnk]
            params[ci] /= step_idx.size
        else:
            for s in range(steps):
                ids_all = np.unique(assignments[s])
                ids_here, cnt = np.unique(sub[s], return_counts=True)
                ranks = np.nonzero(np.isin(ids_all, ids_here))[0]
                params[ci] += cnt @ params_full[s][ranks]
            params[ci] /= steps * cells.size
    return params


def _make_trace(seed, steps=40, n=18, k_ids=7, capacity=8, m=6,
                churn=0.3):
    """A synthetic posterior trace with compacted parameter rows."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, k_ids, n)
    assignments = np.empty((steps, n), dtype=np.int64)
    for s in range(steps):
        row = base.copy()
        flip = rng.random(n) < churn
        row[flip] = rng.integers(0, k_ids, int(flip.sum()))
        assignments[s] = row
    params_full = np.zeros((steps, capacity, m), dtype=np.float64)
    for s in range(steps):
        n_live = np.unique(assignments[s]).size
        params_full[s, :n_live] = rng.random((n_live, m))
    return assignments, params_full


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_matches_loop(seed):
    assignments, params_full = _make_trace(seed)
    assign, geno = est.consensus_genotypes(assignments, params_full)
    expected = _loop_consensus_params(assignments, params_full, assign)
    got = np.asarray(geno).T  # [cells, m] expanded per cell
    want = expected[np.searchsorted(np.unique(assign), assign)]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_weighted_fallback_branch():
    # Split every consensus cluster across two sampled ids in every sample
    # so criterion 1 never holds and the weighted average kicks in.
    rng = np.random.default_rng(9)
    steps, n, m, capacity = 12, 10, 4, 10
    assignments = np.empty((steps, n), dtype=np.int64)
    for s in range(steps):
        # cells 0-4 always split between ids {0,1}; cells 5-9 between {2,3}
        assignments[s, :5] = rng.permutation([0, 0, 0, 1, 1])
        assignments[s, 5:] = rng.permutation([2, 2, 3, 3, 3])
    params_full = np.zeros((steps, capacity, m))
    for s in range(steps):
        params_full[s, :4] = rng.random((4, m))
    assign, geno = est.consensus_genotypes(assignments, params_full)
    expected = _loop_consensus_params(assignments, params_full, assign)
    got = np.asarray(geno).T
    want = expected[np.searchsorted(np.unique(assign), assign)]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_capacity_guard():
    assignments, params_full = _make_trace(5, k_ids=9, capacity=12, n=30)
    # Ensure some sample really uses 9 ids, more than the sliced capacity.
    assignments[0, :9] = np.arange(9)
    with pytest.raises(ValueError, match="trace capacity"):
        est.consensus_genotypes(assignments, params_full[:, :5])


def test_mpear_landmark_path_matches_exact(monkeypatch):
    """The scalable landmark MPEAR path (VERDICT round 2, next-round item 4)
    recovers the same consensus clustering as the exact full-matrix path on
    separable data: the landmark tree only generates candidate cuts; the
    winner is picked by the same exact device-side score."""
    rng = np.random.default_rng(7)
    n, steps, k = 300, 40, 5
    base = np.repeat(np.arange(k), n // k)
    a = np.tile(base, (steps, 1))
    flip = rng.random((steps, n)) < 0.03  # posterior churn
    a[flip] = rng.integers(0, k, int(flip.sum()))

    exact = est.mpear_assignment(a, max_exact=n)
    monkeypatch.setenv("BNPC_TPU_MPEAR_LANDMARKS", "90")
    landmark = est.mpear_assignment(a, max_exact=10)

    assert np.unique(exact).size == k
    assert est.ari(landmark, exact) == 1.0


def test_batched_mpear_scores_match_reference_formula():
    rng = np.random.default_rng(3)
    import jax.numpy as jnp
    from scipy.spatial.distance import squareform

    n = 40
    a = rng.integers(0, 5, (30, n))
    sim = est.coclustering_similarity(a)
    labels = np.stack([
        rng.integers(0, k, n) for k in (2, 3, 5, 8)
    ], axis=1)
    got = est._mpear_scores_batch(jnp.asarray(sim, jnp.float32), labels)
    cond = squareform(sim, checks=False)
    want = np.array([
        est._mpear_score(cond, labels[:, j]) for j in range(labels.shape[1])
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pair_counting_mpear_scores_match_reference_formula():
    """The matrix-free pair-counting scorer (the 50k-cell path) computes
    the SAME exact MPEAR scores as the [n, n]-matrix formulations."""
    rng = np.random.default_rng(11)
    import jax.numpy as jnp
    from scipy.spatial.distance import squareform

    n = 40
    a = rng.integers(0, 5, (30, n))
    labels = np.stack([
        rng.integers(0, k, n) for k in (2, 3, 5, 8)
    ], axis=1)
    got = est._mpear_scores_pairs(a, labels)

    sim = est.coclustering_similarity(a)
    cond = squareform(sim, checks=False)
    want = np.array([
        est._mpear_score(cond, labels[:, j]) for j in range(labels.shape[1])
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    batch = est._mpear_scores_batch(jnp.asarray(sim, jnp.float32), labels)
    np.testing.assert_allclose(got, batch, rtol=1e-5, atol=1e-6)


def test_contingency_device_matches_bincount_oracle():
    """Device contingency tables equal the joint host bincount."""
    rng = np.random.default_rng(9)
    steps, n, n_k, k_ids = 17, 61, 4, 7
    a = rng.integers(0, k_ids, (steps, n))
    labels = rng.integers(0, n_k, n)
    got = est._contingency_device(a, labels)

    want = np.zeros((steps, n_k, k_ids), dtype=np.int64)
    for s in range(steps):
        for i in range(n):
            want[s, labels[i], a[s, i]] += 1
    np.testing.assert_array_equal(got, want)


def test_sim_to_cols_matches_full_matrix():
    """[n, L] column-block similarity equals the [:, cols] slice of the
    full co-clustering matrix."""
    rng = np.random.default_rng(4)
    a = rng.integers(0, 6, (25, 50))
    cols = np.array([0, 7, 13, 49])
    full = est.coclustering_similarity(a)
    block = np.asarray(est._sim_to_cols_device(a, cols))
    np.testing.assert_allclose(block, full[:, cols], rtol=1e-6, atol=1e-6)
