"""Lugsail PSRF vs an independent oracle rendering, estimator sanity."""

import numpy as np

from bnpc_tpu import diagnostics, estimators
from tests import oracle


def test_lugsail_matches_oracle():
    rng = np.random.default_rng(0)
    chains = [(rng.normal(size=500) + 0.1 * c, 50) for c in range(4)]
    got = diagnostics.lugsail_psrf(chains)
    want = oracle.lugsail_psrf(chains)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_lugsail_short_chain_is_inf():
    assert diagnostics.lugsail_psrf([(np.arange(5.0), 0)]) == np.inf
    # 9 samples is the minimum
    assert np.isfinite(
        diagnostics.lugsail_psrf([(np.random.default_rng(1).normal(size=9),
                                   0)])
    )


def test_lugsail_converged_chains_near_one():
    rng = np.random.default_rng(2)
    chains = [(rng.normal(size=2000), 0) for _ in range(4)]
    psrf = diagnostics.lugsail_psrf(chains)
    assert 0.99 < psrf < 1.05


def test_lugsail_cutoff_monotone():
    assert diagnostics.lugsail_cutoff(0.1) > diagnostics.lugsail_cutoff(0.05)


def test_coclustering_similarity():
    assignments = np.array([
        [0, 0, 1, 1],
        [0, 0, 1, 2],
        [3, 0, 1, 1],
    ])
    sim = estimators.coclustering_similarity(assignments)
    np.testing.assert_allclose(sim[0, 1], 2 / 3)
    np.testing.assert_allclose(sim[2, 3], 2 / 3)
    np.testing.assert_allclose(sim[0, 2], 0.0)
    np.testing.assert_allclose(np.diag(sim), 1.0)


def test_mpear_recovers_clear_consensus():
    rng = np.random.default_rng(3)
    true = np.array([0] * 8 + [1] * 8 + [2] * 8)
    samples = []
    for _ in range(60):
        # relabel clusters randomly per sample and flip a couple of cells
        perm = rng.permutation(6)[:3]
        s = perm[true]
        flip = rng.integers(0, true.size, size=1)
        s[flip] = rng.integers(0, 6)
        samples.append(s)
    assign = estimators.mpear_assignment(np.array(samples))
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(true, assign) > 0.9


def test_hamming_dist_transpose_disambiguation():
    a = np.array([[1, 0, 1], [0, 1, 1]])
    assert estimators.hamming_dist(a, a) == 0
    assert estimators.hamming_dist(a, 1 - a) == a.size
    sq = np.array([[1, 0], [0, 1]])
    assert estimators.hamming_dist(sq, sq.T) == 0


def test_point_estimator_picks_best_step():
    rng = np.random.default_rng(4)
    steps, n, k, m = 20, 6, 4, 5
    result = {
        "ML": np.linspace(0, 10, steps),          # best at last step
        "MAP": np.linspace(10, 0, steps),         # best at first step
        "DP_alpha": rng.random(steps),
        "FN": rng.random(steps), "FP": rng.random(steps),
        "assignments": rng.integers(0, 3, size=(steps, n)),
        "params": rng.random((steps - 4, k, m)),
        "burn_in": 4,
    }
    data = rng.integers(0, 2, size=(n, m)).astype(float)
    lat_ml = estimators.latents_point([result], "ML", data)[0]
    assert lat_ml["step"] == steps - 1
    lat_map = estimators.latents_point([result], "MAP", data)[0]
    assert lat_map["step"] == 4  # first post-burn-in step


def test_effective_sample_size():
    rng = np.random.default_rng(0)
    iid = rng.normal(size=4000)
    ess_iid = diagnostics.effective_sample_size(iid)
    assert ess_iid > 2500  # iid -> ESS near n

    # AR(1) with strong correlation -> much smaller ESS.
    rho, n = 0.95, 4000
    ar = np.empty(n)
    ar[0] = 0.0
    for i in range(1, n):
        ar[i] = rho * ar[i - 1] + rng.normal()
    ess_ar = diagnostics.effective_sample_size(ar)
    # theoretical ESS ~ n (1-rho)/(1+rho) ~ 103
    assert 20 < ess_ar < 500, ess_ar
    assert ess_ar < ess_iid / 5
