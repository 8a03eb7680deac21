"""Posterior post-processing: MPEAR consensus, ML/MAP point estimates, metrics.

Reference: libs/utils.py:49-282. The O(steps * n^2) co-clustering accumulation
(libs/utils.py:90-97) runs on-device as chunked broadcast comparisons; the
small n x n hierarchical clustering stays on the host (scipy), as does the
genotype-averaging logic of the paper's section 2.3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.cluster.hierarchy import cut_tree, linkage
from scipy.spatial.distance import squareform
from scipy.special import binom
from sklearn.metrics import adjusted_rand_score, v_measure_score

EPSILON = float(np.finfo(np.float64).resolution)


def check_beta_params(mean: float, var: float) -> bool:
    """Whether (mean, var) are attainable by a Beta distribution
    (reference: libs/utils.py:31-42)."""
    return mean > 0.5 * (1 - (1 - 4 * var) ** 0.5)


# ---------------------------------------------------------------------------
# Clustering metrics (libs/utils.py:49-72)
# ---------------------------------------------------------------------------


def v_measure(pred, true) -> float:
    return float(v_measure_score(true, pred))


def ari(pred, true) -> float:
    return float(adjusted_rand_score(true, pred))


def hamming_dist(geno_pred, geno_true) -> int:
    """Genotype mismatch count with transpose disambiguation
    (libs/utils.py:63-72)."""
    pred = np.asarray(geno_pred)
    true = np.asarray(geno_true)
    if pred.shape != true.shape:
        return int(np.count_nonzero(pred.round() != true.T))
    score = int(np.count_nonzero(pred.round() != true))
    if pred.shape[0] == pred.shape[1]:
        # Catch N x N frames that got transposed (libs/utils.py:67-71).
        score_t = int(np.count_nonzero(pred.round() != true.T))
        score = min(score, score_t)
    return score


# ---------------------------------------------------------------------------
# Posterior co-clustering similarity (libs/utils.py:90-97)
# ---------------------------------------------------------------------------


def coclustering_similarity(assignments: np.ndarray,
                            chunk: int = 64) -> np.ndarray:
    """[n, n] mean posterior co-clustering indicator.

    Device-accelerated equivalent of 1 - get_dist (libs/utils.py:90-97):
    sim[i, j] = fraction of posterior samples assigning i and j together.
    """
    import jax
    import jax.numpy as jnp

    a = np.asarray(assignments)
    steps, n = a.shape

    @jax.jit
    def acc(block):
        eq = block[:, :, None] == block[:, None, :]
        return jnp.sum(eq, axis=0, dtype=jnp.float32)

    total = np.zeros((n, n), dtype=np.float64)
    for s in range(0, steps, chunk):
        total += np.asarray(acc(jnp.asarray(a[s:s + chunk])))
    return total / steps


def mean_hamming_condensed(assignments: np.ndarray) -> np.ndarray:
    """Condensed (pdist-style) mean pairwise Hamming distance."""
    sim = coclustering_similarity(assignments)
    return squareform(1.0 - sim, checks=False)


# ---------------------------------------------------------------------------
# MPEAR consensus clustering (libs/utils.py:100-143)
# ---------------------------------------------------------------------------


def _mpear_score(pi_condensed: np.ndarray, clusters: np.ndarray) -> float:
    """Fritsch & Ickstadt (2009) eq. 13 (libs/utils.py:132-143)."""
    same = squareform(
        clusters[:, None] == clusters[None, :], checks=False
    ).astype(np.float64)
    i_sum = same.sum()
    pi_sum = pi_condensed.sum()
    index = float((same * pi_condensed).sum())
    expected = (i_sum * pi_sum) / binom(clusters.size, 2)
    max_index = 0.5 * (i_sum + pi_sum)
    denom = max_index - expected
    if denom == 0:
        return -np.inf
    return (index - expected) / denom


def mpear_assignment(assignments: np.ndarray) -> np.ndarray:
    """Consensus assignment maximizing MPEAR over a Ward-linkage scan
    (libs/utils.py:100-129)."""
    dist = mean_hamming_condensed(assignments)
    sim = 1.0 - dist
    z = linkage(dist, method="ward")

    # Average number of non-trivial clusters (size > 2) per sample.
    cl_no = []
    for row in assignments:
        _, counts = np.unique(row, return_counts=True)
        cl_no.append(int((counts > 2).sum()))
    avg = float(np.mean(cl_no))

    lo = max(2, int(avg * 0.2))
    hi = int(min(avg * 2.5, assignments.shape[1]))
    n_range = np.arange(lo, hi, dtype=int)
    if n_range.size == 0:
        n_range = np.array([max(2, min(int(avg) or 2, assignments.shape[1]))])

    best_score, best = -np.inf, None
    for k in n_range:
        clusters = cut_tree(z, n_clusters=int(k)).flatten()
        score = _mpear_score(sim, clusters)
        if score > best_score:
            best_score, best = score, clusters
    return best


# ---------------------------------------------------------------------------
# Consensus genotypes (libs/utils.py:146-192; paper section 2.3)
# ---------------------------------------------------------------------------


def consensus_genotypes(assignments: np.ndarray, params_full: np.ndarray):
    """(assign, genotypes DataFrame [muts x cells]).

    For each consensus cluster, average the sampled parameter rows over the
    posterior samples in which (criterion 1) all its cells share one sampled
    cluster and, preferably, (criterion 2) no outside cell shares it; fall
    back to a membership-weighted average over all samples.
    """
    steps = assignments.shape[0]
    assign = mpear_assignment(assignments)
    clusters = np.unique(assign)

    params = np.zeros((clusters.size, params_full.shape[2]))
    for ci, cluster in enumerate(clusters):
        member = assign == cluster
        cells = np.nonzero(member)[0]
        others = np.nonzero(~member)[0]

        sub = assignments[:, cells]                       # [steps, |cells|]
        if cells.size == 1:
            same_cluster = np.ones(steps, dtype=bool)
        else:
            same_cluster = (sub == sub[:, [0]]).all(axis=1)

        # Majority sampled id of the cells (ties -> lowest id, as bincount).
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
                rank = int(np.searchsorted(all_ids, cl_ids[s]))
                params[ci] += params_full[s][rank]
            params[ci] /= step_idx.size
        else:
            for s in range(steps):
                ids_all = np.unique(assignments[s])
                ids_here, cnt = np.unique(sub[s], return_counts=True)
                ranks = np.nonzero(np.isin(ids_all, ids_here))[0]
                params[ci] += cnt @ params_full[s][ranks]
            params[ci] /= steps * cells.size

    geno = pd.DataFrame(params).T[assign]
    return assign, geno


# ---------------------------------------------------------------------------
# Latent-variable extraction (libs/utils.py:195-282)
# ---------------------------------------------------------------------------


def _posterior_avg(x):
    return float(np.mean(x)), float(np.std(x))


def _geno_errors(geno: pd.DataFrame, data: np.ndarray):
    """Data-vs-genotype FN/FP estimates (libs/utils.py:235-238)."""
    g = geno.T.values.round()
    fn_geno = (((g == 1) & (data == 0)).sum() + EPSILON) \
        / (geno.values.round().sum() + EPSILON)
    fp_geno = (((g == 0) & (data == 1)).sum() + EPSILON) \
        / ((1 - geno.values.round()).sum() + EPSILON)
    return float(fn_geno), float(fp_geno)


def _pool_chains(results: list[dict]) -> dict:
    """Concatenate post-burn-in traces of all chains (libs/utils.py:206-223)."""
    def cat(key):
        return np.concatenate([r[key][r["burn_in"]:] for r in results])

    params = [r["params"] for r in results]
    k_max = max(p.shape[1] for p in params)
    params = [
        np.pad(p, [(0, 0), (0, k_max - p.shape[1]), (0, 0)]) for p in params
    ]
    return {
        "assignments": cat("assignments"),
        "DP_alpha": cat("DP_alpha"),
        "ML": cat("ML"), "MAP": cat("MAP"),
        "FN": cat("FN"), "FP": cat("FP"),
        "params": np.concatenate(params),
        "burn_in": 0,
    }


def _posterior_chain(result: dict, data: np.ndarray) -> dict:
    bi = result["burn_in"]
    assigns = result["assignments"][bi:]
    # The parameter trace is ALREADY post-burn-in (it is only recorded after
    # burn-in, libs/MCMC.py:260-282) — align it to the assignment slice
    # instead of re-slicing by burn_in. (The reference re-slices,
    # libs/utils.py:228-230, which IndexErrors the single-chains posterior
    # path whenever burn_in > 0 — a latent defect not reproduced here.)
    params = result["params"]
    if params.shape[0] != assigns.shape[0]:
        params = params[-assigns.shape[0]:]
    assign, geno = consensus_genotypes(assigns, params)
    fn_geno, fp_geno = _geno_errors(geno, data)
    return {
        "a": _posterior_avg(result["DP_alpha"][bi:]),
        "assignment": assign,
        "genotypes": geno,
        "FN": _posterior_avg(result["FN"][bi:]),
        "FP": _posterior_avg(result["FP"][bi:]),
        "FN_geno": fn_geno,
        "FP_geno": fp_geno,
    }


def latents_posterior(results: list[dict], data: np.ndarray,
                      single_chains: bool = False) -> list[dict]:
    if single_chains:
        return [_posterior_chain(r, data) for r in results]
    return [_posterior_chain(_pool_chains(results), data)]


def _point_chain(result: dict, est: str, data: np.ndarray) -> dict:
    bi = result["burn_in"]
    step_no_bi = int(np.argmax(result[est][bi:]))
    step = step_no_bi + bi

    assignment = result["assignments"][step].tolist()
    cl_names = np.unique(assignment)
    if cl_names.size > result["params"].shape[1]:
        raise ValueError(
            f"{cl_names.size} live clusters at the {est}-optimal step exceed "
            f"the parameter-trace capacity {result['params'].shape[1]}; "
            "re-run with a larger --trace_clusters"
        )
    geno_rows = result["params"][step_no_bi][np.arange(cl_names.size)]
    geno = pd.DataFrame(geno_rows, index=cl_names).T[assignment]
    fn_geno, fp_geno = _geno_errors(geno, data)
    return {
        "step": step,
        "a": float(result["DP_alpha"][step]),
        "assignment": assignment,
        "genotypes": geno,
        "FN": float(result["FN"][step]),
        "FP": float(result["FP"][step]),
        "FN_geno": fn_geno,
        "FP_geno": fp_geno,
    }


def latents_point(results: list[dict], est: str, data: np.ndarray,
                  single_chains: bool = False) -> list[dict]:
    if single_chains:
        return [_point_chain(r, est, data) for r in results]
    scores = [np.max(r[est][r["burn_in"]:]) for r in results]
    best = results[int(np.argmax(scores))]
    return [_point_chain(best, est, data)]
