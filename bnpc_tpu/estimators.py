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


def _coclustering_device(assignments: np.ndarray, chunk: int = 64):
    """Device-array [n, n] mean posterior co-clustering indicator.

    Accumulates ON the device across step chunks — a single [n, n] result
    crosses the host boundary (the per-chunk transfer of the previous
    version dominated wall-clock over the tunneled TPU link).
    """
    import jax
    import jax.numpy as jnp

    a = np.asarray(assignments)
    steps, n = a.shape

    @jax.jit
    def acc(total, block):
        eq = block[:, :, None] == block[:, None, :]
        return total + jnp.sum(eq, axis=0, dtype=jnp.float32)

    total = jnp.zeros((n, n), dtype=jnp.float32)
    for s in range(0, steps, chunk):
        total = acc(total, jnp.asarray(a[s:s + chunk]))
    return total / steps


def coclustering_similarity(assignments: np.ndarray,
                            chunk: int = 64) -> np.ndarray:
    """[n, n] mean posterior co-clustering indicator.

    Device-accelerated equivalent of 1 - get_dist (libs/utils.py:90-97):
    sim[i, j] = fraction of posterior samples assigning i and j together.
    """
    from bnpc_tpu.utils.transfer import to_host

    # Chunked fetch: at n = 5,000 this matrix is 100 MB and a single
    # np.asarray takes minutes over the tunneled device (utils/transfer.py).
    return to_host(_coclustering_device(assignments, chunk)) \
        .astype(np.float64)


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


def _mpear_scores_batch(sim_dev, labels: np.ndarray) -> np.ndarray:
    """MPEAR score for every column of `labels` [n, n_k].

    Same math as _mpear_score, reorganized for the MXU: with PI the full
    similarity matrix (unit diagonal) and M the one-hot cluster-membership
    matrix of a cut, index = (sum_c m_c^T PI m_c - n) / 2. The n x n @ n x K
    product runs on the device; the final size-n_c reductions run in f64 on
    the host (f32 accumulation of ~n^2 unit-scale terms would lose the
    between-k score differences). All scoring reads the EXACT f32 device
    matrix (only the host-side linkage tree may see a quantized copy —
    mpear_assignment).
    """
    import jax
    import jax.numpy as jnp

    n, n_k = labels.shape
    k_hi = int(labels.max()) + 1

    # sim is an ARGUMENT, not a closure capture: a captured concrete array
    # becomes an HLO constant, and at n = 10,000 the 400 MB matrix blows
    # the remote-compile payload limit of the tunneled TPU service.
    @jax.jit
    def row_terms(sim, labs):                  # labs: [n_k, n]
        def one(lab):
            m = jax.nn.one_hot(lab, k_hi, dtype=jnp.float32)   # [n, k_hi]
            pim = jnp.dot(sim, m, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
            return jnp.take_along_axis(pim, lab[:, None], axis=1)[:, 0]

        return jax.vmap(one)(labs)             # [n_k, n]

    terms = np.asarray(
        row_terms(sim_dev, jnp.asarray(labels.T)), dtype=np.float64
    )
    # pi_sum over i<j (condensed form): exclude the unit diagonal. Row sums
    # in f32 on device (n-element rows are safe), total in f64 on host.
    rowsum = np.asarray(
        jax.jit(lambda s: jnp.sum(s, axis=1))(sim_dev), dtype=np.float64
    )
    pi_sum = (rowsum.sum() - n) / 2.0
    pairs = float(binom(n, 2))

    scores = np.empty(n_k)
    for j in range(n_k):
        quad = float(terms[j].sum())           # = sum_c m_c^T PI m_c
        index = (quad - n) / 2.0
        sizes = np.bincount(labels[:, j])
        i_sum = float(((sizes.astype(np.float64) ** 2).sum() - n) / 2.0)
        expected = (i_sum * pi_sum) / pairs
        max_index = 0.5 * (i_sum + pi_sum)
        denom = max_index - expected
        scores[j] = -np.inf if denom == 0 else (index - expected) / denom
    return scores


def _cut_range(assignments: np.ndarray) -> np.ndarray:
    """Candidate cluster-count range for the MPEAR scan
    (libs/utils.py:115-120): [0.2, 2.5] x the average number of
    non-trivial (size > 2) clusters per posterior sample."""
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
    return n_range


def _stratified_landmarks(assignments: np.ndarray, n_landmarks: int):
    """Deterministic landmark cells for the scalable MPEAR path: stratified
    by the final posterior sample's clustering so every cluster (however
    small) contributes at least one landmark, the rest proportional."""
    last = assignments[-1]
    n = last.size
    rng = np.random.default_rng(n)  # deterministic per problem size
    ids, counts = np.unique(last, return_counts=True)
    quota = np.maximum(1, (counts * (n_landmarks / n)).astype(int))
    picks = []
    for cid, q in zip(ids, quota):
        members = np.nonzero(last == cid)[0]
        picks.append(rng.choice(members, size=min(q, members.size),
                                replace=False))
    picks = np.concatenate(picks)
    if picks.size < n_landmarks:
        rest = np.setdiff1d(np.arange(n), picks, assume_unique=False)
        extra = rng.choice(rest, size=min(n_landmarks - picks.size,
                                          rest.size), replace=False)
        picks = np.concatenate([picks, extra])
    return np.sort(picks[:n_landmarks])


def mpear_assignment(assignments: np.ndarray,
                     max_exact: int | None = None) -> np.ndarray:
    """Consensus assignment maximizing MPEAR over a Ward-linkage scan
    (libs/utils.py:100-129).

    Scaling: the Ward tree is a CANDIDATE-PARTITION GENERATOR — the final
    choice among cuts is always the exact device-side MPEAR score over all
    n cells (_mpear_scores_batch). Up to `max_exact` cells the tree is
    built from the full co-clustering matrix (the reference's exact
    procedure). Beyond it, fetching O(n^2) to the host does not scale
    (400 MB at n = 10,000; minutes-to-hours over a degraded relay link), so
    the tree is built from a stratified landmark subset (L cells, env
    BNPC_TPU_MPEAR_LANDMARKS, default 1536): the [L, L] landmark similarity
    block is fetched, cut into candidate partitions, and each cut is
    extended to every cell ON DEVICE by assigning it to the cut cluster
    with the highest mean co-clustering similarity — then all extended cuts
    are scored exactly as usual. Tree-feeding fetches above a few MB are
    additionally uint8-quantized (<= 1/510 distance perturbation; the exact
    scorer never sees quantized values). Override the exact threshold with
    BNPC_TPU_MPEAR_EXACT_MAX or the `max_exact` argument.
    """
    import os

    import jax
    import jax.numpy as jnp

    from bnpc_tpu.utils.transfer import to_host

    if max_exact is None:
        max_exact = int(os.environ.get("BNPC_TPU_MPEAR_EXACT_MAX", "4096"))

    steps, n = assignments.shape
    sim_dev = _coclustering_device(assignments)
    n_range = _cut_range(assignments)

    def fetch_for_tree(s_dev, quant_above=(16 << 20)):
        if s_dev.size * s_dev.dtype.itemsize > quant_above:
            q = jax.jit(
                lambda s: jnp.round(s * 255.0).astype(jnp.uint8)
            )(s_dev)
            return to_host(q).astype(np.float64) / 255.0
        return to_host(s_dev).astype(np.float64)

    n_landmarks = int(os.environ.get("BNPC_TPU_MPEAR_LANDMARKS", "1536"))
    if n <= max_exact or n_landmarks >= n:
        sim = fetch_for_tree(sim_dev)
        dist = squareform(1.0 - sim, checks=False)
        z = linkage(dist, method="ward")
        labels = cut_tree(z, n_clusters=n_range)             # [n, n_k]
        scores = _mpear_scores_batch(sim_dev, labels)
        return labels[:, int(np.argmax(scores))]

    # --- landmark path -----------------------------------------------
    lm = _stratified_landmarks(np.asarray(assignments), n_landmarks)
    lm_dev = jnp.asarray(lm)
    sub = jax.jit(lambda s, ix: s[ix][:, ix])(sim_dev, lm_dev)
    sim_lm = fetch_for_tree(sub, quant_above=(4 << 20))
    dist = squareform(1.0 - sim_lm, checks=False)
    z = linkage(dist, method="ward")
    labels_lm = cut_tree(z, n_clusters=n_range)              # [L, n_k]
    k_hi = int(labels_lm.max()) + 1

    @jax.jit
    def extend(sim, ix, labs):                               # labs [n_k, L]
        sim_nl = sim[:, ix]                                  # [n, L]

        def one(lab):
            m = jax.nn.one_hot(lab, k_hi, dtype=jnp.float32)  # [L, k_hi]
            tot = jnp.dot(sim_nl, m,
                          precision=jax.lax.Precision.HIGHEST)
            cnt = m.sum(axis=0)
            mean = jnp.where(cnt > 0.0, tot / jnp.maximum(cnt, 1.0),
                             -jnp.inf)
            full = jnp.argmax(mean, axis=1).astype(jnp.int32)
            # Landmarks keep their tree label (preserves cut structure).
            return full.at[ix].set(lab.astype(jnp.int32))

        return jax.vmap(one)(labs)                           # [n_k, n]

    labels_full = np.asarray(
        extend(sim_dev, lm_dev, jnp.asarray(labels_lm.T))
    ).T                                                      # [n, n_k]
    scores = _mpear_scores_batch(sim_dev, labels_full)
    return labels_full[:, int(np.argmax(scores))]


# ---------------------------------------------------------------------------
# Consensus genotypes (libs/utils.py:146-192; paper section 2.3)
# ---------------------------------------------------------------------------


def consensus_genotypes(assignments: np.ndarray, params_full: np.ndarray,
                        assign: np.ndarray | None = None):
    """(assign, genotypes DataFrame [muts x cells]).

    `assign` lets a caller supply a precomputed consensus assignment
    (benchmarks time the MPEAR stages separately); by default it is
    computed here via :func:`mpear_assignment`.

    For each consensus cluster, average the sampled parameter rows over the
    posterior samples in which (criterion 1) all its cells share one sampled
    cluster and, preferably, (criterion 2) no outside cell shares it; fall
    back to a membership-weighted average over all samples.

    Fully vectorized over the steps axis (the reference loops steps and
    bincounts per (step, cluster), libs/utils.py:146-192 — O(steps*K*n)
    host Python): sampled-id presence/count matrices are built once by
    scatter-adds, the compacted parameter-row rank of id v at step s is a
    prefix count of present smaller ids, and both criteria reduce to boolean
    array lookups.
    """
    steps, n_cells = assignments.shape
    a = np.asarray(assignments)
    if assign is None:
        assign = mpear_assignment(a)
    clusters = np.unique(assign)

    k_ids = int(a.max()) + 1
    rows = np.arange(steps)[:, None]
    # present[s, v]: sampled id v occupied at step s; rank[s, v]: its row
    # index in the compacted parameter trace (= # of smaller present ids).
    present = np.zeros((steps, k_ids), dtype=bool)
    present[rows, a] = True
    rank = np.cumsum(present, axis=1) - 1

    capacity = params_full.shape[1]
    n_live_max = int(present.sum(axis=1).max())
    if n_live_max > capacity:
        raise ValueError(
            f"{n_live_max} live clusters in a posterior sample exceed the "
            f"parameter-trace capacity {capacity}; re-run with a larger "
            "--trace_clusters"
        )

    params = np.zeros((clusters.size, params_full.shape[2]))
    for ci, cluster in enumerate(clusters):
        member = assign == cluster
        sub = a[:, member]                                # [steps, |cells|]
        same_cluster = (sub == sub[:, :1]).all(axis=1)

        # Majority sampled id of the cells (ties -> lowest id, as the
        # reference's bincount argmax).
        counts = np.zeros((steps, k_ids), dtype=np.int32)
        np.add.at(counts, (np.broadcast_to(rows, sub.shape), sub), 1)
        cl_ids = counts.argmax(axis=1)

        others_present = np.zeros((steps, k_ids), dtype=bool)
        others_present[np.broadcast_to(rows, (steps, n_cells - sub.shape[1])),
                       a[:, ~member]] = True
        no_others = ~others_present[rows[:, 0], cl_ids]

        if same_cluster.any():
            use = same_cluster & no_others
            step_idx = np.nonzero(use if use.any() else same_cluster)[0]
            ranks = rank[step_idx, cl_ids[step_idx]]
            params[ci] = params_full[step_idx, ranks].mean(axis=0)
        else:
            # Membership-weighted average over ALL samples: each member
            # cell contributes its sampled cluster's parameter row.
            ranks_sub = rank[np.broadcast_to(rows, sub.shape), sub]
            acc = np.zeros(params_full.shape[2])
            chunk = max(1, 2_000_000 // max(1, sub.shape[1]))
            for s0 in range(0, steps, chunk):
                sl = slice(s0, min(s0 + chunk, steps))
                acc += params_full[
                    rows[sl], ranks_sub[sl]
                ].sum(axis=(0, 1))
            params[ci] = acc / (steps * sub.shape[1])

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
