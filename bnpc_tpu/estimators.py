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


def _coclustering_device(assignments: np.ndarray):
    """Device-array [n, n] mean posterior co-clustering indicator — the
    cols = all-cells case of :func:`_sim_to_cols_device`. Accumulates ON
    the device across step chunks; a single [n, n] result crosses the host
    boundary."""
    a = np.asarray(assignments)
    return _sim_to_cols_device(a, np.arange(a.shape[1]))


def coclustering_similarity(assignments: np.ndarray) -> np.ndarray:
    """[n, n] mean posterior co-clustering indicator.

    Device-accelerated equivalent of 1 - get_dist (libs/utils.py:90-97):
    sim[i, j] = fraction of posterior samples assigning i and j together.
    """
    from bnpc_tpu.utils.transfer import to_host

    # Chunked fetch: at n = 5,000 this matrix is 100 MB and a single
    # np.asarray takes minutes over the tunneled device (utils/transfer.py).
    return to_host(_coclustering_device(assignments)).astype(np.float64)


def mean_hamming_condensed(assignments: np.ndarray) -> np.ndarray:
    """Condensed (pdist-style) mean pairwise Hamming distance."""
    sim = coclustering_similarity(assignments)
    return squareform(1.0 - sim, checks=False)


def _sim_to_cols_device(assignments: np.ndarray, cols: np.ndarray):
    """Device-array [n, L] mean co-clustering similarity of every cell to
    the cells in `cols`, WITHOUT materializing the [n, n] matrix.

    sim[i, l] = fraction of posterior samples assigning cell i together
    with cell cols[l] — the [:, cols] column block of
    :func:`coclustering_similarity`, computed directly so the estimator
    scales past the n where an [n, n] f32 buffer stops fitting HBM
    (10 GB at n = 50,000).
    """
    import jax
    import jax.numpy as jnp

    a = np.asarray(assignments)
    cols = np.asarray(cols)
    steps, n = a.shape
    ncol = cols.size
    # Step chunk sized so the [c, n, L] compare stays ~512 MB.
    c = max(1, int((512 << 20) // max(1, n * ncol)))

    @jax.jit
    def acc(total, block, block_cols):
        eq = block[:, :, None] == block_cols[:, None, :]
        return total + jnp.sum(eq, axis=0, dtype=jnp.float32)

    total = jnp.zeros((n, ncol), dtype=jnp.float32)
    for s in range(0, steps, c):
        blk = a[s:s + c]
        total = acc(total, jnp.asarray(blk), jnp.asarray(blk[:, cols]))
    return total / steps


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


def _pair_stats_device(assignments: np.ndarray, labels: np.ndarray):
    """Device pair-counting statistics for MPEAR scoring: per-candidate
    quad[j] = sum_s sum_cv (N^(s,j)_cv)^2 and pi_quad = sum_s sum_v n_sv^2,
    where N^(s,j) is the contingency table between candidate cut j and
    posterior sample s and n_sv the sampled-cluster sizes.

    All contingency tables of all candidates come out of ONE one-hot
    matmul per step chunk — a [c, n, k_ids] x [n, n_k*k_hi] einsum.
    Inputs are bf16 (0/1 exact) accumulated in f32, so every count is an
    exact integer (counts <= n < 2^24). The squared sums accumulate in
    f32, bounding the relative error of quad at ~1e-7 — far below the
    between-candidate score separation the argmax needs. A slow
    virtualized host takes minutes for the same statistics as numpy
    bincounts (the temporaries are memory-bandwidth-bound); the MXU does
    the whole thing in milliseconds.
    """
    import jax
    import jax.numpy as jnp

    a = np.asarray(assignments)
    steps, n = a.shape
    labels = np.asarray(labels)
    n_k = labels.shape[1]
    k_ids = int(a.max()) + 1
    k_hi = int(labels.max()) + 1

    @jax.jit
    def reduce_chunk(quad, pi_quad, cont):
        cont = cont.reshape(cont.shape[0], n_k, k_hi, k_ids)
        # Sampled-cluster sizes: every cell lies in exactly one cluster of
        # candidate 0, so summing its contingency rows recovers n_sv.
        sizes = jnp.sum(cont[:, 0], axis=1)
        return (quad + jnp.sum(cont * cont, axis=(0, 2, 3)),
                pi_quad + jnp.sum(sizes * sizes))

    quad = jnp.zeros((n_k,), jnp.float32)
    pi_quad = jnp.zeros((), jnp.float32)
    for cont in _contingency_chunks(a, labels, k_hi):
        quad, pi_quad = reduce_chunk(quad, pi_quad, cont)
    return np.asarray(quad, np.float64), float(pi_quad)


def _contingency_chunks(assignments: np.ndarray, labels: np.ndarray,
                        k_each: int):
    """Yield per-step-chunk device contingency tables
    N[s, j*k_each + c, v] = |{i : labels[i, j] = c and a[s, i] = v}| as
    [c, J*k_each, k_ids] f32 device arrays — the shared machinery of
    :func:`_pair_stats_device` and :func:`_contingency_device`.

    One one-hot matmul per chunk: [c, n, k_ids] x [n, J*k_each]. Inputs
    are bf16 (0/1 exact) feeding the MXU with f32 accumulation, so every
    count is an exact integer (counts <= n < 2^24); CPU XLA lacks the
    bf16 x bf16 = f32 dot, so it falls back to f32 there (still exact).
    A slow virtualized host takes minutes for the same statistics as
    numpy bincounts (~300 MB of index temporaries, memory-bandwidth-
    bound); the MXU does milliseconds of work.
    """
    import jax
    import jax.numpy as jnp

    a = np.asarray(assignments)
    steps, n = a.shape
    labels = np.asarray(labels)
    if labels.ndim == 1:
        labels = labels[:, None]
    n_j = labels.shape[1]
    k_ids = int(a.max()) + 1

    in_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32)
    memb = jax.jit(
        lambda l: jax.nn.one_hot(l, k_each, dtype=in_dtype)
        .reshape(n, n_j * k_each)
    )(jnp.asarray(labels.astype(np.int32)))

    # Step chunk sized so the [c, n, k_ids] one-hot stays ~256 MB.
    c = max(1, int((256 << 20)
                   // max(1, np.dtype(in_dtype).itemsize * n * k_ids)))

    @jax.jit
    def tables(blk, memb):
        onehot = jax.nn.one_hot(blk, k_ids, dtype=in_dtype)
        return jnp.einsum("snv,nk->skv", onehot, memb,
                          preferred_element_type=jnp.float32)

    wire = np.uint8 if k_ids <= 255 else np.int32
    for s in range(0, steps, c):
        yield tables(jnp.asarray(a[s:s + c].astype(wire)), memb)


def _contingency_device(assignments: np.ndarray,
                        labels: np.ndarray) -> np.ndarray:
    """Per-step contingency tables N[s, c, v] = |{i : labels[i] = c and
    assignments[s, i] = v}| as host int64 (tiny: [steps, n_k, k_ids]),
    computed on device (:func:`_contingency_chunks`) and fetched through
    the chunked transfer helper (a direct np.asarray of a >8 MB device
    array takes the relay's pathological big-transfer path)."""
    import jax.numpy as jnp

    from bnpc_tpu.utils.transfer import to_host

    n_k = int(np.asarray(labels).max()) + 1
    parts = list(_contingency_chunks(assignments, labels, n_k))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return np.asarray(to_host(out), dtype=np.int64)


def _mpear_scores_pairs(assignments: np.ndarray,
                        labels: np.ndarray) -> np.ndarray:
    """Exact MPEAR scores via pair-counting contingency statistics —
    no [n, n] similarity matrix.

    Same math as :func:`_mpear_scores_batch`: with PI the mean posterior
    co-clustering matrix (unit diagonal) and N^(s,j) the contingency table
    between candidate cut j and posterior sample s,

        sum_c m_c^T PI m_c = (1/S) sum_s sum_cv (N^(s,j)_cv)^2
        sum_ij PI_ij       = (1/S) sum_s sum_v n_sv^2

    so index, pi_sum, i_sum reduce to contingency statistics:
    O(S * n * k) total, O(1) in n^2. This is what lets the posterior
    estimator run at 50,000 cells, where PI itself would be 10 GB. The
    heavy reductions run on device (:func:`_pair_stats_device`); the final
    score arithmetic is f64 on host.
    """
    a = np.asarray(assignments)
    steps, n = a.shape
    labels = np.asarray(labels)
    n_k = labels.shape[1]
    k_hi = int(labels.max()) + 1

    quad, pi_quad = _pair_stats_device(a, labels)
    pi_sum = (pi_quad / steps - n) / 2.0

    pairs = float(binom(n, 2))
    scores = np.empty(n_k)
    for j in range(n_k):
        index = (quad[j] / steps - n) / 2.0
        csz = np.bincount(labels[:, j], minlength=k_hi).astype(np.float64)
        i_sum = ((csz ** 2).sum() - n) / 2.0
        expected = (i_sum * pi_sum) / pairs
        max_index = 0.5 * (i_sum + pi_sum)
        denom = max_index - expected
        scores[j] = -np.inf if denom == 0 else (index - expected) / denom
    return scores


def _cut_range(assignments: np.ndarray) -> np.ndarray:
    """Candidate cluster-count range for the MPEAR scan
    (libs/utils.py:115-120): [0.2, 2.5] x the average number of
    non-trivial (size > 2) clusters per posterior sample.

    The per-sample counting is ONE device pass — sort each sample's
    assignment row, then count runs of length >= 3 (a run of value v has a
    third element iff xs[i] == xs[i+2] at its start) — replacing a host
    loop of np.unique per sample that cost O(seconds) at 50,000 cells x
    500 samples on the virtualized host. Only the scalar average comes
    back from the device."""
    import jax
    import jax.numpy as jnp

    if assignments.shape[1] < 3:  # no cluster can exceed size 2
        return np.array([2])
    a = np.ascontiguousarray(assignments)
    if a.max(initial=0) < 32768:  # smaller H2D wire
        a = a.astype(np.int16)

    @jax.jit
    def avg_nontrivial(x):
        s = x.shape[0]
        xs = jnp.sort(x, axis=1)
        start = jnp.concatenate(
            [jnp.ones((s, 1), bool), xs[:, 1:] != xs[:, :-1]], axis=1)
        has3 = jnp.concatenate(
            [xs[:, 2:] == xs[:, :-2], jnp.zeros((s, 2), bool)], axis=1)
        return jnp.mean(jnp.sum(start & has3, axis=1).astype(jnp.float32))

    avg = float(avg_nontrivial(jnp.asarray(a)))
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
    choice among cuts is always the exact MPEAR score over all n cells.
    Up to `max_exact` cells the tree is built from the full co-clustering
    matrix (the reference's exact procedure) and cuts are scored on device
    (_mpear_scores_batch). Beyond it, neither the [n, n] matrix on device
    (10 GB at n = 50,000) nor its host fetch (400 MB at n = 10,000;
    minutes-to-hours over a degraded relay link) scales, so the path is
    MATRIX-FREE: the tree is built from a stratified landmark subset
    (L cells, env BNPC_TPU_MPEAR_LANDMARKS, default 1536) whose [L, L]
    similarity block is computed directly; each cut is extended to every
    cell ON DEVICE by assigning it to the cut cluster with the highest
    mean co-clustering similarity (needs only the [n, L] block); and all
    extended cuts are scored EXACTLY by pair-counting contingency
    statistics (_mpear_scores_pairs) — the full similarity matrix is never
    materialized anywhere. Tree-feeding fetches above a few MB are
    additionally uint8-quantized (<= 1/510 distance perturbation; the
    exact scorer never sees quantized values). Override the exact
    threshold with BNPC_TPU_MPEAR_EXACT_MAX or the `max_exact` argument.
    """
    import os

    import jax
    import jax.numpy as jnp

    from bnpc_tpu.utils.transfer import to_host

    if max_exact is None:
        max_exact = int(os.environ.get("BNPC_TPU_MPEAR_EXACT_MAX", "4096"))

    steps, n = assignments.shape
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
        sim_dev = _coclustering_device(assignments)
        sim = fetch_for_tree(sim_dev)
        dist = squareform(1.0 - sim, checks=False)
        z = linkage(dist, method="ward")
        labels = cut_tree(z, n_clusters=n_range)             # [n, n_k]
        scores = _mpear_scores_batch(sim_dev, labels)
        return labels[:, int(np.argmax(scores))]

    # --- landmark path (matrix-free) ---------------------------------
    a_host = np.asarray(assignments)
    lm = _stratified_landmarks(a_host, n_landmarks)
    sub = _sim_to_cols_device(a_host[:, lm], np.arange(lm.size))
    sim_lm = fetch_for_tree(sub, quant_above=(4 << 20))
    dist = squareform(1.0 - sim_lm, checks=False)
    z = linkage(dist, method="ward")
    labels_lm = cut_tree(z, n_clusters=n_range)              # [L, n_k]
    k_hi = int(labels_lm.max()) + 1

    @jax.jit
    def extend(sim_nl, ix, labs):        # sim_nl [n, L], labs [n_k, L]
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

    sim_nl = _sim_to_cols_device(a_host, lm)
    labels_full = to_host(
        extend(sim_nl, jnp.asarray(lm), jnp.asarray(labels_lm.T))
    ).T                                                      # [n, n_k]
    scores = _mpear_scores_pairs(a_host, labels_full)
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

    Fully vectorized (the reference loops steps and bincounts per
    (step, cluster), libs/utils.py:146-192 — O(steps*K*n) host Python):
    one device contingency pass builds N[s, c, v] = |consensus cluster c ∩
    sampled cluster v at step s| (:func:`_contingency_device`; the host
    equivalent needs ~300 MB of index temporaries, which a paging-bound
    virtualized host serves at tens of seconds), from which both §2.3
    criteria are O(S*K) lookups (criterion 1: max_v N = |c|; criterion 2:
    that N equals the sampled cluster's total size) and the
    weighted-average fallback is a [steps, capacity] weight matrix
    contracted against the parameter trace — no per-cell gathers, so it
    stays cheap at 50,000 cells.
    """
    steps, n_cells = assignments.shape
    a = np.asarray(assignments)
    if assign is None:
        assign = mpear_assignment(a)
    clusters, cinv = np.unique(assign, return_inverse=True)
    n_k = clusters.size

    k_ids = int(a.max()) + 1
    srow = np.arange(steps)
    joint = _contingency_device(a, cinv)                  # N[s, c, v]

    # tot[s, v]: sampled cluster sizes; rank[s, v]: row index of id v in
    # the compacted parameter trace (= # of smaller occupied ids).
    tot = joint.sum(axis=1)
    present = tot > 0
    rank = np.cumsum(present, axis=1) - 1

    capacity = params_full.shape[1]
    n_live_max = int(present.sum(axis=1).max())
    if n_live_max > capacity:
        raise ValueError(
            f"{n_live_max} live clusters in a posterior sample exceed the "
            f"parameter-trace capacity {capacity}; re-run with a larger "
            "--trace_clusters"
        )

    sizes = np.bincount(cinv, minlength=n_k)              # consensus sizes
    params = np.zeros((n_k, params_full.shape[2]))
    for ci in range(n_k):
        nc = joint[:, ci, :]                              # [steps, k_ids]
        # Majority sampled id of the member cells (ties -> lowest id, as
        # the reference's bincount argmax).
        cl_ids = nc.argmax(axis=1)
        nc_at = nc[srow, cl_ids]
        same_cluster = nc_at == sizes[ci]                 # criterion 1
        no_others = nc_at == tot[srow, cl_ids]            # criterion 2

        if same_cluster.any():
            use = same_cluster & no_others
            step_idx = np.nonzero(use if use.any() else same_cluster)[0]
            ranks = rank[step_idx, cl_ids[step_idx]]
            params[ci] = params_full[step_idx, ranks].mean(axis=0)
        else:
            # Membership-weighted average over ALL samples: each member
            # cell contributes its sampled cluster's parameter row, i.e.
            # row r of step s carries weight N[s, ci, v(r)].
            w = np.zeros((steps, capacity))
            s_p, v_p = np.nonzero(nc)
            w[s_p, rank[s_p, v_p]] = nc[s_p, v_p]
            params[ci] = np.einsum("sk,skm->m", w, params_full) \
                / (steps * sizes[ci])

    # Positional take, then label the columns: pandas label-based column
    # selection consolidates the block manager per duplicate label (~20 s
    # at 50,000 cells — same pathology as the clustermap fix).
    geno = pd.DataFrame(params.T[:, cinv], columns=assign)
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
    # Positional take + column labels (label-based selection consolidates
    # the block manager per duplicate label — ~20 s at 50,000 cells).
    pos = np.searchsorted(cl_names, assignment)
    geno = pd.DataFrame(geno_rows.T[:, pos], columns=assignment)
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
