"""Sampler state: fixed-capacity padded cluster bookkeeping.

The reference tracks clusters with a ``dict`` of sizes plus cluster-id
recycling over [0, n) (libs/CRP.py:119-152, 297-299). XLA needs static shapes,
so here a cluster is a *slot* in [0, k_max):

  assignment[n]      int32, slot id per cell
  params[k_max, m]   float32, one genotype-parameter row per slot
  cluster_size[k_max] int32, 0 == free slot (rows of free slots are stale,
                      exactly like the reference's recycled parameter rows)
  dp_alpha, fp, fn   scalars

"First unused id" (libs/CRP.py:297-299) becomes an argmax over the free mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bnpc_tpu.config import TMIN, TMAX, ModelConfig
from bnpc_tpu.data import PackedData


class CRPState(NamedTuple):
    assignment: jnp.ndarray     # [n] int32
    params: jnp.ndarray         # [k_max, m] float32
    cluster_size: jnp.ndarray   # [k_max] int32
    dp_alpha: jnp.ndarray       # [] float32
    fp: jnp.ndarray             # [] float32
    fn: jnp.ndarray             # [] float32

    @property
    def live(self) -> jnp.ndarray:
        """[k_max] bool — occupied slots."""
        return self.cluster_size > 0

    @property
    def n_clusters(self) -> jnp.ndarray:
        return jnp.sum(self.live).astype(jnp.int32)


def first_free_slot(cluster_size: jnp.ndarray) -> jnp.ndarray:
    """Lowest slot id with size 0 (libs/CRP.py:297-299 analogue)."""
    return jnp.argmax(cluster_size == 0).astype(jnp.int32)


def cluster_stats(
    data: PackedData, assignment: jnp.ndarray, k_max: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot sufficient statistics (N1, N0), each [k_max, m].

    N1[k, j] = #cells in slot k with observed x==1 at mutation j, etc.
    Computed as one-hot matmuls so it lands on the MXU. These statistics make
    the cluster-parameter MH update (libs/CRP.py:347-378), the error-rate MH
    (libs/CRP_learning_errors.py:58-63) and the full log-likelihood
    (libs/CRP.py:237-238) all O(k_max * m) instead of O(n * m).
    """
    onehot = jax.nn.one_hot(assignment, k_max, dtype=data.xm.dtype)  # [n, k]
    n1 = jnp.einsum("nk,nm->km", onehot, data.xm, preferred_element_type=jnp.float32)
    n0 = jnp.einsum("nk,nm->km", onehot, data.xm0, preferred_element_type=jnp.float32)
    return n1, n0


def _beta_posterior_params(
    key: jax.Array, cfg: ModelConfig, n1: jnp.ndarray, n0: jnp.ndarray
) -> jnp.ndarray:
    """Draw rows from Beta(p + N1, q + N0), clipped to [TMIN, TMAX] as f32.

    Reference: libs/CRP.py:155-188 (`_init_cl_params` / `_init_cl_params_new`).
    """
    from bnpc_tpu.ops.randomx import beta_general

    draw = beta_general(key, cfg.p + n1, cfg.q + n0)
    return jnp.clip(draw, TMIN, TMAX).astype(jnp.float32)


def init_state(
    key: jax.Array,
    cfg: ModelConfig,
    data: PackedData,
    mode: str = "random",
    assign=None,
) -> CRPState:
    """Build an initial state (reference: CRP.init, libs/CRP.py:119-152).

    Modes:
      'random'   — each cell draws a uniform slot in [0, k_max); live slots get
                   uniform parameter rows. (The reference draws cluster ids in
                   [0, n); with k_max < n the initial cluster count caps at
                   k_max — a different but equally valid over-dispersed start.)
      'together' — all cells in slot 0; Beta-posterior parameter row.
      'separate' — each cell its own slot (requires k_max == n);
                   Beta-posterior rows per cell.
      'assign'   — fixed assignment vector (relabelled to compact slot ids);
                   Beta-posterior rows per cluster.
    """
    n, m, k = cfg.n_cells, cfg.n_muts, cfg.k_max
    k_assign, k_params = jax.random.split(key)

    if assign is not None:
        import numpy as np

        lab = np.asarray(assign)
        _, compact = np.unique(lab, return_inverse=True)
        if compact.max() >= k:
            raise ValueError(
                f"fixed assignment uses {compact.max() + 1} clusters; k_max={k}"
            )
        assignment = jnp.asarray(compact.astype(np.int32))
        cluster_size = _sizes(assignment, k)
        n1, n0 = cluster_stats(data, assignment, k)
        params = _beta_posterior_params(k_params, cfg, n1, n0)
    elif mode == "random":
        assignment = jax.random.randint(k_assign, (n,), 0, k, dtype=jnp.int32)
        cluster_size = _sizes(assignment, k)
        params = jnp.clip(
            jax.random.uniform(k_params, (k, m)), TMIN, TMAX
        ).astype(jnp.float32)
    elif mode == "together":
        assignment = jnp.zeros((n,), dtype=jnp.int32)
        cluster_size = _sizes(assignment, k)
        n1, n0 = cluster_stats(data, assignment, k)
        params = _beta_posterior_params(k_params, cfg, n1, n0)
    elif mode == "separate":
        if k != n:
            raise ValueError("mode='separate' requires k_max == n_cells")
        assignment = jnp.arange(n, dtype=jnp.int32)
        cluster_size = jnp.ones((k,), dtype=jnp.int32)
        n1, n0 = cluster_stats(data, assignment, k)
        params = _beta_posterior_params(k_params, cfg, n1, n0)
    else:
        raise TypeError(f"Unsupported initialization: {mode}")

    return CRPState(
        assignment=assignment,
        params=params,
        cluster_size=cluster_size,
        dp_alpha=jnp.asarray(cfg.dp_a_init, dtype=jnp.float32),
        fp=jnp.asarray(cfg.fp, dtype=jnp.float32),
        fn=jnp.asarray(cfg.fn, dtype=jnp.float32),
    )


def _sizes(assignment: jnp.ndarray, k_max: int) -> jnp.ndarray:
    return jnp.zeros((k_max,), dtype=jnp.int32).at[assignment].add(1)
