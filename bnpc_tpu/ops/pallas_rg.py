"""Pallas TPU kernel for the split-merge restricted 2-way Gibbs scan.

The Jain-Neal launch scans (reference: _rg_scan_assign, libs/CRP.py:609-632)
are sequential over the move's cells: each cell's 2-way draw shifts the side
counts seen by the next cell. The XLA lax.scan formulation pays ~3-5us of
While-loop dispatch per visited cell, which makes split-merge the dominant
per-step cost at headline scale (~17 ms of a ~10 ms average step, taken on
33% of steps).

This kernel runs the whole restricted scan as SCALAR work in SMEM — no
vector ops, no matmuls, no transcendentals:

  * the per-cell 2-way categorical reduces to ONE scalar comparison.
    With hoisted Gumbel noise g, side 1 wins iff

        (ll2[c,1] + g1) + log(n_j)  >  (ll2[c,0] + g0) + log(n_i)

    Everything except the counts is precomputed outside into a single
    difference ``dz[c] = (ll2[c,1]+g1) - (ll2[c,0]+g0)`` (the CRP
    denominator log(n_move-1+alpha) is side-independent and cancels; so
    does the 2-way log-normalization, which is a lateral shift);
  * ``log(n_i)/log(n_j)`` are SMEM table lookups (``logtab[t] = log t``)
    because the side counts are integers in [0, n_move];
  * the visit order is the move's cells compacted to the first ``s_count``
    slots of a permutation vector, so the loop trip count is the number of
    movable cells, not n.

The chosen-probability accumulation of the final (trans_prob) scan is NOT
done in-kernel: given the launch and final side vectors the count evolution
is deterministic, so it is replayed vectorized outside (prefix/suffix sums
in visit order — same trick as the merge reverse path,
bnpc_tpu/models/splitmerge.py:_reverse_split_prob).

The kernel writes ONLY the visited cells' entries of ``rg_out``; the caller
merges ``where(s_mask, rg_out, rg_in)`` (each cell is visited at most once,
so the pre-visit value of any cell is always its launch value — the kernel
reads current sides from ``rg_in``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rg_kernel(
    dz_ref,       # [n] f32, SMEM — decision margin per cell (see module doc)
    order_ref,    # [n] i32, SMEM — visit order; first s_count entries movable
    rg_in_ref,    # [n] i32, SMEM — launch sides
    logtab_ref,   # [n+2] f32, SMEM — logtab[t] = log(t) (logtab[0] = -inf)
    scal_ref,     # [3] i32, SMEM — (s_count, count1_init, n_move)
    rg_out_ref,   # [n] i32, SMEM — sides of visited cells (others unwritten)
):
    s_count = scal_ref[0]
    n_move = scal_ref[2]

    def body(i, count1):
        cell = order_ref[i]
        cur = rg_in_ref[cell]
        s1 = count1 - cur
        margin = dz_ref[cell] + logtab_ref[s1 + 1] \
            - logtab_ref[n_move - s1 - 2]
        new = (margin > 0.0).astype(jnp.int32)
        rg_out_ref[cell] = new
        return s1 + new

    jax.lax.fori_loop(0, s_count, body, scal_ref[1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def rg_scan(dz, order, rg_in, logtab, s_count, count1, n_move, *,
            interpret: bool = False):
    """Run the restricted scan; returns the [n] i32 side vector whose entries
    are valid ONLY at the visited (movable) cells — merge with the launch
    vector outside."""
    n = dz.shape[0]
    scal = jnp.stack([s_count, count1, n_move]).astype(jnp.int32)
    return pl.pallas_call(
        _rg_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dz
            pl.BlockSpec(memory_space=pltpu.SMEM),  # order
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rg_in
            pl.BlockSpec(memory_space=pltpu.SMEM),  # logtab
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(
        dz.astype(jnp.float32),
        order.astype(jnp.int32),
        rg_in.astype(jnp.int32),
        logtab.astype(jnp.float32),
        scal,
    )
