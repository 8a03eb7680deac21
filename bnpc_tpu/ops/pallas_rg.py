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
  * ``log(n_j) - log(n_i)`` is ONE fused SMEM table lookup
    (``dtab[s1] = log(s1+1) - log(n_move-s1-2)``, +inf where side i would
    empty) because the side counts are integers in [0, n_move];
  * every per-cell input arrives in VISIT order (the caller's
    ``_visit_order`` sort compacts the move's cells to the first
    ``s_count`` positions and co-sorts dz and the launch sides), so the
    kernel consumes and produces purely SEQUENTIAL streams.

Sequential streams mean the [n]-sized arrays need not live in scalar
memory: dz and the launch sides stay in HBM, staged chunk-by-chunk into
small SMEM buffers by leading-dim DMA, and the chosen sides are staged back
out the same way. The only n-sized SMEM array left is the fused log table
(4 bytes/cell — the round-3 kernel kept five such arrays and capped at
50,000 cells; this one compiles at 196,608, benchmarks/smem_probe.py).

The chosen-probability accumulation of the final (trans_prob) scan is NOT
done in-kernel: given the launch and final side vectors the count evolution
is deterministic, so it is replayed vectorized outside (prefix/suffix sums
in visit order — same trick as the merge reverse path,
bnpc_tpu/models/splitmerge.py:_reverse_split_prob).

The kernel writes ONLY the chunks it enters (ceil(s_count / C) of them);
the caller keeps positions >= s_count at their launch values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Cells staged per chunk DMA. 3 x (1, C) i32/f32 SMEM scratch buffers; the
# staging is synchronous (a chunk's ~8 KB DMA costs ~1 us against ~100+ us
# of serial scalar compute, so overlap would hide nothing).
_CHUNK = 2048


def _rg_kernel(
    dzv3_ref,     # [G, 1, C] f32, ANY/HBM — decision margins, VISIT order
    lauv3_ref,    # [G, 1, C] i32, ANY/HBM — launch sides, visit order
    dtab_ref,     # [n+2] f32, SMEM — dtab[s1] = log(s1+1) - log(n_move-s1-2)
    scal_ref,     # [2] i32, SMEM — (s_count, count1_init)
    outv3_ref,    # [G, 1, C] i32, ANY/HBM — chosen sides by visit position;
    #               only chunks overlapping [0, s_count) are written
    dzbuf,        # [1, C] f32, SMEM scratch
    laubuf,       # [1, C] i32, SMEM scratch
    outbuf,       # [1, C] i32, SMEM scratch
    dsem, lsem, osem,
):
    C = dzbuf.shape[1]
    s_count = scal_ref[0]

    def chunk(g, count1):
        d_dma = pltpu.make_async_copy(dzv3_ref.at[g], dzbuf, dsem)
        d_dma.start()
        l_dma = pltpu.make_async_copy(lauv3_ref.at[g], laubuf, lsem)
        l_dma.start()
        d_dma.wait()
        l_dma.wait()

        def body(i, c1):
            cur = laubuf[0, i]
            s1 = c1 - cur
            new = (dzbuf[0, i] + dtab_ref[s1] > 0.0).astype(jnp.int32)
            outbuf[0, i] = new
            return s1 + new

        lim = jnp.minimum(s_count - g * C, C)
        count1 = jax.lax.fori_loop(0, lim, body, count1)
        o_dma = pltpu.make_async_copy(outbuf, outv3_ref.at[g], osem)
        o_dma.start()
        o_dma.wait()
        return count1

    n_chunks = jax.lax.div(s_count + (C - 1), C)
    jax.lax.fori_loop(0, n_chunks, chunk, scal_ref[1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def rg_scan(dz_v, lau_v, dtab, s_count, count1, *, interpret: bool = False):
    """Run the restricted scan over visit-order streams.

    dz_v [n] f32 and lau_v [n] i32 are the decision margins and launch sides
    in VISIT order (movable cells first); dtab [n+2] f32 is the fused count
    log-table. Returns the [n] i32 chosen-side vector BY VISIT POSITION,
    valid only at positions < s_count — merge with the launch vector
    outside.
    """
    n = dz_v.shape[0]
    C = min(_CHUNK, -(-n // 128) * 128)
    G = -(-n // C)
    pad = (0, G * C - n)
    scal = jnp.stack([s_count, count1]).astype(jnp.int32)
    out3 = pl.pallas_call(
        _rg_kernel,
        out_shape=jax.ShapeDtypeStruct((G, 1, C), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # dz_v chunks
            pl.BlockSpec(memory_space=pl.ANY),      # lau_v chunks
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dtab
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((1, C), jnp.float32),
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        jnp.pad(dz_v.astype(jnp.float32), pad).reshape(G, 1, C),
        jnp.pad(lau_v.astype(jnp.int32), pad).reshape(G, 1, C),
        dtab.astype(jnp.float32),
        scal,
    )
    return out3.reshape(-1)[:n]
