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

Sequential streams mean NO [n]-sized array lives in scalar memory: dz and
the launch sides stay in HBM, staged chunk-by-chunk into small SMEM buffers
by leading-dim DMA, and the chosen sides are staged back out the same way.
The fused log table is staged the same way (round 5): the side-1 count
moves by at most 1 per visited cell, so within a C-cell chunk every lookup
index sits inside the 2C-wide window [count1 - C, count1 + C) of the
chunk-entry count — one dynamic-offset DMA per chunk stages exactly that
window. SMEM usage is therefore CONSTANT (~40 KB at C=2048) regardless of
n; the round-4 kernel kept the whole [n+2] table in SMEM and capped at
196,608 cells (the round-3 five-array kernel at 50,000). The kernel's
ceiling is now just HBM (benchmarks/smem_probe.py verifies bit-exactness
against a sequential NumPy replay at 262,144 and 1M+ cells).

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
    dtab_ref,     # [1, len_d] f32, ANY/HBM — dtab[s1] = log(s1+1)-log(n_move-s1-2)
    scal_ref,     # [2] i32, SMEM — (s_count, count1_init)
    outv3_ref,    # [G, 1, C] i32, ANY/HBM — chosen sides by visit position;
    #               only chunks overlapping [0, s_count) are written
    dzbuf,        # [1, C] f32, SMEM scratch
    laubuf,       # [1, C] i32, SMEM scratch
    outbuf,       # [1, C] i32, SMEM scratch
    dtabbuf,      # [1, W] f32, SMEM scratch — staged table window, W = 2C+128
    dsem, lsem, osem, tsem,
):
    C = dzbuf.shape[1]
    W = dtabbuf.shape[1]
    len_d = dtab_ref.shape[1]
    s_count = scal_ref[0]

    def chunk(g, count1):
        # The side-1 count moves by <= 1 per cell, so within this chunk every
        # lookup index s1 = count1' - cur stays in [count1 - C, count1 + C).
        # Stage that window of the table; the start is rounded down to a
        # lane-tile multiple (the same aligned dynamic-start minor-dim slice
        # as the sweep kernel's birth column DMA) — W = 2C + 128 keeps
        # coverage.
        w = pl.multiple_of(
            jnp.clip(jax.lax.div(count1 - C, 128) * 128, 0, len_d - W), 128)
        t_dma = pltpu.make_async_copy(
            dtab_ref.at[:, pl.ds(w, W)], dtabbuf, tsem)
        t_dma.start()
        d_dma = pltpu.make_async_copy(dzv3_ref.at[g], dzbuf, dsem)
        d_dma.start()
        l_dma = pltpu.make_async_copy(lauv3_ref.at[g], laubuf, lsem)
        l_dma.start()
        t_dma.wait()
        d_dma.wait()
        l_dma.wait()

        def body(i, c1):
            cur = laubuf[0, i]
            s1 = c1 - cur
            new = (dzbuf[0, i] + dtabbuf[0, s1 - w] > 0.0).astype(jnp.int32)
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
    # The staged window [count1 - C, count1 + C) can reach index
    # count1 + C - 1 <= n + C, and its 128-aligned start can sit anywhere in
    # [0, n + 2); pad the table so every clipped window fits inside it.
    W = 2 * C + 128
    len_d = -(-(dtab.shape[0] + W) // 128) * 128
    scal = jnp.stack([s_count, count1]).astype(jnp.int32)
    out3 = pl.pallas_call(
        _rg_kernel,
        out_shape=jax.ShapeDtypeStruct((G, 1, C), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # dz_v chunks
            pl.BlockSpec(memory_space=pl.ANY),      # lau_v chunks
            pl.BlockSpec(memory_space=pl.ANY),      # dtab (window-staged)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((1, C), jnp.float32),
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SMEM((1, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        jnp.pad(dz_v.astype(jnp.float32), pad).reshape(G, 1, C),
        jnp.pad(lau_v.astype(jnp.int32), pad).reshape(G, 1, C),
        jnp.pad(dtab.astype(jnp.float32),
                (0, len_d - dtab.shape[0]))[None, :],
        scal,
    )
    return out3.reshape(-1)[:n]
