"""Fused Pallas TPU kernel for the sequential per-cell Gibbs sweep.

The XLA lax.scan formulation (bnpc_tpu/models/gibbs.py) is latency-bound:
~15us of While-loop dispatch per cell. This kernel runs the WHOLE sweep in
one pallas_call with the per-cluster log-probability tables c1/c0 resident in
VMEM, so each cell iteration is:

  * two double-buffered 800 B DMAs (the cell's xm/xm0 rows) + a 1 KB DMA
    (its Gumbel row) — all read-only, prefetched one iteration ahead;
  * one [k, m] x [m] MXU matvec for the cell's log-likelihood row;
  * VPU masking/argmax for the CRP-weighted categorical draw;
  * on a (rare) cluster birth: three [m] DMAs patch the newborn slot's
    parameter row and its c1/c0 table rows in place.

Semantics are IDENTICAL to the scan implementation given the same hoisted
randomness (permutation, Gumbel noise, fresh Beta rows): the equivalence is
asserted in tests/test_pallas.py. Shapes are padded to TPU tiling (m, k to
multiples of 128); padded mutation columns carry zero data weight and padded
cluster slots use a size sentinel of -1 (never live, never free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _sweep_kernel(
    # inputs
    xm_ref,        # [n, m_pad] f32, HBM (rows permuted)
    xm0_ref,       # [n, m_pad] f32, HBM
    gum_ref,       # [n, k_pad] f32, HBM
    fresh_ref,     # [n, m_pad] f32, HBM — newborn parameter row per cell
    f1_ref,        # [n, m_pad] f32, HBM — c1 table of fresh rows
    f0_ref,        # [n, m_pad] f32, HBM — c0 table of fresh rows
    aux_ref,       # [n] f32, SMEM — new-cluster logit incl. its gumbel
    assign_in_ref,  # [n] i32, SMEM (permuted)
    sizes_in_ref,  # [1, k_pad] f32, VMEM (-1 sentinel on padded slots)
    params_in_ref,  # [k_pad, m_pad] f32, VMEM
    c1_in_ref,     # [k_pad, m_pad] f32, VMEM
    c0_in_ref,     # [k_pad, m_pad] f32, VMEM
    log_denom_ref,  # [1, 1] f32, SMEM
    # outputs
    assign_out_ref,  # [n] i32, SMEM
    sizes_out_ref,   # [1, k_pad] f32
    params_out_ref,  # [k_pad, m_pad] f32
    # scratch
    row_buf,       # [2, 3, m_pad] f32 (slot, {xm, xm0, gum-pad}, lane)
    gum_buf,       # [2, 1, k_pad] f32
    birth_buf,     # [3, m_pad] f32 ({fresh, f1, f0})
    c1_scr,        # [k_pad, m_pad] f32
    c0_scr,        # [k_pad, m_pad] f32
    row_sem,       # DMA sems (2, 3)
    birth_sem,     # DMA sems (3,)
):
    n = xm_ref.shape[0]
    k_pad = gum_buf.shape[2]

    # Working copies of the mutable state.
    assign_out_ref[...] = assign_in_ref[...]
    sizes_out_ref[...] = sizes_in_ref[...]
    params_out_ref[...] = params_in_ref[...]
    c1_scr[...] = c1_in_ref[...]
    c0_scr[...] = c0_in_ref[...]

    log_denom = log_denom_ref[0, 0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    def row_dma(slot, i):
        return (
            pltpu.make_async_copy(
                xm_ref.at[pl.ds(i, 1), :], row_buf.at[slot, pl.ds(0, 1), :],
                row_sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                xm0_ref.at[pl.ds(i, 1), :], row_buf.at[slot, pl.ds(1, 1), :],
                row_sem.at[slot, 1],
            ),
            pltpu.make_async_copy(
                gum_ref.at[pl.ds(i, 1), :], gum_buf.at[slot],
                row_sem.at[slot, 2],
            ),
        )

    for d in row_dma(0, 0):
        d.start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        # Prefetch the next cell's rows (read-only, no hazard).
        @pl.when(i + 1 < n)
        def _():
            for d in row_dma(nxt, i + 1):
                d.start()

        for d in row_dma(slot, i):
            d.wait()

        xm_row = row_buf[slot, 0, :]       # [m_pad]
        xm0_row = row_buf[slot, 1, :]
        gum_row = gum_buf[slot, 0, :]      # [k_pad]

        # Remove the cell from its cluster (libs/CRP.py:262-266).
        old = assign_out_ref[i]
        sizes = sizes_out_ref[0, :] - (iota_k[0] == old).astype(jnp.float32)

        # Log-likelihood row: one MXU matvec against the resident tables.
        ll = (
            jnp.dot(c1_scr[...], xm_row, preferred_element_type=jnp.float32)
            + jnp.dot(c0_scr[...], xm0_row,
                      preferred_element_type=jnp.float32)
        )  # [k_pad]

        live = sizes > 0.0
        logits = jnp.where(
            live,
            ll + jnp.log(jnp.maximum(sizes, 1.0)) - log_denom + gum_row,
            NEG_INF,
        )
        best_old = jnp.max(logits)
        idx_old = jnp.argmax(logits).astype(jnp.int32)

        free_mask = sizes == 0.0
        has_free = jnp.any(free_mask)
        post_new = jnp.where(has_free, aux_ref[i], NEG_INF)
        is_new = post_new > best_old
        # Mosaic argmax lowering is float32-only.
        free = jnp.argmax(free_mask.astype(jnp.float32)).astype(jnp.int32)
        target = jnp.where(is_new, free, idx_old)

        # Newborn cluster: patch parameter row + its c1/c0 table rows.
        @pl.when(is_new)
        def _():
            dmas = [
                pltpu.make_async_copy(
                    src.at[pl.ds(i, 1), :], birth_buf.at[pl.ds(j, 1), :],
                    birth_sem.at[j],
                )
                for j, src in enumerate((fresh_ref, f1_ref, f0_ref))
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()
            params_out_ref[pl.ds(free, 1), :] = birth_buf[pl.ds(0, 1), :]
            c1_scr[pl.ds(free, 1), :] = birth_buf[pl.ds(1, 1), :]
            c0_scr[pl.ds(free, 1), :] = birth_buf[pl.ds(2, 1), :]

        sizes_out_ref[0, :] = sizes + (iota_k[0] == target).astype(jnp.float32)
        assign_out_ref[i] = target
        return ()

    jax.lax.fori_loop(0, n, body, (), unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep(xm_p, xm0_p, gum_p, fresh_p, f1_p, f0_p, aux, assign_p,
                 sizes, params, c1, c0, log_denom, *, interpret=False):
    """Run the fused sweep. All arrays pre-permuted and pre-padded:

    xm_p/xm0_p/fresh_p/f1_p/f0_p: [n, m_pad]; gum_p: [n, k_pad];
    aux: [n] (new-cluster logit + gumbel); assign_p: [n] i32;
    sizes: [k_pad] f32 with -1 sentinels; params/c1/c0: [k_pad, m_pad].

    Returns (assignment_p [n] i32, sizes [k_pad] f32, params [k_pad, m_pad]).
    """
    n, m_pad = xm_p.shape
    k_pad = gum_p.shape[1]

    out = pl.pallas_call(
        _sweep_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, m_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xm
            pl.BlockSpec(memory_space=pl.ANY),   # xm0
            pl.BlockSpec(memory_space=pl.ANY),   # gum
            pl.BlockSpec(memory_space=pl.ANY),   # fresh
            pl.BlockSpec(memory_space=pl.ANY),   # f1
            pl.BlockSpec(memory_space=pl.ANY),   # f0
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux
            pl.BlockSpec(memory_space=pltpu.SMEM),  # assign
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sizes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c0
            pl.BlockSpec(memory_space=pltpu.SMEM),  # log_denom
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, m_pad), jnp.float32),
            pltpu.VMEM((2, 1, k_pad), jnp.float32),
            pltpu.VMEM((3, m_pad), jnp.float32),
            pltpu.VMEM((k_pad, m_pad), jnp.float32),
            pltpu.VMEM((k_pad, m_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        xm_p, xm0_p, gum_p, fresh_p, f1_p, f0_p,
        aux.astype(jnp.float32),
        assign_p.astype(jnp.int32),
        sizes[None, :].astype(jnp.float32),
        params, c1, c0,
        jnp.asarray(log_denom, jnp.float32)[None, None],
    )
    assign_out, sizes_out, params_out = out
    return assign_out, sizes_out[0], params_out
