"""Fused Pallas TPU kernel for the sequential per-cell Gibbs sweep.

The XLA lax.scan formulation (bnpc_tpu/models/gibbs.py) is latency-bound:
~13us of While-loop dispatch per cell. This kernel runs the WHOLE sweep in
one pallas_call with the per-cluster log-probability tables VMEM-resident, so
each cell iteration is:

  * two double-buffered row DMAs (the cell's concatenated xm|xm0 planes and
    its Gumbel row) — read-only, prefetched one iteration ahead;
  * ONE [k, 2m] x [2m] MXU matvec for the cell's log-likelihood row (the c1
    and c0 tables are concatenated along lanes, matching the xm|xm0 layout);
  * VPU masking/argmax for the CRP-weighted categorical draw;
  * on a (rare) cluster birth: three direct HBM->VMEM DMAs patch the newborn
    slot's parameter row and its table row in place.

Semantics are IDENTICAL to the scan implementation given the same hoisted
randomness (permutation, Gumbel noise, fresh Beta rows): the equivalence is
asserted in tests/test_pallas.py. Shapes are padded to TPU tiling (m, k to
multiples of 128); padded mutation columns carry zero data weight and padded
cluster slots use a size sentinel of -1 (never live, never free).

Mosaic toolchain status (bisected 2026-08-16 on the axon remote compiler,
which ICEs — "tpu_compile_helper subprocess exit code 1" — on specific
patterns inside a fori_loop):
  * mixing an MXU dot result with a value read from a ref that is
    vector-stored in the loop crashes; staging the dot result through a VMEM
    scratch fixes it (applied below);
  * summing TWO dot results crashes — even staged separately; hence the
    single concatenated matvec (applied below);
  * vector stores into a ref that feeds a dot crash; newborn rows are
    patched with DMAs instead (applied below);
  * REMAINING BLOCKER: any in-loop dot with input OR output wider than one
    128-lane tile still crashes (probed: [128,256]x[256], [256,128]x[128],
    and tiled 128-lane partial dots summed via staged reads all ICE). The
    target configs need [k<=256, 2m<=512], so this kernel cannot compile on
    the current image; it is validated in interpreter mode
    (tests/test_pallas.py, bit-identical to the scan implementation) and
    gated behind BNPC_TPU_PALLAS=1 until the toolchain is fixed.
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
    x2_ref,        # [n, 2*m_pad] f32, HBM (rows permuted; xm | xm0)
    gum_ref,       # [n, k_pad] f32, HBM
    fresh_ref,     # [n, m_pad] f32, HBM — newborn parameter row per cell
    ftab_ref,      # [n, 2*m_pad] f32, HBM — c1|c0 table rows of fresh rows
    aux_ref,       # [n] f32, SMEM — new-cluster logit incl. its gumbel
    assign_in_ref,  # [n] i32, SMEM (permuted; aliased to the output)
    sizes_in_ref,  # [1, k_pad] f32, VMEM (-1 sentinel on padded slots)
    params_in_ref,  # [k_pad, m_pad] f32, VMEM
    ctab_in_ref,   # [k_pad, 2*m_pad] f32, VMEM (c1 | c0)
    log_denom_ref,  # [1, 1] f32, SMEM
    # outputs
    assign_out_ref,  # [n] i32, SMEM
    sizes_out_ref,   # [1, k_pad] f32
    params_out_ref,  # [k_pad, m_pad] f32
    # scratch
    row_buf,       # [2, 1, 2*m_pad] f32 double-buffered x2 rows
    gum_buf,       # [2, 1, k_pad] f32
    ctab_scr,      # [k_pad, 2*m_pad] f32
    ll_scr,        # [1, k_pad] f32 — MXU-result staging
    row_sem,       # DMA sems (2, 2)
    birth_sem,     # DMA sems (2,)
):
    n = x2_ref.shape[0]
    k_pad = gum_buf.shape[2]

    # Working copies of the mutable state. The assignment input is aliased
    # to its output buffer (SMEM allows only scalar loads, so no array copy).
    del assign_in_ref
    sizes_out_ref[...] = sizes_in_ref[...]
    params_out_ref[...] = params_in_ref[...]
    ctab_scr[...] = ctab_in_ref[...]

    log_denom = log_denom_ref[0, 0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)[0]

    def row_dma(slot, i):
        return (
            pltpu.make_async_copy(
                x2_ref.at[pl.ds(i, 1), :], row_buf.at[slot],
                row_sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                gum_ref.at[pl.ds(i, 1), :], gum_buf.at[slot],
                row_sem.at[slot, 1],
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

        x2_row = row_buf[slot, 0, :]       # [2*m_pad] = xm | xm0
        gum_row = gum_buf[slot, 0, :]      # [k_pad]

        # Remove the cell from its cluster (libs/CRP.py:262-266).
        old = assign_out_ref[i]
        sizes = sizes_out_ref[0, :] - (iota_k == old).astype(jnp.float32)

        # Log-likelihood row: ONE MXU matvec against the resident tables,
        # staged through VMEM (see module docstring).
        ll_scr[0, :] = jnp.dot(
            ctab_scr[...], x2_row, preferred_element_type=jnp.float32
        )
        ll = ll_scr[0, :]

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

        # Newborn cluster: patch the parameter row and its table row via
        # direct HBM -> VMEM DMAs with a dynamic destination row.
        @pl.when(is_new)
        def _():
            dmas = [
                pltpu.make_async_copy(
                    src.at[pl.ds(i, 1), :], dst.at[pl.ds(free, 1), :],
                    birth_sem.at[j],
                )
                for j, (src, dst) in enumerate((
                    (fresh_ref, params_out_ref),
                    (ftab_ref, ctab_scr),
                ))
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        sizes_out_ref[0, :] = sizes + (iota_k == target).astype(jnp.float32)
        assign_out_ref[i] = target
        return ()

    jax.lax.fori_loop(0, n, body, (), unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep(x2_p, gum_p, fresh_p, ftab_p, aux, assign_p,
                 sizes, params, ctab, log_denom, *, interpret=False):
    """Run the fused sweep. All arrays pre-permuted and pre-padded:

    x2_p: [n, 2*m_pad] (xm | xm0); fresh_p: [n, m_pad];
    ftab_p: [n, 2*m_pad] (c1|c0 of fresh rows); gum_p: [n, k_pad];
    aux: [n] (new-cluster logit + gumbel); assign_p: [n] i32;
    sizes: [k_pad] f32 with -1 sentinels; params: [k_pad, m_pad];
    ctab: [k_pad, 2*m_pad] (c1 | c0).

    Returns (assignment_p [n] i32, sizes [k_pad] f32, params [k_pad, m_pad]).
    """
    n, m2_pad = x2_p.shape
    k_pad = gum_p.shape[1]
    m_pad = m2_pad // 2

    out = pl.pallas_call(
        _sweep_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, m_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x2
            pl.BlockSpec(memory_space=pl.ANY),      # gum
            pl.BlockSpec(memory_space=pl.ANY),      # fresh
            pl.BlockSpec(memory_space=pl.ANY),      # ftab
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux
            pl.BlockSpec(memory_space=pltpu.SMEM),  # assign
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sizes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # params
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ctab
            pl.BlockSpec(memory_space=pltpu.SMEM),  # log_denom
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, m2_pad), jnp.float32),
            pltpu.VMEM((2, 1, k_pad), jnp.float32),
            pltpu.VMEM((k_pad, m2_pad), jnp.float32),
            pltpu.VMEM((1, k_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={5: 0},  # assignment: in-place in SMEM
        interpret=interpret,
    )(
        x2_p, gum_p, fresh_p, ftab_p,
        aux.astype(jnp.float32),
        assign_p.astype(jnp.int32),
        sizes[None, :].astype(jnp.float32),
        params, ctab,
        jnp.asarray(log_denom, jnp.float32)[None, None],
    )
    assign_out, sizes_out, params_out = out
    return assign_out, sizes_out[0], params_out
