"""Fused dot-free Pallas TPU kernel for the sequential per-cell Gibbs sweep.

The XLA lax.scan formulation (bnpc_tpu/models/gibbs.py) is latency-bound:
~13us of While-loop dispatch per cell. This kernel runs the WHOLE sweep in
one pallas_call with ZERO in-loop matmuls or per-cell DMAs: the two
likelihood matrices the sweep can ever need are precomputed outside as large
MXU matmuls (reference semantics: update_assignments_Gibbs,
libs/CRP.py:254-299):

  * ``ll0 [n, k_pad]`` — every cell against every current slot's
    parameters, with the cell's hoisted Gumbel noise folded in
    (Z = ll0 + gumbel), staged once into a VMEM-resident working matrix;
  * ``lf [n, n]`` — every cell against every cell's pre-drawn newborn
    (Beta-posterior) parameter row; a birth's column patch is one DMA of a
    128-lane-aligned column slice.

All arrays stay in ABSOLUTE cell order; the sweep's random permutation is a
single SMEM indirection per iteration (``cell = perm[i]``), which removes
four [n, *] gather passes and a 100 MB transpose from the per-sweep
precompute.

Each cell iteration is then pure VPU work on [1, k_pad] vectors: mask the
live slots, add the CRP size prior and the hoisted Gumbel row, argmax, and
update the size/assignment state. On a (rare) cluster birth, the newborn
slot's V column is patched via one [n, 128] block DMA + a masked-lane merge,
and its parameter row via one [1, m_pad] HBM->HBM DMA.

Semantics are IDENTICAL to the scan implementation given the same hoisted
randomness (permutation, Gumbel noise, fresh Beta rows); asserted bit-exactly
in interpreter mode by tests/test_pallas.py and modulo the TPU log
approximation (~2e-6 absolute, measured) when compiled — the only divergence
channel is an argmax flip on a near-tied categorical, which is statistically
immaterial (both outcomes are valid draws from a negligibly perturbed
categorical).

Mosaic compiled-mode landmines (measured on this image, 2026-08-16, and
designed around):
  * in-loop dots wider than one 128-lane tile ICE the compiler -> this
    kernel has no dots at all;
  * single-row slices of tiled HBM/VMEM arrays are rejected ("slice shape
    must be aligned to tiling") -> all DMA sources/destinations slice an
    untiled LEADING dim (lf4 [nb, n, 128], fresh3/params3 [x, 1, m_pad]);
  * aliased SMEM/HBM outputs do NOT start with the aliased input's contents
    inside the kernel -> initial values are read from the input refs and
    copied explicitly;
  * jnp.argmax tie-breaking differs from XLA (returns a non-first lane) ->
    the first-free-slot pick uses a masked index-min instead (ties in the
    Gumbel logits themselves are measure-zero).
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


def _sds(shape, dtype, *like):
    """ShapeDtypeStruct whose varying-mesh-axes are the union of the traced
    inputs' — required by shard_map's vma checking when a kernel runs under
    a sharded MutAxis (its inputs are psummed/replicated, so outputs vary
    exactly as much as the inputs do; outside shard_map vma is empty)."""
    vma = frozenset()
    for x in like:
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _sweep_kernel(
    # inputs
    ll0_ref,        # [n8, k_pad] f32, ANY/HBM — Z = ll0 + gumbel
    #                 (absolute cell order)
    gum_ref,        # [n8, k_pad] f32, ANY/HBM (birth-only use)
    lf2_ref,        # [n8, nb*128] f32, ANY/HBM — lf2[j, b] = ll(cell j |
    #                 fresh row of cell b)
    fresh3_ref,     # [n, 1, m_pad] f32, ANY/HBM — newborn parameter rows
    aux_ref,        # [n] f32, SMEM — new-cluster logit incl. its gumbel
    assign_in_ref,  # [n] i32, SMEM
    perm_ref,       # [n] i32, SMEM — the sweep's cell visit order
    sizes_in_ref,   # [1, k_pad] f32, VMEM (-1 sentinel on padded slots)
    params3_in_ref,  # [k_pad, 1, m_pad] f32, ANY/HBM
    logden_ref,     # [1, 1] f32, SMEM
    # outputs
    assign_out_ref,  # [n] i32, SMEM (absolute cell order)
    sizes_out_ref,   # [1, k_pad] f32, VMEM
    params3_out_ref,  # [k_pad, 1, m_pad] f32, ANY/HBM
    # scratch
    v_scr,          # [n8, k_pad] f32 — the resident working likelihood matrix
    colblk,         # [n8, 128] f32 — birth-column staging block
    free_scr,       # [1] i32 — first-free slot of the current iteration
    init_sem, pinit_sem, col_sem, prow_sem,
):
    # v_scr rows are padded to a sublane multiple; the loop runs over the
    # real cell count (the SMEM assignment length).
    n = assign_in_ref.shape[0]
    k_pad = v_scr.shape[1]

    # Stage initial state. Outputs do not start with the inputs' contents
    # (see module docstring), so V, params, and sizes are copied explicitly.
    init_dma = pltpu.make_async_copy(ll0_ref, v_scr, init_sem)
    init_dma.start()
    pinit_dma = pltpu.make_async_copy(params3_in_ref, params3_out_ref,
                                      pinit_sem)
    pinit_dma.start()
    sizes_out_ref[...] = sizes_in_ref[...]
    init_dma.wait()
    pinit_dma.wait()

    log_denom = logden_ref[0, 0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)[0]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, sizes_cur):
        cell = perm_ref[i]
        # Remove the cell from its cluster (libs/CRP.py:262-266). Each cell
        # is visited exactly once, so its pre-sweep assignment (input ref)
        # is its current one. The sizes row rides the loop carry (vector
        # registers) instead of a VMEM read-modify-write per iteration.
        old = assign_in_ref[cell]
        sizes = sizes_cur - (iota_k == old).astype(jnp.float32)

        # Z-formulation: the resident matrix already carries the hoisted
        # Gumbel noise (models/gibbs.py), so ONE row load + the size prior
        # is the whole categorical. Dead and padded lanes need no explicit
        # mask: log(max(sizes, 0)) is -inf there (sizes uses a -1 sentinel
        # on padded slots), and the live-lane values are bit-identical to
        # the scan's where(live, z + prior, -inf).
        v = v_scr[pl.ds(cell, 1), :][0]
        logits = v + (jnp.log(jnp.maximum(sizes, 0.0)) - log_denom)
        best_old = jnp.max(logits)
        idx_old = jnp.argmax(logits).astype(jnp.int32)

        # The free-slot search (two vector reductions) only matters when
        # the new-cluster option actually beats every occupied slot — rare
        # at stationarity — so it runs under pl.when. free == k_pad means
        # "no free slot": the birth is then vetoed, matching the masked
        # post_new of the scan implementations.
        cand = aux_ref[cell] > best_old
        free_scr[0] = k_pad

        @pl.when(cand)
        def _():
            # First free slot. NOT jnp.argmax: Mosaic's argmax does not
            # return the first tied lane (measured).
            free_scr[0] = jnp.min(
                jnp.where(sizes == 0.0, iota_k, k_pad)
            ).astype(jnp.int32)

        free = free_scr[0]
        is_new = cand & (free < k_pad)
        target = jnp.where(is_new, free, idx_old)

        # Newborn cluster: patch the slot's parameter row (HBM->HBM) and its
        # V column (one contiguous [n, 128] block DMA + masked-lane merge).
        # The newborn slot's Z column carries every cell's own hoisted
        # Gumbel noise for it; gum lives in HBM (it is only touched on the
        # rare birth), so its lane block is a second DMA through the same
        # staging buffer. Both merges write lane `free`, so the final value
        # is col + gcol exactly as the scan computes it.
        @pl.when(is_new)
        def _():
            start = pl.multiple_of(jax.lax.div(cell, 128) * 128, 128)
            lane = jax.lax.rem(cell, 128)
            col_dma = pltpu.make_async_copy(
                lf2_ref.at[:, pl.ds(start, 128)], colblk, col_sem)
            col_dma.start()
            prow_dma = pltpu.make_async_copy(
                fresh3_ref.at[cell], params3_out_ref.at[free], prow_sem)
            prow_dma.start()
            col_dma.wait()
            col = jnp.sum(
                colblk[...] * (lane128 == lane).astype(jnp.float32),
                axis=1, keepdims=True)                       # [n, 1]
            v_scr[...] = jnp.where(lane_iota == free, col, v_scr[...])
            gstart = pl.multiple_of(jax.lax.div(free, 128) * 128, 128)
            glane = jax.lax.rem(free, 128)
            g_dma = pltpu.make_async_copy(
                gum_ref.at[:, pl.ds(gstart, 128)], colblk, col_sem)
            g_dma.start()
            g_dma.wait()
            gcol = jnp.sum(
                colblk[...] * (lane128 == glane).astype(jnp.float32),
                axis=1, keepdims=True)                       # [n, 1]
            v_scr[...] = jnp.where(lane_iota == free, v_scr[...] + gcol,
                                   v_scr[...])
            prow_dma.wait()

        assign_out_ref[cell] = target
        return sizes + (iota_k == target).astype(jnp.float32)

    sizes_out_ref[0, :] = jax.lax.fori_loop(
        0, n, body, sizes_out_ref[0, :], unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep(ll0, gum, lf2, fresh3, aux, assign, perm, sizes, params3,
                 log_denom, *, interpret=False):
    """Run the fused sweep. All arrays in ABSOLUTE cell order, pre-padded:

    ll0: [n8, k_pad] the Gumbel-folded Z matrix (ll0 + gumbel);
    gum: [n8, k_pad]; lf2: [n8, nb*128] where n8 = n
    rounded up to the f32 sublane tile (8) and nb = ceil(n/128);
    fresh3: [n, 1, m_pad]; aux: [n] (new-cluster logit + gumbel);
    assign: [n] i32; perm: [n] i32 visit order; sizes: [k_pad] f32 with -1
    sentinels; params3: [k_pad, 1, m_pad].

    Returns (assignment [n] i32, sizes [k_pad] f32, params [k_pad, m_pad]).
    """
    n_pad8, k_pad = ll0.shape
    n = assign.shape[0]
    m_pad = fresh3.shape[2]

    out = pl.pallas_call(
        _sweep_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, 1, m_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # ll0 (Z)
            pl.BlockSpec(memory_space=pl.ANY),      # gum (birth-only)
            pl.BlockSpec(memory_space=pl.ANY),      # lf2
            pl.BlockSpec(memory_space=pl.ANY),      # fresh3
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux
            pl.BlockSpec(memory_space=pltpu.SMEM),  # assign
            pl.BlockSpec(memory_space=pltpu.SMEM),  # perm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sizes
            pl.BlockSpec(memory_space=pl.ANY),      # params3
            pl.BlockSpec(memory_space=pltpu.SMEM),  # log_denom
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad8, k_pad), jnp.float32),
            pltpu.VMEM((n_pad8, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        ll0, gum, lf2, fresh3,
        aux.astype(jnp.float32),
        assign.astype(jnp.int32),
        perm.astype(jnp.int32),
        sizes[None, :].astype(jnp.float32),
        params3,
        jnp.asarray(log_denom, jnp.float32)[None, None],
    )
    assign_out, sizes_out, params3_out = out
    return assign_out, sizes_out[0], params3_out[:, 0, :]


def vmem_budget_bytes(n: int, k_max: int) -> int:
    """VMEM the kernel needs resident (V + colblk staging), in bytes.

    The Gumbel matrix stays in HBM (only touched on births), so the fused
    sweep fits e.g. 10,000 cells at k_max=128 on a 16 MB-VMEM core."""
    k_pad = _round_up(k_max, 128)
    return 4 * (n * k_pad + n * 128)


# ---------------------------------------------------------------------------
# Lazy-birth segment kernel
# ---------------------------------------------------------------------------
#
# The eager kernel above needs every potential newborn cluster materialized
# up front: a [n, m] Beta field, its log tables, and a [n, n] cross-
# likelihood matmul — ~60% of the whole sweep's device time at the headline
# shape — even though only the few cells that actually BIRTH a cluster ever
# consume a column. The lazy design splits the sweep at birth events
# instead (reference semantics are unchanged: the new-cluster LOGIT is the
# analytic prior-predictive, libs/CRP.py:230-234; the newborn parameter row
# is only drawn once a birth happens, libs/CRP.py:291-294):
#
#   * this kernel runs the per-cell loop from a dynamic start position and
#     EXITS at the first cluster birth, returning the per-position targets,
#     the updated sizes row, and the (cell, slot) of the pending birth. The
#     loop is VECTOR-FLOW batched (measured 18% faster than the scalar-
#     crossing formulation, benchmarks/vecflow_probe.py): the serial chain
#     is latency-bound on vector->scalar crossings, so reductions stay
#     [1, 1] vectors, targets accumulate in a [1, 128] register window
#     flushed once per batch, and the birth exit is one scalar check per
#     128-cell batch (post-birth cells in the batch run inert and are
#     recomputed by the relaunch);
#   * the caller (models/gibbs.py::_pallas_lazy_impl) patches the Z matrix
#     column and the parameter row for that one birth in XLA — one Beta row
#     draw + one [n, m] matvec — and relaunches the kernel at the next
#     position. Launches per sweep = births + 1, and a launch's fixed cost
#     is one [n8, k_pad] HBM->VMEM restage of Z.
#
# The kernel itself needs no newborn inputs at all (no lf2 matrix, no fresh
# rows, no gum staging, no params DMA), so its VMEM footprint is just the
# resident Z working matrix.


_LANE = 128  # batch size of the vector-flow loop == the VPU lane width


def _lazy_segment_kernel(
    track_veto,     # static: whether to spend per-cell ops on cap_veto
    # inputs
    z_ref,          # [n8, k_pad] f32, ANY/HBM — current Z (Gumbel folded),
    #                 kept up to date across launches by the caller
    aux_ref,        # [n] f32, SMEM — new-cluster logit incl. its gumbel
    assign_ref,     # [n] i32, SMEM — assignment BEFORE this sweep for cells
    #                 not yet visited (each cell is visited exactly once)
    perm_ref,       # [n] i32, SMEM — the sweep's cell visit order
    sizes_in_ref,   # [1, k_pad] f32, VMEM (-1 sentinel on padded slots)
    i0_ref,         # [1] i32, SMEM — start position in the permutation
    logden_ref,     # [1, 1] f32, SMEM
    # outputs
    tgt_out_ref,    # [nb, 128] i32, VMEM — chosen slot per PERMUTATION
    #                 POSITION (row-major); only [i0, i_next) is meaningful
    sizes_out_ref,  # [1, k_pad] f32, VMEM
    info_ref,       # [4] i32, SMEM — (i_next, birth_cell, birth_slot,
    #                 cap_veto); birth_cell == -1 when the segment ran to
    #                 the end; cap_veto = 1 iff some cell's new-cluster
    #                 option won but NO free slot existed (the birth was
    #                 vetoed by the k_max capacity — the live-width fast
    #                 path replays such steps at full width, mcmc.py)
    # scratch
    v_scr,          # [n8, k_pad] f32 — the resident Z working matrix
    init_sem,
):
    # Vector-flow formulation (benchmarks/vecflow_probe.py): the serial
    # per-cell chain is latency-bound on vector->scalar crossings, so the
    # whole carry stays in vector registers — the target pick is two
    # lane-reductions that STAY [1, 1], targets accumulate in a [1, 128]
    # register window flushed once per batch, and the birth early-exit is
    # ONE vector->scalar check per 128 cells (in-batch cells after a birth
    # run inert via the `act` predicate; the caller relaunches at the birth
    # position + 1, so their lanes are recomputed then).
    n = assign_ref.shape[0]
    k_pad = v_scr.shape[1]
    nb = tgt_out_ref.shape[0]
    nI = jnp.int32(n)

    init_dma = pltpu.make_async_copy(z_ref, v_scr, init_sem)
    init_dma.start()
    # Batches before i0 / after a birth flush zero windows over positions
    # the caller ignores; the explicit init just keeps the output
    # deterministic (never uninitialized VMEM).
    tgt_out_ref[...] = jnp.zeros((nb, _LANE), jnp.int32)
    init_dma.wait()

    log_denom = logden_ref[0, 0]
    i0 = i0_ref[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    iota_kf = iota_k.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    kpadf = jnp.float32(k_pad)

    def outer_cond(carry):
        b, _, bposv, _, _ = carry
        return (b < nb) & (bposv[0, 0] >= nI)

    def outer_body(carry):
        b, sizes0, bposv0, bslotv0, vetov0 = carry
        base = b * _LANE

        def body(j, c):
            sizes, bposv, bslotv, w, vetov = c
            i = base + j
            # Inert positions still issue their SMEM reads — keep the
            # indices in bounds (OOB SMEM reads fault nondeterministically).
            cell = perm_ref[jnp.minimum(i, n - 1)]
            old = assign_ref[cell]
            # Active: inside [i0, n) and no birth yet this launch. Computed
            # against the CARRIED bposv, so the birth iteration itself is
            # active and everything after it in the batch is inert.
            act = ((i >= i0) & (i < n)) & (bposv >= nI)  # [1, 1]

            # Remove the cell from its cluster (libs/CRP.py:262-266).
            sizes = sizes - ((iota_k == old) & act).astype(jnp.float32)

            v = v_scr[pl.ds(cell, 1), :]
            logits = v + (jnp.log(jnp.maximum(sizes, 0.0)) - log_denom)
            best = jnp.max(logits, axis=1, keepdims=True)        # [1, 1]
            cand = (aux_ref[cell] > best) & act                  # [1, 1]
            # First free slot / first argmax lane via masked index-min (NOT
            # jnp.argmax: Mosaic's argmax does not return the first tied
            # lane; logit ties are measure-zero but the scan's tie-breaking
            # is first-lane, and the free-slot pick NEEDS first-free).
            free = jnp.min(jnp.where(sizes == 0.0, iota_kf, kpadf),
                           axis=1, keepdims=True)                # [1, 1]
            is_new = cand & (free < kpadf)
            if track_veto:
                vetov = jnp.maximum(
                    vetov, (cand & (free >= kpadf)).astype(jnp.int32))
            idx = jnp.min(jnp.where(logits == best, iota_kf, kpadf),
                          axis=1, keepdims=True)                 # [1, 1]
            tgt = jnp.where(is_new, free, idx).astype(jnp.int32)
            sizes = sizes + ((iota_k == tgt) & act).astype(jnp.float32)

            w = jnp.where(lane == j, tgt, w)
            bposv = jnp.where(is_new, i, bposv)
            bslotv = jnp.where(is_new, tgt, bslotv)
            return (sizes, bposv, bslotv, w, vetov)

        w0 = jnp.zeros((1, _LANE), jnp.int32)
        sizes, bposv, bslotv, w, vetov = jax.lax.fori_loop(
            0, _LANE, body, (sizes0, bposv0, bslotv0, w0, vetov0))
        tgt_out_ref[pl.ds(b, 1), :] = w
        return (b + 1, sizes, bposv, bslotv, vetov)

    b0 = jax.lax.div(i0, _LANE)
    _, sizes, bposv, bslotv, vetov = jax.lax.while_loop(
        outer_cond, outer_body,
        (b0, sizes_in_ref[0, :][None, :],
         jnp.full((1, 1), n, jnp.int32), jnp.full((1, 1), -1, jnp.int32),
         jnp.zeros((1, 1), jnp.int32)),
    )
    sizes_out_ref[...] = sizes
    bpos = bposv[0, 0]
    birth = bpos < nI
    info_ref[0] = jnp.where(birth, bpos + 1, nI)
    info_ref[1] = jnp.where(birth, perm_ref[jnp.minimum(bpos, n - 1)], -1)
    info_ref[2] = jnp.where(birth, bslotv[0, 0], -1)
    info_ref[3] = vetov[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "track_veto"))
def pallas_lazy_segment(z, aux, assign, perm, sizes, i0, log_denom, *,
                        interpret=False, track_veto=False):
    """Run one birth-bounded segment of the sweep (see kernel docstring).

    z: [n8, k_pad] the current Gumbel-folded Z matrix; aux: [n]; assign [n]
    i32; perm [n] i32; sizes [1, k_pad] f32 with -1 sentinels; i0 scalar
    i32 start position.

    Returns (targets_by_position [n] i32, sizes [1, k_pad] f32,
    info [4] i32 = (i_next, birth_cell, birth_slot, cap_veto)).
    """
    n_pad8, k_pad = z.shape
    n = assign.shape[0]
    nb = -(-n // _LANE)

    tgt2, sizes_out, info = pl.pallas_call(
        functools.partial(_lazy_segment_kernel, track_veto),
        out_shape=(
            _sds((nb, _LANE), jnp.int32, z, aux, sizes),
            _sds((1, k_pad), jnp.float32, z, aux, sizes),
            _sds((4,), jnp.int32, z, aux, sizes),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # z
            pl.BlockSpec(memory_space=pltpu.SMEM),  # aux
            pl.BlockSpec(memory_space=pltpu.SMEM),  # assign
            pl.BlockSpec(memory_space=pltpu.SMEM),  # perm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sizes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # i0
            pl.BlockSpec(memory_space=pltpu.SMEM),  # log_denom
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad8, k_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        z,
        aux.astype(jnp.float32),
        assign.astype(jnp.int32),
        perm.astype(jnp.int32),
        sizes.astype(jnp.float32),
        jnp.asarray(i0, jnp.int32)[None],
        jnp.asarray(log_denom, jnp.float32)[None, None],
    )
    return tgt2.reshape(-1)[:n], sizes_out, info


def lazy_vmem_budget_bytes(n: int, k_max: int) -> int:
    """VMEM the lazy segment kernel needs resident (just Z), in bytes."""
    k_pad = _round_up(k_max, 128)
    return 4 * _round_up(n, 8) * k_pad


# ---------------------------------------------------------------------------
# Streaming (HBM-chunked) lazy segment kernel
# ---------------------------------------------------------------------------
#
# The resident kernels above cap n * k_pad at VMEM (~26k cells at k_pad=128).
# This variant keeps Z in HBM and stages it through a chunk-sized VMEM buffer
# instead, so the sweep scales to any cell count the chip's HBM holds.
#
# Two reformulations make the streaming cheap:
#   * everything is in VISIT (permutation) order — the caller gathers
#     Z/aux/assign by `perm` once per sweep — so the kernel consumes rows
#     SEQUENTIALLY and a chunk is one tile-aligned leading-dim DMA
#     (zp3[g] -> buf), with no in-kernel permutation indirection at all;
#   * the chunk DMA is synchronous (no double buffering): staging 2048 rows
#     costs ~1 us of HBM bandwidth against ~470 us of serial per-cell
#     compute, so overlap would hide nothing.
#
# Early exit at a birth works exactly like pallas_lazy_segment: the kernel
# returns (i_next, birth_pos, birth_slot) and the caller patches the newborn
# Z column (in visit order) and relaunches.


def _lazy_stream_kernel(
    track_veto,     # static: whether to spend per-cell ops on cap_veto
    # inputs
    zp3_ref,        # [G, C, k_pad] f32, ANY/HBM — Z rows in VISIT order
    auxp3_ref,      # [G, 1, C] f32, ANY/HBM — new-cluster logit per position
    assignp3_ref,   # [G, 1, C] i32, ANY/HBM — pre-sweep assignment of perm[i]
    sizes_in_ref,   # [1, k_pad] f32, VMEM (-1 sentinel on padded slots)
    i0_ref,         # [2] i32, SMEM — (start position, real cell count)
    logden_ref,     # [1, 1] f32, SMEM
    # outputs
    tgt_out_ref,    # [nb, B] i32, VMEM — chosen slot per position
    #                 (row-major); only [i0, i_next) is meaningful
    sizes_out_ref,  # [1, k_pad] f32, VMEM
    info_ref,       # [4] i32, SMEM — (i_next, birth_pos, birth_slot,
    #                 cap_veto — see _lazy_segment_kernel)
    # scratch
    buf,            # [C, k_pad] f32, VMEM — Z chunk staging buffer
    abuf,           # [1, C] f32, SMEM — aux chunk
    sbuf,           # [1, C] i32, SMEM — assignment chunk
    sem, asem, ssem,
):
    # Same vector-flow batched loop as _lazy_segment_kernel (see its
    # notes), with one structural change: instead of nesting a batch loop
    # inside a chunk loop (three loop levels — a Mosaic ICE risk), there is
    # ONE while over batches and the chunk DMAs fire under pl.when whenever
    # the batch enters a new chunk. B divides C (asserted by the wrapper),
    # so a batch never straddles a chunk boundary.
    #
    # aux/assign are chunk-staged into SMEM alongside the Z chunk (HBM->SMEM
    # DMA) rather than held as [n] SMEM inputs: the per-cell reads stay on
    # the SCALAR unit — off the vector critical path, where they are ~free
    # because the index is a pure function of the loop counter — while the
    # scalar-memory footprint is one chunk (two [1, C] buffers), not O(n).
    # (The round-3 [n]-SMEM layout capped at 98,304 cells; a round-4 interim
    # that read aux/assign from VMEM via lane reductions put 4 extra vector
    # ops on the serial chain and measured 60% slower at 50k cells.)
    C, k_pad = buf.shape
    nb, B = tgt_out_ref.shape
    n = i0_ref[1]  # real cell count (positions >= n are padding)
    nI = n

    tgt_out_ref[...] = jnp.zeros((nb, B), jnp.int32)

    log_denom = logden_ref[0, 0]
    i0 = i0_ref[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    iota_kf = iota_k.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    kpadf = jnp.float32(k_pad)

    def outer_cond(carry):
        b, _, _, bposv, _, _ = carry
        return (b < nb) & (bposv[0, 0] >= nI)

    def outer_body(carry):
        b, g_cur, sizes0, bposv0, bslotv0, vetov0 = carry
        base = b * B
        g = jax.lax.div(base, C)

        @pl.when(g != g_cur)
        def _():
            dma = pltpu.make_async_copy(zp3_ref.at[g], buf, sem)
            dma.start()
            a_dma = pltpu.make_async_copy(auxp3_ref.at[g], abuf, asem)
            a_dma.start()
            s_dma = pltpu.make_async_copy(assignp3_ref.at[g], sbuf, ssem)
            s_dma.start()
            dma.wait()
            a_dma.wait()
            s_dma.wait()

        boff = base - g * C  # the batch's row offset inside the chunk

        def body(j, c):
            sizes, bposv, bslotv, w, vetov = c
            pp = base + j
            old = sbuf[0, boff + j]
            act = ((pp >= i0) & (pp < nI)) & (bposv >= nI)  # [1, 1]

            sizes = sizes - ((iota_k == old) & act).astype(jnp.float32)

            v = buf[pl.ds(boff + j, 1), :]
            logits = v + (jnp.log(jnp.maximum(sizes, 0.0)) - log_denom)
            best = jnp.max(logits, axis=1, keepdims=True)        # [1, 1]
            cand = (abuf[0, boff + j] > best) & act              # [1, 1]
            free = jnp.min(jnp.where(sizes == 0.0, iota_kf, kpadf),
                           axis=1, keepdims=True)                # [1, 1]
            is_new = cand & (free < kpadf)
            if track_veto:
                vetov = jnp.maximum(
                    vetov, (cand & (free >= kpadf)).astype(jnp.int32))
            idx = jnp.min(jnp.where(logits == best, iota_kf, kpadf),
                          axis=1, keepdims=True)                 # [1, 1]
            tgt = jnp.where(is_new, free, idx).astype(jnp.int32)
            sizes = sizes + ((iota_k == tgt) & act).astype(jnp.float32)

            w = jnp.where(lane == j, tgt, w)
            bposv = jnp.where(is_new, pp, bposv)
            bslotv = jnp.where(is_new, tgt, bslotv)
            return (sizes, bposv, bslotv, w, vetov)

        w0 = jnp.zeros((1, B), jnp.int32)
        sizes, bposv, bslotv, w, vetov = jax.lax.fori_loop(
            0, B, body, (sizes0, bposv0, bslotv0, w0, vetov0))
        tgt_out_ref[pl.ds(b, 1), :] = w
        return (b + 1, g, sizes, bposv, bslotv, vetov)

    b0 = jax.lax.div(i0, B)
    _, _, sizes, bposv, bslotv, vetov = jax.lax.while_loop(
        outer_cond, outer_body,
        (b0, jnp.int32(-1), sizes_in_ref[0, :][None, :],
         jnp.full((1, 1), n, jnp.int32), jnp.full((1, 1), -1, jnp.int32),
         jnp.zeros((1, 1), jnp.int32)),
    )
    sizes_out_ref[...] = sizes
    bpos = bposv[0, 0]
    birth = bpos < nI
    info_ref[0] = jnp.where(birth, bpos + 1, nI)
    info_ref[1] = jnp.where(birth, bpos, -1)
    info_ref[2] = jnp.where(birth, bslotv[0, 0], -1)
    info_ref[3] = vetov[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "track_veto"))
def pallas_lazy_segment_stream(zp3, auxp, assignp, sizes, i0, log_denom, *,
                               interpret=False, track_veto=False):
    """Run one birth-bounded segment of the sweep, streaming Z from HBM.

    zp3: [G, C, k_pad] the Gumbel-folded Z matrix in VISIT order, chunked
    (rows >= n are padding); auxp [n] f32 and assignp [n] i32 also in visit
    order; sizes [1, k_pad] f32 with -1 sentinels; i0 scalar i32.

    Returns (targets_by_position [n] i32, sizes [1, k_pad] f32,
    info [4] i32 = (i_next, birth_pos, birth_slot, cap_veto)); birth_pos
    is a PERMUTATION POSITION (the caller maps it to a cell via perm).
    """
    G, C, k_pad = zp3.shape
    n = auxp.shape[0]
    B = min(_LANE, C)
    assert C % B == 0, (C, B)
    nb = -(-n // B)
    npad = G * C

    tgt2, sizes_out, info = pl.pallas_call(
        functools.partial(_lazy_stream_kernel, track_veto),
        out_shape=(
            _sds((nb, B), jnp.int32, zp3, auxp, sizes),
            _sds((1, k_pad), jnp.float32, zp3, auxp, sizes),
            _sds((4,), jnp.int32, zp3, auxp, sizes),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # zp3
            pl.BlockSpec(memory_space=pl.ANY),      # auxp3
            pl.BlockSpec(memory_space=pl.ANY),      # assignp3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sizes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (i0, n)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # log_denom
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(zp3.shape[1:], jnp.float32),
            pltpu.SMEM((1, C), jnp.float32),
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        zp3,
        jnp.pad(auxp.astype(jnp.float32), (0, npad - n)).reshape(G, 1, C),
        jnp.pad(assignp.astype(jnp.int32), (0, npad - n)).reshape(G, 1, C),
        sizes.astype(jnp.float32),
        jnp.stack([jnp.asarray(i0, jnp.int32), jnp.int32(n)]),
        jnp.asarray(log_denom, jnp.float32)[None, None],
    )
    return tgt2.reshape(-1)[:n], sizes_out, info


def stream_chunk_rows(k_max: int, n: int = 0,
                      budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Chunk row count for the streaming kernel: fill VMEM left over after
    the [nb, B]-shaped target output (4 bytes/cell; aux/assign are
    SMEM-chunk-staged and cost no VMEM). A multiple of the 128-cell batch
    size so batches never straddle chunks."""
    k_pad = _round_up(k_max, 128)
    left = max(budget_bytes - 4 * _round_up(max(n, 1), _LANE),
               4 * _LANE * k_pad)
    return max(_LANE, _round_up(min(left, 8 * 1024 * 1024) // (4 * k_pad),
                                _LANE))


def stream_vmem_budget_bytes(n: int, k_max: int) -> int:
    """VMEM the streaming kernel needs resident: the Z chunk buffer plus the
    per-position target array (4 bytes per padded cell)."""
    k_pad = _round_up(k_max, 128)
    return 4 * stream_chunk_rows(k_max, n) * k_pad \
        + 4 * _round_up(n, _LANE)
