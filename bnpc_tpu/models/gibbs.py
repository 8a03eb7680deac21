"""Sequential per-cell Gibbs sweep.

Reference: update_assignments_Gibbs (libs/CRP.py:254-288). The per-cell order
dependence (through cluster sizes, occupancy, and clusters born mid-sweep) is
real, so the sweep stays sequential over a random permutation. Four
implementations share identical hoisted randomness (and therefore produce
bit-identical results; asserted in tests/test_pallas.py):

  * ``scan_cond`` (default) — lax.scan with the [n, k_max] likelihood matrix
    computed once per sweep as MXU matmuls, zero in-scan RNG (categorical
    via hoisted Gumbel argmax, newborn Beta rows pre-drawn), and a rare
    lax.cond that patches one likelihood column on cluster birth. Works
    everywhere, including vmapped chains and mutation-sharded shard_map.
  * ``scan_dense`` — branch-free: likelihoods against every potential
    newborn cluster precomputed as one [n, n] matmul; better shape under
    vmap, slower single-chain (gather-bound).
  * ``pallas`` — the lazy-birth fused TPU path (the default on TPU via
    impl="auto_single"): an early-exit segment kernel
    (ops/pallas_gibbs.py::pallas_lazy_segment) runs the per-cell loop on a
    VMEM-resident Gumbel-folded Z matrix and EXITS at each cluster birth;
    an outer while_loop draws THAT cell's newborn Beta row, patches its Z
    column (one [n, m] matvec), and relaunches. The eager newborn
    precomputes (the [n, m] Beta field, its log tables, and the [n, n]
    cross-likelihood matmul — ~60% of the eager sweep's device time) are
    skipped entirely: newborn work is proportional to actual births (a
    handful per sweep at stationarity), not to n.
  * ``pallas_eager`` — the round-2 fully-eager kernel
    (ops/pallas_gibbs.py::pallas_sweep): likelihoods against every
    potential newborn cluster precomputed as one [n, n] matmul, births
    patched in-kernel via column-slice DMA. Kept as a measured
    alternative; it loses to the lazy path unless births/sweep is huge.

All Pallas paths are unbatched-chains-on-TPU only; the lazy and streaming
variants also run under a sharded MutAxis (Z and birth columns are psummed
BEFORE the kernel, which then executes identically on every shard — the
serial sweep is replicated work either way, exactly as in the scan impls).
Bit-identical to the scan in interpreter mode, identical modulo the TPU log
approximation (~2e-6) when compiled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bnpc_tpu.config import TMIN, TMAX, ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import CRPState

_NO_AXIS = MutAxis()

NEG_INF = -jnp.inf


def _sweep_keys(key, state, cfg, ax):
    """The sweep's (perm, gumbel, k_beta) randomness, shared by ALL impls.

    The newborn-row randomness is COUNTER-BASED: cell i's row is always
    drawn from fold_in(k_beta, i), so eager implementations (which draw the
    whole [n, m] field up front) and the lazy Pallas path (which draws only
    the few rows that actually birth a cluster) produce bit-identical
    values per cell.

    The Gumbel field is drawn at cfg.rng_k + 1 columns (>= k_max + 1): the
    live-width fast path (mcmc.make_step_fn) runs a narrow k_max while
    keeping the full-width draw, so slot j's noise — and the LAST column,
    the new-cluster option's — is bit-identical between the narrow and wide
    step bodies. Impls read slot columns as gumbel[:, :k_max] and the aux
    column as gumbel[:, -1]."""
    n, k_max = cfg.n_cells, cfg.k_max
    k_perm, k_gumbel, k_beta = jax.random.split(key, 3)
    perm = jax.random.permutation(k_perm, n)
    gumbel = jax.random.gumbel(k_gumbel, (n, cfg.rng_k + 1))
    if cfg.rng_k != k_max:
        gumbel = jnp.concatenate(
            [gumbel[:, :k_max], gumbel[:, -1:]], axis=1)
    return perm, gumbel, ax.fold_key(k_beta)


def fresh_row(k_beta, cell, data, cfg):
    """Newborn parameter row for `cell` (libs/CRP.py:183-188, 291-294):
    an exact Beta(p + x, q + x0) posterior draw given that one cell."""
    from bnpc_tpu.ops.randomx import beta_binary

    return jnp.clip(
        beta_binary(jax.random.fold_in(k_beta, cell), cfg.p, cfg.q,
                    jnp.take(data.xm, cell, axis=0),
                    jnp.take(data.xm0, cell, axis=0)),
        TMIN, TMAX,
    ).astype(jnp.float32)


def _hoisted_randomness(key, state, data, cfg, ax):
    """Everything random in a sweep, drawn up front (eager impls)."""
    perm, gumbel, k_beta = _sweep_keys(key, state, cfg, ax)
    # [n, m] newborn row per cell. beta_binary is the exact Beta(p+x, q+x0)
    # specialized to binary planes — jax.random.beta with array shapes
    # costs ~85% of a whole sweep (ops/randomx.py).
    fresh = jax.vmap(
        lambda cell: fresh_row(k_beta, cell, data, cfg)
    )(jnp.arange(cfg.n_cells))
    return perm, gumbel, fresh


def _is_batched(x) -> bool:
    """True when `x` is being traced under vmap (a batched chain axis).

    The fused kernels are unbatched-only; resolving to them under vmap
    would hand the user a Mosaic lowering failure, so impl resolution falls
    back to the scan (with a warning when the kernel was forced)."""
    try:
        from jax.interpreters.batching import BatchTracer
    except ImportError:  # moved in jax 0.9
        from jax._src.interpreters.batching import BatchTracer

    return isinstance(x, BatchTracer)


# Above this cell count the RESIDENT kernels' [n]-sized SMEM arrays stop
# fitting scalar memory (measured on v5e: 98,304 cells of 8 bytes, ~786 KB,
# compiles; 131,072 does not — benchmarks/smem_probe.py). Only the resident
# lazy/eager kernels still carry [n] SMEM arrays, and their VMEM budget caps
# them at ~26k cells long before this matters; the STREAMING kernel
# chunk-stages aux/assign through SMEM DMA since round 4, so its ceiling is
# the VMEM accounting in ops/pallas_gibbs.py::stream_vmem_budget_bytes
# (~3.4M cells at k_pad=128).
SMEM_CELL_CAP = 98304


def resolve_stream(cfg: ModelConfig) -> bool:
    """True when impl="pallas" means the STREAMING lazy kernel: the
    VMEM-resident Z matrix no longer fits, so Z stays in HBM and the kernel
    stages it through chunk buffers (ops/pallas_gibbs.py::
    pallas_lazy_segment_stream)."""
    from bnpc_tpu.ops.pallas_gibbs import lazy_vmem_budget_bytes

    return lazy_vmem_budget_bytes(cfg.n_cells, cfg.k_max) > 13 * 1024 * 1024


def pallas_available(cfg: ModelConfig, ax: MutAxis = _NO_AXIS,
                     eager: bool = False) -> bool:
    """Whether a fused Pallas sweep can run here: TPU backend and the
    buffers fit. The lazy/stream kernels also run under a sharded MutAxis
    (their inputs are psummed before the kernel); the eager kernel is
    additionally unsharded-only. The eager kernel needs all of
    Z + the column staging block resident in VMEM (~16 MB/core; ~3 MB
    headroom left for Mosaic temporaries); the default lazy kernel needs
    just Z — and when even that exceeds VMEM, the streaming variant takes
    over (Z in HBM, chunk-staged), bounded by its own VMEM accounting."""
    import os

    from bnpc_tpu.ops.pallas_gibbs import vmem_budget_bytes

    if os.environ.get("BNPC_TPU_PALLAS", "") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if eager:
        # The eager kernel patches births in-kernel from the precomputed
        # lf2 matrix — keeping it unsharded-only bounds its test surface.
        return (not ax.sharded) and \
            vmem_budget_bytes(cfg.n_cells, cfg.k_max) <= 13 * 1024 * 1024
    if resolve_stream(cfg):
        from bnpc_tpu.ops.pallas_gibbs import stream_vmem_budget_bytes

        return stream_vmem_budget_bytes(cfg.n_cells, cfg.k_max) \
            <= 13 * 1024 * 1024
    # The resident lazy kernel keeps aux/assign/perm as [n] SMEM arrays,
    # but its VMEM-resident Z already caps it far below the SMEM ceiling.
    return cfg.n_cells <= SMEM_CELL_CAP


def gibbs_sweep(key, state: CRPState, data: PackedData,
                cfg: ModelConfig, ax: MutAxis = _NO_AXIS,
                impl: str = "auto", interpret: bool = False,
                return_veto: bool = False, block: int = 0):
    """One full Gibbs sweep. With ``return_veto`` returns (state, veto)
    where veto is True iff some cell's new-cluster option won its
    categorical but NO free slot existed (a birth vetoed by the k_max
    capacity) — the live-width fast path (mcmc.make_step_fn) replays such
    steps at full width. Not supported for impl="pallas_eager".

    impl="blocked" selects the opt-in APPROXIMATE blocked sweep
    (_blocked_impl; ``block`` is its block size, default 128)."""
    if impl == "auto":
        # Safe-everywhere default (vmapped chains, sharded, CPU). Callers
        # that run chains unbatched pass impl="auto_single" to get the fused
        # kernel; BNPC_TPU_PALLAS=1 forces it on here too.
        import os

        impl = (
            "pallas"
            if (os.environ.get("BNPC_TPU_PALLAS", "") == "1"
                and pallas_available(cfg, ax))
            else "scan"
        )
    elif impl == "auto_single":
        impl = "pallas" if pallas_available(cfg, ax) else "scan"

    if impl in ("pallas", "pallas_eager", "pallas_stream") \
            and _is_batched(state.assignment):
        import warnings

        warnings.warn(
            "bnpc_tpu: the fused Pallas Gibbs sweep cannot run under vmapped"
            " chains; falling back to the scan implementation. Run chains"
            " unbatched (chain_exec='sequential' or a sharded chain mesh) to"
            " use the kernel.",
            stacklevel=2,
        )
        impl = "scan"

    # Per-sweep constants: alpha is fixed within a sweep, so the new-cluster
    # posterior is precomputed for all cells at once (libs/CRP.py:258).
    n = cfg.n_cells
    alpha = state.dp_alpha
    log_denom = jnp.log(n - 1.0 + alpha)
    new_post = lk.new_cluster_ll(data, cfg, state.fp, state.fn) \
        + jnp.log(alpha) - log_denom

    if impl == "blocked":
        perm, gumbel, k_beta = _sweep_keys(key, state, cfg, ax)
        out = _blocked_impl(state, data, cfg, ax, perm, gumbel, k_beta,
                            new_post, log_denom, block or 128)
        return out if return_veto else out[0]

    if impl == "pallas" and resolve_stream(cfg):
        impl = "pallas_stream"
    if impl == "pallas":
        # Lazy-birth kernel: newborn rows are drawn (and their Z columns
        # computed) only for the cells that actually birth a cluster.
        perm, gumbel, k_beta = _sweep_keys(key, state, cfg, ax)
        out = _pallas_lazy_impl(state, data, cfg, perm, gumbel, k_beta,
                                new_post, log_denom, interpret, ax,
                                return_veto)
        return out if return_veto else out[0]
    if impl == "pallas_stream":
        # Streaming lazy kernel: Z stays in HBM, staged through VMEM chunk
        # buffers — the path for cell counts beyond the resident-Z cap.
        perm, gumbel, k_beta = _sweep_keys(key, state, cfg, ax)
        out = _pallas_stream_impl(state, data, cfg, perm, gumbel, k_beta,
                                  new_post, log_denom, interpret, ax,
                                  return_veto)
        return out if return_veto else out[0]

    perm, gumbel, fresh = _hoisted_randomness(key, state, data, cfg, ax)

    if impl == "pallas_eager":
        if return_veto:
            raise ValueError(
                "return_veto is not supported for impl='pallas_eager'")
        return _pallas_impl(state, data, cfg, perm, gumbel, fresh,
                            new_post, log_denom, interpret)
    if impl == "scan":
        # Measured on TPU v5e at 5000x200: cond-patching 74 ms vs dense
        # 112 ms single-chain (the per-iteration two-level gather outweighs
        # the avoided branch), so cond is the default everywhere; the dense
        # variant remains selectable (it is the better shape under vmap).
        impl = "scan_cond"
    if impl == "scan_dense":
        out = _scan_dense_impl(state, data, cfg, ax, perm, gumbel, fresh,
                               new_post, log_denom)
    else:
        out = _scan_impl(state, data, cfg, ax, perm, gumbel, fresh,
                         new_post, log_denom)
    return out if return_veto else out[0]


# ---------------------------------------------------------------------------
# Branch-free dense lax.scan implementation
# ---------------------------------------------------------------------------


def _scan_dense_impl(state, data, cfg, ax, perm, gumbel, fresh, new_post,
                     log_denom):
    """Identical semantics to _scan_impl, with the cluster-birth lax.cond
    eliminated: the log-likelihood of EVERY cell under EVERY potential
    newborn cluster is one [n, m] x [m, n] matmul up front
    (Lf[i, b] = ll(cell i | fresh row of cell b)), and a birth just records
    `born_by[slot] = cell`. The per-iteration body is two gathers plus
    vector ops — no branches, so it also stays fast under vmap (where cond
    would lower to select and execute the column patch every step).
    """
    n, k_max = cfg.n_cells, cfg.k_max
    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    ll0 = lk.ll_matrix(data, c1, c0, ax)  # [n, k_max]
    f1, f0 = lk.log_prob_tables(fresh, state.fp, state.fn)
    lf = lk.ll_matrix(data, f1, f0, ax)   # [n, n]: cell x birth-cell

    # Shared Z-formulation (see _scan_impl): Gumbel folded in up front.
    z0 = ll0 + gumbel[:, :k_max]
    aux = new_post + gumbel[:, k_max]

    def step(carry, cell):
        assignment, params, size, born_by, veto = carry

        old = assignment[cell]
        size = size.at[old].add(-1)
        live = size > 0

        born = born_by >= 0
        over = lf[cell, jnp.maximum(born_by, 0)]      # [k_max]
        z_row = jnp.where(born, over + gumbel[cell, :k_max], z0[cell])

        prior = jnp.log(jnp.maximum(size, 1).astype(jnp.float32)) - log_denom
        post_old = jnp.where(live, z_row + prior, NEG_INF)
        has_free = jnp.any(~live)
        post_new = jnp.where(has_free, aux[cell], NEG_INF)
        veto = veto | ((~has_free) & (aux[cell] > jnp.max(post_old)))
        logits = jnp.concatenate([post_old, post_new[None]])

        choice = jnp.argmax(logits).astype(jnp.int32)
        is_new = choice == k_max
        free = jnp.argmax(size == 0).astype(jnp.int32)
        target = jnp.where(is_new, free, choice).astype(jnp.int32)

        params = params.at[free].set(
            jnp.where(is_new, fresh[cell], params[free])
        )
        born_by = born_by.at[free].set(
            jnp.where(is_new, cell, born_by[free])
        )
        size = size.at[target].add(1)
        assignment = assignment.at[cell].set(target)
        return (assignment, params, size, born_by, veto), None

    born_by0 = jnp.full((k_max,), -1, jnp.int32)
    init = (state.assignment, state.params, state.cluster_size, born_by0,
            jnp.bool_(False))
    (assignment, params, size, _, veto), _ = jax.lax.scan(step, init, perm)
    return state._replace(
        assignment=assignment, params=params, cluster_size=size
    ), veto


# ---------------------------------------------------------------------------
# lax.scan implementation
# ---------------------------------------------------------------------------


def _scan_impl(state, data, cfg, ax, perm, gumbel, fresh, new_post,
               log_denom):
    n, k_max = cfg.n_cells, cfg.k_max
    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    ll0 = lk.ll_matrix(data, c1, c0, ax)  # [n, k_max]
    f1, f0 = lk.log_prob_tables(fresh, state.fp, state.fn)

    # Z-formulation: the Gumbel noise is folded into the likelihood matrix
    # up front (Z = ll0 + gumbel), so the body carries/loads ONE row and the
    # categorical draw is a plain argmax. All three implementations share
    # this grouping — bit-identical in interpreter mode (tests/test_pallas).
    z0 = ll0 + gumbel[:, :k_max]
    aux = new_post + gumbel[:, k_max]

    def step(carry, cell):
        assignment, params, size, z, veto = carry

        # Remove the cell from its cluster (libs/CRP.py:262-266).
        old = assignment[cell]
        size = size.at[old].add(-1)
        live = size > 0

        # Posterior over live slots + the new-cluster option.
        prior = jnp.log(jnp.maximum(size, 1).astype(jnp.float32)) - log_denom
        post_old = jnp.where(live, z[cell] + prior, NEG_INF)
        has_free = jnp.any(~live)
        post_new = jnp.where(has_free, aux[cell], NEG_INF)
        veto = veto | ((~has_free) & (aux[cell] > jnp.max(post_old)))
        logits = jnp.concatenate([post_old, post_new[None]])

        choice = jnp.argmax(logits).astype(jnp.int32)
        is_new = choice == k_max
        free = jnp.argmax(size == 0).astype(jnp.int32)
        target = jnp.where(is_new, free, choice).astype(jnp.int32)

        # Newborn cluster: patch the parameter row (a fresh Beta-posterior
        # draw, libs/CRP.py:291-294) and refresh Z's column for this slot so
        # later cells in the permutation see the newborn cluster (with their
        # own hoisted Gumbel noise for it).
        def birth(params, z):
            params = params.at[free].set(fresh[cell])
            col = lk.ll_col(f1[cell], f0[cell],
                            data.xm, data.xm0, ax)  # [n]
            return params, z.at[:, free].set(
                col + jnp.take(gumbel, free, axis=1)
            )

        params, z = jax.lax.cond(
            is_new, birth, lambda p, zz: (p, zz), params, z
        )

        size = size.at[target].add(1)
        assignment = assignment.at[cell].set(target)
        return (assignment, params, size, z, veto), None

    init = (state.assignment, state.params, state.cluster_size, z0,
            jnp.bool_(False))
    # Mild unroll amortizes While-loop control overhead (~9% on v5e).
    (assignment, params, size, _, veto), _ = jax.lax.scan(step, init, perm,
                                                          unroll=4)
    return state._replace(
        assignment=assignment, params=params, cluster_size=size
    ), veto


# ---------------------------------------------------------------------------
# Opt-in blocked (approximate) sweep — SURVEY.md pivot 3's reserved variant
# ---------------------------------------------------------------------------


def _blocked_impl(state, data, cfg, ax, perm, gumbel, k_beta, new_post,
                  log_denom, block):
    """Opt-in APPROXIMATE blocked sweep. No reference counterpart — the
    reference sweep is strictly sequential (libs/CRP.py:254-299); SURVEY.md
    pivot 3 reserved this as an opt-in approximation, default OFF.

    Cells are visited in the same permuted order as the exact impls, but in
    blocks of ``block`` cells: within a block every cell decides against the
    cluster sizes FROZEN at block entry (minus its own membership), and the
    size/assignment updates are applied once per block — so the per-cell
    serial dependency chain (the structural floor of the exact kernels)
    shrinks from n links to n/block. Any block whose frozen-size pass
    includes a cluster-birth decision is REPLAYED exactly (per-cell
    sequential semantics identical to _scan_impl) from the block boundary:
    births — the one event later cells MUST see — never happen under frozen
    sizes, and a burn-in phase with births in every block degenerates
    gracefully to the exact sampler. block=1 reproduces the exact scan's
    partition evolution bit-for-bit (newborn params to f32 round-off — they
    are drawn per cell here, vmapped there;
    tests/test_blocked.py::test_block1_bit_identical).

    The approximation error is the within-block size drift: a decision can
    miss at most block-1 membership changes out of n-1+alpha, an O(block/n)
    logit perturbation. Stationary-distribution impact is measured on the
    enumerable 5-cell posterior (test_blocked::test_blocked_stationary_tv)
    and at the reference's 100x100 example scale (BASELINE.md).

    Pure XLA (no Pallas): runs everywhere — CPU, TPU, sharded MutAxis, and
    under vmap (where the birth-segmented while_loop runs until every batch
    element converges, costing the scan rate; the intended regime is
    unbatched large-n chains where the exact kernels are latency-bound).

    Structure (birth-segmented, like the lazy Pallas sweep): one lax.scan
    sweeps ALL blocks with the [G, B, k] Z matrix fed as read-only scan
    inputs — nothing n-sized rides the carry, so no per-block carry copy
    (an earlier z-in-carry formulation copied the whole Z matrix every
    block: 131,072x200 ran no faster at block=512 than the exact kernel).
    The scan stops applying at the FIRST block whose frozen pass contains a
    birth candidate; a while_loop then replays that one block exactly
    (per-cell sequential, newborn Z columns materialized), and re-runs the
    scan from the next block. Births/sweep ~= 0 at stationarity, so the
    steady state is exactly one scan pass.
    """
    n, k_max = cfg.n_cells, cfg.k_max
    B = max(1, int(block))
    G = -(-n // B)
    nB = G * B

    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    z0 = lk.ll_matrix(data, c1, c0, ax) + gumbel[:, :k_max]
    aux = new_post + gumbel[:, k_max]

    # Visit-order staging: one gather per sweep (same trick as the
    # streaming kernel), so per-block reads are contiguous scan slices.
    z3 = jnp.pad(jnp.take(z0, perm, axis=0),
                 [(0, nB - n), (0, 0)]).reshape(G, B, k_max)
    aux3 = jnp.pad(jnp.take(aux, perm), (0, nB - n),
                   constant_values=NEG_INF).reshape(G, B)
    old3 = jnp.pad(jnp.take(state.assignment, perm).astype(jnp.int32),
                   (0, nB - n)).reshape(G, B)
    cell3 = jnp.pad(perm.astype(jnp.int32), (0, nB - n)).reshape(G, B)
    act3 = (jnp.arange(nB) < n).reshape(G, B)
    iota_k = jnp.arange(k_max)
    iota_g = jnp.arange(G)

    def do_pass(g0, sizes, z3):
        """Frozen-size pass over all blocks: applies block decisions from
        g0 up to (exclusive) the first birth block; returns its index (G if
        none) and the per-block targets (valid on the applied range)."""

        def block_step(carry, xs):
            sizes, bflag, bblock, veto = carry
            g, zb, auxb, oldb, actb = xs

            # All cells of the block at once ([B, k] VPU work instead of
            # B serial [1, k] steps), against sizes frozen at block entry
            # (minus each cell's own membership).
            oh_old = (oldb[:, None] == iota_k[None, :]) & actb[:, None]
            sizes_excl = sizes[None, :] - oh_old.astype(sizes.dtype)
            live = sizes_excl > 0
            prior = jnp.log(
                jnp.maximum(sizes_excl, 1).astype(jnp.float32)) - log_denom
            post_old = jnp.where(live, zb + prior, NEG_INF)
            best = jnp.max(post_old, axis=1)
            has_free = jnp.any(~live, axis=1)
            cand = (auxb > best) & actb
            choice = jnp.argmax(post_old, axis=1).astype(jnp.int32)

            active = (g >= g0) & (~bflag)
            birth_here = active & jnp.any(cand & has_free)
            apply = active & (~birth_here)

            tgt = jnp.where(actb, choice, oldb)
            oh_new = (tgt[:, None] == iota_k[None, :]) & actb[:, None]
            d = oh_new.astype(sizes.dtype).sum(0) \
                - oh_old.astype(sizes.dtype).sum(0)
            sizes = jnp.where(apply, sizes + d, sizes)
            veto = veto | (apply & jnp.any(cand & ~has_free))
            bblock = jnp.where(birth_here, jnp.minimum(bblock, g), bblock)
            bflag = bflag | birth_here
            return (sizes, bflag, bblock, veto), tgt

        (sizes, bflag, bblock, veto), tgt3 = jax.lax.scan(
            block_step,
            (sizes, jnp.bool_(False), jnp.int32(G), jnp.bool_(False)),
            (iota_g, z3, aux3, old3, act3))
        return sizes, jnp.where(bflag, bblock, jnp.int32(G)), veto, tgt3

    def exact_block(g, sizes, params, z3):
        """Sequential exact replay of one block — the _scan_impl body over
        the block's cells; newborn Z columns are materialized into z3 so
        later passes see them."""

        def body(j, c):
            sizes, params, z3, tgt, veto = c
            act = act3[g, j]
            old = old3[g, j]
            delta = jnp.where(act, 1, 0)
            sizes = sizes.at[old].add(-delta)
            live = sizes > 0
            prior = jnp.log(
                jnp.maximum(sizes, 1).astype(jnp.float32)) - log_denom
            post_old = jnp.where(live, z3[g, j] + prior, NEG_INF)
            has_free = jnp.any(~live)
            post_new = jnp.where(has_free, aux3[g, j], NEG_INF)
            veto = veto | (act & (~has_free)
                           & (aux3[g, j] > jnp.max(post_old)))
            choice = jnp.argmax(
                jnp.concatenate([post_old, post_new[None]])
            ).astype(jnp.int32)
            free = jnp.argmax(sizes == 0).astype(jnp.int32)
            is_new = act & (choice == k_max)
            target = jnp.where(choice == k_max, free, choice)
            target = jnp.where(act, target, old)

            def birth(params, z3):
                cell = cell3[g, j]
                theta = fresh_row(k_beta, cell, data, cfg)
                f1r, f0r = lk.log_prob_tables(theta, state.fp, state.fn)
                col = lk.ll_col(f1r, f0r, data.xm, data.xm0, ax)
                col3 = jnp.pad(jnp.take(col + jnp.take(gumbel, free,
                                                       axis=1), perm),
                               (0, nB - n)).reshape(G, B)
                return params.at[free].set(theta), \
                    z3.at[:, :, free].set(col3)

            params, z3 = jax.lax.cond(
                is_new, birth, lambda p_, z_: (p_, z_), params, z3)
            sizes = sizes.at[target].add(delta)
            tgt = tgt.at[j].set(target)
            return (sizes, params, z3, tgt, veto)

        return jax.lax.fori_loop(
            0, B, body,
            (sizes, params, z3, old3[g], jnp.bool_(False)))

    # First pass, then one while iteration per birth BLOCK (~0 at
    # stationarity): replay the birth block exactly, rescan from the next.
    sizes0, bblock0, veto0, tgt30 = do_pass(jnp.int32(0),
                                            state.cluster_size, z3)
    mask0 = iota_g < bblock0
    tgt3 = jnp.where(mask0[:, None], tgt30, old3)

    def w_cond(c):
        return c[0] < G

    def w_body(c):
        bblock, sizes, params, z3, tgt3, veto = c
        sizes, params, z3, tgt_b, veto_b = exact_block(
            bblock, sizes, params, z3)
        tgt3 = jax.lax.dynamic_update_index_in_dim(tgt3, tgt_b, bblock, 0)
        g0 = bblock + 1
        sizes, bnext, veto_p, tgt3n = do_pass(g0, sizes, z3)
        mask = (iota_g >= g0) & (iota_g < bnext)
        tgt3 = jnp.where(mask[:, None], tgt3n, tgt3)
        return (bnext, sizes, params, z3, tgt3, veto | veto_b | veto_p)

    _, sizes, params, _, tgt3, veto = jax.lax.while_loop(
        w_cond, w_body,
        (bblock0, sizes0, state.params, z3, tgt3, veto0))

    tgt_v = tgt3.reshape(-1)[:n]
    # Sort-scatter back to cell order (see _pallas_lazy_impl).
    _, assignment = jax.lax.sort((perm.astype(jnp.int32), tgt_v), num_keys=1)
    return state._replace(
        assignment=assignment, cluster_size=sizes, params=params
    ), veto


# ---------------------------------------------------------------------------
# Fused Pallas implementation
# ---------------------------------------------------------------------------


def _pallas_impl(state, data, cfg, perm, gumbel, fresh, new_post, log_denom,
                 interpret):
    from bnpc_tpu.ops.pallas_gibbs import _round_up, pallas_sweep

    n, m, k_max = cfg.n_cells, cfg.n_muts, cfg.k_max
    m_pad = _round_up(m, 128)
    k_pad = _round_up(k_max, 128)
    n8 = _round_up(n, 8)  # cell axis must hit the f32 sublane tile
    nb = _round_up(n, 128) // 128

    def pad_m(x, value=0.0):
        return jnp.pad(x, [(0, 0), (0, m_pad - m)], constant_values=value)

    def pad_n8(x):
        return jnp.pad(x, [(0, n8 - n), (0, 0)])

    # Everything the sweep can ever need is two big MXU matmuls up front
    # (the _scan_dense_impl trick): each cell against the current slots,
    # and each cell against every potential newborn row. All in absolute
    # cell order — the permutation is an in-kernel SMEM indirection, so no
    # gather/transpose passes are needed here.
    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    # Z-formulation (see _scan_impl): the hoisted Gumbel noise is folded
    # into the resident matrix up front, so the kernel body loads ONE row
    # per cell. `gum` is still passed for the rare birth-column patch.
    z0 = pad_n8(jnp.pad(
        lk.ll_matrix(data, c1, c0) + gumbel[:, :k_max],
        [(0, 0), (0, k_pad - k_max)]
    ))  # [n8, k_pad]
    f1, f0 = lk.log_prob_tables(fresh, state.fp, state.fn)
    # Padding the TABLE rows makes the matmul write the padded [n8, nb*128]
    # output directly — an explicit pad of the 100 MB result costs an extra
    # full memory pass. Padded birth columns are never read.
    pad_rows = [(0, nb * 128 - n), (0, 0)]
    lf2 = pad_n8(lk.ll_matrix(
        data, jnp.pad(f1, pad_rows), jnp.pad(f0, pad_rows)
    ))  # [n8, nb*128]: lf2[j, b] = ll(cell j | fresh row of cell b)

    gum = pad_n8(jnp.pad(gumbel[:, :k_max], [(0, 0), (0, k_pad - k_max)]))
    aux = new_post + gumbel[:, k_max]

    sizes = jnp.concatenate([
        state.cluster_size.astype(jnp.float32),
        jnp.full((k_pad - k_max,), -1.0, jnp.float32),
    ])
    fresh3 = pad_m(fresh, 0.5)[:, None, :]
    params3 = jnp.pad(
        pad_m(state.params, 0.5), [(0, k_pad - k_max), (0, 0)],
        constant_values=0.5,
    )[:, None, :]

    assignment, sizes_out, params_out = pallas_sweep(
        z0, gum, lf2, fresh3, aux, state.assignment, perm,
        sizes, params3, log_denom, interpret=interpret,
    )

    return state._replace(
        assignment=assignment,
        cluster_size=sizes_out[:k_max].astype(jnp.int32),
        params=params_out[:k_max, :m],
    )


# ---------------------------------------------------------------------------
# Lazy-birth fused Pallas implementation (the TPU default)
# ---------------------------------------------------------------------------


def _pallas_lazy_impl(state, data, cfg, perm, gumbel, k_beta, new_post,
                      log_denom, interpret, ax: MutAxis = _NO_AXIS,
                      track_veto: bool = False):
    """Birth-lazy fused sweep: the eager precomputes (the [n, m] newborn
    Beta field, its log tables, and the [n, n] cross-likelihood matmul,
    ~60% of the sweep's device time at 5,000 x 200) are replaced by an
    outer while_loop that runs the early-exit segment kernel
    (ops/pallas_gibbs.py::pallas_lazy_segment) and materializes ONE newborn
    row + Z column per actual cluster birth — a Beta row draw and a single
    [n, m] matvec (exactly the scan implementation's lax.cond birth path,
    hoisted out of the per-cell loop). Launches per sweep = births + 1.

    Bit-identical to the scan/eager impls given the same sweep key: the
    newborn randomness is counter-based per cell (see _sweep_keys), and the
    patched column uses the same lk.ll_col formulation as the scan birth.

    Works under a sharded MutAxis: Z and the birth columns are psummed
    BEFORE the kernel, so the kernel itself runs identically on every
    shard from replicated inputs (exactly like the scan's per-cell body).
    """
    from bnpc_tpu.ops.pallas_gibbs import _round_up, pallas_lazy_segment

    n, m, k_max = cfg.n_cells, cfg.n_muts, cfg.k_max
    k_pad = _round_up(k_max, 128)
    n8 = _round_up(n, 8)

    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    z0 = jnp.pad(
        lk.ll_matrix(data, c1, c0, ax) + gumbel[:, :k_max],
        [(0, n8 - n), (0, k_pad - k_max)],
    )  # [n8, k_pad]
    aux = new_post + gumbel[:, k_max]
    sizes0 = jnp.concatenate([
        state.cluster_size.astype(jnp.float32),
        jnp.full((k_pad - k_max,), -1.0, jnp.float32),
    ])[None, :]
    pos = jnp.arange(n, dtype=jnp.int32)
    # Each cell is visited exactly once, so the kernel only ever reads the
    # PRE-SWEEP assignment of not-yet-visited cells — pass it statically and
    # accumulate chosen targets in VISIT order instead of gather/scattering
    # the cell-order assignment through perm on every launch (a [n] gather
    # costs ~8 ns/elem on the TPU scalar unit; one sort at the end is ~5x
    # cheaper than the gather+scatter pair it replaces).
    assign0 = state.assignment.astype(jnp.int32)

    def cond(carry):
        return carry[0] < n

    def body(carry):
        i0, z, tgt_v, sizes, params, veto = carry
        tgt, sizes, info = pallas_lazy_segment(
            z, aux, assign0, perm, sizes, i0, log_denom,
            interpret=interpret, track_veto=track_veto,
        )
        i_next, bcell, bslot = info[0], info[1], info[2]
        veto = veto | (info[3] > 0)
        done = (pos >= i0) & (pos < i_next)
        tgt_v = jnp.where(done, tgt, tgt_v)

        def patch(z, params):
            theta = fresh_row(k_beta, bcell, data, cfg)
            f1r, f0r = lk.log_prob_tables(theta, state.fp, state.fn)
            col = lk.ll_col(f1r, f0r, data.xm, data.xm0, ax) \
                + jnp.take(gumbel, bslot, axis=1)
            z2 = jax.lax.dynamic_update_slice(
                z, jnp.pad(col, (0, n8 - n))[:, None],
                (jnp.int32(0), bslot),
            )
            return z2, params.at[bslot].set(theta)

        z, params = jax.lax.cond(
            bcell >= 0, patch, lambda z_, p_: (z_, p_), z, params
        )
        return (i_next, z, tgt_v, sizes, params, veto)

    init = (jnp.int32(0), z0, jnp.zeros((n,), jnp.int32), sizes0,
            state.params, jnp.bool_(False))
    _, _, tgt_v, sizes, params, veto = jax.lax.while_loop(cond, body, init)
    # Scatter targets back to cell order: sorting (perm, tgt_v) by the
    # permutation keys IS the scatter assignment[perm[t]] = tgt_v[t].
    _, assignment = jax.lax.sort((perm.astype(jnp.int32), tgt_v), num_keys=1)
    return state._replace(
        assignment=assignment,
        cluster_size=sizes[0, :k_max].astype(jnp.int32),
        params=params,
    ), veto


# ---------------------------------------------------------------------------
# Streaming lazy-birth fused Pallas implementation (beyond-VMEM cell counts)
# ---------------------------------------------------------------------------


def _pallas_stream_impl(state, data, cfg, perm, gumbel, k_beta, new_post,
                        log_denom, interpret, ax: MutAxis = _NO_AXIS,
                        track_veto: bool = False):
    """The lazy-birth sweep with Z resident in HBM instead of VMEM: the
    VMEM-resident kernel caps n * k_pad at ~26k cells x 128 slots; this path
    reorders everything into VISIT (permutation) order once per sweep so the
    segment kernel (ops/pallas_gibbs.py::pallas_lazy_segment_stream) can
    stage Z sequentially through a chunk-sized VMEM buffer. Launch/patch
    structure and semantics are identical to _pallas_lazy_impl — the only
    moving part is WHERE Z lives — and results are bit-identical to the
    scan/lazy impls given the same sweep key (tests/test_pallas.py)."""
    from bnpc_tpu.ops.pallas_gibbs import (_round_up, pallas_lazy_segment_stream,
                                           stream_chunk_rows)

    n, m, k_max = cfg.n_cells, cfg.n_muts, cfg.k_max
    k_pad = _round_up(k_max, 128)
    # C stays a multiple of the kernel's batch size (or B shrinks to C).
    C = min(stream_chunk_rows(k_max, n), _round_up(n, 128))
    G = -(-n // C)
    nC = G * C

    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    z0 = lk.ll_matrix(data, c1, c0, ax) + gumbel[:, :k_max]  # [n, k_max]
    # Visit-order gather + chunking (one memory pass per sweep).
    zp = jnp.pad(jnp.take(z0, perm, axis=0),
                 [(0, nC - n), (0, k_pad - k_max)])
    zp3 = zp.reshape(G, C, k_pad)
    auxp = jnp.take(new_post + gumbel[:, k_max], perm)
    # Each cell is visited exactly once, so the assignment the kernel needs
    # at a position is always the PRE-SWEEP one — static per sweep.
    assignp = jnp.take(state.assignment, perm).astype(jnp.int32)
    permC = jnp.pad(perm.astype(jnp.int32), (0, nC - n))

    sizes0 = jnp.concatenate([
        state.cluster_size.astype(jnp.float32),
        jnp.full((k_pad - k_max,), -1.0, jnp.float32),
    ])[None, :]
    pos = jnp.arange(n, dtype=jnp.int32)

    def cond(carry):
        return carry[0] < n

    def body(carry):
        i0, zp3, tgt_v, sizes, params, veto = carry
        tgt, sizes, info = pallas_lazy_segment_stream(
            zp3, auxp, assignp, sizes, i0, log_denom, interpret=interpret,
            track_veto=track_veto,
        )
        i_next, bpos, bslot = info[0], info[1], info[2]
        veto = veto | (info[3] > 0)
        done = (pos >= i0) & (pos < i_next)
        # Targets accumulate in VISIT order; one sort-scatter at the end
        # (see _pallas_lazy_impl — same rationale).
        tgt_v = jnp.where(done, tgt, tgt_v)

        def patch(zp3, params):
            bcell = permC[jnp.maximum(bpos, 0)]
            theta = fresh_row(k_beta, bcell, data, cfg)
            f1r, f0r = lk.log_prob_tables(theta, state.fp, state.fn)
            col = lk.ll_col(f1r, f0r, data.xm, data.xm0, ax) \
                + jnp.take(gumbel, bslot, axis=1)
            colp = jnp.pad(jnp.take(col, perm), (0, nC - n))
            zp2 = jax.lax.dynamic_update_slice(
                zp3.reshape(nC, k_pad), colp[:, None], (jnp.int32(0), bslot),
            ).reshape(G, C, k_pad)
            return zp2, params.at[bslot].set(theta)

        zp3, params = jax.lax.cond(
            bpos >= 0, patch, lambda z_, p_: (z_, p_), zp3, params
        )
        return (i_next, zp3, tgt_v, sizes, params, veto)

    init = (jnp.int32(0), zp3, jnp.zeros((n,), jnp.int32), sizes0,
            state.params, jnp.bool_(False))
    _, _, tgt_v, sizes, params, veto = jax.lax.while_loop(cond, body, init)
    _, assignment = jax.lax.sort((perm.astype(jnp.int32), tgt_v), num_keys=1)
    return state._replace(
        assignment=assignment,
        cluster_size=sizes[0, :k_max].astype(jnp.int32),
        params=params,
    ), veto
