"""Chain orchestration: the per-step move mixture and the multi-chain runner.

Reference: libs/MCMC.py. The reference runs one chain per OS process
(mp.Pool, libs/MCMC.py:113-120) and mixes moves with Python-level randomness
(do_step, libs/MCMC.py:320-342). Here one MCMC step is a pure jitted function
(move selection via lax.cond on uniform draws), a *block* of steps is a
lax.scan emitting trace rows, and chains are a vmapped leading axis that can
be sharded over a 1-D device mesh. The host loop only stitches blocks
together, checks wall-clock/convergence termination, and accumulates traces
in numpy — mirroring the reference's scheduler semantics (steps / runtime /
lugsail, libs/MCMC.py:79-193) at block granularity.
"""

from __future__ import annotations

import dataclasses
import os
from datetime import datetime
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bnpc_tpu.config import MCMCConfig, ModelConfig
from bnpc_tpu.data import PackedData
from bnpc_tpu.models.gibbs import gibbs_sweep
from bnpc_tpu.models.splitmerge import split_merge
from bnpc_tpu.models.updates import (
    update_dp_alpha,
    update_error_rates,
    update_parameters,
)
from bnpc_tpu.ops import likelihood as lk
from bnpc_tpu.parallel.axis import MutAxis
from bnpc_tpu.state import CRPState, cluster_stats, init_state
from bnpc_tpu.utils import transfer
from bnpc_tpu import diagnostics

_NO_AXIS = MutAxis()


class TraceRow(NamedTuple):
    ml: jnp.ndarray          # [] f32 log-likelihood
    map_: jnp.ndarray        # [] f32 log-posterior
    dp_alpha: jnp.ndarray    # [] f32
    fp: jnp.ndarray          # [] f32
    fn: jnp.ndarray          # [] f32
    assignment: jnp.ndarray  # [n] smallest uint that holds k_max (D2H wire)
    params: jnp.ndarray      # [trace_k, m] f16 wire format (see _trace_dtypes)
    mh_counts: jnp.ndarray   # [5, 2] i32 (params, splits, merges, FP, FN)


def _trace_dtypes(cfg: ModelConfig):
    """(assignment, params) wire dtypes for trace rows.

    Traces cross the tunneled-TPU relay's slow device->host path every
    block (see utils/transfer.py); at headline scale the params +
    assignment leaves are ~50 MB per 400 steps and dominate end-to-end
    `run()` wall-clock. The assignment cast is lossless (values are slot
    indices < k_max). The params cast to f16 rounds the RECORDED Beta
    means (not the sampler state) by <= 2^-11 relative — invisible in the
    2-decimal genotype outputs; set BNPC_TPU_TRACE_F32=1 to record f32.
    `_collect` casts both back so downstream consumers always see i32/f32.
    """
    # rng_k (not k_max): the live-width fast path's narrow step body must
    # emit the same wire dtypes as the wide one so the lax.cond branches
    # unify (rng_k always carries the TRUE slot capacity).
    if cfg.rng_k <= 256:
        a = jnp.uint8
    elif cfg.rng_k <= 65536:
        a = jnp.uint16
    else:
        a = jnp.int32
    p = (jnp.float32 if os.environ.get("BNPC_TPU_TRACE_F32") == "1"
         else jnp.float16)
    return a, p


def resolve_trace_k(cfg: ModelConfig, mcmc_cfg: MCMCConfig) -> int:
    if mcmc_cfg.trace_k > 0:
        return min(mcmc_cfg.trace_k, cfg.k_max)
    return min(cfg.k_max, 128)


@jax.jit
def _block_live_k(params):
    """Max live-cluster count across a block's compacted params trace
    [C, B, k, m]: dead rows are exactly zero (_compact_params masks them)
    and live rows are clipped to >= TMIN = 1e-5 > 0, which stays nonzero
    even in the f16 wire dtype (subnormal ~1.0014e-5)."""
    return jnp.max(jnp.sum(jnp.any(params != 0, axis=-1), axis=-1))


def _pad_k(params: np.ndarray, k: int) -> np.ndarray:
    """Zero-pad (or slice) a [C, B, k_cur, m] params trace to k slots.
    Slicing only ever drops slots of EMPTY blocks (0 step rows) — concat
    sizes k from the widest non-empty block."""
    cur = params.shape[2]
    if cur == k:
        return params
    if cur > k:
        return params[:, :, :k]
    return np.pad(params, [(0, 0), (0, 0), (0, k - cur), (0, 0)])


def _compact_params(state: CRPState, trace_k: int) -> jnp.ndarray:
    """Rows of live slots in ascending slot order, zero-padded to trace_k.

    Matches the reference's storage of ``parameters[sorted(live_ids)]`` into
    row positions 0..K-1 (libs/MCMC.py:261-282): estimator code downstream
    addresses clusters by their rank among sorted ids.
    """
    live = state.cluster_size > 0
    order = jnp.argsort(~live, stable=True)  # live slots first, slot order
    sel = order[:trace_k]
    return state.params[sel] * live[sel][:, None].astype(state.params.dtype)


def summarize(state: CRPState, data: PackedData, cfg: ModelConfig,
              trace_k: int, ax: MutAxis = _NO_AXIS, stats=None) -> TraceRow:
    """One trace row for the current state (libs/MCMC.py:242-282).

    `stats` lets the caller reuse the (n1, n0) sufficient statistics already
    computed for the parameter update in the same step — they depend only on
    the assignment, which no longer changes after the assignment moves.
    """
    n1, n0 = stats if stats is not None else cluster_stats(
        data, state.assignment, cfg.k_max
    )
    c1, c0 = lk.log_prob_tables(state.params, state.fp, state.fn)
    ml = lk.ll_from_stats(n1, n0, c1, c0, ax)
    lprior = lk.log_prior_full(
        cfg, state.cluster_size, state.params, state.dp_alpha,
        state.fp, state.fn, ax,
    )
    a_dt, p_dt = _trace_dtypes(cfg)
    return TraceRow(
        ml=ml,
        map_=ml + lprior,
        dp_alpha=state.dp_alpha,
        fp=state.fp,
        fn=state.fn,
        assignment=state.assignment.astype(a_dt),
        params=_compact_params(state, trace_k).astype(p_dt),
        mh_counts=jnp.zeros((5, 2), jnp.int32),
    )


# Narrow bucket width of the live-width fast path (one VPU lane tile).
_KB = 128

# The live-width k-bucket is OFF by default since round 5: controlled
# same-session measurements show ALWAYS-WIDE execution beats the bucketed
# dispatch at every shape tried (k_max=256, full move mixture, v5e;
# benchmarks/headline_bench.py):
#
#     5,000 x 200   wide 721.8 vs bucket 673.5 steps/s
#    10,000 x 200   wide 436.2 vs bucket 412.8
#     5,000 x 500   wide 607.7 vs bucket 571.3
#    10,000 x 500   wide 387.7 vs bucket 376.6
#
# The bucket's fixed per-step costs (occupancy reductions + two lax.conds,
# full-width slot RNG, dynamic-slice state merges) exceed the narrow body's
# [n, k] savings now that the streaming sweep kernel serves wide-k shapes
# at full speed — the round-4 10,000x500 k256 win credited to the bucket
# (133 -> 298 steps/s) was actually the streaming kernel replacing the
# round-3 scan fallback; re-measured on round-5 code, always-wide runs
# 387.7 at that shape. The machinery stays bit-parity-tested
# (tests/test_kbucket.py) and can be re-enabled for unexplored shapes by
# setting _KB_ON = True.
_KB_ON = False


def _make_step_body(cfg: ModelConfig, mcmc_cfg: MCMCConfig, data: PackedData,
                    trace_k: int, ax: MutAxis, gibbs_impl: str,
                    with_veto: bool):
    """The raw single-step body (do_step, libs/MCMC.py:320-342). With
    ``with_veto`` the step returns (state, row, veto) where veto marks a
    capacity-vetoed Gibbs birth (see gibbs_sweep) — consumed by the
    live-width fast path below."""

    def step(state: CRPState, key):
        k_sel, k_assign, k_dpa, k_par, k_err = jax.random.split(key, 5)
        u_sm, u_dpa, u_err = jax.random.uniform(k_sel, (3,))
        counts = jnp.zeros((5, 2), jnp.int32)
        veto = jnp.bool_(False)

        if not mcmc_cfg.fix_assign:
            def do_sm(st):
                # The restricted-scan backend follows the Gibbs one: both
                # "auto_single" fast paths are valid exactly when the step
                # runs unbatched on TPU.
                st2, sm_c = split_merge(
                    k_assign, st, data, cfg,
                    mcmc_cfg.sm_split_ratio, mcmc_cfg.sm_steps, ax=ax,
                    impl=gibbs_impl if gibbs_impl in ("auto", "auto_single")
                    else "auto",
                )
                return st2, sm_c, jnp.bool_(False)

            def do_gibbs(st):
                # Opt-in approximate blocked sweep (gibbs_block > 0)
                # replaces the exact Gibbs move only; split-merge and the
                # scalar moves are untouched.
                blk = mcmc_cfg.gibbs_block
                impl_g = "blocked" if blk > 0 else gibbs_impl
                if with_veto:
                    st2, v = gibbs_sweep(k_assign, st, data, cfg, ax=ax,
                                         impl=impl_g, block=blk,
                                         return_veto=True)
                else:
                    st2 = gibbs_sweep(k_assign, st, data, cfg, ax=ax,
                                      impl=impl_g, block=blk)
                    v = jnp.bool_(False)
                return st2, jnp.zeros((2, 2), jnp.int32), v

            if mcmc_cfg.sm_prob > 0.0:
                state, sm_counts, veto = jax.lax.cond(
                    u_sm < mcmc_cfg.sm_prob, do_sm, do_gibbs, state
                )
            else:
                state, sm_counts, veto = do_gibbs(state)
            counts = counts.at[1:3].add(sm_counts)

            if mcmc_cfg.dpa_prob > 0.0:
                state = jax.lax.cond(
                    u_dpa < mcmc_cfg.dpa_prob,
                    lambda st: update_dp_alpha(k_dpa, st, cfg),
                    lambda st: st,
                    state,
                )

        n1, n0 = cluster_stats(data, state.assignment, cfg.k_max)
        state, par_dec, par_acc = update_parameters(
            k_par, state, n1, n0, cfg, ax=ax
        )
        counts = counts.at[0, 0].add(par_acc.astype(jnp.int32))
        counts = counts.at[0, 1].add(par_dec.astype(jnp.int32))

        if cfg.learn_errors and mcmc_cfg.error_prob > 0.0:
            def do_err(st):
                st2, fp_acc, fn_acc = update_error_rates(
                    k_err, st, n1, n0, cfg, ax=ax
                )
                c = jnp.zeros((2, 2), jnp.int32)
                c = c.at[0, 0].set(fp_acc.astype(jnp.int32))
                c = c.at[0, 1].set(1 - fp_acc.astype(jnp.int32))
                c = c.at[1, 0].set(fn_acc.astype(jnp.int32))
                c = c.at[1, 1].set(1 - fn_acc.astype(jnp.int32))
                return st2, c

            state, err_counts = jax.lax.cond(
                u_err < mcmc_cfg.error_prob,
                do_err,
                lambda st: (st, jnp.zeros((2, 2), jnp.int32)),
                state,
            )
            counts = counts.at[3:5].add(err_counts)

        row = summarize(state, data, cfg, trace_k, ax, stats=(n1, n0))
        if with_veto:
            return state, row._replace(mh_counts=counts), veto
        return state, row._replace(mh_counts=counts)

    return step


def make_step_fn(cfg: ModelConfig, mcmc_cfg: MCMCConfig, data: PackedData,
                 trace_k: int, ax: MutAxis = _NO_AXIS,
                 gibbs_impl: str = "auto"):
    """Build the jittable single-step function (do_step, libs/MCMC.py:320-342).

    gibbs_impl="auto_single" selects the fused Pallas sweep on TPU; only
    valid when the step runs unbatched (not under vmap).

    Live-width fast path (OFF by default — see _KB_ON; measured slower
    than always-wide at every shape tried): with _KB_ON and k_max > 128
    on the unbatched ("auto_single") route, each step dispatches by a
    lax.cond on the occupancy — when every live slot sits below 128 and
    fewer than 128 clusters exist (always true at stationarity, where
    ~10-20 slots are live), the step runs a NARROW body whose state and
    kernels are sliced to 128 slots, and the [n, k]-shaped work (likelihood
    matmuls, Z restages, per-cell kernel rows) shrinks accordingly. The
    narrow body is BIT-IDENTICAL to the wide one: slot-axis randomness is
    drawn at the full width and sliced (cfg.k_rng; rows of [k, m] draws and
    1-D slot draws are threefry prefix-stable), dead slots are masked out
    of every term, and the one divergence channel — a Gibbs birth finding
    no free slot among the first 128 although k_max has more — is flagged
    by the kernels (cap_veto) and the step is REPLAYED wide with the same
    key (astronomically rare at stationarity)."""
    step_wide = _make_step_body(cfg, mcmc_cfg, data, trace_k, ax,
                                gibbs_impl, False)
    # trace_k <= _KB keeps the narrow body's trace-row params the same
    # shape as the wide one's (the default trace_k is min(k_max, 128)).
    # _KB_ON: the bucket is off by default — measured slower than
    # always-wide at every shape tried (see the note at _KB_ON).
    if not _KB_ON or cfg.k_max <= _KB or cfg.k_rng or trace_k > _KB \
            or gibbs_impl != "auto_single":
        return step_wide
    cfg_n = dataclasses.replace(cfg, k_max=_KB, k_rng=cfg.k_max)
    step_narrow = _make_step_body(cfg_n, mcmc_cfg, data, trace_k, ax,
                                  gibbs_impl, True)
    kb = _KB

    def step(state: CRPState, key):
        live_hi = jnp.any(state.cluster_size[kb:] > 0)
        n_cl = jnp.sum(state.cluster_size > 0)
        # n_cl < kb keeps split proposals identical too: narrow's
        # forced-merge-at-capacity rule (splitmerge.py) never engages, and
        # a split's free slot always exists below kb.
        narrow_ok = (~live_hi) & (n_cl < kb)

        def run_narrow(st):
            stn = st._replace(params=st.params[:kb],
                              cluster_size=st.cluster_size[:kb])
            st2, row, veto = step_narrow(stn, key)
            merged = st._replace(
                assignment=st2.assignment,
                params=jax.lax.dynamic_update_slice(
                    st.params, st2.params, (0, 0)),
                cluster_size=jax.lax.dynamic_update_slice(
                    st.cluster_size, st2.cluster_size, (0,)),
                dp_alpha=st2.dp_alpha, fp=st2.fp, fn=st2.fn)
            return merged, row, veto

        def run_wide(st):
            st2, row = step_wide(st, key)
            return st2, row, jnp.bool_(False)

        out_state, row, veto = jax.lax.cond(narrow_ok, run_narrow, run_wide,
                                            state)
        # Replay capacity-vetoed steps at full width from the ORIGINAL
        # state with the SAME key (identical randomness; see docstring).
        return jax.lax.cond(
            veto,
            lambda st: step_wide(st, key),
            lambda st: (out_state, row),
            state,
        )

    return step


def make_block_fn(cfg, mcmc_cfg, data, trace_k, ax: MutAxis = _NO_AXIS,
                  gibbs_impl: str = "auto"):
    """scan a block of steps; returns (state, stacked TraceRows)."""
    step = make_step_fn(cfg, mcmc_cfg, data, trace_k, ax, gibbs_impl)

    def block(state: CRPState, keys) -> tuple[CRPState, TraceRow]:
        return jax.lax.scan(step, state, keys)

    return block


def make_coupled_step_fn(cfg: ModelConfig, mcmc_cfg: MCMCConfig,
                         data: PackedData, trace_k: int):
    """Batched-chain step with a SHARED move-type selection.

    Under plain vmap the per-chain lax.cond of the move mixture lowers to
    select — every chain executes BOTH the Gibbs sweep and the split-merge
    every step. Sharing the move-type draw across chains keeps the cond a
    real branch over the batched operands (see MCMCConfig.coupled_moves);
    the randomness inside every move remains per-chain.
    """

    def step(states: CRPState, key):
        n_chains = states.assignment.shape[0]
        k_sel, k_move, k_dpa, k_par, k_err = jax.random.split(key, 5)
        u_sm, u_dpa, u_err = jax.random.uniform(k_sel, (3,))
        counts = jnp.zeros((n_chains, 5, 2), jnp.int32)
        move_keys = jax.random.split(k_move, n_chains)

        if not mcmc_cfg.fix_assign:
            def do_sm(st):
                return jax.vmap(
                    lambda k_, s: split_merge(
                        k_, s, data, cfg,
                        mcmc_cfg.sm_split_ratio, mcmc_cfg.sm_steps,
                    )
                )(move_keys, st)

            def do_gibbs(st):
                return (
                    jax.vmap(
                        lambda k_, s: gibbs_sweep(k_, s, data, cfg)
                    )(move_keys, st),
                    jnp.zeros((n_chains, 2, 2), jnp.int32),
                )

            if mcmc_cfg.sm_prob > 0.0:
                states, sm_counts = jax.lax.cond(
                    u_sm < mcmc_cfg.sm_prob, do_sm, do_gibbs, states
                )
            else:
                states, sm_counts = do_gibbs(states)
            counts = counts.at[:, 1:3].add(sm_counts)

            if mcmc_cfg.dpa_prob > 0.0:
                dpa_keys = jax.random.split(k_dpa, n_chains)
                states = jax.lax.cond(
                    u_dpa < mcmc_cfg.dpa_prob,
                    lambda st: jax.vmap(
                        lambda k_, s: update_dp_alpha(k_, s, cfg)
                    )(dpa_keys, st),
                    lambda st: st,
                    states,
                )

        n1, n0 = jax.vmap(
            lambda a: cluster_stats(data, a, cfg.k_max)
        )(states.assignment)
        par_keys = jax.random.split(k_par, n_chains)
        states, par_dec, par_acc = jax.vmap(
            lambda k_, s, a, b: update_parameters(k_, s, a, b, cfg)
        )(par_keys, states, n1, n0)
        counts = counts.at[:, 0, 0].add(par_acc.astype(jnp.int32))
        counts = counts.at[:, 0, 1].add(par_dec.astype(jnp.int32))

        if cfg.learn_errors and mcmc_cfg.error_prob > 0.0:
            err_keys = jax.random.split(k_err, n_chains)

            def do_err(st):
                st2, fp_acc, fn_acc = jax.vmap(
                    lambda k_, s, a, b: update_error_rates(k_, s, a, b, cfg)
                )(err_keys, st, n1, n0)
                c = jnp.zeros((n_chains, 2, 2), jnp.int32)
                c = c.at[:, 0, 0].set(fp_acc.astype(jnp.int32))
                c = c.at[:, 0, 1].set(1 - fp_acc.astype(jnp.int32))
                c = c.at[:, 1, 0].set(fn_acc.astype(jnp.int32))
                c = c.at[:, 1, 1].set(1 - fn_acc.astype(jnp.int32))
                return st2, c

            states, err_counts = jax.lax.cond(
                u_err < mcmc_cfg.error_prob,
                do_err,
                lambda st: (st, jnp.zeros((n_chains, 2, 2), jnp.int32)),
                states,
            )
            counts = counts.at[:, 3:5].add(err_counts)

        rows = jax.vmap(
            lambda s, a, b: summarize(s, data, cfg, trace_k,
                                      stats=(a, b))
        )(states, n1, n0)
        return states, rows._replace(mh_counts=counts)

    return step


# ---------------------------------------------------------------------------
# Host-side result containers (structurally the reference's `results` dicts)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ChainResult:
    """Mirrors the per-chain results dict (libs/MCMC.py:231-258)."""

    ML: np.ndarray
    MAP: np.ndarray
    DP_alpha: np.ndarray
    FN: np.ndarray
    FP: np.ndarray
    assignments: np.ndarray   # [steps, n]
    params: np.ndarray        # [post_burn_in_steps, trace_k, m]
    burn_in: int
    mh_counts: np.ndarray     # [5, 2]
    PSRF: list = dataclasses.field(default_factory=list)
    PSRF_cutoff: float | None = None

    def as_dict(self) -> dict:
        d = {
            "ML": self.ML, "MAP": self.MAP, "DP_alpha": self.DP_alpha,
            "FN": self.FN, "FP": self.FP, "assignments": self.assignments,
            "params": self.params, "burn_in": self.burn_in,
        }
        if self.PSRF:
            d["PSRF"] = self.PSRF
            d["PSRF_cutoff"] = self.PSRF_cutoff
        return d


class _TraceBuffer:
    """Accumulates device trace blocks into host numpy arrays.

    Invariant: ``rows[-1]`` may still be IN FLIGHT (device arrays /
    ``_Chunked`` transfer handles, not numpy) — the D2H copy of block i
    overlaps the sampling of block i+1 and is materialized on the next
    append. Always go through :meth:`concat` (which finishes every fetch);
    never read ``rows[-1]``'s leaves directly.

    ``params_from`` bounds host memory for the big params leaf: rows of the
    params trace with a global row index (initial state = row 0, step s =
    row s) below it are dropped at append time, matching the reference's
    post-burn-in-only params recording (libs/MCMC.py:260-282). At headline
    scale the full-rate params trace is ~0.5 GB per chain (steps x trace_k
    x m f32); with the default burn-in this retains ~1/3 of it. Scalar and
    assignment traces are always kept at full rate (the PSRF diagnostic and
    the point estimators need the whole ML/MAP history). Blocks appended
    with an already-trimmed params leaf (checkpoint resume) are recognized
    by their row count and left alone.
    """

    def __init__(self, n_chains: int, params_from: int = 0):
        self.rows: list = []  # list of TraceRow pytrees (numpy, [C, B, ...])
        self.n_chains = n_chains
        self.params_from = params_from
        self._next = 1  # global row index of the next appended step row

    def append(self, rows: TraceRow, live_k=None):
        b = rows.ml.shape[1]
        bp = rows.params.shape[1]
        lo = max(0, min(b, self.params_from - self._next))
        self._next += b
        if bp == b:
            if lo:
                rows = rows._replace(params=rows.params[:, lo:])
        elif bp != b - lo:
            raise ValueError(
                f"block with {bp} params rows does not match either the "
                f"full ({b}) or the trimmed ({b - lo}) row count"
            )
        p = rows.params
        if isinstance(p, jax.Array) and p.shape[1] and p.shape[2] > 8:
            # Slice the params leaf to the block's live-cluster width
            # (rounded up to a POWER OF TWO — each distinct width is a
            # separate slice + chunked-transfer program, and on the
            # tunneled TPU every fresh compile is a ~0.7-1.4 s remote
            # round-trip; pow2 bounds the storm at log2(k) programs)
            # before it crosses the relay: at headline scale ~12 of
            # trace_k=128 slots are live, so the dominant D2H leaf
            # shrinks ~8x. `live_k` is the pipe-computed block scalar
            # (run_block._last_live_k) — already materialized with the
            # block, so int() is a ready-buffer readback, not a queued
            # device program. concat() re-pads to a common width.
            if live_k is not None:
                w = max(int(x) for x in live_k)
            else:
                w = int(_block_live_k(p))
            w = min(p.shape[2], max(8, 1 << max(0, int(w) - 1).bit_length()))
            if w < p.shape[2]:
                rows = rows._replace(params=p[:, :, :w])
        # Start the device->host copies immediately (chunked for large
        # leaves — utils/transfer.py) and materialize with a one-block
        # delay, so the transfer of block i overlaps the sampling of block
        # i+1. The param trace is tens of MB at headline scale: a blocking
        # per-block np.asarray serialized it with compute, and a whole-
        # buffer async copy takes the relay's pathological big-transfer
        # path.
        rows = transfer.start_fetch(rows)
        if self.rows:
            self.rows[-1] = transfer.finish_fetch(self.rows[-1])
        self.rows.append(rows)

    def concat(self) -> TraceRow:
        self.rows = [transfer.finish_fetch(r) for r in self.rows]
        # Blocks may carry different live-width params slices (append);
        # re-pad to the run's high-water width before concatenating.
        # Fully-trimmed (pre-burn-in) blocks kept their unsliced width but
        # have no rows — exclude them so they don't re-inflate the width.
        ws = [r.params.shape[2] for r in self.rows if r.params.shape[1]]
        k = max(ws) if ws else self.rows[0].params.shape[2]
        self.rows = [
            r if r.params.shape[2] == k
            else r._replace(params=_pad_k(np.asarray(r.params), k))
            for r in self.rows
        ]
        return jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=1), *self.rows
        )

    def trim_params(self, new_from: int):
        """Ratchet ``params_from`` upward, dropping already-retained params
        rows with global index < ``new_from``. For modes whose burn-in GROWS
        with the trace (lugsail's steps//2), this keeps host retention of
        the big params leaf at ~post-burn-in size throughout the run
        instead of full rate (the reference trims once at the end,
        libs/MCMC.py:173-177). Materializes in-flight fetches first — in
        practice free, because the lugsail loop calls concat() (which also
        materializes) right before each trim."""
        if new_from <= self.params_from:
            return
        self.params_from = new_from
        self.rows = [transfer.finish_fetch(r) for r in self.rows]
        start = 1  # global row index of block 0's first step row
        for i, r in enumerate(self.rows):
            b = r.ml.shape[1]
            bp = r.params.shape[1]
            p_start = start + (b - bp)  # earlier trims drop LEADING rows
            k = min(new_from - p_start, bp)
            if k > 0:
                # .copy(): a numpy slice is a view that pins the full base
                # buffer — copying is what actually frees the memory.
                self.rows[i] = r._replace(params=r.params[:, k:].copy())
            start += b

    @property
    def n_steps(self) -> int:
        return sum(r.ml.shape[1] for r in self.rows)


class MCMCRunner:
    """Multi-chain scheduler (reference MCMC class, libs/MCMC.py:26-193).

    Chains are a batched leading axis executed in one jitted scan per block;
    with a multi-device mesh the chain axis is sharded so chains ride
    separate chips with zero collectives (they only meet on the host for
    PSRF checks and result pooling, as in the reference).
    """

    def __init__(self, cfg: ModelConfig, mcmc_cfg: MCMCConfig,
                 data: PackedData, block_size: int = 256, mesh=None,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 4, chain_exec: str = "auto"):
        self.cfg = cfg
        self.mcmc_cfg = mcmc_cfg
        self.data = data
        self.block_size = block_size
        self.trace_k = resolve_trace_k(cfg, mcmc_cfg)
        self.mesh = mesh
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        # Mutation-axis model parallelism (SURVEY.md section 2.3 TP row):
        # a mesh with a "muts" axis routes every block through the
        # shard_map-wrapped step of bnpc_tpu.parallel.sharded.
        self.mut_shards = (
            int(mesh.shape["muts"]) if mesh is not None
            and "muts" in mesh.axis_names else 1
        )
        requested_exec = chain_exec  # pre-resolution; threads into shard_map
        self._block_sharded = None
        if self.mut_shards > 1:
            from bnpc_tpu.parallel import sharded as _psh

            self._data_pad, self._m_pad = _psh.pad_muts(
                data, self.mut_shards)
            self._block_sharded = _psh.make_sharded_block(
                mesh, cfg, mcmc_cfg, self._data_pad,
                chain_exec=requested_exec)
        # Chain-sharded kernel path: with a multi-device backend (explicit
        # chains mesh, or any multi-device default), blocks route through
        # shard_map so each device runs its LOCAL chains unbatched and takes
        # the fused Pallas fast path (see parallel/sharded.make_sharded_block)
        # instead of the vmapped scan fallback. Used whenever the chain count
        # divides the mesh's chain axis (run_block falls back otherwise).
        self._chain_mesh = None
        self._chain_block = None
        if self._block_sharded is None:
            from bnpc_tpu.parallel import sharded as _psh

            if mesh is not None and "chains" in mesh.axis_names:
                self._chain_mesh = mesh
            elif mesh is None and len(jax.devices()) > 1:
                self._chain_mesh = _psh.make_mesh(len(jax.devices()), 1)
            if self._chain_mesh is not None:
                self._chain_block = _psh.make_sharded_block(
                    self._chain_mesh, cfg, mcmc_cfg, data,
                    chain_exec=requested_exec)
        # How to execute a chain batch on a single device: "vmap" batches
        # them into one program, "sequential" runs the single-chain program
        # per chain. Sequential wins whenever the fused Pallas kernels are
        # available (they cannot run under vmap; measured 985 vs 254 total
        # chain-steps/s at 4 x 1,000 x 100 on v5e) and also for large states
        # on any backend (batched scatter/gather lowering and the [C, n, k]
        # likelihood carries make the vmapped scan slower than 1 chain).
        # With a multi-device mesh, vmap + chain sharding keeps chains on
        # separate chips — sequential would serialize them on one.
        if chain_exec == "auto":
            from bnpc_tpu.models.gibbs import pallas_available

            single_dev = len(jax.devices()) == 1
            chain_exec = (
                "sequential"
                if single_dev and (pallas_available(cfg)
                                   or cfg.n_cells * cfg.k_max >= 600_000)
                else "vmap"
            )
        self.chain_exec = chain_exec

        # Each pipeline folds the per-block key splitting and the chain-axis
        # unwrap/rewrap INTO the jitted program: over a tunneled TPU every
        # separate dispatch costs ~1-2 ms of relay latency, and the old
        # eager tree.map/split sequence (~20 dispatches per block) cost more
        # than the sampling itself at headline scale (measured: 180 ->
        # ~300 steps/s at 5,000 x 200, block 32).
        #
        # The data planes enter every pipe as ARGUMENTS, not closures: a
        # closed-over concrete array is embedded in the lowered program as a
        # constant, which (a) ships the whole [n, m] matrix inside every
        # compile request (the tunneled remote-compile service rejects the
        # step program with HTTP 413 above ~131k cells) and (b) recompiles
        # on every new dataset of the same shape. The block/step factories
        # are therefore invoked inside the traced function, where `data` is
        # a tracer.
        def _split_keys(keys, n_steps):
            step_keys = jax.vmap(
                lambda k: jax.random.split(k, n_steps + 1)
            )(keys)
            return step_keys, step_keys[:, 0]

        # Every pipe returns (states, rows, next_keys, live_k) where live_k
        # is the block's max live-cluster count, computed INSIDE the jitted
        # pipeline. _TraceBuffer.append needs this scalar concretely for the
        # live-width params wire slice; computing it eagerly per block cost
        # a separate device program that queued BEHIND the already-
        # dispatched next block (~150 ms/block of spurious wait at headline
        # shape). As a pipe output it is materialized the moment the block
        # finishes, so int() is a cheap ready-buffer readback.
        def _pipe_single(states, keys, data, n_steps):
            # Single-chain runs skip vmap entirely: under vmap lax.cond
            # lowers to select (both move branches execute every step),
            # roughly doubling step cost. The unbatched block also gets the
            # fused Pallas kernels on TPU (gibbs.pallas_available).
            blk = make_block_fn(cfg, mcmc_cfg, data, self.trace_k,
                                gibbs_impl="auto_single")
            step_keys, next_keys = _split_keys(keys, n_steps)
            st1 = jax.tree.map(lambda x: x[0], states)
            st1, rows1 = blk(st1, step_keys[0, 1:])
            return (jax.tree.map(lambda x: x[None], st1),
                    jax.tree.map(lambda x: x[None], rows1), next_keys,
                    _block_live_k(rows1.params))

        def _pipe_vmap(states, keys, data, n_steps):
            blk = make_block_fn(cfg, mcmc_cfg, data, self.trace_k)
            step_keys, next_keys = _split_keys(keys, n_steps)
            states, rows = jax.vmap(blk)(states, step_keys[:, 1:])
            return states, rows, next_keys, _block_live_k(rows.params)

        def _pipe_coupled(states, keys, data, n_steps):
            coupled = make_coupled_step_fn(cfg, mcmc_cfg, data, self.trace_k)
            step_keys, next_keys = _split_keys(keys, n_steps)
            states, rows_sc = jax.lax.scan(coupled, states, step_keys[0, 1:])
            # [B, C, ...] -> [C, B, ...]
            rows = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), rows_sc)
            return states, rows, next_keys, _block_live_k(rows.params)

        self._pipe_single = jax.jit(_pipe_single, static_argnums=3)
        self._pipe_vmap = jax.jit(_pipe_vmap, static_argnums=3)
        self._pipe_coupled = jax.jit(_pipe_coupled, static_argnums=3)
        # Sharded (shard_map) paths share one pipe that folds the key
        # splitting and the params un-padding into the jitted program (the
        # eager per-block vmap-split costs several relay dispatches). The
        # pipe calls the RAW (un-jitted, data-first) shard_map body so the
        # data rides through its own jit boundary as an argument.
        sh_block = (self._block_sharded if self._block_sharded is not None
                    else self._chain_block)
        self._pipe_sharded = None
        self._sh_data = None
        if sh_block is not None:
            m_real = cfg.n_muts
            sh_raw = sh_block.raw
            # Committed to the mesh sharding ONCE (parallel/sharded.
            # place_data) — an uncommitted jit argument would be re-laid-
            # out to the shard_map in_spec sharding every block.
            sh_mesh = (mesh if self._block_sharded is not None
                       else self._chain_mesh)
            self._sh_data = _psh.place_data(
                sh_mesh,
                self._data_pad if self._block_sharded is not None else data)

            def _pipe_sharded(states, keys, data_arg, n_steps):
                step_keys, next_keys = _split_keys(keys, n_steps)
                states, rows = sh_raw(data_arg, states, step_keys[:, 1:])
                if rows.params.shape[-1] != m_real:
                    rows = rows._replace(params=rows.params[..., :m_real])
                return states, rows, next_keys, _block_live_k(rows.params)

            self._pipe_sharded = jax.jit(_pipe_sharded, static_argnums=3)
        # Sequential-exec helpers: one dispatch to slice a chain out and one
        # to restack all chains (vs ~6 eager ops per pytree leaf).
        self._slice_chain = jax.jit(lambda tree, c: jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, c, 1, 0), tree))
        self._stack_chains = jax.jit(lambda trees: jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *trees))
        self._summary = jax.jit(jax.vmap(
            lambda st, d: summarize(st, d, cfg, self.trace_k),
            in_axes=(0, None),
        ))
        self.seeds: np.ndarray | None = None
        # Injectable clock (deterministic time-mode tests stub this).
        self._now = datetime.now
        # Set by run_block: tuple of device scalars, the max live-cluster
        # count of the latest block (one per dispatched program).
        self._last_live_k = None

    # -- low-level --------------------------------------------------------

    def init_chains(self, key, n_chains: int, assign=None) -> CRPState:
        keys = jax.random.split(key, n_chains)
        if assign is not None:
            states = [
                init_state(k, self.cfg, self.data, assign=assign)
                for k in keys
            ]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        return jax.vmap(
            lambda k: init_state(k, self.cfg, self.data, mode="random")
        )(keys)

    def run_block(self, states: CRPState, keys, n_steps: int):
        """Run one block. Returns (states, rows, next_keys); the block's
        live-cluster-count scalar(s) — a device int computed inside the
        pipe — land in ``self._last_live_k`` for _TraceBuffer.append's
        wire-width slice (a tuple: one entry per dispatched program)."""
        if self._block_sharded is not None:
            states = self._pad_state_muts(states)
            st, rows, nk, lk = self._pipe_sharded(
                states, keys, self._sh_data, n_steps)
        elif keys.shape[0] == 1:
            st, rows, nk, lk = self._pipe_single(
                states, keys, self.data, n_steps)
        elif self.mcmc_cfg.coupled_moves and self.chain_exec == "vmap":
            # One shared key stream drives the move schedule; per-chain
            # randomness is split from it inside the step.
            st, rows, nk, lk = self._pipe_coupled(
                states, keys, self.data, n_steps)
        elif (self._chain_block is not None
                and keys.shape[0] % self._chain_mesh.shape["chains"] == 0):
            st, rows, nk, lk = self._pipe_sharded(
                states, keys, self._sh_data, n_steps)
        elif self.chain_exec == "sequential":
            # Per-chain single-chain programs (see __init__ notes). The
            # width-1 slice keeps the chain axis so each chain reuses the
            # SAME compiled pipeline as an actual single-chain run.
            outs = []
            for c in range(keys.shape[0]):
                st_c, keys_c = self._slice_chain((states, keys), c)
                outs.append(
                    self._pipe_single(st_c, keys_c, self.data, n_steps))
            st, rows, nk = self._stack_chains(tuple(o[:3] for o in outs))
            self._last_live_k = tuple(o[3] for o in outs)
            return st, rows, nk
        else:
            st, rows, nk, lk = self._pipe_vmap(
                states, keys, self.data, n_steps)
        self._last_live_k = (lk,)
        return st, rows, nk

    # -- top-level run (libs/MCMC.py:79-123) -------------------------------

    def run(self, run_var, seed: int, n_chains: int = 1, assign=None,
            verbosity: int = 1):
        """run_var: (steps:int, burn_in:int) | (end:datetime, bi:datetime) |
        (cutoff:float, 0). Returns list[ChainResult]."""
        self._verbosity = verbosity
        if seed is None or seed < 0:
            seed = int(np.random.randint(0, 2**31 - 1))
        root = jax.random.key(seed)
        k_init, k_run = jax.random.split(root)
        # Per-chain seeds reported for reproducibility (libs/MCMC.py:102-104).
        self.seeds = np.asarray(
            jax.random.randint(k_init, (n_chains,), 0, 2**31 - 1)
        )

        states = self.init_chains(k_init, n_chains, assign=assign)
        keys = jax.random.split(k_run, n_chains)
        states, keys = self._maybe_shard(states, keys, n_chains)

        if isinstance(run_var[0], (int, np.integer)):
            return self._run_steps(states, keys, int(run_var[0]),
                                   int(run_var[1]))  # noqa: E501
        if isinstance(run_var[0], float):
            return self._run_lugsail(states, keys, float(run_var[0]),
                                     verbosity)
        return self._run_time(states, keys, run_var[0], run_var[1])

    def _pad_state_muts(self, states):
        """Pad the params mutation axis up to the mesh's shard multiple."""
        m, m_pad = self.cfg.n_muts, self._m_pad
        if states.params.shape[-1] == m_pad:
            return states
        return states._replace(params=jnp.pad(
            states.params, [(0, 0), (0, 0), (0, m_pad - m)],
            constant_values=0.5,
        ))

    def _summarize_states(self, states):
        """Initial-row summary; drops mutation padding first if present."""
        if states.params.shape[-1] != self.cfg.n_muts:
            states = states._replace(
                params=states.params[..., :self.cfg.n_muts])
        return self._summary(states, self.data)

    def _maybe_shard(self, states, keys, n_chains: int):
        """Shard the chain batch axis over the devices (the TPU-native
        replacement for one-process-per-chain, libs/MCMC.py:113-120)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if self.mesh is not None:
            mesh = self.mesh
            if self.mut_shards > 1:
                if n_chains % mesh.shape["chains"] != 0:
                    raise ValueError(
                        f"{n_chains} chains not divisible by the mesh's "
                        f"chain axis ({mesh.shape['chains']})"
                    )
                from bnpc_tpu.parallel import sharded as _psh

                return _psh.shard_chain_states(
                    mesh, self._pad_state_muts(states), keys)
        else:
            n_dev = len(jax.devices())
            if n_dev <= 1 or n_chains <= 1:
                return states, keys
            # Place inputs on the same mesh the chain-sharded block uses so
            # shard_map needs no resharding on entry.
            mesh = (self._chain_mesh if self._chain_mesh is not None
                    else Mesh(np.asarray(jax.devices()), ("chains",)))
        if "chains" not in mesh.axis_names or                 n_chains % mesh.shape["chains"] != 0:
            return states, keys
        states = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P(*(("chains",) + (None,) * (x.ndim - 1))))),
            states,
        )
        keys = jax.device_put(keys, NamedSharding(mesh, P("chains")))
        return states, keys

    # -- checkpoint / resume (absent in the reference; SURVEY.md section 5
    # notes trace+PRNG-key checkpointing is nearly free with a scan carry) --

    def save_checkpoint(self, path, states, keys, buf, done: int,
                        init_rows: TraceRow | None = None,
                        extra: dict | None = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        rows = buf.concat() if buf.rows else None
        payload = {
            "done": np.asarray(done),
            "key_data": np.asarray(jax.random.key_data(keys)),
        }
        for k, v in (extra or {}).items():
            payload[f"extra_{k}"] = np.asarray(v)
        for f in states._fields:
            payload[f"state_{f}"] = np.asarray(getattr(states, f))
        if init_rows is not None:
            for f in init_rows._fields:
                payload[f"init_{f}"] = np.asarray(getattr(init_rows, f))
        if rows is not None:
            for f in rows._fields:
                payload[f"trace_{f}"] = np.asarray(getattr(rows, f))
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)

    def load_checkpoint(self, path):
        with np.load(path) as z:
            done = int(z["done"])
            keys = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
            self._ckpt_extra = {
                k[len("extra_"):]: z[k] for k in z.files
                if k.startswith("extra_")
            }
            states = CRPState(**{
                f: jnp.asarray(z[f"state_{f}"]) for f in CRPState._fields
            })
            rows = None
            if "trace_ml" in z.files:
                rows = TraceRow(**{
                    f: z[f"trace_{f}"] for f in TraceRow._fields
                })
            init_rows = None
            if "init_ml" in z.files:
                init_rows = TraceRow(**{
                    f: z[f"init_{f}"] for f in TraceRow._fields
                })
        return states, keys, rows, done, init_rows

    def _collect(self, buf: _TraceBuffer, init_rows: TraceRow, burn_in,
                 psrf=None, cutoff=None) -> list[ChainResult]:
        rows = buf.concat()
        # Reconcile the initial row's params width with the (live-width
        # sliced) trace. When the buffer starts at burn_in > 0 the initial
        # params are never consumed, so aligning down is safe; otherwise
        # keep every live initial row (random init can have far more live
        # clusters than any post-mixing block).
        ip = np.asarray(init_rows.params)
        w = rows.params.shape[2]
        if ip.shape[1] != w:
            if buf.params_from == 0:
                init_live = int(np.any(ip != 0, axis=-1).sum(axis=-1).max())
                common = max(w, init_live)
                rows = rows._replace(params=_pad_k(rows.params, common))
                w = common
            ip = (ip[:, :w] if ip.shape[1] >= w
                  else np.pad(ip, [(0, 0), (0, w - ip.shape[1]), (0, 0)]))
            init_rows = init_rows._replace(params=ip)
        # Prepend the initial-state row (reference records step 0 at chain
        # construction, libs/MCMC.py:349-358).
        full = jax.tree.map(
            lambda a, b: np.concatenate([np.asarray(a)[:, None], b], axis=1),
            jax.tree.map(np.asarray, init_rows), rows,
        )
        results = []
        for c in range(buf.n_chains):
            bi = burn_in if np.isscalar(burn_in) else burn_in[c]
            if buf.params_from > 0:
                # The buffer only retained params rows with global index
                # >= params_from (== burn_in in steps mode; <= the final
                # burn-in under lugsail's ratcheting trim, so slice any
                # remainder). The initial row is excluded either way.
                params_c = np.asarray(rows.params[c])
                extra = int(bi) - buf.params_from
                if extra > 0:
                    params_c = params_c[extra:]
            else:
                params_c = full.params[c][int(bi):]
            res = ChainResult(
                ML=full.ml[c],
                MAP=full.map_[c],
                DP_alpha=full.dp_alpha[c],
                FN=full.fn[c],
                FP=full.fp[c],
                # Traces travel the relay in compact wire dtypes
                # (_trace_dtypes); restore the documented i32/f32 contract.
                assignments=full.assignment[c].astype(np.int32),
                params=params_c.astype(np.float32),
                burn_in=int(bi),
                mh_counts=full.mh_counts[c].sum(axis=0),
            )
            if psrf is not None:
                res.PSRF = list(psrf)
                res.PSRF_cutoff = cutoff
            results.append(res)
        return results

    def _run_steps(self, states, keys, steps: int, burn_in: int):
        init_rows = self._summarize_states(states)
        # Retain the (large) params trace only post-burn-in, as the
        # reference does (libs/MCMC.py:260-282) — see _TraceBuffer.
        buf = _TraceBuffer(keys.shape[0], params_from=int(burn_in))
        done = 0
        ckpt_path = None
        if self.checkpoint_dir:
            ckpt_path = os.path.join(self.checkpoint_dir, "mcmc_state.npz")
            if os.path.exists(ckpt_path):
                states, keys, rows, done, saved_init = \
                    self.load_checkpoint(ckpt_path)
                if rows is not None:
                    buf.append(rows)
                if saved_init is not None:
                    init_rows = saved_init
        blocks_since_ckpt = 0
        # Dispatch-ahead trace appends: append() synchronizes on its
        # block's completion (the live-width params slice needs the
        # concrete cluster count — _TraceBuffer.append), so appending
        # block i BEFORE dispatching block i+1 leaves the device idle for
        # one host round-trip per block. Holding each block's rows as
        # `pending` and appending only after the NEXT block is in the
        # device queue removes that bubble; `flush()` runs before anything
        # that needs the buffer caught up with `done` (checkpoints,
        # collection). Append order — and therefore the buffer's global
        # row indexing for the params_from trim — is unchanged.
        pending = None

        def flush():
            nonlocal pending
            if pending is not None:
                buf.append(pending[0], live_k=pending[1])
                pending = None

        while done < steps:
            b = min(self.block_size, steps - done)
            if b == self.block_size:
                states, rows, keys = self.run_block(states, keys, b)
            else:
                # Run a full block to reuse the compiled program; keep only
                # the first b trace rows (the extra sampled steps are simply
                # discarded — the chain state intentionally advances past
                # them, which is statistically immaterial). Checkpoint the
                # last BLOCK-ALIGNED state first: the excess steps are not
                # re-startable, and a resume replays the partial block
                # bit-identically from here (the step keys are a pure
                # function of the chain key).
                flush()
                if ckpt_path:
                    self.save_checkpoint(ckpt_path, states, keys, buf, done,
                                         init_rows)
                states, rows, keys = self.run_block(
                    states, keys, self.block_size
                )
                rows = jax.tree.map(lambda x: x[:, :b], rows)
            flush()
            pending = (rows, self._last_live_k)
            done += b
            if getattr(self, "_verbosity", 1) > 1:
                # Progress printing reads the current block's MH counts —
                # a per-block sync that reintroduces the dispatch bubble;
                # acceptable at debug verbosity.
                self._print_progress(done, steps, rows)
            blocks_since_ckpt += 1
            aligned = done % self.block_size == 0
            if (ckpt_path and aligned
                    and blocks_since_ckpt >= self.checkpoint_every):
                flush()
                self.save_checkpoint(ckpt_path, states, keys, buf, done,
                                     init_rows)
                blocks_since_ckpt = 0
        flush()
        if ckpt_path and steps % self.block_size == 0:
            self.save_checkpoint(ckpt_path, states, keys, buf, done,
                                 init_rows)
        return self._collect(buf, init_rows, burn_in)

    def _print_progress(self, done, steps, rows):
        """Per-block progress + mean MH acceptance (libs/MCMC.py:369-379)."""
        counts = np.asarray(rows.mh_counts).sum(axis=(0, 1))
        print(f"\tstep:\t{done} / {steps}\n\t\tmean MH accept. ratio:")
        from bnpc_tpu import io as _io

        _io.show_mh_acceptance(counts[0], "parameters", 1)
        if not self.mcmc_cfg.fix_assign:
            _io.show_mh_acceptance(counts[1], "splits")
            _io.show_mh_acceptance(counts[2], "merges")
        if self.cfg.learn_errors:
            _io.show_mh_acceptance(counts[3], "FP")
            _io.show_mh_acceptance(counts[4], "FN")

    def _run_time(self, states, keys, end_time: datetime,
                  burnin_time: datetime):
        init_rows = self._summarize_states(states)
        buf = _TraceBuffer(keys.shape[0])
        burn_in = 0
        ckpt_path = None
        if self.checkpoint_dir:
            ckpt_path = os.path.join(self.checkpoint_dir,
                                     "mcmc_state_time.npz")
            if os.path.exists(ckpt_path):
                states, keys, rows, _, saved_init = \
                    self.load_checkpoint(ckpt_path)
                if rows is not None:
                    buf.append(rows)
                if saved_init is not None:
                    init_rows = saved_init
                ex = getattr(self, "_ckpt_extra", None) or {}
                if "burn_in" in ex:
                    burn_in = int(ex["burn_in"])
        blocks_since_ckpt = 0
        while self._now() < end_time:
            t_before = self._now()
            before_steps = buf.n_steps
            states, rows, keys = self.run_block(states, keys,
                                                self.block_size)
            jax.block_until_ready(rows.ml)
            t_after = self._now()
            # The reference ends the run within one step of the deadline
            # (clock check per step, libs/MCMC.py:413-430); a fixed-size
            # block would overshoot by up to block_size steps, so the rows
            # sampled past the deadline are truncated away by wall-clock
            # interpolation (the chain state advances past them, which is
            # statistically immaterial — same treatment as the partial
            # final block of steps mode).
            if t_after >= end_time and t_before < end_time:
                frac = (end_time - t_before) / (t_after - t_before)
                keep = max(1, int(self.block_size * frac))
                if keep < self.block_size:
                    rows = jax.tree.map(lambda x: x[:, :keep], rows)
            buf.append(rows, live_k=self._last_live_k)
            # The reference compares the burn-in timestamp at every step
            # start (libs/MCMC.py:428-430); steps inside a jitted block have
            # no host clock, so the step where burn-in ended is recovered by
            # linear interpolation of the block's wall-clock interval.
            if t_after < burnin_time:
                burn_in = buf.n_steps
            elif t_before < burnin_time:
                frac = (burnin_time - t_before) / (t_after - t_before)
                burn_in = before_steps + int(self.block_size * frac)
            blocks_since_ckpt += 1
            if (ckpt_path and blocks_since_ckpt >= self.checkpoint_every
                    and self._now() < end_time):
                self.save_checkpoint(ckpt_path, states, keys, buf,
                                     buf.n_steps, init_rows,
                                     extra={"burn_in": burn_in})
                blocks_since_ckpt = 0
        return self._collect(buf, init_rows, burn_in)

    def _run_lugsail(self, states, keys, cutoff: float, verbosity: int,
                     extension: int = 200):
        # Initial steps: max(10, 1/(cutoff^2 - 1)) (libs/MCMC.py:85-90).
        first = max(10, int(1.0 / (cutoff**2 - 1.0)))
        init_rows = self._summarize_states(states)
        buf = _TraceBuffer(keys.shape[0])
        ckpt_path = None
        resumed = False
        if self.checkpoint_dir:
            ckpt_path = os.path.join(self.checkpoint_dir,
                                     "mcmc_state_lugsail.npz")
            if os.path.exists(ckpt_path):
                states, keys, rows, _, saved_init = \
                    self.load_checkpoint(ckpt_path)
                ex = getattr(self, "_ckpt_extra", None) or {}
                if "params_from" in ex:
                    # The checkpointed rows carry a ratchet-trimmed params
                    # leaf; append() recognizes it by its row count.
                    buf.params_from = int(ex["params_from"])
                if rows is not None:
                    buf.append(rows)
                if saved_init is not None:
                    init_rows = saved_init
                resumed = True
        if not resumed:
            states, rows, keys = self.run_block(states, keys, first)
            buf.append(rows, live_k=self._last_live_k)
        # PSRF evaluations recorded before a checkpoint restart stay in the
        # reported history (the reference accumulates the full list across
        # extensions, libs/MCMC.py:147-156).
        psrf_log = []
        if resumed and getattr(self, "_ckpt_extra", None):
            ex = self._ckpt_extra
            if "psrf_steps" in ex:
                psrf_log = [
                    (int(s), float(v))
                    for s, v in zip(ex["psrf_steps"], ex["psrf_vals"])
                ]
        while True:
            steps_run = buf.n_steps + 1  # incl. initial row
            ml = np.concatenate(
                [np.asarray(init_rows.ml)[:, None], buf.concat().ml], axis=1
            )
            psrf = diagnostics.lugsail_psrf(
                [(ml[c], steps_run // 2) for c in range(ml.shape[0])]
            )
            psrf_log.append((steps_run, psrf))
            if verbosity > 1:
                print(f"\tPSRF at {steps_run}:\t{psrf:.5f}")
            # Burn-in only grows with the trace (steps//2+1), so params
            # rows below the CURRENT burn-in can never be needed — drop
            # them now instead of retaining the full-rate trace until the
            # end (reference trims post-hoc, libs/MCMC.py:173-177).
            buf.trim_params((buf.n_steps + 1) // 2 + 1)
            if psrf <= cutoff:
                break
            states, rows, keys = self.run_block(states, keys, extension)
            buf.append(rows, live_k=self._last_live_k)
            if ckpt_path:
                self.save_checkpoint(
                    ckpt_path, states, keys, buf, buf.n_steps, init_rows,
                    extra={
                        "psrf_steps": [s for s, _ in psrf_log],
                        "psrf_vals": [v for _, v in psrf_log],
                        "params_from": buf.params_from,
                    })
        burn_in = (buf.n_steps + 1) // 2 + 1
        return self._collect(buf, init_rows, burn_in, psrf=psrf_log,
                             cutoff=cutoff)
