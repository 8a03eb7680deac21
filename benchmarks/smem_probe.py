#!/usr/bin/env python3
"""Hardware probe: large-n ceilings + kernel compile/parity at large n.

Since round 4 the streaming sweep kernel keeps NO [n]-sized SMEM arrays
(aux/assign/targets ride VMEM [nb, 128] rows — the ceiling is the VMEM
accounting in ops/pallas_gibbs.py::stream_vmem_budget_bytes), and since
round 5 neither does the split-merge restricted-scan kernel (the fused
count log-table is window-staged per chunk; constant SMEM, no cell cap).
This probe binds those claims to measured reality:

  1. compiles + runs pallas_lazy_segment_stream at a ladder of cell counts
     with a NumPy oracle check of the full segment semantics (no-birth and
     birth exits);
  2. compiles + runs the rg kernel at the same ladder.

Run on a real TPU: PYTHONPATH=.:/root/.axon_site python benchmarks/smem_probe.py
"""

import sys

import numpy as np


def check_segment(zp, auxp, assignp, sizes, i0, log_denom, tgt, out_sizes,
                  info, tol=5e-4):
    """Validate the kernel's segment output against the semantics, allowing
    near-tie argmax flips: the TPU log approximation perturbs logits (the
    absolute error grows with log magnitude — ~1e-4 observed at cluster
    sizes ~25k), so any choice within `tol` of the exact max is a valid
    draw of a negligibly perturbed categorical (the documented divergence
    channel, ops/pallas_gibbs.py). A real staging bug (wrong row/lane) is
    O(1) off, far beyond `tol`. The replay FOLLOWS the kernel's choices so
    the size evolution stays in sync."""
    n = auxp.shape[0]
    k_pad = sizes.shape[0]
    sizes = sizes.astype(np.float64).copy()
    i_next, bpos, bslot = (int(v) for v in info[:3])
    p = i0
    while p < i_next:
        old = assignp[p]
        sizes[old] -= 1
        with np.errstate(divide="ignore"):
            logits = zp[p].astype(np.float64) + np.where(
                sizes > 0, np.log(np.maximum(sizes, 1e-30)), -np.inf
            ) - log_denom
        best_old = logits.max()
        t = int(tgt[p])
        assert 0 <= t < k_pad, (p, t)
        zeros = np.nonzero(sizes == 0)[0]
        is_birth = sizes[t] == 0
        if is_birth:
            # Birth: must be the FIRST free slot, and aux must (near-)beat
            # every live logit.
            assert zeros.size and t == int(zeros[0]), (p, t, zeros[:3])
            assert auxp[p] > best_old - tol, (p, auxp[p], best_old)
            assert (p, t) == (bpos, bslot) and i_next == p + 1, (
                p, t, (i_next, bpos, bslot))
        else:
            # Existing cluster: the choice must be a near-max logit, and if
            # a free slot existed, aux must not clearly beat it.
            assert logits[t] > best_old - tol, (p, t, logits[t], best_old)
            if zeros.size:
                assert auxp[p] < best_old + tol, (p, auxp[p], best_old)
        sizes[t] += 1
        p += 1
    if bpos < 0:
        assert i_next == n, (i_next, n)
    np.testing.assert_allclose(out_sizes, sizes, atol=0.5)


def probe_stream(n, k_pad=128, seed=0):
    import jax
    import jax.numpy as jnp

    from bnpc_tpu.ops.pallas_gibbs import (pallas_lazy_segment_stream,
                                           stream_chunk_rows)

    rng = np.random.default_rng(seed)
    C = min(stream_chunk_rows(k_pad, n), n)
    G = -(-n // C)
    nC = G * C
    k_live = 8
    zp = rng.normal(size=(n, k_pad)).astype(np.float32) * 2
    sizes = np.full(k_pad, -1.0, np.float32)
    counts = rng.multinomial(n, np.ones(k_live) / k_live)
    sizes[:k_live] = counts
    assignp = np.repeat(np.arange(k_live), counts).astype(np.int32)
    rng.shuffle(assignp)
    # aux mostly losing, a few winners to exercise the birth exit
    auxp = np.full(n, -50.0, np.float32)
    auxp[rng.integers(0, n, 3)] = 50.0
    log_denom = float(np.log(n - 1 + 1.0))

    zp3 = jnp.pad(jnp.asarray(zp), [(0, nC - n), (0, 0)]).reshape(G, C, k_pad)
    for i0 in (0, min(7, n - 1)):
        tgt, out_sizes, info = pallas_lazy_segment_stream(
            zp3, jnp.asarray(auxp), jnp.asarray(assignp),
            jnp.asarray(sizes)[None, :], i0, log_denom,
        )
        check_segment(zp, auxp, assignp, sizes, i0, log_denom,
                      np.asarray(tgt), np.asarray(out_sizes)[0],
                      np.asarray(info))
    return True


def probe_rg(n, seed=0):
    """Compile + run the chunk-staged rg kernel and check it bit-exactly
    against a sequential NumPy replay (the margin is one f32 add + compare,
    so host f32 and the TPU scalar unit round identically)."""
    import jax.numpy as jnp

    from bnpc_tpu.ops.pallas_rg import rg_scan

    rng = np.random.default_rng(seed)
    n_move = n // 2
    s_count = n_move - 2
    dz_v = (rng.normal(size=n) * 0.5).astype(np.float32)
    lau_v = rng.integers(0, 2, n).astype(np.int32)
    s1r = np.arange(n + 2, dtype=np.float32)
    with np.errstate(divide="ignore"):
        dtab = (np.log(s1r + 1.0)
                - np.log(np.maximum(n_move - s1r - 2.0, 0.0))
                ).astype(np.float32)
    count1 = int(lau_v[:s_count].sum())
    out = np.asarray(rg_scan(jnp.asarray(dz_v), jnp.asarray(lau_v),
                             jnp.asarray(dtab), s_count, count1))
    c1 = count1
    exp = lau_v.copy()
    for i in range(s_count):
        s1 = c1 - lau_v[i]
        new = int(np.float32(dz_v[i] + dtab[s1]) > 0.0)
        exp[i] = new
        c1 = s1 + new
    np.testing.assert_array_equal(out[:s_count], exp[:s_count])
    return True


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [30000, 50000, 65536, 98304]
    for n in sizes:
        for name, fn in (("stream", probe_stream), ("rg", probe_rg)):
            try:
                fn(n)
                print(f"n={n} {name}: OK", flush=True)
            except Exception as e:  # noqa: BLE001 — probe reports, not raises
                msg = str(e).splitlines()[0][:160]
                print(f"n={n} {name}: FAIL {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
