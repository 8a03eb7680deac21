"""Probe: vector-flow sweep inner loop vs the shipped lazy segment kernel.

Hypothesis: the shipped kernel's per-cell cost (~0.25 us) is dominated by
vector->scalar crossings on the carried dependency (jnp.max/argmax feeding
the while-loop condition and SMEM target writes). This probe keeps the
whole per-cell chain in vector registers:

  * target selection via lane-reductions that STAY [1, 1] vectors
    (max-keepdims, min-where), never materializing a scalar;
  * targets accumulated in a [1, 128] register window, flushed to VMEM
    once per 128 cells;
  * the birth check batched: a birth-position min-accumulator in vector
    domain, ONE vector->scalar check per 128-cell batch.

No birth replay here (the probe measures the no-birth fast path, which is
~100% of iterations at stationarity); aux is set to -inf so no births fire.
Run on TPU: PYTHONPATH=.:/root/.axon_site python benchmarks/vecflow_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bnpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, K_PAD = 5000, 256
T = 128  # batch / window size


def _vecflow_kernel(z_ref, aux_ref, assign_ref, perm_ref, sizes_in_ref,
                    logden_ref,
                    tgt_out_ref, sizes_out_ref, info_ref,
                    v_scr, sem):
    n = assign_ref.shape[0]
    k_pad = v_scr.shape[1]
    nb = tgt_out_ref.shape[0]  # ceil(n / T)

    dma = pltpu.make_async_copy(z_ref, v_scr, sem)
    dma.start()
    dma.wait()

    log_denom = logden_ref[0, 0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    iota_kf = iota_k.astype(jnp.float32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    BIG = jnp.float32(1e9)

    def outer_cond(carry):
        b, _, bpos = carry
        return (b < nb) & (bpos[0, 0] >= BIG)

    def outer_body(carry):
        b, sizes0, bpos0 = carry
        base = b * T

        def body(j, c):
            sizes, bpos, w = c
            i = base + j
            # Tail-batch positions >= n are inert, but the reads still
            # happen — clamp so they stay in bounds.
            cell = perm_ref[jnp.minimum(i, n - 1)]
            old = assign_ref[cell]
            guard = i < n

            oldhot = ((iota_k == old) & guard).astype(jnp.float32)
            sizes = sizes - oldhot

            v = v_scr[pl.ds(cell, 1), :]
            logits = v + (jnp.log(jnp.maximum(sizes, 0.0)) - log_denom)
            best = jnp.max(logits, axis=1, keepdims=True)       # [1,1] vec
            candv = (best < aux_ref[cell]) & guard              # [1,1]
            freev = jnp.min(jnp.where(sizes == 0.0, iota_kf, float(k_pad)),
                            axis=1, keepdims=True)              # [1,1]
            is_new = candv & (freev < float(k_pad))
            idxv = jnp.min(jnp.where(logits == best, iota_kf, float(k_pad)),
                           axis=1, keepdims=True)               # [1,1]
            tgt = jnp.where(is_new, freev, idxv)                # [1,1] f32
            tgthot = ((iota_kf == tgt) & guard).astype(jnp.float32)
            sizes = sizes + tgthot

            w = jnp.where(lane128 == j, tgt, w)                 # [1,T]
            bpos = jnp.minimum(bpos, jnp.where(is_new,
                                               jnp.float32(i), BIG))
            return (sizes, bpos, w)

        w0 = jnp.zeros((1, T), jnp.float32)
        sizes, bpos, w = jax.lax.fori_loop(0, T, body, (sizes0, bpos0, w0))
        tgt_out_ref[pl.ds(b, 1), :] = w
        return (b + 1, sizes, bpos)

    b, sizes, bpos = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), sizes_in_ref[...], jnp.full((1, 1), BIG, jnp.float32)))
    sizes_out_ref[...] = sizes
    info_ref[0] = jnp.where(bpos[0, 0] >= BIG, n,
                            bpos[0, 0].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def vecflow(z, aux, assign, perm, sizes, log_denom, *, interpret=False):
    n8, k_pad = z.shape
    n = assign.shape[0]
    nb = -(-n // T)
    return pl.pallas_call(
        _vecflow_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, T), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n8, k_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(z, aux.astype(jnp.float32), assign.astype(jnp.int32),
      perm.astype(jnp.int32), sizes.astype(jnp.float32),
      jnp.asarray(log_denom, jnp.float32)[None, None])


def main():
    from bnpc_tpu.ops.pallas_gibbs import pallas_lazy_segment, _round_up

    rng = np.random.default_rng(0)
    n, k_pad = N, K_PAD
    n8 = _round_up(n, 8)
    z = jnp.asarray(rng.normal(size=(n8, k_pad)).astype(np.float32))
    assign = jnp.asarray(rng.integers(0, 12, n).astype(np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    sizes = np.full(k_pad, -1.0, np.float32)
    counts = np.bincount(np.asarray(assign), minlength=12)
    sizes[:12] = counts
    sizes = jnp.asarray(sizes)[None, :]
    aux = jnp.full((n,), -np.inf, jnp.float32)  # no births
    logden = 8.5

    # correctness vs the shipped kernel (interpret on CPU not needed; run
    # both compiled and compare)
    tgt_v, sizes_v, info_v = vecflow(z, aux, assign, perm, sizes, logden)
    tgt_l, sizes_l, info_l = pallas_lazy_segment(
        z, aux, assign, perm, sizes, jnp.int32(0), logden)
    tv = np.asarray(tgt_v).reshape(-1)[:n].astype(np.int32)
    tl = np.asarray(tgt_l)[:n]
    print("targets equal:", bool((tv == tl).all()),
          "sizes equal:", bool(np.allclose(sizes_v, sizes_l)),
          "info:", int(info_v[0]), int(info_l[0]))

    def bench(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        reps = 30
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / reps * 1e3)
        return float(np.median(ts))

    t_new = bench(vecflow, z, aux, assign, perm, sizes, logden)
    t_old = bench(pallas_lazy_segment, z, aux, assign, perm, sizes,
                  jnp.int32(0), logden)
    print(f"vecflow: {t_new:.3f} ms  ({t_new/n*1e3:.3f} us/cell)")
    print(f"shipped: {t_old:.3f} ms  ({t_old/n*1e3:.3f} us/cell)")


if __name__ == "__main__":
    main()
