#!/usr/bin/env python3
"""Probe: does lax.while_loop with a data-dependent exit compile in Mosaic?

The lazy-birth sweep redesign needs a kernel that processes cells from a
dynamic start position and exits early at the first cluster birth. This
probes the exact control structure (while_loop with scalar + vector carry,
SMEM scratch write under pl.when inside the body) on the real TPU compile
service before committing to the design.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k_pad = 512, 256

    def kernel(z_ref, perm_ref, i0_ref, out_ref, sizes_out_ref, info_ref,
               v_scr, free_scr, init_sem):
        init_dma = pltpu.make_async_copy(z_ref, v_scr, init_sem)
        init_dma.start()
        init_dma.wait()
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)[0]

        def cond(carry):
            i, sizes, bcell = carry
            return (i < n) & (bcell < 0)

        def body(carry):
            i, sizes, _ = carry
            cell = perm_ref[i]
            v = v_scr[pl.ds(cell, 1), :][0]
            logits = v + jnp.log(jnp.maximum(sizes, 0.0))
            best = jnp.max(logits)
            idx = jnp.argmax(logits).astype(jnp.int32)
            cand = v[0] > best  # arbitrary data-dependent trigger
            free_scr[0] = k_pad

            @pl.when(cand)
            def _():
                free_scr[0] = jnp.min(
                    jnp.where(sizes == 0.0, iota_k, k_pad)
                ).astype(jnp.int32)

            free = free_scr[0]
            is_new = cand & (free < k_pad)
            target = jnp.where(is_new, free, idx)
            out_ref[i] = target
            sizes = sizes + (iota_k == target).astype(jnp.float32)
            bcell = jnp.where(is_new, cell, -1)
            return (i + 1, sizes, bcell)

        i, sizes, bcell = jax.lax.while_loop(
            cond, body,
            (i0_ref[0], sizes_out_ref[0, :], jnp.int32(-1)),
        )
        sizes_out_ref[0, :] = sizes
        info_ref[0] = i
        info_ref[1] = bcell

    rng = np.random.default_rng(0)
    z = rng.normal(size=(n, k_pad)).astype(np.float32)
    perm = rng.permutation(n).astype(np.int32)
    i0 = np.array([0], np.int32)

    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((4,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, k_pad), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(z, perm, i0)
    for o in out:
        o.block_until_ready()
    print("compiled and ran; info:", np.asarray(out[2]))
    print("OK")


if __name__ == "__main__":
    main()
