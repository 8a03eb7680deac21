"""On-device (TPU) parity check for the estimator device paths.

The CPU test suite exercises _pair_stats_device / _contingency_device /
_sim_to_cols_device on the f32 fallback (CPU XLA has no bf16 dot); on TPU
they run bf16 one-hot matmuls whose exactness argument (0/1 inputs exact in
bf16, integer counts < 2^24 exact in the f32 MXU accumulator) is a hardware
property this script verifies: contingency tables must equal integer host
bincounts EXACTLY, and pair-counting MPEAR scores must match the f64 host
formulation to f32 rounding.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/tpu_estimator_parity.py
"""

import numpy as np


def host_scores(a, labels):
    """f64 host oracle of _mpear_scores_pairs (the pre-device bincount
    formulation)."""
    from scipy.special import binom

    steps, n = a.shape
    n_k = labels.shape[1]
    k_ids = int(a.max()) + 1
    k_hi = int(labels.max()) + 1
    span = steps * k_hi * k_ids
    dtype = np.int64
    a = a.astype(dtype)
    base = a + (np.arange(steps, dtype=dtype) * (k_hi * k_ids))[:, None]
    sizes = np.bincount(
        (a + np.arange(steps, dtype=dtype)[:, None] * k_ids).ravel(),
        minlength=steps * k_ids).astype(np.float64)
    pi_sum = ((sizes ** 2).sum() / steps - n) / 2.0
    pairs = float(binom(n, 2))
    out = np.empty(n_k)
    for j in range(n_k):
        joint = base + (labels[:, j].astype(dtype) * k_ids)[None, :]
        cnt = np.bincount(joint.ravel(), minlength=span).astype(np.float64)
        quad = (cnt ** 2).sum() / steps
        index = (quad - n) / 2.0
        csz = np.bincount(labels[:, j], minlength=k_hi).astype(np.float64)
        i_sum = ((csz ** 2).sum() - n) / 2.0
        expected = (i_sum * pi_sum) / pairs
        denom = 0.5 * (i_sum + pi_sum) - expected
        out[j] = -np.inf if denom == 0 else (index - expected) / denom
    return out


def main():
    from bnpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bnpc_tpu import estimators as est

    assert jax.default_backend() == "tpu", jax.default_backend()

    rng = np.random.default_rng(7)
    steps, n, k_ids = 120, 3000, 24
    # Posterior-like trace: a stable base clustering + 2% churn, candidate
    # cuts that coarsen/refine it — the structured regime MPEAR actually
    # scores (uniform-random labels give near-zero scores where relative
    # comparisons are meaningless).
    base = rng.integers(0, 12, n)
    a = np.tile(base, (steps, 1))
    flip = rng.random((steps, n)) < 0.02
    a[flip] = rng.integers(0, k_ids, int(flip.sum()))
    a = a.astype(np.int32)
    labels = np.stack([
        base // 6, base // 3, base, base * 2 + (rng.random(n) < 0.5),
        rng.integers(0, 30, n),
    ], axis=1)

    cont = est._contingency_device(a, labels[:, 2])
    want = np.zeros_like(cont)
    for s in range(steps):
        np.add.at(want[s], (labels[:, 2], a[s]), 1)
    assert (cont == want).all(), "contingency tables not integer-exact"
    print(f"contingency exact: [steps={steps}, n={n}] OK")

    got = est._mpear_scores_pairs(a, labels)
    want = host_scores(a, labels)
    err = np.max(np.abs(got - want))
    print(f"pair scores: {np.round(got, 4)}")
    print(f"abs err vs f64 host: {err:.2e}")
    # f32 accumulation of the quads bounds score error ~1e-4; the
    # between-candidate separations MPEAR discriminates are >= 1e-2.
    assert err < 1e-3, err
    assert int(np.argmax(got)) == int(np.argmax(want))

    cols = rng.choice(n, 97, replace=False)
    blk = np.asarray(est._sim_to_cols_device(a, cols))
    # exact oracle on a subsample of rows
    rows = rng.choice(n, 64, replace=False)
    oracle = (a[:, rows, None] == a[:, None, cols]).mean(axis=0)
    np.testing.assert_allclose(blk[rows], oracle, rtol=0, atol=1e-6)
    print("sim column-block OK")
    print("TPU ESTIMATOR PARITY OK")


if __name__ == "__main__":
    main()
