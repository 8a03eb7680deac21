"""On-device (compiled Mosaic) parity tests — TPU hardware only.

Interpreter-mode tests pin the kernels' LOGIC bit-exactly, but several
behaviors depend on Mosaic hardware semantics the interpreter does not
exercise: the rg kernel's +/-inf scalar arithmetic (the fused count
log-table forcing side 1 when a restricted-Gibbs side empties), the sweep
kernels' pl.when-guarded SMEM write-then-read ordering on cluster birth,
the chunked HBM<->SMEM staging DMAs, and the bf16-one-hot/f32-MXU exactness
argument of the estimator device paths. These wrap the standing hardware
probes (benchmarks/tpu_kernel_parity.py, benchmarks/tpu_estimator_parity.py)
as pytests so a Mosaic regression cannot ship silently (VERDICT round 3,
weak item 4).

They skip cleanly on CPU (the default suite forces jax_platforms=cpu). To
run them on the bench TPU:

    BNPC_TPU_TESTS=1 PYTHONPATH=.:/root/.axon_site \
        python -m pytest tests/test_tpu_hardware.py -q

Never run these concurrently with another TPU process — both queue on the
single tunneled chip (CLAUDE.md).
"""

import os
import sys

import pytest

import jax

pytestmark = [
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs real TPU hardware"),
    pytest.mark.slow,
]

_BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "benchmarks")


def _run_probe(module_name):
    sys.path.insert(0, os.path.abspath(_BENCH_DIR))
    try:
        mod = __import__(module_name)
        mod.main()
    finally:
        sys.path.pop(0)


def test_kernel_parity_compiled():
    """Sweep (resident + stream) and restricted-scan kernels match the scan
    impls compiled on device, across 30 seeds with birth/forced-side paths
    firing (benchmarks/tpu_kernel_parity.py asserts internally)."""
    _run_probe("tpu_kernel_parity")


def test_estimator_parity_compiled():
    """Contingency tables integer-exact and MPEAR pair scores at f32
    tolerance vs the f64 host oracle on the TPU bf16/MXU path
    (benchmarks/tpu_estimator_parity.py asserts internally)."""
    _run_probe("tpu_estimator_parity")


def test_sharded_kernels_compiled():
    """The sweep (resident + stream) and restricted-scan kernels compiled
    INSIDE shard_map with a live MutAxis on real hardware match the scan
    impls under the same shard_map — the muts-sharded kernel enablement's
    Mosaic lowering, which the CPU-mesh interpret tests cannot exercise
    (benchmarks/tpu_sharded_parity.py asserts internally)."""
    _run_probe("tpu_sharded_parity")


def test_smem_probe_at_caps():
    """The shipped scaling claims actually compile and run on this
    hardware: the streaming sweep at (and beyond) the old SMEM ceiling and
    the cap-free rg kernel far above its old 196,608-cell SMEM cap
    (benchmarks/smem_probe.py oracles; bit-exact sequential replays)."""
    sys.path.insert(0, os.path.abspath(_BENCH_DIR))
    try:
        import smem_probe

        assert smem_probe.probe_stream(131072)
        assert smem_probe.probe_rg(262144)
        assert smem_probe.probe_rg(1048576)
    finally:
        sys.path.pop(0)
