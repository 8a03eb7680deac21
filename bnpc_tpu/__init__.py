"""bnpc_tpu — TPU-native Bayesian non-parametric clustering of single-cell data.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cbg-ethz/BnpC
(Borgsmüller et al., Bioinformatics 2020): Dirichlet-process mixture clustering
of binary single-cell mutation matrices with a Bernoulli noise likelihood
(false-positive / false-negative error rates), inferred via MCMC.

Design (TPU-first, not a port):
  * The cells x clusters x mutations Bernoulli-mixture log-likelihood
    (reference: libs/CRP.py:197-238) is reformulated as two matmuls against
    per-cluster log-probability tables, so the hot path rides the MXU.
  * The dynamic cluster count (reference: dict bookkeeping, libs/CRP.py:119-152)
    becomes a fixed-capacity padded slot array with occupancy masks, keeping all
    shapes XLA-static.
  * The per-cell sequential Gibbs sweep (libs/CRP.py:254-288) is a lax.scan;
    split-merge (libs/CRP.py:417-820) is masked fixed-trip-count scans.
  * Independent chains (reference: multiprocessing.Pool, libs/MCMC.py:113-120)
    are a vmapped batch axis sharded over a 1-D device mesh.
"""

__version__ = "0.1.0"

import os as _os


def _tune_host_allocator():
    """Serve large allocations from the reusable glibc heap.

    numpy hands buffers above glibc's mmap threshold straight to
    mmap/munmap, so every big host temporary (trace stacking, estimator
    contingency arrays) pays demand-paging faults on first touch. On
    virtualized hosts with slow page-in (measured here: ~90 MB/s, i.e.
    ~20 s for a [500, 50000] int64 temporary) that dwarfs the compute.
    Raising M_MMAP_THRESHOLD keeps those buffers on the heap, which grows
    once to its high-water mark and is reused afterwards (measured: the
    same temporary drops to ~0.1 s steady-state). Harmless where paging
    is fast; disable with BNPC_TPU_NO_MALLOC_TUNE=1.
    """
    if _os.environ.get("BNPC_TPU_NO_MALLOC_TUNE") == "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 28)  # M_MMAP_THRESHOLD = -3
    except Exception:  # non-glibc platform: keep defaults
        pass


_tune_host_allocator()

import jax as _jax

# All matmuls in this package are either log-likelihood accumulations or
# integer-valued sufficient-statistic counts; both need true float32, not the
# TPU MXU's bf16 default. (Individual hot kernels may override locally.)
_jax.config.update("jax_default_matmul_precision", "highest")

from bnpc_tpu.config import ModelConfig, MCMCConfig
from bnpc_tpu.data import PackedData, pack_data
from bnpc_tpu.state import CRPState

__all__ = [
    "ModelConfig",
    "MCMCConfig",
    "PackedData",
    "pack_data",
    "CRPState",
    "__version__",
]
