"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md section 4, item 5).

BNPC_TPU_TESTS=1 keeps the real backend instead, enabling the TPU-gated
hardware tests (tests/test_tpu_hardware.py) — run those alone:

    BNPC_TPU_TESTS=1 PYTHONPATH=.:/root/.axon_site \
        python -m pytest tests/test_tpu_hardware.py -q
"""

import os

_TPU_MODE = os.environ.get("BNPC_TPU_TESTS", "") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    # The hosted TPU plugin ignores JAX_PLATFORMS; the config knob does not.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The suite is dominated by XLA compile time (full MCMC-step programs);
# persist compiled executables across runs. The helper scopes the cache
# dir by a host CPU-feature fingerprint — XLA:CPU AOT entries from a host
# with different visible flags SEGFAULT on load (utils/cache.py).
from bnpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

# None -> BNPC_TPU_CACHE env override, else the repo-root .jax_cache (the
# module default). The env override lets a side process (e.g. developing a
# new test while the suite runs) use a scratch cache dir instead of racing
# the suite's.
enable_compilation_cache(None)
