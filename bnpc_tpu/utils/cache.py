"""Persistent XLA compilation cache.

The MCMC step compiles to a large program (~30 s on TPU, minutes for the
vmapped multi-chain variant); caching compiled executables across processes
makes repeat CLI/benchmark invocations start in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("BNPC_TPU_CACHE", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — purely an optimization
