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


def host_fingerprint() -> str:
    """CPU-feature fingerprint for scoping the cache directory.

    XLA:CPU AOT executables in the persistent cache are compiled against
    the host's exact feature set, and jax's cache key does NOT include it:
    loading an entry produced under different visible flags first warns
    (cpu_aot_loader "could lead to execution errors such as SIGILL") and
    then SEGFAULTS in get_executable_and_time — observed here when the
    virtualized host's flags changed between sessions. Scoping the cache
    dir by the flags turns a feature change into a cache miss.

    The fingerprint hashes the model identity lines as well as the flags:
    LLVM tuning features (e.g. +prefer-no-gather, seen mismatching r3) are
    derived from the CPU MODEL, so hosts with identical flag sets but
    different models still produce incompatible AOT code.

    It ALSO hashes numpy's runtime-CPUID feature dict: on this virtualized
    host /proc/cpuinfo stayed byte-identical across a migration while the
    CPUID-visible feature set (what LLVM actually compiles against) changed
    — observed r4 as cpu_aot_loader feature-mismatch warnings followed by a
    suite segfault under an unchanged hw-* scope. numpy's dispatcher reads
    CPUID directly, so it tracks the truth /proc/cpuinfo missed.
    """
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "flags")
    parts = []
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                k = line.split(":", 1)[0].strip()
                if k in keys:
                    parts.append(line.strip())
                if k == "flags":
                    break  # first core is enough
    except OSError:
        pass
    try:
        from numpy._core._multiarray_umath import __cpu_features__

        parts.append(",".join(
            sorted(k for k, v in __cpu_features__.items() if v)))
    except Exception:
        pass
    if parts:
        import hashlib

        return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:10]
    return "nofp"


def _platform_tag() -> str:
    """Coarse platform tag for the cache scope. CPU-forced processes (the
    test suite) and TPU processes get SEPARATE directories: a CPU suite
    reading its own entries while a concurrent TPU benchmark writes into
    the same directory segfaulted twice in compilation_cache
    .get_executable_and_time (r4) — disjoint trees make cross-platform
    concurrency structurally impossible. Resolved WITHOUT initializing
    backends: only explicit platform forcing is inspected."""
    try:
        import jax

        forced = jax.config.jax_platforms or os.environ.get(
            "JAX_PLATFORMS", "")
    except Exception:
        forced = os.environ.get("JAX_PLATFORMS", "")
    name = (forced or "dev").split(",")[0].strip() or "dev"
    return name


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("BNPC_TPU_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(
        cache_dir, _platform_tag() + "-" + host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache EVERYTHING, including sub-second programs: on the tunneled
        # TPU every compile is a remote-service round-trip (~0.7-1.4 s wall
        # even for a trivial slice program), so the default 1 s floor —
        # which keys on XLA's own compile time, not the round-trip — left
        # the per-live-width trace-slice programs uncached and every fresh
        # process re-paid them (measured: 2+ s of the accuracy bench's
        # per-run overhead).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without the knobs — purely an optimization
