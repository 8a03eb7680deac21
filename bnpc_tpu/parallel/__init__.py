"""Device-mesh parallelism: chain data-parallelism + mutation-axis sharding."""

from bnpc_tpu.parallel.axis import MutAxis

__all__ = ["MutAxis"]
