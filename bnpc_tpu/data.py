"""Device-side packed representation of the mutation matrix.

The reference carries the data as an ``n x m`` float matrix with NaN for
missing entries and relies on bottleneck's NaN-aware reductions
(libs/dpmmIO.py:91, libs/CRP.py:197-204). NaNs are hostile to TPU compute, so
the data is packed once into explicit value/mask planes plus the two
masked indicator matrices that turn every likelihood evaluation into a matmul:

  xm[i, j]  = mask * x          (observed mutation present)
  xm0[i, j] = mask * (1 - x)    (observed mutation absent)

With per-cluster log-probability tables c1/c0 (see bnpc_tpu.ops.likelihood),
the full cells x clusters log-likelihood is ``xm @ c1.T + xm0 @ c0.T``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PackedData(NamedTuple):
    """Immutable device arrays derived from the input matrix."""

    xm: jnp.ndarray    # [n, m] f32: 1 where x==1 and observed
    xm0: jnp.ndarray   # [n, m] f32: 1 where x==0 and observed
    rs1: jnp.ndarray   # [n] f32: per-cell count of observed 1s
    rs0: jnp.ndarray   # [n] f32: per-cell count of observed 0s

    @property
    def n_cells(self) -> int:
        return self.xm.shape[0]

    @property
    def n_muts(self) -> int:
        return self.xm.shape[1]

    @property
    def mask(self) -> jnp.ndarray:
        return self.xm + self.xm0

    @property
    def x(self) -> jnp.ndarray:
        """Data with missing entries as 0 (use .mask to distinguish)."""
        return self.xm


def pack_data(data: np.ndarray, dtype=jnp.float32) -> PackedData:
    """Pack an n x m matrix of {0, 1, NaN} into device planes.

    Args:
      data: numpy array as produced by bnpc_tpu.io.load_data (cells x
        mutations, NaN = missing).
    """
    data = np.asarray(data, dtype=np.float64)
    mask = np.isfinite(data)
    x = np.where(mask, data, 0.0)
    xm = (x * mask).astype(np.float32)
    xm0 = ((1.0 - x) * mask).astype(np.float32)
    return PackedData(
        xm=jnp.asarray(xm, dtype=dtype),
        xm0=jnp.asarray(xm0, dtype=dtype),
        rs1=jnp.asarray(xm.sum(axis=1), dtype=dtype),
        rs0=jnp.asarray(xm0.sum(axis=1), dtype=dtype),
    )
