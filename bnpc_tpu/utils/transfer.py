"""Chunked device->host fetches for tunneled TPUs.

The hosted axon relay's device-to-host path collapses on large single
transfers: measured 37 MB/s at 8 MB but 0.2 MB/s at 41 MB (a ~200 s fetch
for one [5000, 5000] f32 co-clustering matrix). Fetching the same bytes as
a sequence of ~6 MB chunks with async prefetch stays on the fast path.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 6 << 20


def to_host(x, max_bytes: int = _MAX_BYTES):
    """np.asarray(x), but large device arrays are fetched in chunks.

    Chunks are taken over a flattened view (device reshape of a contiguous
    array is layout-only), so any shape benefits — including arrays whose
    leading axis is 1. Host-side the chunks are concatenated and reshaped
    back. No-op for numpy inputs and small arrays.
    """
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    if nbytes <= max_bytes or x.ndim == 0:
        return np.asarray(x)
    flat = x.reshape(-1)
    elems = max(1, int(max_bytes // x.dtype.itemsize))
    chunks = [flat[i:i + elems] for i in range(0, flat.shape[0], elems)]
    for c in chunks:
        if hasattr(c, "copy_to_host_async"):
            c.copy_to_host_async()
    out = np.concatenate([np.asarray(c) for c in chunks])
    return out.reshape(x.shape)


def tree_to_host(tree, max_bytes: int = _MAX_BYTES):
    """to_host over every leaf of a pytree."""
    import jax

    return jax.tree.map(lambda x: to_host(x, max_bytes), tree)


class _Chunked:
    """A device array whose D2H copy is in flight as flat chunks."""

    __slots__ = ("shape", "dtype", "chunks")

    def __init__(self, shape, dtype, chunks):
        self.shape = shape
        self.dtype = dtype
        self.chunks = chunks

    def materialize(self) -> np.ndarray:
        return np.concatenate(
            [np.asarray(c) for c in self.chunks]
        ).reshape(self.shape)

    def __array__(self, dtype=None, copy=None):
        # Safety net: an accidental np.asarray on an in-flight handle (e.g.
        # reading _TraceBuffer.rows[-1] directly) materializes correctly
        # instead of exploding.
        out = self.materialize()
        return out.astype(dtype) if dtype is not None else out


def start_fetch(tree, max_bytes: int = _MAX_BYTES):
    """Begin async D2H copies for every leaf of a pytree and return the
    tree with large leaves replaced by in-flight _Chunked handles.

    Large leaves are pre-sliced into flat chunks BEFORE the copy starts —
    calling copy_to_host_async on a large buffer directly would itself take
    the relay's pathological large-transfer path and hog it for seconds.
    Small leaves stay as-is (with their copy started). finish_fetch()
    materializes everything to numpy.
    """
    import jax

    def pre(x):
        if isinstance(x, np.ndarray) or not hasattr(x, "copy_to_host_async"):
            return x
        nbytes = x.size * x.dtype.itemsize
        if nbytes <= max_bytes:
            x.copy_to_host_async()
            return x
        flat = x.reshape(-1)
        elems = max(1, int(max_bytes // x.dtype.itemsize))
        chunks = [flat[i:i + elems] for i in range(0, flat.shape[0], elems)]
        for c in chunks:
            c.copy_to_host_async()
        return _Chunked(x.shape, x.dtype, chunks)

    return jax.tree.map(pre, tree)


def finish_fetch(tree):
    """Materialize a start_fetch() tree (or any pytree) to host numpy."""
    import jax

    return jax.tree.map(
        lambda x: x.materialize() if isinstance(x, _Chunked)
        else np.asarray(x),
        tree,
    )
