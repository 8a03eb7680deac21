"""Minimal numpy-backed stand-in for the `bottleneck` package, used ONLY to
benchmark the reference implementation (which imports bottleneck but the
package is not installed in this image). Covers exactly the functions the
reference calls; placed on PYTHONPATH by benchmarks/measure_reference.py.
"""

import numpy as np

__version__ = "1.3.5"  # pandas parses this; numpy-backed shim, not real bn


def nansum(a, axis=None):
    return np.nansum(a, axis=axis)


def nanmean(a, axis=None):
    return np.nanmean(a, axis=axis)


def nanvar(a, axis=None, ddof=0):
    return np.nanvar(a, axis=axis, ddof=ddof)


def nanargmax(a, axis=None):
    return np.nanargmax(a, axis=axis)


def replace(a, old, new):
    """In-place replacement, mirroring bottleneck.replace semantics."""
    if np.isnan(old):
        a[np.isnan(a)] = new
    else:
        a[a == old] = new
    return a


def move_std(a, window, axis=-1, min_count=None):
    """Rolling std-dev with NaN fill for incomplete leading windows."""
    a = np.asarray(a, dtype=float)
    a = np.moveaxis(a, axis, -1)
    out = np.full(a.shape, np.nan)
    n = a.shape[-1]
    for i in range(window - 1, n):
        out[..., i] = a[..., i - window + 1:i + 1].std(axis=-1)
    return np.moveaxis(out, -1, axis)
