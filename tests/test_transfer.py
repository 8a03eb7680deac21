"""Chunked device->host transfer helpers (bnpc_tpu/utils/transfer.py).

The chunked paths must be value-identical to a plain np.asarray for any
shape/dtype, including shapes whose leading axis is 1 (the chain axis) and
non-divisible chunk boundaries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bnpc_tpu.utils import transfer


@pytest.mark.parametrize("shape,dtype", [
    ((1000,), np.float32),
    ((1, 64, 128, 200), np.float32),      # chain-axis-1 trace leaf
    ((333, 7), np.int32),
    ((5, 5), np.float32),                 # small: whole-array path
])
def test_to_host_matches_asarray(shape, dtype):
    rng = np.random.default_rng(0)
    host = (rng.random(shape) * 100).astype(dtype)
    dev = jnp.asarray(host)
    # Force the chunked path with a tiny budget (except the "small" case).
    out = transfer.to_host(dev, max_bytes=4096)
    np.testing.assert_array_equal(out, host)
    assert out.dtype == host.dtype and out.shape == host.shape


def test_to_host_numpy_passthrough():
    x = np.arange(10)
    assert transfer.to_host(x) is not None
    np.testing.assert_array_equal(transfer.to_host(x), x)


def test_start_finish_fetch_tree():
    rng = np.random.default_rng(1)
    tree = {
        "big": jnp.asarray(rng.random((1, 300, 40)).astype(np.float32)),
        "small": jnp.asarray(np.arange(6, dtype=np.int32)),
        "host": np.ones((3,)),
    }
    pending = transfer.start_fetch(tree, max_bytes=4096)
    # Large leaves become in-flight handles that still expose their shape.
    assert isinstance(pending["big"], transfer._Chunked)
    assert pending["big"].shape == (1, 300, 40)
    out = transfer.finish_fetch(pending)
    np.testing.assert_array_equal(out["big"], np.asarray(tree["big"]))
    np.testing.assert_array_equal(out["small"], np.asarray(tree["small"]))
    np.testing.assert_array_equal(out["host"], tree["host"])
    assert all(isinstance(v, np.ndarray) for v in out.values())


def test_finish_fetch_idempotent_on_host_tree():
    tree = {"a": np.ones((4, 4)), "b": np.arange(3)}
    out = transfer.finish_fetch(tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
