"""multihost.initialize: env parsing + single-host no-op path, exercised
with fake environments (the image is single-host, so jax.distributed is
monkeypatched rather than actually started)."""

import jax
import pytest

from bnpc_tpu.parallel import multihost


def test_single_host_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)

    def explode(**kwargs):
        raise AssertionError("jax.distributed.initialize must not be called")

    monkeypatch.setattr(jax.distributed, "initialize", explode)
    assert multihost.initialize() is False


def test_env_parsing(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")

    seen = {}

    def fake_init(*, coordinator_address, num_processes, process_id):
        seen.update(coordinator_address=coordinator_address,
                    num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax, "process_count", lambda: 4)

    assert multihost.initialize() is True
    assert seen == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}


def test_explicit_args_beat_env(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "ignored:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    seen = {}

    def fake_init(**kwargs):
        seen.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    assert multihost.initialize("host:9", num_processes=2, process_id=1)
    assert seen["coordinator_address"] == "host:9"
    assert seen["num_processes"] == 2
    assert seen["process_id"] == 1
