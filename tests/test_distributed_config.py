"""parallel/distributed.py launch-mode selection (the full 2-process
bring-up is exercised for real in test_multihost.py; these cover the
flag/env plumbing without touching jax.distributed)."""
import pytest

import food101_sr_tpu.parallel.distributed as dist


@pytest.fixture(autouse=True)
def _fresh(monkeypatch):
    monkeypatch.setattr(dist, "_INITIALIZED", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)


def test_noop_without_request():
    assert dist.maybe_initialize() is False
    assert dist.is_initialized() is False


def test_explicit_flags_reach_initialize(monkeypatch):
    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    monkeypatch.setattr(dist.jax.distributed, "initialize", fake_init)
    assert dist.maybe_initialize("h0:1234", 2, 1) is True
    assert calls == {"coordinator_address": "h0:1234",
                     "num_processes": 2, "process_id": 1}
    # idempotent: second call is a no-op (initialize not re-invoked)
    calls.clear()
    assert dist.maybe_initialize("other:1", 4, 0) is True
    assert calls == {}


def test_env_fallback(monkeypatch):
    calls = {}
    monkeypatch.setattr(dist.jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "env-host:99")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert dist.maybe_initialize() is True
    assert calls["coordinator_address"] == "env-host:99"
    assert calls["num_processes"] == 4 and calls["process_id"] == 3


def test_auto_mode_bare_initialize(monkeypatch):
    calls = []
    monkeypatch.setattr(dist.jax.distributed, "initialize",
                        lambda *a, **kw: calls.append((a, kw)))
    assert dist.maybe_initialize(mode="auto") is True
    assert calls == [((), {})]  # pod autodetection: no arguments


def test_coordinator_requires_count_and_id():
    with pytest.raises(ValueError):
        dist.maybe_initialize("h0:1", 0, -1)


def test_config_mapping(monkeypatch):
    calls = {}
    monkeypatch.setattr(dist.jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    cfg = {"coordinator": "c:7", "num_processes": 2, "process_id": 0,
           "distributed": ""}
    assert dist.maybe_initialize_from_config(cfg) is True
    assert calls["num_processes"] == 2
