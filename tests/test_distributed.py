"""parallel/distributed.py: pod init + mesh construction, exercised with
monkeypatched jax.distributed (no real pod in CI — the SPMD programs
themselves are covered by tests/test_sharding.py on the virtual mesh)."""

import numpy as np
import pytest

import jax

from bliss_tpu.parallel import distributed as dist


def test_init_distributed_passes_arguments(monkeypatch):
    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    dist.init_distributed("10.0.0.1:1234", 4, 2)
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_init_distributed_survives_single_process(monkeypatch):
    def fake_initialize(**kw):
        raise RuntimeError("jax.distributed.initialize cannot be called on single-process")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    dist.init_distributed()  # must not raise


def test_init_distributed_noop_when_already_initialized(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    dist.init_distributed()
    assert called == []


def test_pod_mesh_spans_all_devices():
    mesh = dist.pod_mesh(n_seq=2)
    assert mesh.axis_names == ("data", "seq")
    assert mesh.devices.size == jax.device_count()
    assert mesh.shape["seq"] == 2
    assert mesh.shape["data"] == jax.device_count() // 2


def test_pod_mesh_runs_a_collective():
    """The pod mesh must be usable by the same shard_map programs the
    single-host path uses."""
    from jax.sharding import PartitionSpec as P

    try:  # jax >= 0.8 exports shard_map at the top level
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    mesh = dist.pod_mesh()
    n = mesh.devices.size

    def f(x):
        return jax.lax.psum(x, "data")

    mapped = shard_map(
        f, mesh=mesh, in_specs=P("data"), out_specs=P()
    )
    out = np.asarray(mapped(np.ones(n, np.float32)))
    assert out.item() == n
