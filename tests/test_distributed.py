"""Multi-host bootstrap: env-driven init, per-host batch slicing, global
batch assembly on a multi-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iadr1_tpu.core import MeshConfig, build_mesh
from iadr1_tpu.core.distributed import (
    host_batch_slice,
    make_global_batch,
    maybe_initialize_distributed,
    topology,
)


def test_no_env_is_noop(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False


def test_env_driven_initialize(monkeypatch):
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None, **kw):
        calls.update(coordinator_address=coordinator_address,
                     num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host0:8476")
    monkeypatch.setenv("NUM_PROCESSES", "16")
    monkeypatch.setenv("PROCESS_ID", "3")
    assert maybe_initialize_distributed() is True
    assert calls == {"coordinator_address": "host0:8476",
                     "num_processes": 16, "process_id": 3}


def test_topology_and_host_slice_single_process():
    topo = topology()
    assert topo.process_count == 1 and topo.is_primary
    assert host_batch_slice(8) == slice(0, 8)


def test_make_global_batch_shards_batch_axis():
    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    batch = {
        "input_ids": np.arange(8 * 16).reshape(8, 16).astype(np.int32),
        "labels": np.ones((8, 16), np.int32),
    }
    out = make_global_batch(batch, mesh)
    assert out["input_ids"].shape == (8, 16)
    # batch dim sharded over dp x fsdp = 4-way
    shard_shapes = {s.data.shape for s in out["input_ids"].addressable_shards}
    assert shard_shapes == {(2, 16)}
    np.testing.assert_array_equal(np.asarray(out["input_ids"]),
                                  batch["input_ids"])


def test_mesh_uses_device_mesh_helper():
    mesh = build_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    assert dict(mesh.shape) == {"dp": 1, "fsdp": 4, "tp": 2}


def test_detect_distributed_mode_table():
    """The bootstrap decision table, covered purely (round-2 weak #6: the
    auto-detect branch previously only ran under a monkeypatched
    initialize)."""
    from iadr1_tpu.core.distributed import detect_distributed_mode as d

    # explicit manual launch
    assert d({"COORDINATOR_ADDRESS": "h0:1234", "NUM_PROCESSES": "2",
              "PROCESS_ID": "1"}) == (
        "explicit",
        {"coordinator_address": "h0:1234", "num_processes": 2,
         "process_id": 1},
    )
    # JAX_-prefixed aliases
    assert d({"JAX_COORDINATOR_ADDRESS": "h0:1", "JAX_NUM_PROCESSES": "4",
              "JAX_PROCESS_ID": "0"})[0] == "explicit"
    # incomplete explicit env does NOT half-initialize
    assert d({"COORDINATOR_ADDRESS": "h0:1234"}) is None
    assert d({"NUM_PROCESSES": "2", "PROCESS_ID": "0"}) is None
    # pod auto-detect needs MULTIPLE workers; a single-entry hostname list
    # (tunneled single-chip setups) must stay single-process
    assert d({"TPU_WORKER_HOSTNAMES": "host-a"}) is None
    assert d({"TPU_WORKER_HOSTNAMES": "host-a,host-b"}) == ("auto", {})
    assert d({"MEGASCALE_COORDINATOR_ADDRESS": "c:1"}) == ("auto", {})
    # explicit beats auto when both are present
    assert d({"TPU_WORKER_HOSTNAMES": "a,b", "COORDINATOR_ADDRESS": "h:1",
              "NUM_PROCESSES": "2", "PROCESS_ID": "0"})[0] == "explicit"
    assert d({}) is None
