"""Core mesh/sharding/config tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from iadr1_tpu.core import MeshConfig, build_mesh, named_sharding, shard_pytree
from iadr1_tpu.core.config import (
    apply_overrides,
    dataclass_from_dict,
    load_config,
)


def test_eight_devices():
    assert jax.device_count() == 8


def test_mesh_resolve():
    assert MeshConfig(dp=2, fsdp=-1, tp=2).resolve(8) == (2, 2, 2)
    assert MeshConfig(dp=1, fsdp=-1, tp=1).resolve(8) == (1, 8, 1)
    with pytest.raises(ValueError):
        MeshConfig(dp=3, fsdp=-1, tp=1).resolve(8)
    with pytest.raises(ValueError):
        MeshConfig(dp=-1, fsdp=-1, tp=1).resolve(8)


def test_build_mesh_and_shard():
    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    assert mesh.shape == {"dp": 2, "fsdp": 2, "tp": 2}

    sharding = named_sharding(mesh, ("embed", "mlp"))
    assert sharding.spec == P("fsdp", "tp")

    x = jnp.zeros((16, 32))
    tree = {"w": x}
    logical = {"w": ("embed", "mlp")}
    sharded = shard_pytree(tree, logical, mesh)
    # each device holds a (16/2, 32/2) shard
    shard_shape = sharded["w"].sharding.shard_shape(x.shape)
    assert shard_shape == (8, 16)


def test_sharded_matmul_runs():
    mesh = build_mesh(MeshConfig(dp=1, fsdp=4, tp=2))
    x = jnp.ones((8, 16))
    w = jnp.ones((16, 32))
    xs = jax.device_put(x, named_sharding(mesh, ("fsdp_batch", None)))
    ws = jax.device_put(w, named_sharding(mesh, ("embed", "mlp")))
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.full((8, 32), 16.0))


@dataclasses.dataclass
class _Inner:
    lr: float = 1e-4
    steps: int = 10


@dataclasses.dataclass
class _Cfg:
    name: str = "x"
    inner: _Inner = dataclasses.field(default_factory=_Inner)
    tags: list[str] = dataclasses.field(default_factory=list)


def test_dataclass_from_dict():
    cfg = dataclass_from_dict(
        _Cfg, {"name": "run1", "inner": {"lr": "3e-4", "steps": 5}, "tags": ["a"]}
    )
    assert cfg.inner.lr == pytest.approx(3e-4)
    assert cfg.inner.steps == 5
    with pytest.raises(KeyError):
        dataclass_from_dict(_Cfg, {"bogus": 1})


def test_overrides(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"name": "base", "inner": {"lr": 0.1}}')
    cfg = load_config(_Cfg, p, overrides=["inner.steps=42", "name=over"])
    assert cfg.name == "over"
    assert cfg.inner.steps == 42
    assert cfg.inner.lr == pytest.approx(0.1)


def test_prefetch_iterator():
    """Order-preserving background prefetch; exceptions propagate; finite
    streams terminate (train/loop.py prefetch_iterator)."""
    import time as _time

    from iadr1_tpu.train.loop import prefetch_iterator

    assert list(prefetch_iterator(iter(range(10)), depth=3)) == list(range(10))
    assert list(prefetch_iterator(iter([]), depth=2)) == []

    def boom():
        yield 1
        raise RuntimeError("collate failed")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="collate failed"):
        next(it)

    # the producer genuinely runs ahead of the consumer
    times = []

    def slow_producer():
        for i in range(4):
            times.append(("produced", i, _time.perf_counter()))
            yield i

    out = []
    for x in prefetch_iterator(slow_producer(), depth=4):
        _time.sleep(0.05)   # slow consumer
        out.append((x, _time.perf_counter()))
    assert [x for x, _ in out] == [0, 1, 2, 3]
    # everything was produced before the consumer finished item 1
    assert times[-1][2] < out[1][1]


def test_batch_shardings_and_shard_batch():
    """shard_batch: token arrays split their batch dim over (dp, fsdp) when
    divisible, M-RoPE [3, B, T] positions split on axis 1, vision aux
    arrays replicate, and non-divisible batches fall back to replication."""
    from iadr1_tpu.core.mesh import batch_shardings, shard_batch

    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    batch = {
        "input_ids": jnp.zeros((4, 16), jnp.int32),
        "position_ids": jnp.zeros((3, 4, 16), jnp.int32),
        "rot_cos": jnp.zeros((64, 32), jnp.float32),
        "scatter_rows": jnp.zeros((8,), jnp.int32),
        "advantages": jnp.zeros((2,), jnp.float32),  # 2 % 4 != 0
    }
    shardings = batch_shardings(mesh, batch)
    assert shardings["input_ids"].spec == P(("dp", "fsdp"))
    assert shardings["position_ids"].spec == P(None, ("dp", "fsdp"))
    assert shardings["rot_cos"].spec == P()
    assert shardings["scatter_rows"].spec == P()
    assert shardings["advantages"].spec == P()  # non-divisible fallback

    out = shard_batch(mesh, batch)
    assert out["input_ids"].sharding.spec == P(("dp", "fsdp"))
    assert out["rot_cos"].sharding.spec == P()


def test_constrain_helpers_respect_mesh_and_env(monkeypatch):
    """constrain_replicated / constrain_batch_aux / constrain_scan_chunks:
    no-ops without an armed kernel mesh or with
    IADR1_DISABLE_AUX_CONSTRAINTS set; under jit with a mesh they pin the
    documented specs."""
    from iadr1_tpu.core.mesh import (
        constrain_batch_aux,
        constrain_replicated,
        constrain_scan_chunks,
        kernel_mesh_scope,
    )

    x = jnp.ones((4, 8, 16), jnp.float32)
    with kernel_mesh_scope(None):
        assert constrain_replicated(x) is x
        assert constrain_batch_aux(x) is x
        assert constrain_scan_chunks(x) is x

    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    monkeypatch.setenv("IADR1_DISABLE_AUX_CONSTRAINTS", "1")
    assert constrain_replicated(x) is x
    monkeypatch.delenv("IADR1_DISABLE_AUX_CONSTRAINTS")

    @jax.jit
    def f(x):
        return (constrain_replicated(x), constrain_batch_aux(x),
                constrain_scan_chunks(x))

    rep, ba, sc = f(x)
    assert rep.sharding.spec == P()
    assert ba.sharding.spec == P(("dp", "fsdp"))  # trailing Nones normalized
    assert sc.sharding.spec == P(None, ("dp", "fsdp"))
