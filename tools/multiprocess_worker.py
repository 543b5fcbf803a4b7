"""Worker for the REAL multi-process bootstrap test (no mocks).

Launched N times by tests/test_multiprocess.py (and usable manually) with
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID set, this executes the
actual code path a v5e pod host runs: maybe_initialize_distributed() ->
real jax.distributed.initialize, a mesh spanning every process's devices,
host_batch_slice + make_global_batch's make_array_from_process_local_data
branch, and one jit SFT step over the global batch.  The torchrun-rank
analogue of the reference's scripts/train/*.sh bootstrap.

Prints one line: ``RESULT <process_id> <loss>``; every process must print
the same loss (the jit program all-reduces over the global batch).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from iadr1_tpu.core import MeshConfig, build_mesh
    from iadr1_tpu.core.distributed import (
        host_batch_slice,
        make_global_batch,
        maybe_initialize_distributed,
        topology,
    )
    from iadr1_tpu.core.mesh import pytree_shardings
    from iadr1_tpu.data.tokenize import IGNORE_INDEX
    from iadr1_tpu.models.registry import make_qwen2_bundle
    from iadr1_tpu.train import OptimizerConfig, make_optimizer, make_sft_step
    from iadr1_tpu.train.state import create_sharded_state

    assert maybe_initialize_distributed(), "multi-process env not detected"
    topo = topology()
    assert topo.process_count == int(os.environ["NUM_PROCESSES"]), topo
    print(f"proc {topo.process_index}/{topo.process_count} "
          f"local={topo.local_device_count} global={topo.global_device_count}",
          flush=True)

    # dp spans processes: per-host batch rows feed disjoint dp shards
    mesh = build_mesh(MeshConfig(dp=topo.global_device_count, fsdp=1, tp=1))

    hf = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=2,
              num_key_value_heads=2, rope_theta=1e4,
              tie_word_embeddings=True, architectures=["Qwen2ForCausalLM"])
    bundle = make_qwen2_bundle(hf, attention="xla")
    params = jax.device_put(
        bundle.init_params(jax.random.PRNGKey(0)),
        pytree_shardings(bundle.logical_axes(), mesh))
    optimizer, schedule = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0))
    state = create_sharded_state(params, optimizer)
    step = make_sft_step(bundle.forward, optimizer, schedule)

    # deterministic global batch; each host materializes ONLY its slice
    G, T = 8, 32
    rng = np.random.default_rng(42)
    ids = rng.integers(1, 128, (G, T))
    labels = np.where(np.arange(T) < T // 2, IGNORE_INDEX, ids)
    sl = host_batch_slice(G)
    local = {
        "input_ids": ids[sl].astype(np.int32),
        "labels": labels[sl].astype(np.int32),
        "segment_ids": np.ones((sl.stop - sl.start, T), np.int32),
        "position_ids": np.broadcast_to(
            np.arange(T), (sl.stop - sl.start, T)).astype(np.int32).copy(),
    }
    batch = make_global_batch(local, mesh)
    assert batch["input_ids"].shape == (G, T), batch["input_ids"].shape

    losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        losses.append(float(jnp.mean(metrics["loss"])))
    assert all(np.isfinite(losses)), losses
    print(f"RESULT {topo.process_index} {losses[-1]:.8f}", flush=True)


if __name__ == "__main__":
    main()
