"""Train state: parameters + optimizer state + step, as one pytree.

The fsdp mesh axis shards both (the ZeRO-3 analogue of the reference's
DeepSpeed config, scripts/train/zero3.json): optimizer moments are created
under jit from already-sharded parameters, so XLA's sharding propagation
partitions them identically -- partitioned optimizer + partitioned params
with no partitioning code.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any

    def apply_gradients(self, grads, optimizer) -> "TrainState":
        updates, new_opt_state = optimizer.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(self.step + 1, new_params, new_opt_state)


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def create_sharded_state(params, optimizer) -> TrainState:
    """Build the state under jit so optimizer moments inherit the parameter
    shardings via propagation."""
    return jax.jit(lambda p: create_train_state(p, optimizer))(params)
