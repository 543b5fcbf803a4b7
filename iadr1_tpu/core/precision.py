"""Mixed-precision policy.

Matches the reference recipe's envelope (bf16 training via --bf16 flags in
scripts/train/*.sh, fp32 master behavior from DeepSpeed) the TPU way:
bfloat16 weights-in-compute and activations feeding the MXU, float32
parameters and optimizer state, float32 softmax/logits where it matters.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32       # stored parameters
    compute_dtype: jnp.dtype = jnp.bfloat16    # matmul inputs
    accum_dtype: jnp.dtype = jnp.float32       # MXU preferred_element_type
    logits_dtype: jnp.dtype = jnp.float32      # final logits / softmax

    def cast_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_PRECISION = Precision()
FULL_PRECISION = Precision(compute_dtype=jnp.float32)
