"""Dtype policy for TPU execution.

TPU MXU natively consumes bfloat16; fp32 accumulation is free via
preferred_element_type. Policy: params may be stored fp32 (training masters)
or bf16 (inference); activations/compute bf16; softmax, norms and losses in
fp32. This replaces the reference's fp16 autocast setup (infer.py:19,
train_SDXL.py:175-185) with the TPU-idiomatic bf16 story.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype for numerically sensitive reductions (softmax, norm stats, losses)
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)


INFERENCE = DTypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
TRAINING = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
FP32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def cast_floating(tree, dtype):
    """Cast all floating-point leaves of a pytree to `dtype`."""
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
