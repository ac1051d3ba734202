"""Perceiver-style building blocks of the ConsistentID adapter.

Re-designs (TPU/flax) of the reference modules:
  PerceiverAttention        reference functions.py:407-452
  FeedForward               reference functions.py:390-397
  FacePerceiverResampler    reference functions.py:454-488

Parity notes (validated against the reference torch modules in
tests/test_adapter_parity.py):
  - torch nn.LayerNorm eps = 1e-5 (flax default is 1e-6 → set explicitly)
  - torch nn.GELU is the exact erf form (jax default is tanh-approx → off)
  - PerceiverAttention uses the double-sqrt scaling trick: q and k are each
    scaled by dim_head**-0.25 before the logit matmul, and the softmax is
    computed in fp32 (reference functions.py:445-447).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(x)
        return x


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        """latents attend to concat(x, latents); shapes (B, n1, D), (B, n2, D)."""
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                               name="norm2")(latents)
        b, n2, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = 1.0 / (self.dim_head ** 0.25)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n2, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class FacePerceiverResampler(nn.Module):
    """Depth-`depth` perceiver stack refining ID tokens against CLIP features."""

    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = PerceiverAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                dtype=self.dtype, name=f"layers_{i}_attn")(x, latents) + latents
            latents = FeedForward(
                dim=self.dim, mult=self.ff_mult, dtype=self.dtype,
                name=f"layers_{i}_ff")(latents) + latents
        latents = nn.Dense(self.output_dim, dtype=self.dtype,
                           name="proj_out")(latents)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="norm_out")(latents)
