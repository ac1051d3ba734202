"""TPU-shaped GroupNorm (+ fused SiLU).

A device trace of the SD1.5 inference graph (profile_infer.py) showed
GroupNorm statistics — XLA's convert_reduce fusions — eating 24% of device
time (~16 ms of a 62 ms denoise step): flax's nn.GroupNorm reshapes to
(..., G, C//G) and reduces over (H, W, C//G) in one pass, a lane-strided
reduction the TPU does badly (C//G = 10 lanes per group at C=320, G=32).

Here the reduction is restructured into TPU-friendly stages:
  1. per-CHANNEL sum / sum-of-squares over H*W — a sublane reduction with
     the channel lane dim intact (fast);
  2. a tiny (B, G, C//G) -> (B, G) combine;
  3. one fused elementwise normalize+affine (+ optional SiLU) pass.
Same math as flax nn.GroupNorm (E[x^2] - E[x]^2 variance, fp32 stats),
parity-tested in tests/test_models.py.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def group_norm_act(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   groups: int, eps: float,
                   act: Optional[str] = None) -> jax.Array:
    """NHWC (or (B, L, C)) group norm with per-channel affine; act in
    {None, "silu"} is fused into the normalize pass."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, c)
    n_spatial = xf.shape[1]
    cg = c // groups
    n = n_spatial * cg

    s1 = jnp.sum(xf, axis=1)                       # (B, C) sublane reduce
    s2 = jnp.sum(jnp.square(xf), axis=1)           # (B, C)
    mean = s1.reshape(b, groups, cg).sum(-1) / n   # (B, G)
    ex2 = s2.reshape(b, groups, cg).sum(-1) / n
    rstd = jax.lax.rsqrt(ex2 - jnp.square(mean) + eps)

    # fold group stats into the per-channel affine: y = x * w + b
    mean_c = jnp.repeat(mean, cg, axis=-1)         # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    w = rstd_c * scale.astype(jnp.float32)[None]
    off = bias.astype(jnp.float32)[None] - mean_c * w
    y = xf * w[:, None, :] + off[:, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.reshape(orig_shape).astype(x.dtype)


class GroupNorm(nn.Module):
    """Drop-in replacement for flax nn.GroupNorm(num_groups, epsilon,
    dtype) with identical param layout ('scale'/'bias', fp32 init) and an
    optional fused activation."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_act(x, scale, bias, self.num_groups, self.epsilon,
                              act=self.act)
