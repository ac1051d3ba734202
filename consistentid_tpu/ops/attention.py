"""Attention dispatch: Pallas flash kernel on TPU, XLA einsum reference path
elsewhere (and whenever softmax probabilities must be materialized for the
facial localization loss — flash attention never forms them).

The reference's equivalents: xformers / F.scaled_dot_product_attention for the
fast path (attention.py:152-158,259) and diffusers' get_attention_scores
monkey-patch for prob capture (functions.py:263-299). Here prob capture is a
functional flag: `dot_product_attention(..., return_probs=True)`.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

# benchmarking escape hatch: CONSISTENTID_DISABLE_FLASH=1 forces XLA attention
_FLASH_DISABLED = os.environ.get("CONSISTENTID_DISABLE_FLASH", "0") == "1"

# below this many query*key elements per head the XLA path wins (kernel launch
# and padding overheads dominate); tuned on v5e — see bench_kernels.py
_FLASH_MIN_ELEMS = 1024 * 1024

# A/B tuning knob for the flash q-block (rows per program). 256 measured
# best on v5e at SD1.5 shapes (512 A/B'd via profile_components: no gain)
_FLASH_BLOCK_Q = int(os.environ.get("CONSISTENTID_FLASH_BLOCK_Q", "256"))


def reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    sm_scale: Optional[float] = None,
    return_probs: bool = False,
):
    """Plain XLA attention, (B, H, S, D). fp32 softmax, output in q.dtype."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    if return_probs:
        return o, p
    return o


def dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    sm_scale: Optional[float] = None,
    return_probs: bool = False,
    use_flash: Optional[bool] = None,
):
    """Attention over (B, H, S, D) tensors.

    use_flash=None auto-selects: Pallas flash kernel on TPU backends for large
    attention maps, XLA otherwise. return_probs forces the XLA path (the
    localization loss needs the full softmax, reference functions.py:205-261).
    """
    if return_probs:
        return reference_attention(q, k, v, sm_scale, return_probs=True)
    if use_flash is None:
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        big = q.shape[2] * k.shape[2] >= _FLASH_MIN_ELEMS
        use_flash = on_tpu and big and not _FLASH_DISABLED
    if use_flash:
        return flash_attention(q, k, v, sm_scale, block_q=_FLASH_BLOCK_Q)
    return reference_attention(q, k, v, sm_scale)


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    """(B, S, H*D) -> (B, H, S, D)."""
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, S, D) -> (B, S, H*D)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
