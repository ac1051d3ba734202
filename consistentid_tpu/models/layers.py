"""Shared layers for the diffusion backbones (NHWC, TPU-first).

Covers the layer vocabulary of the SD1.5/SDXL UNet and VAE the reference
drives through diffusers (reference pipline_StableDiffusion_ConsistentID.py
loads them at :41-57; adapters hook their attention at :152-174). Everything
here is written against the published Stable Diffusion architecture, laid out
NHWC so convolutions map directly onto TPU's preferred layout.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, merge_heads, split_heads
from ..ops.quant import (int8_conv_quantized, int8_matmul_quantized,
                         quantize_symmetric, quantize_with_scale)

GN_EPS = 1e-5          # resnet / conv-out group norms
GN_EPS_TRANSFORMER = 1e-6  # transformer input group norm
LN_EPS = 1e-5


class Int8Conv(nn.Module):
    """W8A8 conv for the quantized serving path (ops/quant.py): int8
    per-out-channel kernel + fp32 scale params (produced from the folded
    float kernels by quantize_params_like), int32 MXU accumulation. Param
    names kernel_q/kernel_scale/bias.

    Activation quant is dynamic per-example by default; `static_act=True`
    reads a calibrated per-tensor `act_scale` param instead — no amax
    reduction before the conv, the bandwidth-bound prologue that made
    dynamic int8 a net loss at SDXL 1024px (ROUND_NOTES r4). Dynamic
    applies sow the observed per-tensor amax into the "calib" collection
    (a no-op unless the caller passes mutable=["calib"]) so calibration
    runs through the exact serving graph."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    static_act: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (kh, kw, x.shape[-1], self.features), jnp.int8)
        ws = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        pad = [(self.padding, self.padding)] * 2
        if self.static_act:
            s = self.param("act_scale", nn.initializers.ones, (),
                           jnp.float32)
            y = int8_conv_quantized(quantize_with_scale(x, s), s, wq, ws,
                                    self.strides, pad)
        else:
            xq, xscale = quantize_symmetric(x, axis=(1, 2, 3), keepdims=True)
            self.sow("calib", "act_amax", jnp.max(xscale) * 127.0)
            y = int8_conv_quantized(xq, xscale, wq, ws, self.strides, pad)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class Int8Dense(nn.Module):
    """W8A8 dense: int8 (I, O) kernel + per-out-channel scale, dynamic
    per-token (or calibrated static per-tensor, see Int8Conv) activation
    quant. Drop-in for nn.Dense on the quant path."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    static_act: bool = False

    @nn.compact
    def __call__(self, x):
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (x.shape[-1], self.features), jnp.int8)
        ws = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        if self.static_act:
            s = self.param("act_scale", nn.initializers.ones, (),
                           jnp.float32)
            y = int8_matmul_quantized(quantize_with_scale(x, s), s, wq, ws)
        else:
            xq, xscale = quantize_symmetric(x, axis=(x.ndim - 1,),
                                            keepdims=True)
            self.sow("calib", "act_amax", jnp.max(xscale) * 127.0)
            y = int8_matmul_quantized(xq, xscale, wq, ws)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def conv2d(features, kernel_size, *, strides=(1, 1), padding=1,
           use_bias=True, dtype=jnp.float32, name=None, quant=False):
    """nn.Conv or its W8A8 twin, padding given as a symmetric int.

    `quant`: False = float; True = int8 with dynamic activation quant;
    "static" = int8 with calibrated per-tensor act_scale params."""
    if quant:
        return Int8Conv(features, kernel_size, strides=strides,
                        padding=padding, use_bias=use_bias, dtype=dtype,
                        static_act=(quant == "static"), name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   use_bias=use_bias, dtype=dtype, name=name)


def dense(features, *, use_bias=True, dtype=jnp.float32, name=None,
          quant=False):
    if quant:
        return Int8Dense(features, use_bias=use_bias, dtype=dtype,
                         static_act=(quant == "static"), name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def timestep_embedding(timesteps: jax.Array, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep features, (B,) -> (B, dim). fp32 throughout."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting sinusoidal features to the time-embed dim."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


def group_norm_silu(x, groups: int, dtype, name: str, fused: bool,
                    eps: float = GN_EPS):
    """GroupNorm + SiLU; `fused=True` swaps in the TPU-restructured op
    (ops/group_norm.py: per-channel sublane stats + one normalize+SiLU
    pass) with the identical 'scale'/'bias' param layout — an A/B switch
    for the training graph's bandwidth-bound norm share, off by default
    (the inference-scan A/B at 558410e measured it 2.5% slower there)."""
    if fused:
        from ..ops.group_norm import GroupNorm as FusedGroupNorm
        return FusedGroupNorm(num_groups=groups, epsilon=eps, dtype=dtype,
                              act="silu", name=name)(x)
    h = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype,
                     name=name)(x)
    return nn.silu(h)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    use_time_emb: bool = True
    quant: Any = False    # W8A8 convs (time_emb_proj / norms stay float)
    fused_gn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jax.Array] = None):
        in_channels = x.shape[-1]
        h = group_norm_silu(x, self.groups, self.dtype, "norm1",
                            self.fused_gn)
        h = conv2d(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                   name="conv1", quant=self.quant)(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = group_norm_silu(h, self.groups, self.dtype, "norm2",
                            self.fused_gn)
        h = conv2d(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                   name="conv2", quant=self.quant)(h)
        if in_channels != self.out_channels:
            x = conv2d(self.out_channels, (1, 1), padding=0, dtype=self.dtype,
                       name="conv_shortcut", quant=self.quant)(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    quant: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv2d(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                      dtype=self.dtype, name="conv", quant=self.quant)(x)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """2x nearest-neighbor upsample as broadcast+reshape — identical output
    to jax.image.resize(..., method="nearest") at integer scale 2 (torch
    F.interpolate semantics: out[2i] = out[2i+1] = in[i]) but pure layout
    ops; resize lowers to gathers, which are slow on TPU at the VAE
    decoder's (B, 512, 512, C) sizes."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    out_channels: int
    quant: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample2x_nearest(x)
        return conv2d(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                      name="conv", quant=self.quant)(x)


class LoRADelta(nn.Module):
    """Rank-decomposed delta, diffusers LoRALinearLayer semantics: zero-init
    up-projection, N(0, 1/rank) down-projection, applied additively with an
    external scale (reference attention.py:105-108,138)."""

    out_features: int
    rank: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        down = nn.Dense(
            self.rank, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=1.0 / self.rank),
            name="down")(x)
        return nn.Dense(self.out_features, use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="up")(down)


class Attention(nn.Module):
    """UNet attention with optional LoRA (all four projections) and the
    decoupled IP-adapter branch on the last `ip_num_tokens` context tokens
    (reference attention.py:90-294 re-expressed functionally).

    When `capture_probs=True` the fp32 base-attention softmax is sown into the
    'intermediates' collection under 'attn_probs' — the functional replacement
    for the reference's get_attention_scores monkey-patch
    (reference functions.py:263-299). With `capture_idx` (B, N) int32 also
    given, only those N context columns are gathered and sown (the
    localization loss reads nothing else, reference train.py:80-88 /
    functions.py:205-244) — the sown tensor and its backward cotangent
    shrink K/N ≈ 16x, removing the training step's largest HBM-bandwidth
    consumer (r3 roofline). Mathematically exact: the loss normalizes
    after gathering, so gather-then-sow == sow-then-gather.
    """

    query_dim: int
    heads: int
    context_dim: Optional[int] = None   # None = self-attention
    lora_rank: int = 0
    ip_num_tokens: int = 0              # only meaningful for cross-attn
    # W8A8 q/k/v/out projections; the decoupled-IP branch and LoRA deltas
    # stay float (quant is the post-fold inference path, lora_rank==0 there)
    quant: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, lora_scale: float = 1.0,
                 ip_scale: float = 1.0, capture_probs: bool = False,
                 capture_idx=None):
        inner = self.query_dim
        is_cross = context is not None
        ctx = context if is_cross else x
        ip_ctx = None
        if is_cross and self.ip_num_tokens > 0:
            end = ctx.shape[1] - self.ip_num_tokens
            ctx, ip_ctx = ctx[:, :end, :], ctx[:, end:, :]

        def proj(name, inp, features):
            y = dense(features, use_bias=False, dtype=self.dtype,
                      name=name, quant=self.quant)(inp)
            if self.lora_rank > 0:
                y = y + lora_scale * LoRADelta(
                    features, self.lora_rank, dtype=self.dtype,
                    name=f"{name}_lora")(inp)
            return y

        q = proj("to_q", x, inner)
        k = proj("to_k", ctx, inner)
        v = proj("to_v", ctx, inner)

        qh, kh, vh = (split_heads(t, self.heads) for t in (q, k, v))
        if capture_probs:
            out, probs = dot_product_attention(qh, kh, vh, return_probs=True)
            if capture_idx is not None:
                b, h, sq, _ = probs.shape
                n = capture_idx.shape[-1]
                idx = jnp.broadcast_to(
                    capture_idx[:, None, None, :], (b, h, sq, n))
                probs = jnp.take_along_axis(probs, idx, axis=3)
            self.sow("intermediates", "attn_probs", probs)
        else:
            out = dot_product_attention(qh, kh, vh)
        out = merge_heads(out)

        if ip_ctx is not None:
            ip_k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip_ctx)
            ip_v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip_ctx)
            ip_out = dot_product_attention(
                split_heads(q, self.heads), split_heads(ip_k, self.heads),
                split_heads(ip_v, self.heads), use_flash=False)
            out = out + ip_scale * merge_heads(ip_out)

        y = dense(inner, dtype=self.dtype, name="to_out",
                  quant=self.quant)(out)
        if self.lora_rank > 0:
            y = y + lora_scale * LoRADelta(
                inner, self.lora_rank, dtype=self.dtype,
                name="to_out_lora")(out)
        return y


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    quant: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = dense(inner * 2, dtype=self.dtype, name="proj",
                     quant=self.quant)(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return dense(self.dim, dtype=self.dtype, name="out",
                     quant=self.quant)(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    lora_rank: int = 0
    ip_num_tokens: int = 0
    quant: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, lora_scale=1.0, ip_scale=1.0,
                 capture_probs=False, capture_idx=None):
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, lora_rank=self.lora_rank,
                          quant=self.quant, dtype=self.dtype, name="attn1")(
            h, lora_scale=lora_scale)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(self.dim, self.heads, context_dim=self.context_dim,
                          lora_rank=self.lora_rank,
                          ip_num_tokens=self.ip_num_tokens,
                          quant=self.quant, dtype=self.dtype, name="attn2")(
            h, context, lora_scale=lora_scale, ip_scale=ip_scale,
            capture_probs=capture_probs, capture_idx=capture_idx)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(x)
        return x + GEGLUFeedForward(self.dim, quant=self.quant,
                                    dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer wrapping `depth` BasicTransformerBlocks.

    use_linear_projection: False = 1x1 conv in/out (SD1.5),
    True = linear in/out on flattened tokens (SDXL).
    """

    heads: int
    context_dim: int
    depth: int = 1
    use_linear_projection: bool = False
    groups: int = 32
    lora_rank: int = 0
    ip_num_tokens: int = 0
    quant: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, lora_scale=1.0, ip_scale=1.0,
                 capture_probs=False, capture_idx=None):
        b, hh, ww, c = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=GN_EPS_TRANSFORMER,
                         dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(b, hh * ww, c)
            h = dense(c, dtype=self.dtype, name="proj_in",
                      quant=self.quant)(h)
        else:
            h = conv2d(c, (1, 1), padding=0, dtype=self.dtype,
                       name="proj_in", quant=self.quant)(h)
            h = h.reshape(b, hh * ww, c)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                dim=c, heads=self.heads, context_dim=self.context_dim,
                lora_rank=self.lora_rank, ip_num_tokens=self.ip_num_tokens,
                quant=self.quant, dtype=self.dtype, name=f"blocks_{i}")(
                h, context, lora_scale=lora_scale, ip_scale=ip_scale,
                capture_probs=capture_probs, capture_idx=capture_idx)
        if self.use_linear_projection:
            h = dense(c, dtype=self.dtype, name="proj_out",
                      quant=self.quant)(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = h.reshape(b, hh, ww, c)
            h = conv2d(c, (1, 1), padding=0, dtype=self.dtype,
                       name="proj_out", quant=self.quant)(h)
        return h + residual
