"""ConsistentID adapter heads: overall-ID projector, per-region compressor,
and the prompt-fusion module.

Re-designs (TPU/flax, static shapes) of:
  ProjPlusModel   reference functions.py:490-522
  AttentionMLP    reference functions.py:524-592
  MLP             reference attention.py:50-70
  FuseModule      reference attention.py:10-48
  FacialEncoder   reference attention.py:72-88

The torch FuseModule gathers a *dynamic* number of marker positions with
boolean masks and masked_scatter_s the fused embeddings back. Here the fuse is
computed over the fixed `max_num_facials` padded slots (the reference already
pads indices to 5, utils.py:154-156) and written back with a single static
scatter — one compiled XLA program, no data-dependent shapes.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .perceiver import (LN_EPS, FacePerceiverResampler, FeedForward,
                        PerceiverAttention, gelu_exact)


class ProjPlusModel(nn.Module):
    """ArcFace 512-d embedding -> num_tokens ID tokens of cross_attention_dim,
    perceiver-refined against CLIP penultimate hidden states."""

    cross_attention_dim: int = 768
    id_embeddings_dim: int = 512
    clip_embeddings_dim: int = 1280
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, id_embeds, clip_embeds, shortcut: bool = False,
                 scale: float = 1.0):
        x = nn.Dense(self.id_embeddings_dim * 2, dtype=self.dtype,
                     name="proj_0")(id_embeds)
        x = gelu_exact(x)
        x = nn.Dense(self.cross_attention_dim * self.num_tokens,
                     dtype=self.dtype, name="proj_2")(x)
        x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        out = FacePerceiverResampler(
            dim=self.cross_attention_dim,
            depth=4,
            dim_head=64,
            heads=self.cross_attention_dim // 64,
            embedding_dim=self.clip_embeddings_dim,
            output_dim=self.cross_attention_dim,
            ff_mult=4,
            dtype=self.dtype,
            name="perceiver_resampler",
        )(x, clip_embeds)
        if shortcut:
            out = x + scale * out
        return out


class AttentionMLP(nn.Module):
    """Compresses one facial-region CLIP feature map (257 x 1280) into
    `single_num_tokens` tokens of `output_dim` via a learned-latent perceiver."""

    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    single_num_tokens: int = 1
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / self.dim ** 0.5,
            (1, self.single_num_tokens, self.dim),
        ).astype(self.dtype)
        latents = jnp.broadcast_to(
            latents, (x.shape[0], self.single_num_tokens, self.dim))
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


class MLP(nn.Module):
    out_dim: int
    hidden_dim: int
    use_residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="layernorm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        if self.use_residual:
            x = x + residual
        return x


class FuseModule(nn.Module):
    """Splice per-region ID tokens into prompt embeddings at the `<|facial|>`
    marker positions.

    prompt_embeds      (B, L, D)
    id_embeds          (B, N, D)   N = max_num_facials padded slots
    facial_token_idx   (B, N) int  position of each marker's preceding token
    facial_token_mask  (B, N) bool slot validity

    Padded slots (mask False) leave the prompt embedding untouched.
    """

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prompt_embeds, id_embeds, facial_token_idx,
                 facial_token_mask):
        id_embeds = id_embeds.astype(prompt_embeds.dtype)
        b, n = facial_token_idx.shape

        gathered = jnp.take_along_axis(
            prompt_embeds, facial_token_idx[..., None], axis=1)  # (B, N, D)

        stacked = jnp.concatenate([gathered, id_embeds], axis=-1)
        fused = MLP(self.embed_dim, self.embed_dim, use_residual=False,
                    dtype=self.dtype, name="mlp1")(stacked) + gathered
        fused = MLP(self.embed_dim, self.embed_dim, use_residual=True,
                    dtype=self.dtype, name="mlp2")(fused)
        fused = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="layer_norm")(fused)

        update = jnp.where(facial_token_mask[..., None], fused, gathered)
        batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
        return prompt_embeds.at[batch_idx, facial_token_idx].set(
            update.astype(prompt_embeds.dtype))


class FacialEncoder(nn.Module):
    """Fine-grained ID encoder: one token per facial region (AttentionMLP over
    each region's CLIP feature map), fused into the prompt embeds."""

    embedding_dim: int = 1280
    output_dim: int = 768
    embed_dim: int = 768
    # AttentionMLP hyperparameters (reference defaults: 1024/8/16/64)
    facial_dim: int = 1024
    facial_depth: int = 8
    facial_heads: int = 16
    facial_dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prompt_embeds, multi_image_embeds, facial_token_idx,
                 facial_token_mask):
        """multi_image_embeds: (B, N, T, C) per-region CLIP hidden states."""
        b, n, t, c = multi_image_embeds.shape
        flat = multi_image_embeds.reshape(b * n, t, c)
        id_tokens = AttentionMLP(
            dim=self.facial_dim, depth=self.facial_depth,
            heads=self.facial_heads, dim_head=self.facial_dim_head,
            embedding_dim=self.embedding_dim, output_dim=self.output_dim,
            dtype=self.dtype, name="visual_projection")(flat)  # (B*N, 1, out)
        id_tokens = id_tokens.reshape(b, n, self.output_dim)
        return FuseModule(embed_dim=self.embed_dim, dtype=self.dtype,
                          name="fuse_module")(
            prompt_embeds, id_tokens, facial_token_idx, facial_token_mask)
