"""AutoencoderKL (SD VAE) in flax, NHWC.

The reference uses the diffusers VAE inside the SD pipelines (latents decode
at pipline_StableDiffusion_ConsistentID.py:586-594; training-time encode at
train.py:225-226). Architecture per the published SD VAE: 4-level encoder /
decoder with 1-head attention mid-blocks, GroupNorm eps 1e-6, asymmetric
downsample padding.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import VAEConfig
from .layers import upsample2x_nearest

VAE_GN_EPS = 1e-6


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=VAE_GN_EPS,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=VAE_GN_EPS,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (SD VAE mid-block)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=VAE_GN_EPS,
                         dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        scale = c ** -0.5
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        h = nn.Dense(c, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(b, hh, ww, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for level, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(out_ch, groups=cfg.norm_num_groups,
                              dtype=self.dtype,
                              name=f"down_{level}_resnet_{j}")(h)
            if level < n - 1:
                # diffusers uses asymmetric (0,1) padding before stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype,
                            name=f"down_{level}_downsample")(h)
        h = VAEResnet(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                      dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(groups=cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_attn")(h)
        h = VAEResnet(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                      dtype=self.dtype, name="mid_resnet_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=VAE_GN_EPS,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[-1], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(z)
        h = VAEResnet(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                      dtype=self.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(groups=cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_attn")(h)
        h = VAEResnet(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                      dtype=self.dtype, name="mid_resnet_1")(h)
        n = len(cfg.block_out_channels)
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(reversed_channels):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(out_ch, groups=cfg.norm_num_groups,
                              dtype=self.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < n - 1:
                h = upsample2x_nearest(h)
                h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=VAE_GN_EPS,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, x):
        """image (B,H,W,3) in [-1,1] -> (mean, logvar) each (B,h,w,latent)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng: Optional[jax.Array] = None):
        """Sample scaled latents (deterministic mode uses the mean)."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, z):
        """Scaled latents -> image in [-1,1]."""
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
