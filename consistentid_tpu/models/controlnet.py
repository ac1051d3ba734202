"""ControlNet in flax (NHWC), config-shared with models/unet.py.

Equivalent of the diffusers ControlNetModel the reference composes with the
inpaint pipeline (pipelines/StableDIffusionControlNetInpaint_ConsistentID.py:
94-486, per-step residuals fed to the UNet at :405-425): a copy of the UNet's
down + mid stack, a conditioning-embedding conv stem on the control image,
and zero-initialized 1x1 projections producing one residual per UNet skip
plus a mid residual.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import UNetConfig
from .layers import (Downsample, ResnetBlock, TimestepEmbedding,
                     Transformer2D, timestep_embedding)


class ControlNetConditioningEmbedding(nn.Module):
    """Control-image (e.g. openpose render) -> conv_in-resolution features;
    stride-2 conv pyramid with a zero-init output conv."""

    out_channels: int
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.block_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_channels) - 1):
            h = nn.Conv(self.block_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.block_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i + 1}")(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv_out")(h)


class ControlNet(nn.Module):
    config: UNetConfig
    # conv pyramid for the control image; len-1 = number of stride-2 convs,
    # must equal log2(pixel/latent ratio) (3 for the standard SD VAE)
    cond_embed_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                  # (B, H, W, C) latents
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        controlnet_cond: jax.Array,         # (B, 8H, 8W, 3) control image
        conditioning_scale: jax.Array | float = 1.0,
        added_cond: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
        """Returns (down_block_residuals, mid_residual), scaled."""
        cfg = self.config
        use_linear = cfg.addition_embed_type == "text_time"
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        temb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                  cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(
            temb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time":
            time_ids = added_cond["time_ids"]
            text_embeds = added_cond["text_embeds"]
            t_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift)
            t_emb = t_emb.reshape(time_ids.shape[0], -1)
            add_emb = jnp.concatenate(
                [text_embeds.astype(jnp.float32), t_emb], axis=-1)
            temb = temb + TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype, name="add_embedding")(
                add_emb.astype(self.dtype))

        ctx = encoder_hidden_states.astype(self.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        h = h + ControlNetConditioningEmbedding(
            cfg.block_out_channels[0],
            block_channels=self.cond_embed_channels, dtype=self.dtype,
            name="controlnet_cond_embedding")(
            controlnet_cond.astype(self.dtype))

        def zero_conv(x, name):
            return nn.Conv(x.shape[-1], (1, 1),
                           kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name=name)(x)

        skips = [h]
        n = len(cfg.block_out_channels)
        for level, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch, groups=cfg.norm_num_groups,
                                dtype=self.dtype,
                                name=f"down_{level}_resnet_{j}")(h, temb)
                if cfg.down_block_has_attn[level]:
                    h = Transformer2D(
                        heads=cfg.num_attention_heads[level],
                        context_dim=cfg.cross_attention_dim,
                        depth=cfg.transformer_layers_per_block[level],
                        use_linear_projection=use_linear,
                        groups=cfg.norm_num_groups, dtype=self.dtype,
                        name=f"down_{level}_attn_{j}")(h, ctx)
                skips.append(h)
            if level < n - 1:
                h = Downsample(out_ch, dtype=self.dtype,
                               name=f"down_{level}_downsample")(h)
                skips.append(h)

        h = ResnetBlock(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                        dtype=self.dtype, name="mid_resnet_0")(h, temb)
        h = Transformer2D(
            heads=cfg.num_attention_heads[-1],
            context_dim=cfg.cross_attention_dim,
            depth=cfg.mid_transformer_depth,
            use_linear_projection=use_linear,
            groups=cfg.norm_num_groups, dtype=self.dtype,
            name="mid_attn")(h, ctx)
        h = ResnetBlock(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                        dtype=self.dtype, name="mid_resnet_1")(h, temb)

        down_res = tuple(
            zero_conv(s, f"controlnet_down_blocks_{i}") * conditioning_scale
            for i, s in enumerate(skips))
        mid_res = zero_conv(h, "controlnet_mid_block") * conditioning_scale
        return down_res, mid_res
