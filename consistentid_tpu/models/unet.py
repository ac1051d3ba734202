"""SD UNet (UNet2DConditionModel equivalent) in flax, NHWC, config-driven for
both SD1.5 and SDXL layouts (core.config.sd15_unet_config / sdxl_unet_config).

This is the frozen backbone the reference drives through diffusers
(pipline_StableDiffusion_ConsistentID.py:552-557) with ConsistentID's LoRA +
decoupled-IP attention processors installed (:152-174). Here those adapters
are config-gated parameters of the same module (UNetConfig.lora_rank /
ip_num_tokens), so the whole denoise step is one jit-compiled function, and
attention-prob capture for the facial localization loss is a functional
`capture_probs` flag (sown 'intermediates') instead of the reference's
monkey-patch (functions.py:263-299).

Localization-capture layer selection mirrors reference functions.py:266-278:
UNET_LAYER_NAMES = [down_0, down_1, down_2, mid, up_1, up_2, up_3], a centered
window of `localization_layers` (5 -> down_1..up_2). NOTE the reference
captures *attn1* probs there but indexes them with text-token ids
(SURVEY.md §2.1 quirk); we capture attn2 (cross-attention) probs, the clear
intent inherited from FastComposer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import UNetConfig
from .layers import (Downsample, ResnetBlock, TimestepEmbedding,
                     Transformer2D, Upsample, group_norm_silu,
                     timestep_embedding)

UNET_LAYER_NAMES = ("down_0", "down_1", "down_2", "mid", "up_1", "up_2", "up_3")


def localization_layer_names(num_layers: int) -> Tuple[str, ...]:
    start = (len(UNET_LAYER_NAMES) - num_layers) // 2
    return UNET_LAYER_NAMES[start:start + num_layers]


class UNet(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    # rematerialize resnet/transformer blocks under autodiff (SURVEY §7.4.7:
    # frozen ViT-H + UNet + captured attn probs need activation recompute).
    # Blocks whose attn probs are captured are never remated (sow would be
    # discarded by the checkpoint).
    remat: bool = False
    # "full" recomputes everything in the block (min memory); "dots" saves
    # MXU (matmul/conv) outputs and recomputes only elementwise chains —
    # usually the TPU speed/memory sweet spot for training.
    remat_policy: str = "full"
    # W8A8 int8 serving path (ops/quant.py): block convs + attention/FF
    # projections run on the int8 MXU; conv_in/conv_out, time embeddings,
    # norms and the IP branch stay float. Inference-only — pair with
    # lora_rank=0 params produced by quantize_params_like. False = float,
    # True = dynamic activation quant, "static" = calibrated per-tensor
    # activation scales (act_scale params, no per-call amax prologue).
    quant: Any = False
    # restructured GroupNorm+SiLU (ops/group_norm.py) in the resnet blocks
    # and conv_norm_out — A/B lever for the training graph's bandwidth-
    # bound norm share; identical params and math, off by default
    fused_gn: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                 # (B, H, W, C) latents
        timesteps: jax.Array,              # (B,) or scalar
        encoder_hidden_states: jax.Array,  # (B, L(+ip), context_dim)
        added_cond: Optional[Dict[str, jax.Array]] = None,  # SDXL text_time
        lora_scale: float = 1.0,
        ip_scale: float = 1.0,
        capture_layers: Tuple[str, ...] = (),
        capture_cols: Optional[jax.Array] = None,  # (B, N) facial-token idx
        down_block_residuals: Optional[Tuple[jax.Array, ...]] = None,
        mid_residual: Optional[jax.Array] = None,
        deep_feature: Optional[jax.Array] = None,
        return_deep: bool = False,
    ) -> jax.Array:
        """Full UNet forward; or, the DeepCache split (Ma et al. 2023 /
        PAPERS.md training-free acceleration family):

        - return_deep=True: also return the "deep feature" — the hidden
          state entering the LAST (shallowest) up block, i.e. everything
          below level 0 (down levels 1.., mid, up blocks 0..n-2).
        - deep_feature=<cached>: SKIP those deep blocks entirely; run only
          conv_in + the level-0 down blocks (for fresh shallow skips) and
          the last up block + conv_out, splicing the cached deep feature
          in. Timestep/context still enter fresh through the shallow
          blocks. Exploits the temporal redundancy of low-frequency
          features across adjacent denoise steps; the cadence is chosen by
          the sampler (sampling/sampler.py cache_interval).

        Both paths read the same param tree (the shallow path simply
        leaves the deep-block params untouched).
        """
        cfg = self.config
        skip_deep = deep_feature is not None
        if skip_deep:
            assert down_block_residuals is None and mid_residual is None, \
                "deep-feature caching is incompatible with ControlNet " \
                "residual injection"
            assert not capture_layers, \
                "attn-prob capture (training) never runs the cached path"
            assert not return_deep
        use_linear = cfg.addition_embed_type == "text_time"  # SDXL layout
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # -- time (+ addition) embedding, fp32 then cast --
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                  cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(
            temb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL needs text_embeds/time_ids"
            time_ids = added_cond["time_ids"]          # (B, 6)
            text_embeds = added_cond["text_embeds"]    # (B, pooled_dim)
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
        sample = sample.astype(self.dtype)

        remat_kw = {}
        if self.remat_policy == "dots":
            remat_kw["policy"] = \
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable

        def res_block(out_ch: int, name: str):
            cls = (nn.remat(ResnetBlock, **remat_kw) if self.remat
                   else ResnetBlock)
            return cls(out_ch, groups=cfg.norm_num_groups, quant=self.quant,
                       fused_gn=self.fused_gn, dtype=self.dtype, name=name)

        def transformer(level: int, name: str, block_name: str,
                        depth: Optional[int] = None):
            cls = Transformer2D
            if self.remat and block_name not in capture_layers:
                # __call__(self, x, context, lora_scale, ip_scale,
                #          capture_probs): scales + flag are static
                cls = nn.remat(Transformer2D, static_argnums=(3, 4, 5),
                               **remat_kw)
            return cls(
                heads=cfg.num_attention_heads[level],
                context_dim=cfg.cross_attention_dim,
                depth=(cfg.transformer_layers_per_block[level]
                       if depth is None else depth),
                use_linear_projection=use_linear,
                groups=cfg.norm_num_groups,
                lora_rank=cfg.lora_rank,
                ip_num_tokens=cfg.ip_num_tokens,
                quant=self.quant,
                dtype=self.dtype,
                name=name,
            )

        def run_transformer(tf, h, block_name):
            # positional so nn.remat's static_argnums covers the scales+flag
            captured = block_name in capture_layers
            # column-gathered capture: sow only the facial-token columns of
            # the attn2 softmax (the localization loss reads nothing else) —
            # the full (B·H, Sq, K) fp32 capture was the train step's
            # largest HBM consumer (VERDICT r4 next #1)
            return tf(h, ctx, lora_scale, ip_scale, captured,
                      capture_cols if captured else None)

        # -- down --
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample)
        skips = [h]
        n_levels = len(cfg.block_out_channels)
        down_levels = 1 if skip_deep else n_levels
        for level in range(down_levels):
            out_ch = cfg.block_out_channels[level]
            block_name = f"down_{level}"
            for j in range(cfg.layers_per_block):
                h = res_block(out_ch, f"down_{level}_resnet_{j}")(h, temb)
                if cfg.down_block_has_attn[level]:
                    h = run_transformer(
                        transformer(level, f"down_{level}_attn_{j}",
                                    block_name), h, block_name)
                skips.append(h)
            if level < n_levels - 1 and not skip_deep:
                h = Downsample(out_ch, quant=self.quant, dtype=self.dtype,
                               name=f"down_{level}_downsample")(h)
                skips.append(h)

        # ControlNet skip/mid residual injection (diffusers semantics:
        # each skip gets its residual; the mid output gets one more)
        if down_block_residuals is not None:
            assert len(down_block_residuals) == len(skips), \
                f"{len(down_block_residuals)} residuals vs {len(skips)} skips"
            skips = [s + r.astype(s.dtype)
                     for s, r in zip(skips, down_block_residuals)]

        if skip_deep:
            # splice the cached deep feature in as the last up block's input
            h = deep_feature.astype(self.dtype)
        else:
            # -- mid --
            mid_level = n_levels - 1
            h = res_block(cfg.block_out_channels[-1], "mid_resnet_0")(h, temb)
            h = run_transformer(
                transformer(mid_level, "mid_attn", "mid",
                            depth=cfg.mid_transformer_depth), h, "mid")
            h = res_block(cfg.block_out_channels[-1], "mid_resnet_1")(h, temb)
            if mid_residual is not None:
                h = h + mid_residual.astype(h.dtype)

            # -- deep up blocks (reversed levels; up block i consumes skips
            #    of level n_levels-1-i; diffusers up_blocks[0] is deepest) --
            for i in range(n_levels - 1):
                level = n_levels - 1 - i
                out_ch = cfg.block_out_channels[level]
                block_name = f"up_{i}"
                for j in range(cfg.layers_per_block + 1):
                    skip = skips.pop()
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = res_block(out_ch, f"up_{i}_resnet_{j}")(h, temb)
                    if cfg.down_block_has_attn[level]:
                        h = run_transformer(
                            transformer(level, f"up_{i}_attn_{j}",
                                        block_name), h, block_name)
                h = Upsample(out_ch, quant=self.quant, dtype=self.dtype,
                             name=f"up_{i}_upsample")(h)
        deep = h

        # -- last (shallowest, level-0) up block --
        i = n_levels - 1
        block_name = f"up_{i}"
        out_ch = cfg.block_out_channels[0]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = res_block(out_ch, f"up_{i}_resnet_{j}")(h, temb)
            if cfg.down_block_has_attn[0]:
                h = run_transformer(
                    transformer(0, f"up_{i}_attn_{j}", block_name),
                    h, block_name)

        h = group_norm_silu(h, cfg.norm_num_groups, self.dtype,
                            "conv_norm_out", self.fused_gn)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_out")(h)
        return (out, deep) if return_deep else out
