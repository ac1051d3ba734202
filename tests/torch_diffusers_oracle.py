"""Hand-written torch oracles for the diffusers UNet2DConditionModel and
AutoencoderKL forward math, with the exact diffusers state_dict key layout.

Purpose (VERDICT r2 item 1): numerically pin `io.convert_backbones.
unet_from_diffusers` / `vae_from_diffusers` — the converters that replace the
reference's `StableDiffusionPipeline.from_pretrained` load path (reference
infer.py:17-21) — so a transposed conv kernel or mis-mapped key fails a test
instead of silently destroying output quality on real weights (the structural
and roundtrip tests cannot see orientation bugs; SURVEY.md §7.4 item 1).

These modules reproduce the published Stable Diffusion architecture block math
(same as diffusers' implementation semantics):
  - ResnetBlock2D: GN(eps 1e-5) -> SiLU -> conv3x3 -> +time_proj(SiLU(temb))
    -> GN -> SiLU -> conv3x3, 1x1 conv shortcut on channel change
  - Transformer2DModel: GN(eps 1e-6) -> proj_in (1x1 conv for SD1.5 /
    linear for SDXL) -> BasicTransformerBlocks -> proj_out -> +residual
  - BasicTransformerBlock: LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU
  - sinusoidal timestep embedding with flip_sin_to_cos + 2-layer SiLU MLP
  - SDXL "text_time" addition embedding: per-element 256-d sinusoids of the
    6 time_ids concatenated onto pooled text embeds -> 2-layer MLP
  - VAE: asymmetric-pad stride-2 downsample, nearest-2x upsample, 1-head
    mid-block attention with c**-0.5 scaling, GN eps 1e-6

State-dict key names match diffusers ("down_blocks.0.resnets.0.norm1.weight",
"mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight",
"encoder.down_blocks.0.downsamplers.0.conv.weight", ...) so the dicts feed the
converters unchanged. Test oracle only — never imported by the package.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding_t(timesteps: torch.Tensor, dim: int,
                         flip_sin_to_cos: bool = True,
                         downscale_freq_shift: float = 0.0,
                         max_period: float = 10000.0) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TimestepEmbeddingT(nn.Module):
    def __init__(self, in_dim, embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2DT(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        self._has_shortcut = in_ch != out_ch

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self._has_shortcut:
            x = self.conv_shortcut(x)
        return x + h


class AttentionT(nn.Module):
    """Multi-head attention, diffusers Attention layout (to_q/k/v no-bias,
    to_out ModuleList with biased linear at index 0)."""

    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        self.heads = heads
        ctx = context_dim if context_dim is not None else dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx, dim, bias=False)
        self.to_v = nn.Linear(ctx, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, s, d = q.shape
        hd = d // self.heads

        def split(t):
            return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

        o = F.scaled_dot_product_attention(split(q), split(k), split(v))
        o = o.transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](o)


class GEGLUT(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class BasicTransformerBlockT(nn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = AttentionT(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = AttentionT(dim, heads, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = nn.Module()
        # diffusers FeedForward.net = [GEGLU, Dropout, Linear] -> keys .0/.2
        self.ff.net = nn.ModuleList(
            [GEGLUT(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)])

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff.net[2](self.ff.net[0](self.norm3(x)))


class Transformer2DT(nn.Module):
    def __init__(self, ch, heads, context_dim, depth, use_linear, groups=32):
        super().__init__()
        self.use_linear = use_linear
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        io = (lambda: nn.Linear(ch, ch)) if use_linear else \
            (lambda: nn.Conv2d(ch, ch, 1))
        self.proj_in, self.proj_out = io(), io()
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlockT(ch, heads, context_dim)
             for _ in range(depth)])

    def forward(self, x, context):
        b, c, hh, ww = x.shape
        residual = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        for blk in self.transformer_blocks:
            h = blk(h, context)
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return h + residual


class DownsamplerT(nn.Module):
    def __init__(self, ch, asymmetric_pad=False):
        super().__init__()
        self.asymmetric_pad = asymmetric_pad
        pad = 0 if asymmetric_pad else 1
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.asymmetric_pad:  # VAE encoder: pad (left,right,top,bottom)
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class UpsamplerT(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TorchUNet(nn.Module):
    """UNet2DConditionModel oracle driven by our UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        n = len(chans)
        temb_dim = cfg.time_embed_dim
        use_linear = cfg.addition_embed_type == "text_time"
        g = cfg.norm_num_groups

        self.conv_in = nn.Conv2d(cfg.sample_channels, chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbeddingT(chans[0], temb_dim)
        if use_linear:
            self.add_embedding = TimestepEmbeddingT(
                cfg.projection_class_embeddings_input_dim, temb_dim)

        def transformer(level, depth=None):
            return Transformer2DT(
                chans[level], cfg.num_attention_heads[level],
                cfg.cross_attention_dim,
                cfg.transformer_layers_per_block[level]
                if depth is None else depth,
                use_linear, groups=g)

        self.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for level in range(n):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(
                    ResnetBlock2DT(in_ch, chans[level], temb_dim, groups=g))
                in_ch = chans[level]
                if cfg.down_block_has_attn[level]:
                    blk.attentions.append(transformer(level))
            if level < n - 1:
                blk.downsamplers = nn.ModuleList([DownsamplerT(chans[level])])
            self.down_blocks.append(blk)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([
            ResnetBlock2DT(chans[-1], chans[-1], temb_dim, groups=g),
            ResnetBlock2DT(chans[-1], chans[-1], temb_dim, groups=g)])
        self.mid_block.attentions = nn.ModuleList(
            [transformer(n - 1, depth=cfg.mid_transformer_depth)])

        # up path: skip channels mirror the down path's output stack
        skip_chans = [chans[0]]
        for level in range(n):
            skip_chans += [chans[level]] * cfg.layers_per_block
            if level < n - 1:
                skip_chans.append(chans[level])
        self.up_blocks = nn.ModuleList()
        h_ch = chans[-1]
        for i in range(n):
            level = n - 1 - i
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_chans.pop()
                blk.resnets.append(ResnetBlock2DT(
                    h_ch + skip, chans[level], temb_dim, groups=g))
                h_ch = chans[level]
                if cfg.down_block_has_attn[level]:
                    blk.attentions.append(transformer(level))
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([UpsamplerT(chans[level])])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states,
                added_cond=None):
        cfg = self.cfg
        temb = timestep_embedding_t(timesteps, cfg.block_out_channels[0],
                                    cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = self.time_embedding(temb)
        if cfg.addition_embed_type == "text_time":
            time_ids = added_cond["time_ids"]
            t_emb = timestep_embedding_t(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift)
            add_emb = torch.cat(
                [added_cond["text_embeds"],
                 t_emb.reshape(time_ids.shape[0], -1)], dim=-1)
            temb = temb + self.add_embedding(add_emb)

        ctx = encoder_hidden_states
        h = self.conv_in(sample)
        skips = [h]
        for level, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if len(blk.attentions) > 0:
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if len(blk.attentions) > 0:
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


class VAEAttentionT(nn.Module):
    """SD VAE 1-head mid-block attention, diffusers Attention key layout."""

    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
        h = self.to_out[0](attn @ v)
        return x + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2DT(ch, ch, None, groups=groups, eps=1e-6),
            ResnetBlock2DT(ch, ch, None, groups=groups, eps=1e-6)])
        self.attentions = nn.ModuleList([VAEAttentionT(ch, groups)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class TorchVAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans, g = cfg.block_out_channels, cfg.norm_num_groups
        n = len(chans)
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for level in range(n):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock2DT(
                    in_ch, chans[level], None, groups=g, eps=1e-6))
                in_ch = chans[level]
            if level < n - 1:
                blk.downsamplers = nn.ModuleList(
                    [DownsamplerT(chans[level], asymmetric_pad=True)])
            self.down_blocks.append(blk)
        self.mid_block = _VAEMid(chans[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchVAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans, g = cfg.block_out_channels, cfg.norm_num_groups
        n = len(chans)
        self.conv_in = nn.Conv2d(cfg.latent_channels, chans[-1], 3, padding=1)
        self.mid_block = _VAEMid(chans[-1], g)
        self.up_blocks = nn.ModuleList()
        in_ch = chans[-1]
        for i in range(n):
            ch = tuple(reversed(chans))[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(
                    ResnetBlock2DT(in_ch, ch, None, groups=g, eps=1e-6))
                in_ch = ch
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([UpsamplerT(ch)])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(g, chans[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchVAE(nn.Module):
    """AutoencoderKL oracle (encoder/decoder/quant_conv/post_quant_conv)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = TorchVAEEncoder(cfg)
        self.decoder = TorchVAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
