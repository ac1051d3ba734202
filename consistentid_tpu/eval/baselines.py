"""Baseline ID encoders for benchmark comparisons.

The reference's evaluation bundles a PhotoMakerIDEncoder for side-by-side
comparison (evaluation/eval_function.py:662-683): CLIP-L vision pooled
embedding through dual projections (1024 -> 768 and 1024 -> 1280,
concatenated to 2048) fused into the prompt embeds at trigger positions.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..adapter.modules import FuseModule
from ..core.config import CLIPVisionConfig
from ..models.clip import CLIPVisionEncoder


def photomaker_vision_config() -> CLIPVisionConfig:
    """CLIP-L/14 vision tower (PhotoMaker's backbone)."""
    return CLIPVisionConfig(image_size=224, patch_size=14, hidden_size=1024,
                            intermediate_size=4096, num_layers=24,
                            num_heads=16, hidden_act="quick_gelu")


class PhotoMakerIDEncoder(nn.Module):
    """id_pixel_values (B, N, H, W, 3) + prompt embeds -> fused embeds."""

    vision_config: CLIPVisionConfig = None
    projection_dim: int = 768
    projection_dim_2: int = 1280
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, id_pixel_values, prompt_embeds, token_idx, token_mask):
        cfg = self.vision_config or photomaker_vision_config()
        b, n, h, w, c = id_pixel_values.shape
        flat = id_pixel_values.reshape(b * n, h, w, c)
        post, _ = CLIPVisionEncoder(cfg, dtype=self.dtype,
                                    name="vision_model")(flat)
        pooled = post[:, 0]   # cls token, post-layernorm
        e1 = nn.Dense(self.projection_dim, use_bias=False, dtype=self.dtype,
                      name="visual_projection")(pooled)
        e2 = nn.Dense(self.projection_dim_2, use_bias=False, dtype=self.dtype,
                      name="visual_projection_2")(pooled)
        id_embeds = jnp.concatenate([e1, e2], axis=-1).reshape(b, n, -1)
        return FuseModule(self.projection_dim + self.projection_dim_2,
                          dtype=self.dtype, name="fuse_module")(
            prompt_embeds, id_embeds, token_idx, token_mask)
