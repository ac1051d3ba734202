"""CLIP-based NSFW safety checker, TPU-native.

The reference SD1.5 pipeline runs diffusers' StableDiffusionSafetyChecker on
every decoded image (pipline_StableDiffusion_ConsistentID.py:586-594):
a CLIP vision tower + visual projection produces image embeddings whose
cosine similarities against fixed "concept" and "special-care" embedding
banks are thresholded; flagged images are replaced with black. This module
reproduces that behavior as one jitted XLA graph (the torch original runs
the threshold logic in numpy on host).

Weights convert from the checkpoint's safety_checker/ dump via
io.convert_backbones.safety_checker_from_hf. SDXL runs no checker
(reference infer_SDXL.py:23) — same here.
"""
from __future__ import annotations

from dataclasses import field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import CLIPVisionConfig
from .clip import CLIPVisionEncoder

# CLIP feature-extractor preprocessing constants
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def _cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    """(B, D) x (N, D) -> (B, N) cosine similarity."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return a @ b.T


class SafetyChecker(nn.Module):
    """(B, S, S, 3) CLIP-preprocessed pixels -> (B,) bool nsfw flags."""

    vision_config: CLIPVisionConfig = field(
        default_factory=lambda: CLIPVisionConfig(
            image_size=224, patch_size=14, hidden_size=1024,
            intermediate_size=4096, num_layers=24, num_heads=16))
    projection_dim: int = 768
    num_concepts: int = 17
    num_special: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip_pixels) -> jax.Array:
        post, _ = CLIPVisionEncoder(self.vision_config, dtype=self.dtype,
                                    name="vision_model")(clip_pixels)
        pooled = post[:, 0]  # CLS token after post-layernorm
        image_embeds = nn.Dense(self.projection_dim, use_bias=False,
                                dtype=self.dtype,
                                name="visual_projection")(pooled)

        concept_embeds = self.param(
            "concept_embeds", nn.initializers.normal(1.0),
            (self.num_concepts, self.projection_dim))
        special_embeds = self.param(
            "special_care_embeds", nn.initializers.normal(1.0),
            (self.num_special, self.projection_dim))
        concept_thresh = self.param(
            "concept_embeds_weights", nn.initializers.ones,
            (self.num_concepts,))
        special_thresh = self.param(
            "special_care_embeds_weights", nn.initializers.ones,
            (self.num_special,))

        emb = image_embeds.astype(jnp.float32)
        special_scores = _cosine(emb, special_embeds.astype(jnp.float32)) \
            - special_thresh
        # any special-care hit lowers every concept threshold by 0.01
        # (diffusers' "adjustment" term)
        adjustment = jnp.where(
            jnp.any(special_scores > 0, axis=-1, keepdims=True), 0.01, 0.0)
        concept_scores = _cosine(emb, concept_embeds.astype(jnp.float32)) \
            - concept_thresh + adjustment
        return jnp.any(concept_scores > 0, axis=-1)


def make_safety_checker(params, vision_config=None, projection_dim=768,
                        dtype=jnp.float32):
    """uint8 images (B, H, W, 3) -> (checked images, has_nsfw (B,) bool).

    Flagged images are replaced with black, matching the diffusers
    post-processing the reference inherits (:586-594)."""
    import numpy as np
    from PIL import Image

    checker = SafetyChecker(
        vision_config=vision_config or SafetyChecker().vision_config,
        projection_dim=params["visual_projection"]["kernel"].shape[1],
        num_concepts=params["concept_embeds"].shape[0],
        num_special=params["special_care_embeds"].shape[0],
        dtype=dtype)
    size = checker.vision_config.image_size

    @jax.jit
    def run(clip_pixels):
        return checker.apply({"params": params}, clip_pixels)

    mean = np.asarray(CLIP_IMAGE_MEAN, np.float32)
    std = np.asarray(CLIP_IMAGE_STD, np.float32)

    def check(images: "np.ndarray") -> Tuple["np.ndarray", "np.ndarray"]:
        batch = []
        for img in images:
            pil = Image.fromarray(img).resize((size, size), Image.BICUBIC)
            arr = np.asarray(pil, np.float32) / 255.0
            batch.append((arr - mean) / std)
        flags = np.asarray(run(jnp.asarray(np.stack(batch))))
        out = images.copy()
        out[flags] = 0
        return out, flags

    return check
