"""LLaVA-1.5 captioner model: CLIP vision tower -> MLP projector -> Llama.

The reference produces FGID facial captions by driving the original LLaVA
repo on GPU (data/FGID_caption.py:20-78, models/LLaVA vendored). This is
the TPU-native equivalent: the vision tower is the existing flax
`CLIPVisionEncoder` (its penultimate hidden states = HF
`vision_feature_layer=-2`), patch features (CLS dropped =
`vision_feature_select_strategy="default"`) go through the 2-layer GELU
projector, and the spliced [pre-text, image, post-text] embedding sequence
is decoded greedily by `LlamaForCausalLM` under one jit (prefill +
`lax.while_loop`, static shapes).

Splice-instead-of-scatter: the FGID protocol always has exactly one image
at a known position in the conversation template, so the image features are
concatenated between the static pre/post token embeddings rather than
scattered into placeholder ids — same semantics as HF's masked scatter
(parity-tested in tests/test_llava.py against transformers'
LlavaForConditionalGeneration), but with no dynamic indexing in the traced
graph.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LlavaConfig
from .clip import CLIPVisionEncoder
from .llama import LlamaForCausalLM, greedy_generate

# OpenAI CLIP normalization (the ViT-L/336 processor's constants)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class LlavaProjector(nn.Module):
    """HF `multi_modal_projector`: linear_1 -> GELU -> linear_2."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features, dtype=self.dtype, name="linear_1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out_features, dtype=self.dtype,
                        name="linear_2")(x)


class LlavaModel(nn.Module):
    """Image features for the splice. The Llama half runs separately so its
    KV cache stays a plain function argument."""

    config: LlavaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_tower = CLIPVisionEncoder(self.config.vision,
                                              dtype=self.dtype)
        self.multi_modal_projector = LlavaProjector(
            self.config.text.hidden_size, dtype=self.dtype)

    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3) normalized -> (B, patches, text_E)."""
        _, penultimate = self.vision_tower(pixel_values)
        return self.multi_modal_projector(penultimate[:, 1:])  # drop CLS


def preprocess_image(image, image_size: int) -> np.ndarray:
    """Reference preprocessing (LLaVA-1.5 `image_aspect_ratio="pad"`):
    pad to square with the CLIP mean color, bicubic resize to the tower
    size, normalize. PIL image in, (1, S, S, 3) float32 out."""
    from PIL import Image

    image = image.convert("RGB")
    w, h = image.size
    if w != h:
        side = max(w, h)
        bg = tuple(int(round(255 * m)) for m in CLIP_IMAGE_MEAN)
        sq = Image.new("RGB", (side, side), bg)
        sq.paste(image, ((side - w) // 2, (side - h) // 2))
        image = sq
    image = image.resize((image_size, image_size), Image.BICUBIC)
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return arr[None]


def make_caption_fn(config: LlavaConfig, max_new_tokens: int,
                    eos_token_id: int, pad_token_id: int = 0,
                    dtype=jnp.float32, quant: bool = False,
                    kv_quant: bool = False):
    """One jitted prefill+decode: (params, pixel_values, pre_ids, post_ids)
    -> (B, max_new_tokens) ids. Recompiles per (pre, post) length pair —
    the FGID protocol uses exactly two fixed prompts, so two compilations
    total per corpus (data/FGID_caption.py:21-24).

    `quant=True` expects params["llama"] in the int8 layout
    (models/llama.quantize_llama_params); the vision tower and projector
    stay float (one prefill-time cost, not per decoded token)."""
    llava = LlavaModel(config, dtype=dtype)
    llama = LlamaForCausalLM(config.text, dtype=dtype, quant=quant,
                             kv_quant=kv_quant)

    def fn(params, pixel_values, pre_ids, post_ids):
        feats = llava.apply({"params": params["mm"]}, pixel_values)
        feats = feats.astype(dtype)
        embed = lambda ids: llama.apply(
            {"params": params["llama"]}, ids, method=llama.embed_tokens)
        b = pixel_values.shape[0]
        tile = lambda ids: jnp.broadcast_to(ids[None], (b, ids.shape[0]))
        parts = [embed(tile(pre_ids)), feats, embed(tile(post_ids))]
        prompt_embeds = jnp.concatenate(parts, axis=1)
        return greedy_generate(
            llama, {"params": params["llama"]}, None,
            max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            pad_token_id=pad_token_id, prompt_embeds=prompt_embeds)

    return jax.jit(fn, static_argnames=())


def random_llava_params(rng, config: LlavaConfig, dtype=jnp.float32,
                        quant: bool = False):
    """Random-weight init (tests / synthetic validation / shape source for
    on-device bench param generation). `quant=True` inits the Llama half in
    the int8 layout (kernel_q/kernel_scale) that `make_caption_fn(...,
    quant=True)` expects."""
    k1, k2 = jax.random.split(rng)
    llava = LlavaModel(config, dtype=dtype)
    llama = LlamaForCausalLM(config.text, dtype=dtype, quant=quant)
    n = config.num_image_tokens
    mm = llava.init(k1, jnp.zeros(
        (1, config.vision.image_size, config.vision.image_size, 3)))["params"]
    lm = llama.init(k2, jnp.zeros((1, 4), jnp.int32))["params"]
    return {"mm": mm, "llama": lm}
