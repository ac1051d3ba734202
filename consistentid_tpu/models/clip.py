"""CLIP text and vision encoders in flax.

The reference uses three CLIP towers (SURVEY.md §2.3):
  - CLIP-L/14 text encoder (SD1.5 prompts; trigger-word path at
    pipline_StableDiffusion_ConsistentID.py:467)
  - OpenCLIP bigG text encoder_2 (SDXL, concat 768+1280 -> 2048-d embeds)
  - CLIP ViT-H/14 vision tower; its *penultimate* hidden states (257 x 1280)
    feed the adapters (pipline_StableDiffusion_ConsistentID.py:182,202)

Both encoders expose `output_hidden_states`-style access functionally: the
text encoder takes `penultimate: bool`, the vision tower always returns the
full hidden-state stack index we need.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import CLIPTextConfig, CLIPVisionConfig
from ..ops.attention import dot_product_attention, merge_heads, split_heads

CLIP_LN_EPS = 1e-5


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v_proj")(x)
        qh, kh, vh = (split_heads(t, self.num_heads) for t in (q, k, v))
        if self.causal:
            s = qh.shape[2]
            scale = (self.hidden_size // self.num_heads) ** -0.5
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            mask = jnp.tril(jnp.ones((s, s), bool))
            logits = jnp.where(mask, logits, -1e30)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh,
                             preferred_element_type=jnp.float32
                             ).astype(vh.dtype)
        else:
            out = dot_product_attention(qh, kh, vh)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="out_proj")(merge_heads(out))


class CLIPLayer(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    causal: bool
    hidden_act: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=CLIP_LN_EPS, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden_size, self.num_heads, self.causal,
                              dtype=self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=CLIP_LN_EPS, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns (last_or_requested_hidden_state, pooled_eos_embedding).

    `output_hidden_state_index` selects which encoder output to return after
    running all layers (-1 = final layernormed output, -2 = penultimate raw
    hidden state as used by SDXL's `hidden_states[-2]` convention).
    """

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, output_hidden_state_index: int = -1,
                 eos_token_id: int = 49407):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.zeros,
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = tok + pos[None, :s].astype(self.dtype)
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.hidden_size, cfg.intermediate_size,
                          cfg.num_heads, causal=True,
                          hidden_act=cfg.hidden_act, dtype=self.dtype,
                          name=f"layers_{i}")(x)
            hidden_states.append(x)
        final = nn.LayerNorm(epsilon=CLIP_LN_EPS, dtype=self.dtype,
                             name="final_layer_norm")(x)
        if output_hidden_state_index == -1:
            out = final
        else:
            # hidden_states layout matches HF's tuple: [emb, layer0, ...,
            # layerN-1]; hidden_states[-2] = input to the last layer
            out = hidden_states[output_hidden_state_index]
        # pooled = final-LN state at the first EOS token position
        eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32),
                             axis=-1)
        pooled = jnp.take_along_axis(
            final, eos_pos[:, None, None], axis=1)[:, 0]
        return out, pooled


class CLIPVisionEncoder(nn.Module):
    """Vision tower; returns (post_layernormed_last, penultimate_hidden).

    The adapters consume the penultimate hidden states (257 tokens of width
    hidden_size), matching the reference's `hidden_states[-2]`.
    """

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          padding="VALID", use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.zeros,
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.num_tokens, cfg.hidden_size))
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=CLIP_LN_EPS, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        penultimate = x
        for i in range(cfg.num_layers):
            penultimate = x
            x = CLIPLayer(cfg.hidden_size, cfg.intermediate_size,
                          cfg.num_heads, causal=False,
                          hidden_act=cfg.hidden_act, dtype=self.dtype,
                          name=f"layers_{i}")(x)
        post = nn.LayerNorm(epsilon=CLIP_LN_EPS, dtype=self.dtype,
                            name="post_layernorm")(x)
        return post, penultimate
