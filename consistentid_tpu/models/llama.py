"""Llama decoder in flax, with a functional KV cache and greedy decoding.

This is the language half of the LLaVA-1.5 captioner the reference drives
for FGID caption production (data/FGID_caption.py:20 loads
liuhaotian/llava-v1.5-7b = CLIP-ViT-L/336 tower + Llama-2-7b;
models/LLaVA vendors the driver). The reference runs it as a torch
`generate` on GPU; here it is a jitted prefill + `lax.while_loop` decode on
TPU: static shapes throughout (fixed cache length, fixed max_new_tokens
trip bound with an early-exit condition), fp32 softmax/norm internals over
a bf16/fp32 parameter dtype, and the KV cache threaded functionally
(pytree in, pytree out — donation-friendly, no flax mutable state).

Numerics follow HF `LlamaForCausalLM` exactly (verified by
tests/test_llama_parity.py against transformers at tiny config):
RMSNorm computed in fp32, rotate-half RoPE with cos/sin from
`theta^{-2i/d}` outer positions, grouped-query attention via KV head
repeat, SiLU-gated MLP, no biases.

`quant=True` serves every projection (q/k/v/o, gate/up/down, lm_head) as
W8A8 int8 (ops/quant.py): greedy decode is weight-read-bound (measured
51.7 tok/s x 14.1 GB bf16 ≈ the v5e HBM roofline, ROUND_NOTES r4), so
int8 weights halve the bytes per decoded token AND halve param HBM,
which is what lets llava-1.5-7b run batch > 1 on a 16 GB chip. The
embedding table stays float (its read is one gather per token).
Convert float params with `quantize_llama_params`.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from .layers import dense as _dense


class LayerKV(NamedTuple):
    k: jax.Array  # (B, kv_heads, max_len, head_dim)
    v: jax.Array


class QuantLayerKV(NamedTuple):
    """int8 KV cache: halves the per-token KV read that grows linearly
    with batch (the measured reason captioning regressed from batch 4 to
    batch 8, ROUND_NOTES r4). Per-(batch, head, position) symmetric
    scales — 4 bytes of scale per 128 bytes of head data."""

    k: jax.Array        # (B, kv_heads, max_len, head_dim) int8
    k_scale: jax.Array  # (B, kv_heads, max_len, 1) fp32
    v: jax.Array
    v_scale: jax.Array


Cache = List[LayerKV]


def init_cache(config: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.float32, kv_quant: bool = False) -> Cache:
    shape = (batch, config.num_kv_heads, max_len, config.head_dim)
    if kv_quant:
        sshape = shape[:-1] + (1,)
        return [QuantLayerKV(jnp.zeros(shape, jnp.int8),
                             jnp.ones(sshape, jnp.float32),
                             jnp.zeros(shape, jnp.int8),
                             jnp.ones(sshape, jnp.float32))
                for _ in range(config.num_layers)]
    return [LayerKV(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(config.num_layers)]


def rope_cos_sin(positions: jax.Array, head_dim: int,
                 theta: float) -> Tuple[jax.Array, jax.Array]:
    """HF convention: freqs = pos * theta^{-2i/d}; emb = concat(freqs, freqs).

    positions: (S,) int32 -> cos/sin (S, head_dim) fp32.
    """
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, S, D); cos/sin: (S, D)."""
    cos = cos[None, None].astype(x.dtype)
    sin = sin[None, None].astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


class RMSNorm(nn.Module):
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (w.astype(self.dtype) * xf.astype(self.dtype))


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, kv: LayerKV, cache_index,
                 attn_len: int):
        """x: (B, S, E). kv: fixed-length cache; new keys/values are written
        at [cache_index, cache_index + S). attn_len = static number of
        leading cache slots that can ever be attended (<= max_len) — lets
        prefill avoid attending over the whole decode-length cache."""
        cfg = self.config
        b, s, _ = x.shape
        d = cfg.head_dim
        dense = lambda n, feats: _dense(feats, use_bias=False,
                                        dtype=self.dtype, name=n,
                                        quant=self.quant)
        q = dense("q_proj", cfg.num_heads * d)(x)
        k = dense("k_proj", cfg.num_kv_heads * d)(x)
        v = dense("v_proj", cfg.num_kv_heads * d)(x)
        q = q.reshape(b, s, cfg.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, cfg.num_kv_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, cfg.num_kv_heads, d).transpose(0, 2, 1, 3)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        k_scale_t = v_scale_t = None
        if isinstance(kv, QuantLayerKV):
            # int8 KV: quantize the new keys/values per (batch, head,
            # position) on write; on read the dots consume the int8 cache
            # DIRECTLY (the int8->bf16 convert fuses into the matmul
            # operand, so HBM reads stay int8) and the per-position scales
            # fold into the (B,H,q,L) logits / probs instead — exact, and
            # it avoids materializing a dequantized bf16 copy of the cache
            # (which would double, not halve, the KV bytes).
            from ..ops.quant import quantize_symmetric

            kq, ks = quantize_symmetric(k, axis=(3,), keepdims=True)
            vq, vs = quantize_symmetric(v, axis=(3,), keepdims=True)
            upd = lambda buf, new: jax.lax.dynamic_update_slice(
                buf, new.astype(buf.dtype), (0, 0, cache_index, 0))
            new_kv = QuantLayerKV(upd(kv.k, kq), upd(kv.k_scale, ks),
                                  upd(kv.v, vq), upd(kv.v_scale, vs))
            kk = new_kv.k[:, :, :attn_len]
            vv = new_kv.v[:, :, :attn_len]
            # (B, kv_heads, 1, attn_len) fp32, broadcast over query pos
            k_scale_t = new_kv.k_scale[:, :, :attn_len, 0][:, :, None, :]
            v_scale_t = new_kv.v_scale[:, :, :attn_len, 0][:, :, None, :]
        else:
            k_cache = jax.lax.dynamic_update_slice(
                kv.k, k.astype(kv.k.dtype), (0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(
                kv.v, v.astype(kv.v.dtype), (0, 0, cache_index, 0))
            new_kv = LayerKV(k_cache, v_cache)

            kk = k_cache[:, :, :attn_len]
            vv = v_cache[:, :, :attn_len]
        rep = cfg.num_heads // cfg.num_kv_heads
        if rep > 1:
            kk = jnp.repeat(kk, rep, axis=1)
            vv = jnp.repeat(vv, rep, axis=1)
            if k_scale_t is not None:
                k_scale_t = jnp.repeat(k_scale_t, rep, axis=1)
                v_scale_t = jnp.repeat(v_scale_t, rep, axis=1)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, kk.astype(q.dtype),
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        if k_scale_t is not None:
            logits = logits * k_scale_t
        # causal over absolute positions: query i sits at cache_index + i
        q_pos = cache_index + jnp.arange(s)[:, None]
        k_pos = jnp.arange(attn_len)[None, :]
        logits = jnp.where(k_pos <= q_pos, logits, -1e30)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if v_scale_t is not None:
            probs = probs * v_scale_t
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype),
                         vv.astype(q.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.num_heads * d)
        return dense("o_proj", cfg.hidden_size)(out), new_kv


class LlamaMLP(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        proj = lambda n, feats: _dense(feats, use_bias=False,
                                       dtype=self.dtype, name=n,
                                       quant=self.quant)
        gate = proj("gate_proj", cfg.intermediate_size)(x)
        up = proj("up_proj", cfg.intermediate_size)(x)
        return proj("down_proj", cfg.hidden_size)(jax.nn.silu(gate) * up)


class LlamaDecoderLayer(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, kv, cache_index, attn_len):
        h = RMSNorm(self.config.rms_norm_eps, dtype=self.dtype,
                    name="input_layernorm")(x)
        attn, new_kv = LlamaAttention(self.config, dtype=self.dtype,
                                      quant=self.quant, name="self_attn")(
            h, cos, sin, kv, cache_index, attn_len)
        x = x + attn
        h = RMSNorm(self.config.rms_norm_eps, dtype=self.dtype,
                    name="post_attention_layernorm")(x)
        return x + LlamaMLP(self.config, dtype=self.dtype, quant=self.quant,
                            name="mlp")(h), new_kv


class LlamaForCausalLM(nn.Module):
    """Causal LM over token ids OR precomputed input embeddings.

    `inputs_embeds` is the LLaVA path (image features spliced between text
    embeddings before the decoder). Returns (logits, new_cache).
    """

    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    # int8 KV cache (QuantLayerKV): halves the batch-linear KV read of
    # greedy decode; greedy_generate sizes the cache accordingly
    kv_quant: bool = False

    def setup(self):
        cfg = self.config
        self._embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                               dtype=self.dtype, name="embed_tokens")
        self._layers = [LlamaDecoderLayer(cfg, dtype=self.dtype,
                                          quant=self.quant,
                                          name=f"layers_{i}")
                        for i in range(cfg.num_layers)]
        self._norm = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="norm")
        if not cfg.tie_word_embeddings:
            self._lm_head = _dense(cfg.vocab_size, use_bias=False,
                                   dtype=self.dtype, quant=self.quant,
                                   name="lm_head")

    def __call__(self, input_ids: Optional[jax.Array] = None,
                 cache: Optional[Cache] = None,
                 cache_index=0,
                 attn_len: Optional[int] = None,
                 inputs_embeds: Optional[jax.Array] = None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self._embed(input_ids)
        b, s, _ = inputs_embeds.shape
        if cache is None:
            cache = init_cache(cfg, b, s, dtype=self.dtype)
            attn_len = s
        if attn_len is None:
            attn_len = cache[0].k.shape[2]

        positions = cache_index + jnp.arange(s)
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

        x = inputs_embeds
        new_cache = []
        for layer, kv_in in zip(self._layers, cache):
            x, kv = layer(x, cos, sin, kv_in, cache_index, attn_len)
            new_cache.append(kv)
        x = self._norm(x)
        if cfg.tie_word_embeddings:
            logits = self._embed.attend(x)
        else:
            logits = self._lm_head(x)
        return logits, new_cache

    def embed_tokens(self, input_ids):
        """Token embeddings only (for the LLaVA splice)."""
        return self._embed(input_ids)


def greedy_generate(model: LlamaForCausalLM, params, prompt,
                    max_new_tokens: int, eos_token_id: int,
                    pad_token_id: int = 0,
                    prompt_embeds: Optional[jax.Array] = None) -> jax.Array:
    """Greedy decode (the reference captions with temperature=0,
    data/FGID_caption.py:57). Returns (B, max_new_tokens) int32, padded with
    pad_token_id after EOS; EOS itself is included.

    Static-shape TPU decode: one prefill over the prompt (cache sized
    prompt_len + max_new_tokens), then a `lax.while_loop` of single-token
    steps that exits early once every row has emitted EOS. Jit-safe as a
    whole; prompt length is static per compilation.
    """
    cfg = model.config
    if prompt_embeds is not None:
        b, prompt_len = prompt_embeds.shape[:2]
    else:
        b, prompt_len = prompt.shape
    max_len = prompt_len + max_new_tokens
    cache = init_cache(cfg, b, max_len, dtype=model.dtype,
                       kv_quant=model.kv_quant)

    if prompt_embeds is not None:
        logits, cache = model.apply(params, cache=cache, cache_index=0,
                                    attn_len=prompt_len,
                                    inputs_embeds=prompt_embeds)
    else:
        logits, cache = model.apply(params, prompt, cache=cache,
                                    cache_index=0, attn_len=prompt_len)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    out = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
    done = jnp.zeros((b,), bool)

    def cond(carry):
        i, _, _, _, done = carry
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(carry):
        i, tok, cache, out, done = carry
        emit = jnp.where(done, pad_token_id, tok)
        out = jax.lax.dynamic_update_slice(out, emit[:, None], (0, i))
        done = done | (tok == eos_token_id)
        logits, cache = model.apply(params, tok[:, None], cache=cache,
                                    cache_index=prompt_len + i,
                                    attn_len=max_len)
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return i + 1, tok, cache, out, done

    _, _, _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tok, cache, out, done))
    return out


def quantize_llama_params(config: LlamaConfig, params, dtype=jnp.float32):
    """Float Llama param tree (raw, no "params" wrapper) -> the int8 layout a
    `LlamaForCausalLM(quant=True)` expects: every projection kernel becomes
    kernel_q (int8, per-out-channel symmetric) + kernel_scale (fp32); norms
    and the embedding table pass through. jnp math — jit-safe, and safe to
    run layer-by-layer upstream if both trees cannot coexist in HBM."""
    from ..ops.quant import quantize_params_like

    model = LlamaForCausalLM(config, dtype=dtype, quant=True)
    target = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32)))["params"]
    return quantize_params_like(target, params)
