"""int8 (W8A8) Llama decoder serving path.

Greedy decode at 7B is weight-read-bound (ROUND_NOTES r4: 51.7 tok/s x
14.1 GB bf16 ≈ the v5e HBM roofline) and bf16 params leave no room for
batch > 1 on a 16 GB chip — int8 weights halve both. These tests pin the
quantized path's numerics and layout at tiny config:

- quantize_llama_params produces the exact param layout the quant=True
  model expects (kernel_q int8 + kernel_scale fp32 per projection, embed
  and norms passed through);
- int8 logits track the float model closely (per-channel symmetric weight
  quant + per-token dynamic activation quant);
- greedy_generate under quant is batch-invariant (per-token activation
  scales are per-row reductions, the int8 dot is exact int32), so batched
  captioning == sequential captioning, same as the bf16 path;
- the LlavaCaptioner quant="int8" constructor converts a float tree once
  and leaves a pre-quantized tree untouched.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.core import LlamaConfig
from consistentid_tpu.models.llama import (LlamaForCausalLM, greedy_generate,
                                           quantize_llama_params)

TINY = LlamaConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                   num_layers=2, num_heads=4, num_kv_heads=2,
                   max_position_embeddings=64)


@pytest.fixture(scope="module")
def float_params():
    model = LlamaForCausalLM(TINY)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4), jnp.int32))["params"]


@pytest.fixture(scope="module")
def int8_params(float_params):
    return quantize_llama_params(TINY, float_params)


def test_quantized_layout(float_params, int8_params):
    attn = int8_params["layers_0"]["self_attn"]
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        assert attn[proj]["kernel_q"].dtype == jnp.int8
        assert attn[proj]["kernel_scale"].dtype == jnp.float32
        assert attn[proj]["kernel_scale"].shape == \
            (attn[proj]["kernel_q"].shape[1],)
        assert "kernel" not in attn[proj]
    mlp = int8_params["layers_0"]["mlp"]
    assert set(mlp) == {"gate_proj", "up_proj", "down_proj"}
    assert int8_params["lm_head"]["kernel_q"].dtype == jnp.int8
    # embed + norms pass through unchanged
    np.testing.assert_array_equal(
        int8_params["embed_tokens"]["embedding"],
        float_params["embed_tokens"]["embedding"])
    np.testing.assert_array_equal(
        int8_params["norm"]["weight"], float_params["norm"]["weight"])


def test_int8_logits_track_float(float_params, int8_params):
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 3,
                             TINY.vocab_size)
    want, _ = LlamaForCausalLM(TINY).apply({"params": float_params}, ids)
    got, _ = LlamaForCausalLM(TINY, quant=True).apply(
        {"params": int8_params}, ids)
    want = np.asarray(want, np.float32).reshape(-1, TINY.vocab_size)
    got = np.asarray(got, np.float32).reshape(-1, TINY.vocab_size)
    cos = np.sum(want * got, -1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.995, cos.min()


def test_int8_greedy_batched_equals_sequential(int8_params):
    model = LlamaForCausalLM(TINY, quant=True)
    prompts = jax.random.randint(jax.random.PRNGKey(2), (3, 7), 3,
                                 TINY.vocab_size)
    batched = greedy_generate(model, {"params": int8_params}, prompts,
                              max_new_tokens=6, eos_token_id=2)
    for i in range(prompts.shape[0]):
        single = greedy_generate(model, {"params": int8_params},
                                 prompts[i:i + 1], max_new_tokens=6,
                                 eos_token_id=2)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(single[0]))


def test_captioner_quant_conversion(float_params):
    from consistentid_tpu.conditioning.captioner import LlavaCaptioner
    from consistentid_tpu.core.config import CLIPVisionConfig, LlavaConfig
    from consistentid_tpu.models.llava import random_llava_params

    from test_llava_captioner import FakeLlamaTokenizer

    cfg = LlavaConfig(
        vision=CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=24,
                                intermediate_size=48, num_layers=2,
                                num_heads=2, hidden_act="quick_gelu"),
        text=TINY, image_token_id=63)
    params = random_llava_params(jax.random.PRNGKey(0), cfg)
    cap = LlavaCaptioner(params, FakeLlamaTokenizer(), config=cfg,
                         max_new_tokens=4, dtype=jnp.float32, quant="int8")
    q = cap.params["llama"]["layers_0"]["self_attn"]["q_proj"]
    assert q["kernel_q"].dtype == jnp.int8
    # pre-quantized trees pass through (no double-quant attempt on a tree
    # with no float kernels)
    cap2 = LlavaCaptioner(cap.params, FakeLlamaTokenizer(), config=cfg,
                          max_new_tokens=4, dtype=jnp.float32, quant="int8")
    assert cap2.params is cap.params
    # and the quant captioner actually decodes
    from PIL import Image
    img = Image.fromarray(
        (np.random.RandomState(0).rand(30, 30, 3) * 255).astype(np.uint8))
    caption = cap.generate(img, "describe")
    assert isinstance(caption, str)


def test_unknown_quant_mode_rejected(float_params):
    from consistentid_tpu.conditioning.captioner import LlavaCaptioner

    with pytest.raises(ValueError):
        LlavaCaptioner({"llama": float_params}, object(), quant="int4")


def test_kv_quant_prefill_tracks_float_cache(float_params):
    """int8 KV cache (QuantLayerKV): prefill logits flow through the
    quantized cache (write int8 -> dequant read), so they must track the
    float-cache model closely; per-(batch,head,position) scales keep the
    error at int8-rounding level."""
    from consistentid_tpu.models.llama import QuantLayerKV, init_cache

    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 9), 3,
                             TINY.vocab_size)
    cache_f = init_cache(TINY, 2, 9)
    cache_q = init_cache(TINY, 2, 9, kv_quant=True)
    assert isinstance(cache_q[0], QuantLayerKV)
    assert cache_q[0].k.dtype == jnp.int8

    want, _ = LlamaForCausalLM(TINY).apply(
        {"params": float_params}, ids, cache=cache_f, attn_len=9)
    got, new_cache = LlamaForCausalLM(TINY, kv_quant=True).apply(
        {"params": float_params}, ids, cache=cache_q, attn_len=9)
    want = np.asarray(want, np.float32).reshape(-1, TINY.vocab_size)
    got = np.asarray(got, np.float32).reshape(-1, TINY.vocab_size)
    cos = np.sum(want * got, -1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.995, cos.min()
    # written slots are quantized, untouched slots stay zero
    assert np.abs(np.asarray(new_cache[0].k, np.int32)).max() > 0


def test_kv_quant_greedy_batched_equals_sequential(float_params):
    """Per-row KV scales -> batching never changes a row's decode."""
    model = LlamaForCausalLM(TINY, kv_quant=True)
    prompts = jax.random.randint(jax.random.PRNGKey(6), (3, 7), 3,
                                 TINY.vocab_size)
    batched = greedy_generate(model, {"params": float_params}, prompts,
                              max_new_tokens=6, eos_token_id=2)
    for i in range(prompts.shape[0]):
        single = greedy_generate(model, {"params": float_params},
                                 prompts[i:i + 1], max_new_tokens=6,
                                 eos_token_id=2)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(single[0]))


def test_kv_quant_composes_with_int8_weights(int8_params):
    """W8A8 weights + int8 KV together (the max-batch captioning config)."""
    model = LlamaForCausalLM(TINY, quant=True, kv_quant=True)
    prompts = jax.random.randint(jax.random.PRNGKey(7), (2, 5), 3,
                                 TINY.vocab_size)
    out = greedy_generate(model, {"params": int8_params}, prompts,
                          max_new_tokens=5, eos_token_id=2)
    arr = np.asarray(out)
    assert arr.shape == (2, 5)
    assert (arr >= 0).all() and (arr < TINY.vocab_size).all()
