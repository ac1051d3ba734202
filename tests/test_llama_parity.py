"""True HF parity for the Llama decoder + LLaVA splice: transformers'
LlamaForCausalLM / LlavaForConditionalGeneration (random init, real HF key
naming) vs the flax models, through the real converters.

The reference captions FGID with llava-v1.5-7b (data/FGID_caption.py:20);
these tests pin every layer of our TPU re-implementation to HF numerics at
tiny config so a transposed kernel, a wrong RoPE convention, or a GQA
repeat bug fails here instead of silently degrading captions.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.core import LlamaConfig, LlavaConfig
from consistentid_tpu.core.config import CLIPVisionConfig
from consistentid_tpu.io import convert
from consistentid_tpu.io.convert_backbones import llama_from_hf, llava_from_hf
from consistentid_tpu.models.llama import (LlamaForCausalLM, greedy_generate,
                                           init_cache)
from consistentid_tpu.models.llava import LlavaModel, make_caption_fn

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = LlamaConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                   num_layers=2, num_heads=4, num_kv_heads=2,
                   max_position_embeddings=64)


def _tiny_hf_llama(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        rms_norm_eps=TINY.rms_norm_eps, rope_theta=TINY.rope_theta,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(hf_cfg).eval()


def _params(hf):
    return {"params": llama_from_hf(
        convert.torch_state_dict_to_numpy(hf.state_dict()), TINY)}


def test_llama_forward_parity_hf():
    hf = _tiny_hf_llama()
    ids = torch.randint(3, TINY.vocab_size, (2, 11),
                        generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    model = LlamaForCausalLM(TINY)
    got, _ = model.apply(_params(hf), jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_llama_cache_decode_matches_full_forward():
    """Prefill + one-token decode steps == one full-sequence forward."""
    hf = _tiny_hf_llama(3)
    model = LlamaForCausalLM(TINY)
    params = _params(hf)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, TINY.vocab_size, (2, 9)))

    full, _ = model.apply(params, ids)

    cache = init_cache(TINY, 2, 9)
    pre, cache = model.apply(params, ids[:, :5], cache=cache,
                             cache_index=0, attn_len=5)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :5]),
                               atol=1e-5)
    for i in range(5, 9):
        step, cache = model.apply(params, ids[:, i:i + 1], cache=cache,
                                  cache_index=i, attn_len=9)
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full[:, i]), atol=1e-5)


def test_llama_greedy_decode_parity_hf():
    hf = _tiny_hf_llama(7)
    ids = torch.randint(3, TINY.vocab_size, (1, 6),
                        generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        hf_out = hf.generate(ids, max_new_tokens=10, do_sample=False,
                             eos_token_id=2, pad_token_id=0)
    want = hf_out[0, 6:].numpy()

    model = LlamaForCausalLM(TINY)
    got = np.asarray(greedy_generate(
        model, _params(hf), jnp.asarray(ids.numpy()), max_new_tokens=10,
        eos_token_id=2, pad_token_id=0))[0]
    np.testing.assert_array_equal(got[:len(want)], want)
    # anything after an HF early stop must be padding
    assert (got[len(want):] == 0).all()


def test_llama_greedy_eos_padding():
    """Rows that hit EOS keep emitting pad while others continue."""
    hf = _tiny_hf_llama(11)
    model = LlamaForCausalLM(TINY)
    params = _params(hf)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(3, TINY.vocab_size, (3, 5)))
    out = np.asarray(greedy_generate(model, params, ids, max_new_tokens=12,
                                     eos_token_id=2, pad_token_id=0))
    for row in out:
        eos = np.where(row == 2)[0]
        if eos.size:
            assert (row[eos[0] + 1:] == 0).all()
            assert (row[:eos[0]] != 0).all() or eos[0] == 0


TINY_LLAVA = LlavaConfig(
    vision=CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=24,
                            intermediate_size=48, num_layers=2, num_heads=2,
                            hidden_act="quick_gelu"),
    text=TINY, image_token_id=98)


def _tiny_hf_llava(seed=0):
    v = TINY_LLAVA.vision
    hf_cfg = transformers.LlavaConfig(
        vision_config=transformers.CLIPVisionConfig(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
            num_hidden_layers=v.num_layers, num_attention_heads=v.num_heads,
            hidden_act="quick_gelu"),
        text_config=transformers.LlamaConfig(
            vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
            intermediate_size=TINY.intermediate_size,
            num_hidden_layers=TINY.num_layers,
            num_attention_heads=TINY.num_heads,
            num_key_value_heads=TINY.num_kv_heads,
            max_position_embeddings=TINY.max_position_embeddings,
            rms_norm_eps=TINY.rms_norm_eps, rope_theta=TINY.rope_theta,
            tie_word_embeddings=False, attention_bias=False, mlp_bias=False),
        image_token_index=TINY_LLAVA.image_token_id,
        vision_feature_layer=-2, vision_feature_select_strategy="default")
    torch.manual_seed(seed)
    return transformers.LlavaForConditionalGeneration(hf_cfg).eval()


def test_llava_splice_forward_parity_hf():
    """Our [pre, image, post] embedding splice == HF's placeholder scatter."""
    hf = _tiny_hf_llava()
    n_img = TINY_LLAVA.num_image_tokens  # 4 patches at 28/14
    g = torch.Generator().manual_seed(5)
    pre = torch.randint(3, 90, (1, 3), generator=g)
    post = torch.randint(3, 90, (1, 4), generator=g)
    img_slot = torch.full((1, n_img), TINY_LLAVA.image_token_id)
    ids = torch.cat([pre, img_slot, post], dim=1)
    pixels = torch.randn(1, 3, 28, 28, generator=g)
    with torch.no_grad():
        want = hf(input_ids=ids, pixel_values=pixels).logits.numpy()

    params = llava_from_hf(
        convert.torch_state_dict_to_numpy(hf.state_dict()), TINY_LLAVA)
    llava = LlavaModel(TINY_LLAVA)
    llama = LlamaForCausalLM(TINY)
    feats = llava.apply({"params": params["mm"]},
                        jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1)))
    embed = lambda t: llama.apply({"params": params["llama"]},
                                  jnp.asarray(t.numpy()),
                                  method=llama.embed_tokens)
    prompt_embeds = jnp.concatenate([embed(pre), feats, embed(post)], axis=1)
    got, _ = llama.apply({"params": params["llama"]},
                         inputs_embeds=prompt_embeds)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_llava_caption_fn_matches_hf_generate():
    hf = _tiny_hf_llava(9)
    n_img = TINY_LLAVA.num_image_tokens
    g = torch.Generator().manual_seed(6)
    pre = torch.randint(3, 90, (1, 2), generator=g)
    post = torch.randint(3, 90, (1, 3), generator=g)
    ids = torch.cat([pre, torch.full((1, n_img), 98), post], dim=1)
    pixels = torch.randn(1, 3, 28, 28, generator=g)
    with torch.no_grad():
        hf_out = hf.generate(input_ids=ids, pixel_values=pixels,
                             max_new_tokens=6, do_sample=False,
                             eos_token_id=2, pad_token_id=0)
    want = hf_out[0, ids.shape[1]:].numpy()

    params = llava_from_hf(
        convert.torch_state_dict_to_numpy(hf.state_dict()), TINY_LLAVA)
    fn = make_caption_fn(TINY_LLAVA, max_new_tokens=6, eos_token_id=2)
    got = np.asarray(fn(params,
                        jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(pre.numpy()[0]),
                        jnp.asarray(post.numpy()[0])))[0]
    np.testing.assert_array_equal(got[:len(want)], want)
    assert (got[len(want):] == 0).all()
