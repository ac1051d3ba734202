"""In-repo CLIP BPE tokenizer parity vs transformers.CLIPTokenizer.

A synthetic-but-valid vocab (full byte alphabet + targeted merges) is
written to disk and loaded by BOTH tokenizers, so the comparison covers the
whole algorithm: cleaning, the split regex, byte-encoding, merge order,
specials, padding ids and `<|facial|>`/`<|image|>` added-token handling —
the exact-token-index contract the fuse scatter depends on (reference
pipline_StableDiffusion_ConsistentID.py:148-150,341)."""
import json

import numpy as np
import pytest

from consistentid_tpu.conditioning.clip_tokenizer import (CLIPBPETokenizer,
                                                          bytes_to_unicode)

transformers = pytest.importorskip("transformers")

MERGES = [
    "t h", "i n", "a n", "o n", "r e", "e r", "o u", "e y", "e s</w>",
    "th e</w>", "an d</w>", "o f</w>", "f a", "c e</w>", "fa ce</w>",
    "e y es</w>", "ey es</w>", "n o", "s e</w>", "no se</w>",
    "m ou", "mou th</w>", "th</w>",
    "e a", "ea r", "ear s</w>", "m an</w>", "w i", "wi th</w>",
    "p h", "ph o", "pho t", "phot o</w>", "h a", "ha i", "hai r</w>",
    "s t", "st r", "o ng</w>", "n g</w>", "r o", "ro ng</w>",
    "st rong</w>", "b l", "u e</w>", "bl ue</w>", "a</w> .",
]

CORPUS = [
    "a photo of a man with a strong face and blue eyes",
    "The man has a wide nose, thin mouth, and big ears.",
    "portrait <|facial|> detail of nose <|facial|> and mouth",
    "face<|facial|>, eyes <|image|> photo",
    "  messy   WHITESPACE\tand CASE  ",
    "hyphen-ated word's contraction'll edge 7 cases 42!",
    "<|facial|><|facial|> adjacent markers",
    "trailing marker <|facial|>",
    "<|image|> leading marker",
    "unicode café naïve — dash",
    "",
    ".",
]


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_tok")
    syms = list(bytes_to_unicode().values())
    tokens = syms + [s + "</w>" for s in syms]
    for m in MERGES:
        tokens.append("".join(m.split()))
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(MERGES),
                                  encoding="utf-8")
    return str(d / "vocab.json"), str(d / "merges.txt"), str(d)


@pytest.fixture(scope="module")
def pair(tok_files):
    vocab_file, merges_file, d = tok_files
    hf = transformers.CLIPTokenizer(vocab_file, merges_file,
                                    model_max_length=77)
    hf.add_tokens(["<|image|>", "<|facial|>"])
    ours = CLIPBPETokenizer.from_pretrained(d)
    ours.add_tokens(["<|image|>", "<|facial|>"])
    return hf, ours


@pytest.mark.parametrize("text", CORPUS)
def test_encode_parity(pair, text):
    hf, ours = pair
    assert ours.encode(text) == hf.encode(text), text


def test_specials_and_padding_ids(pair):
    hf, ours = pair
    assert ours.bos_token_id == hf.bos_token_id
    assert ours.eos_token_id == hf.eos_token_id
    assert ours.pad_token_id == hf.pad_token_id
    assert ours.model_max_length == 77
    assert ours.convert_tokens_to_ids("<|facial|>") == \
        hf.convert_tokens_to_ids("<|facial|>")
    assert ours.convert_tokens_to_ids("<|image|>") == \
        hf.convert_tokens_to_ids("<|image|>")


def test_decode_roundtrip(pair):
    _, ours = pair
    text = "a photo of a man with a strong face <|facial|> and blue eyes"
    ids = ours.encode(text)
    out = ours.decode(ids, skip_special_tokens=True)
    assert out == text.lower()


def test_marker_mask_pipeline_contract(pair):
    """tokenize_and_mask consumes this tokenizer: marker positions found by
    id must point at the token PRECEDING each trigger (the fuse contract)."""
    hf, ours = pair
    from consistentid_tpu.conditioning import tokenize_and_mask_trigger_ends

    text = "a face <|facial|> with a nose <|facial|> and mouth"

    def run(tok):
        return tokenize_and_mask_trigger_ends(
            text, tok.convert_tokens_to_ids("<|image|>"),
            tok.convert_tokens_to_ids("<|facial|>"), tok)

    clean_ours, img_ours, fac_ours = run(ours)
    clean_hf, img_hf, fac_hf = run(hf)
    np.testing.assert_array_equal(clean_ours, clean_hf)
    np.testing.assert_array_equal(img_ours, img_hf)
    np.testing.assert_array_equal(fac_ours, fac_hf)
    assert fac_ours.sum() == 2


def test_call_interface_padding(pair):
    _, ours = pair
    out = ours("a face", max_length=16, padding="max_length",
               truncation=True, return_tensors="np")
    ids = out["input_ids"]
    assert ids.shape == (1, 16)
    assert ids[0, 0] == ours.bos_token_id
    assert (ids[0] == ours.pad_token_id).sum() >= 1


# -- SDXL tokenizer_2 pad semantics (VERDICT r2 item 2) ----------------------
# HF SDXL dumps declare pad_token "!" (id 0) for tokenizer_2 (OpenCLIP bigG)
# in tokenizer_config.json, unlike tokenizer's eos padding. The marker-index
# contract on the 2048-d path runs through these padded ids
# (reference pipline_StableDiffusionXL_ConsistentID.py:378-385).

@pytest.fixture(scope="module")
def pair2(tok_files, tmp_path_factory):
    import shutil

    vocab_file, merges_file, d = tok_files
    d2 = tmp_path_factory.mktemp("clip_tok2")
    shutil.copy(vocab_file, d2 / "vocab.json")
    shutil.copy(merges_file, d2 / "merges.txt")
    (d2 / "tokenizer_config.json").write_text(
        json.dumps({"pad_token": "!", "model_max_length": 77}),
        encoding="utf-8")
    hf = transformers.CLIPTokenizer(vocab_file, merges_file,
                                    model_max_length=77, pad_token="!")
    hf.add_tokens(["<|image|>", "<|facial|>"])
    ours = CLIPBPETokenizer.from_pretrained(str(d2))
    ours.add_tokens(["<|image|>", "<|facial|>"])
    return hf, ours


def test_tokenizer2_pad_token_from_config(pair2):
    hf, ours = pair2
    assert ours.pad_token_id == hf.pad_token_id
    assert ours.pad_token_id != ours.eos_token_id  # "!" padding, not eos


@pytest.mark.parametrize("text", CORPUS)
def test_tokenizer2_padded_parity(pair2, text):
    hf, ours = pair2
    theirs = hf(text, max_length=77, padding="max_length", truncation=True,
                return_tensors="np")["input_ids"][0].tolist()
    mine = ours(text, max_length=77, padding="max_length", truncation=True,
                return_tensors="np")["input_ids"][0].tolist()
    assert mine == theirs, text


def test_tokenizer2_marker_contract_with_pad(pair2):
    """The SDXL clean_ids2 path (tokenize_and_mask_trigger_ends with
    tokenizer_2) must agree with transformers including the "!"-padded
    tail, so facial_idx gathered on the 2048-d stream stays aligned."""
    from consistentid_tpu.conditioning import tokenize_and_mask_trigger_ends

    hf, ours = pair2
    text = "a face <|facial|> with a nose <|facial|> and mouth"

    def run(tok):
        return tokenize_and_mask_trigger_ends(
            text, tok.convert_tokens_to_ids("<|image|>"),
            tok.convert_tokens_to_ids("<|facial|>"), tok)

    clean_ours, img_ours, fac_ours = run(ours)
    clean_hf, img_hf, fac_hf = run(hf)
    np.testing.assert_array_equal(clean_ours, clean_hf)
    np.testing.assert_array_equal(fac_ours, fac_hf)
    # the padded tail really is "!" ids, not eos
    assert clean_ours[0, -1] == ours.pad_token_id
