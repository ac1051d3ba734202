"""Property tests: our conditioning utilities vs the reference implementation
(imported read-only) across randomized captions / parsing-mask subsets —
SURVEY.md §7.4 item 4 (the caption-marker state machine must match exactly)."""
import random

import numpy as np
import pytest

from consistentid_tpu.conditioning import (SimpleTokenizer,
                                           extract_first_sentence,
                                           masks_for_unique_values,
                                           prepare_trigger_token_idx,
                                           process_text_with_markers,
                                           remove_duplicate_keywords,
                                           tokenize_and_mask_trigger_ends)
from tests.reference_import import import_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


REGIONS = ["Face", "Left_Ear", "Right_Ear", "Left_Eye", "Right_Eye", "Nose",
           "Upper_Lip", "Lower_Lip", "Hair", "WithoutBackground"]
WORDS = ["a", "man", "with", "strong", "face", "wearing", "hat", "his",
         "eyes", "are", "blue", "nose", "is", "sharp", "mouth", "smiling",
         "ears", "small", "the", "portrait", "photo", "of"]
PUNCT = [",", ".", ";", ""]


def random_caption(rng, n_clauses=4):
    parts = []
    for _ in range(n_clauses):
        clause = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 8)))
        parts.append(clause + rng.choice(PUNCT))
    return " ".join(parts)


def test_extract_first_sentence_parity():
    ref = import_reference("functions")
    for text in ["Hello world. Second.", "no dot here", "  lead. trail "]:
        assert extract_first_sentence(text) == ref.extract_first_sentence(text)


def test_remove_duplicate_keywords_parity():
    ref = import_reference("functions")
    rng = random.Random(0)
    for _ in range(50):
        text = random_caption(rng)
        keywords = ["face", "ears", "eyes", "nose", "mouth"]
        assert remove_duplicate_keywords(text, keywords) == \
            ref.remove_duplicate_keywords(text, keywords)


def test_process_text_with_markers_parity():
    ref = import_reference("functions")
    rng = random.Random(1)
    for trial in range(100):
        text = random_caption(rng)
        present = [r for r in REGIONS if rng.random() < 0.6]
        ours_masks = {r: f"mask_{r}" for r in present}
        ref_masks = {r: f"mask_{r}" for r in present}
        ours_text, ours_out = process_text_with_markers(text, ours_masks)
        ref_text, ref_out = ref.process_text_with_markers(text, ref_masks)
        assert ours_text == ref_text, (trial, text)
        assert list(ours_out.items()) == list(ref_out.items()), (trial, text)


def test_tokenize_and_mask_parity():
    ref = import_reference("functions")
    tok = SimpleTokenizer()
    tok.add_tokens(["<|image|>", "<|facial|>"])
    img_id = tok.convert_tokens_to_ids("<|image|>")
    fac_id = tok.convert_tokens_to_ids("<|facial|>")
    rng = random.Random(2)
    for _ in range(30):
        words = [rng.choice(WORDS) for _ in range(rng.randint(3, 90))]
        for _ in range(rng.randint(0, 5)):
            words.insert(rng.randrange(1, len(words)), "<|facial|>")
        if rng.random() < 0.5:
            words.insert(rng.randrange(1, len(words)), "<|image|>")
        text = " ".join(words)
        ids, img, fac = tokenize_and_mask_trigger_ends(text, img_id, fac_id, tok)
        r_ids, r_img, r_fac = ref.tokenize_and_mask_noun_phrases_ends(
            text, img_id, fac_id, tok)
        np.testing.assert_array_equal(ids, r_ids.numpy())
        np.testing.assert_array_equal(img, r_img.numpy())
        np.testing.assert_array_equal(fac, r_fac.numpy())

        o = prepare_trigger_token_idx(img, fac)
        import torch
        r = ref.prepare_image_token_idx(torch.from_numpy(img),
                                        torch.from_numpy(fac))
        for ours, theirs in zip(o, r):
            np.testing.assert_array_equal(ours, theirs.numpy())


def test_masks_for_unique_values_parity():
    ref = import_reference("functions")
    rng = np.random.RandomState(3)
    # blocky label map with a few regions
    arr = np.zeros((64, 64), np.uint8)
    arr[5:20, 5:30] = 1      # Face
    arr[8:12, 10:14] = 4     # Left_Eye
    arr[30:40, 30:50] = 10   # Nose
    arr[50:60, 5:15] = 99    # unknown value -> skipped
    ours = masks_for_unique_values(arr)
    theirs = ref.masks_for_unique_values(arr)
    assert set(ours.keys()) == set(theirs.keys())
    for k in ours:
        np.testing.assert_array_equal(np.array(ours[k]), np.array(theirs[k]))
