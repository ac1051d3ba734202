"""Precomputed frozen-encoder conditioning ("latent/feature caching").

The SD1.5 train step spends a measured ~28% of its device time (0.16 s of
0.59 s at 512px batch 8, round-5 profile) re-running FROZEN encoders every
step: VAE encode of the target image, ViT-H over the face + 5 region
crops, CLIP-text over the caption. None of that depends on the trainable
adapters, so it is corpus-constant — this module runs those encoders ONCE
over the FGID dataset and trains from the cached tensors
(training.train_step.consistentid_loss_encoded), the standard production
recipe for frozen-backbone diffusion finetunes.

Exactness: the VAE posterior MOMENTS (mean, logvar) are cached, not a
sample — the encoded loss re-samples per step exactly as
AutoencoderKL.encode does, so losses are bitwise-identical to the pixel
path given the same rng (pinned by tests/test_precompute.py). CFG dropout
(reference utils.py:111-118) moves into EncodedFGIDDataset: the 10%
text-drop / 10% text+image-drop branches swap in precomputed
null-conditioning tensors (empty-caption text embeds, zero-image ViT
features) — the same tensors the pixel path would have produced.

Storage: float tensors are stored as bf16 bit patterns in uint16 (exact
for the bf16 compute dtype, half the fp32 bytes); binary masks as uint8.
~2 MB/sample at SD1.5 shapes (dominated by the 6 ViT-H feature maps).
A side win: the encoded input pipeline does no JPEG decode / cv2
contours / CLIP preprocessing, multiplying host examples/s per core.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.vae import AutoencoderKL
from .dataset import FGIDDataset

_BF16_KEYS = ("latent_mean", "latent_logvar", "face_embeds",
              "region_embeds", "prompt_embeds")
_MASK_KEYS = ("region_masks", "bg_masks")


def pack_float(x) -> np.ndarray:
    """Encoder output -> storage array, EXACT for the graph's dtype:
    bf16 tensors become their uint16 bit patterns (half the fp32 bytes);
    fp32 tensors (e.g. tiny test bundles) are stored as fp32 unchanged —
    so the cached tensors round-trip bitwise whatever the compute dtype."""
    x = np.asarray(x)
    if x.dtype == jnp.bfloat16:
        return x.view(np.uint16)
    return x.astype(np.float32)


def unpack_float(u: np.ndarray) -> np.ndarray:
    """Inverse of pack_float -> float32 (exact: bf16 values are a subset
    of fp32)."""
    if u.dtype == np.uint16:
        return (u.astype(np.uint32) << 16).view(np.float32)
    return np.asarray(u, np.float32)


def precompute_conditioning(bundle, params: Dict, dataset: FGIDDataset,
                            out_dir: str, batch_size: int = 8,
                            progress: bool = True) -> str:
    """Run the frozen encoders over `dataset` once; write one .npz per
    sample plus shared null-conditioning tensors and a manifest JSON.
    Returns the manifest path (feed to EncodedFGIDDataset)."""
    os.makedirs(os.path.join(out_dir, "enc"), exist_ok=True)

    @jax.jit
    def encode_batch(p, images, face_pixels, region_pixels, clean_ids):
        mean, logvar = bundle.vae.apply(
            {"params": p["vae"]}, images, method=AutoencoderKL.encode_moments)
        b = images.shape[0]
        s = bundle.vision_config.image_size
        vit_in = jnp.concatenate(
            [face_pixels, region_pixels.reshape(-1, s, s, 3)], axis=0)
        _, penult = bundle.image_encoder.apply(
            {"params": p["image_encoder"]}, vit_in)
        face = penult[:b]
        regions = penult[b:].reshape(b, region_pixels.shape[1],
                                     *penult.shape[1:])
        prompt, _ = bundle.text_encoder.apply(
            {"params": p["text_encoder"]}, clean_ids)
        return mean, logvar, face, regions, prompt

    # per-sample content must be dropout-free (dropout is re-applied at
    # train time from the cached null tensors)
    saved = (dataset.text_drop_prob, dataset.image_drop_prob)
    dataset.text_drop_prob = dataset.image_drop_prob = 0.0
    try:
        samples = []
        n = len(dataset)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            examples = [dataset[i] for i in idxs]
            pad = batch_size - len(examples)
            stacked = {k: np.stack([e[k] for e in examples]
                                   + [examples[-1][k]] * pad)
                       for k in examples[0]}
            mean, logvar, face, regions, prompt = encode_batch(
                params, jnp.asarray(stacked["images"]),
                jnp.asarray(stacked["face_pixels"]),
                jnp.asarray(stacked["region_pixels"]),
                jnp.asarray(stacked["clean_ids"]))
            mean, logvar, face, regions, prompt = (
                np.asarray(t) for t in (mean, logvar, face, regions, prompt))
            for j, (i, ex) in enumerate(zip(idxs, examples)):
                rel = os.path.join("enc", f"{i:08d}.npz")
                np.savez_compressed(
                    os.path.join(out_dir, rel),
                    latent_mean=pack_float(mean[j]),
                    latent_logvar=pack_float(logvar[j]),
                    face_embeds=pack_float(face[j]),
                    region_embeds=pack_float(regions[j]),
                    prompt_embeds=pack_float(prompt[j]),
                    faceid_embeds=ex["faceid_embeds"].astype(np.float32),
                    facial_idx=ex["facial_idx"].astype(np.int32),
                    facial_idx_mask=ex["facial_idx_mask"].astype(bool),
                    region_masks=(ex["region_masks"] > 0.5).astype(np.uint8),
                    bg_masks=(ex["bg_masks"] > 0.5).astype(np.uint8))
                samples.append(rel)
            if progress:
                print(f"precompute {min(start + batch_size, n)}/{n}",
                      flush=True)

        # shared null-conditioning: empty caption + zero image (exactly the
        # tensors the pixel path produces when the CFG dropout branches
        # fire, reference utils.py:111-118)
        from ..conditioning import (prepare_trigger_token_idx,
                                    tokenize_and_mask_trigger_ends)
        tok = dataset.tokenizer
        null_ids, img_mask, fac_mask = tokenize_and_mask_trigger_ends(
            "", None, dataset.facial_token_id, tok)
        _, _, null_idx, null_idx_mask = prepare_trigger_token_idx(
            img_mask, fac_mask, 1, dataset.max_num_facials)
        zero_img = np.zeros((batch_size, dataset.clip_size,
                             dataset.clip_size, 3), np.float32)
        dummy = dataset[0]
        _, _, null_face, _, null_prompt = encode_batch(
            params, jnp.asarray(np.stack([dummy["images"]] * batch_size)),
            jnp.asarray(zero_img),
            jnp.asarray(np.stack([dummy["region_pixels"]] * batch_size)),
            jnp.asarray(np.stack([null_ids[0].astype(np.int32)]
                                 * batch_size)))
        np.savez_compressed(
            os.path.join(out_dir, "shared.npz"),
            null_face_embeds=pack_float(np.asarray(null_face)[0]),
            null_prompt_embeds=pack_float(np.asarray(null_prompt)[0]),
            null_facial_idx=np.asarray(null_idx[0], np.int32),
            null_facial_idx_mask=np.asarray(null_idx_mask[0], bool))
    finally:
        dataset.text_drop_prob, dataset.image_drop_prob = saved

    manifest = {"format": "consistentid-encoded-v1", "samples": samples,
                "shared": "shared.npz"}
    path = os.path.join(out_dir, "encoded_manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f)
    return path


class EncodedFGIDDataset(FGIDDataset):
    """FGIDDataset twin over a precomputed directory: same batches() API
    (threaded workers included), emits the consistentid_loss_encoded batch
    schema. CFG dropout mirrors the pixel dataset's branch structure
    exactly (10% text-only, next 10% text+image, reference
    utils.py:111-118) using the cached null tensors."""

    def __init__(self, manifest_path: str, text_drop_prob: float = 0.1,
                 image_drop_prob: float = 0.1, seed: int = 0):
        import random
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("format") != "consistentid-encoded-v1":
            raise ValueError(f"{manifest_path} is not an encoded manifest")
        self.root = os.path.dirname(os.path.abspath(manifest_path))
        self.items = m["samples"]
        self.text_drop_prob = text_drop_prob
        self.image_drop_prob = image_drop_prob
        self.rng = random.Random(seed)
        with np.load(os.path.join(self.root, m["shared"])) as sh:
            self.null_face = unpack_float(sh["null_face_embeds"])
            self.null_prompt = unpack_float(sh["null_prompt_embeds"])
            self.null_idx = sh["null_facial_idx"]
            self.null_idx_mask = sh["null_facial_idx_mask"]

    def _load_item(self, i: int) -> Dict[str, np.ndarray]:
        with np.load(os.path.join(self.root, self.items[i])) as z:
            ex = {k: (unpack_float(z[k]) if k in _BF16_KEYS
                      else np.asarray(z[k])) for k in z.files}
        for k in _MASK_KEYS:
            ex[k] = ex[k].astype(np.float32)

        p = self.rng.random()
        if p < self.text_drop_prob * 2:       # text dropped either way
            ex["prompt_embeds"] = self.null_prompt
            ex["facial_idx"] = self.null_idx
            ex["facial_idx_mask"] = self.null_idx_mask
            if p >= self.text_drop_prob:      # second branch: image too
                ex["face_embeds"] = self.null_face
        return ex


def synthetic_encoded_batch(bundle, batch_size: int = 2,
                            latent_hw: int = 64, seed: int = 0,
                            max_num_facials: int = 5,
                            mask_hw: Optional[int] = None
                            ) -> Dict[str, np.ndarray]:
    """Random batch with the consistentid_loss_encoded schema at the
    bundle's real shapes (bench / tests)."""
    rng = np.random.RandomState(seed)
    v = bundle.vision_config
    t = bundle.text_config
    a = bundle.adapter_config
    n_tok = (v.image_size // v.patch_size) ** 2 + 1
    mask_hw = mask_hw or latent_hw * 8
    lat_c = bundle.vae_config.latent_channels
    f32 = lambda *s: rng.randn(*s).astype(np.float32) * 0.5
    idx = np.tile(np.array([[3, 7, 11, 0, 0]], np.int32)
                  [:, :max_num_facials], (batch_size, 1))
    return {
        "latent_mean": f32(batch_size, latent_hw, latent_hw, lat_c),
        "latent_logvar": f32(batch_size, latent_hw, latent_hw, lat_c),
        "face_embeds": f32(batch_size, n_tok, v.hidden_size),
        "region_embeds": f32(batch_size, max_num_facials, n_tok,
                             v.hidden_size),
        "prompt_embeds": f32(batch_size, t.max_position_embeddings,
                             t.hidden_size),
        "faceid_embeds": f32(batch_size, a.id_embeddings_dim),
        "facial_idx": idx,
        "facial_idx_mask": np.tile(
            np.array([[True, True, True, False, False]]
                     [0][:max_num_facials]), (batch_size, 1)),
        "region_masks": (rng.rand(batch_size, max_num_facials, mask_hw,
                                  mask_hw) > 0.5).astype(np.float32),
        "bg_masks": np.ones((batch_size, mask_hw, mask_hw), np.float32),
    }
