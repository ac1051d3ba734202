"""Identity / text-fidelity metrics for the FGIS benchmark.

The reference repo defines the evaluation *protocol* (15 identities x 45
prompts, evaluation/EvaluationIMGs_stars_prompts.csv) but ships no scoring
code (SURVEY.md §4). These are the paper's two headline metrics:
  - FaceSim: cosine similarity of ArcFace embeddings between the generated
    face and the reference face (models/arcface.py);
  - CLIP-T: CLIP similarity between the generated image and the prompt
    (CLIP vision pooled-projection x text pooled-projection).

Both run as jitted batched graphs on TPU.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def face_similarity(embed_a: np.ndarray, embed_b: np.ndarray) -> float:
    """Cosine similarity of two (1, 512) L2-normalizable embeddings."""
    a = np.asarray(embed_a, np.float32).reshape(-1)
    b = np.asarray(embed_b, np.float32).reshape(-1)
    denom = (np.linalg.norm(a) * np.linalg.norm(b)) or 1e-8
    return float(a @ b / denom)


class FaceSimScorer:
    """Scores generated images against a reference identity embedding."""

    def __init__(self, face_embedder: Callable):
        self.face_embedder = face_embedder

    def __call__(self, reference_image, generated_image) -> float:
        ref = self.face_embedder(reference_image)
        gen = self.face_embedder(generated_image)
        return face_similarity(ref, gen)


class CLIPTScorer:
    """CLIP-T: normalized text/image agreement via the CLIP towers.

    Uses pooled representations; with converted projection heads pass
    `text_projection`/`visual_projection` (D_text/D_vis -> shared dim).
    """

    def __init__(self, bundle, params, tokenizer,
                 text_projection: Optional[np.ndarray] = None,
                 visual_projection: Optional[np.ndarray] = None):
        self.bundle = bundle
        self.params = params
        self.tokenizer = tokenizer
        self.text_projection = text_projection
        self.visual_projection = visual_projection
        t_dim = bundle.text_config.hidden_size if text_projection is None \
            else np.asarray(text_projection).shape[1]
        v_dim = bundle.vision_config.hidden_size if visual_projection is None \
            else np.asarray(visual_projection).shape[1]
        if t_dim != v_dim:
            raise ValueError(
                f"CLIP-T needs a shared embedding space: text {t_dim} vs "
                f"vision {v_dim}; pass the CLIP text_projection / "
                "visual_projection weights")

        @jax.jit
        def score(text_ids, pixels):
            _, pooled_t = bundle.text_encoder.apply(
                {"params": params["text_encoder"]}, text_ids)
            pooled_v, _ = bundle.image_encoder.apply(
                {"params": params["image_encoder"]}, pixels)
            pooled_v = pooled_v[:, 0]    # cls token, post-layernorm
            if text_projection is not None:
                pooled_t = pooled_t @ jnp.asarray(text_projection)
            if visual_projection is not None:
                pooled_v = pooled_v @ jnp.asarray(visual_projection)
            t = pooled_t / jnp.linalg.norm(pooled_t, axis=-1, keepdims=True)
            v = pooled_v / jnp.linalg.norm(pooled_v, axis=-1, keepdims=True)
            return jnp.sum(t * v, axis=-1)

        self._score = score

    def __call__(self, prompt: str, image) -> float:
        from ..utils.image import clip_preprocess

        ids = list(self.tokenizer.encode(prompt))
        ids = ids[: self.tokenizer.model_max_length]
        ids += [self.tokenizer.pad_token_id] * (
            self.tokenizer.model_max_length - len(ids))
        pixels = clip_preprocess(image, self.bundle.vision_config.image_size)
        return float(self._score(jnp.asarray([ids], jnp.int32),
                                 jnp.asarray(pixels))[0])
