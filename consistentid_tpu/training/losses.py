"""Training losses: noise-prediction MSE with the random foreground-mask
branch, and the balanced-L1 facial attention-localization loss.

JAX re-expression of reference functions.py:205-324 + train.py:55-89.
The attention probabilities arrive as explicit UNet auxiliary outputs
(models.unet capture_layers) instead of the reference's monkey-patched
side-dict; note we capture attn2 (cross-attention) probs — the reference
accidentally captures attn1 (SURVEY.md §2.1 quirk, resolved to the intent).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


def balanced_l1_loss(attn_prob: jax.Array, segmaps: jax.Array,
                     normalize: bool = True) -> jax.Array:
    """attn_prob (B, H, Q, N), segmaps (B, 1|H, Q, N) in [0,1].

    Per (batch, head, token): mean prob over background minus over object
    (reference BalancedL1Loss, functions.py:301-324; training uses
    normalize=True, train.py:39)."""
    if normalize:
        attn_prob = attn_prob / (
            jnp.max(attn_prob, axis=2, keepdims=True) + 1e-5)
    background = 1.0 - segmaps
    bg_sum = background.sum(axis=2) + 1e-5
    obj_sum = segmaps.sum(axis=2) + 1e-5
    bg_loss = (attn_prob * background).sum(axis=2) / bg_sum
    obj_loss = (attn_prob * segmaps).sum(axis=2) / obj_sum
    return bg_loss - obj_loss                      # (B, H, N)


def localization_loss_for_layer(
    attn_prob: jax.Array,        # (B, H, Q, K_text) fp32 softmax probs
    segmaps: jax.Array,          # (B, N, Hm, Wm) region masks in [0,1]
    token_idx: jax.Array,        # (B, N) int positions into K_text
    token_idx_mask: jax.Array,   # (B, N) bool validity
    normalize: bool = True,
    pregathered: bool = False,
) -> jax.Array:
    """Reference get_object_localization_loss_for_one_layer
    (functions.py:205-244) with static shapes.

    pregathered=True: attn_prob is already the (B, H, Q, N) facial-token
    columns (UNet capture_cols gathered them inside the attention before
    sowing — 16x fewer capture bytes); skip the gather here. Exact same
    math: normalization happens after gathering on both paths."""
    b, h, q, _ = attn_prob.shape
    n = segmaps.shape[1]
    size = int(round(q ** 0.5))
    maps = jax.image.resize(segmaps.astype(jnp.float32),
                            (b, n, size, size), method="bilinear")
    maps = maps.reshape(b, 1, n, q).transpose(0, 1, 3, 2)      # (B,1,Q,N)

    if pregathered:
        assert attn_prob.shape[-1] == n, (attn_prob.shape, n)
        token_prob = attn_prob
    else:
        idx = jnp.broadcast_to(token_idx[:, None, None, :], (b, h, q, n))
        token_prob = jnp.take_along_axis(attn_prob, idx, axis=3)  # (B,H,Q,N)

    loss = balanced_l1_loss(token_prob, maps, normalize)       # (B,H,N)
    loss = loss * token_idx_mask[:, None, :].astype(loss.dtype)
    count = token_idx_mask.sum(axis=1).astype(loss.dtype)[:, None] + 1e-5
    return (loss.sum(axis=2) / count).mean()


def localization_loss(
    attn_probs: Sequence[jax.Array],
    segmaps: jax.Array,
    token_idx: jax.Array,
    token_idx_mask: jax.Array,
    normalize: bool = True,
    pregathered: bool = False,
) -> jax.Array:
    """Average over captured layers (reference functions.py:247-261)."""
    total = 0.0
    for p in attn_probs:
        total = total + localization_loss_for_layer(
            p.astype(jnp.float32), segmaps, token_idx, token_idx_mask,
            normalize, pregathered=pregathered)
    return total / max(len(attn_probs), 1)


def collect_attn_probs(intermediates: Dict) -> List[jax.Array]:
    """Flatten the sown 'attn_probs' tensors in deterministic path order."""
    flat = jax.tree_util.tree_leaves_with_path(intermediates)
    out = [(jax.tree_util.keystr(p), v) for p, v in flat]
    return [v for _, v in sorted(out, key=lambda kv: kv[0])]


def masked_mse(pred: jax.Array, target: jax.Array,
               mask: jax.Array | None = None) -> jax.Array:
    """fp32 mean-squared error; with mask, both sides are multiplied by it
    first (reference train.py:59-72 — the masked branch also masks the
    'predict' loss; background_loss is never added to the total, :269)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is not None:
        mask = mask.astype(jnp.float32)
        pred = pred * mask
        target = target * mask
    return jnp.mean((pred - target) ** 2)
