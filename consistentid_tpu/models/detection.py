"""Face-detection post-processing + alignment, TPU-native.

The reference delegates detection to insightface's SCRFD ONNX graph
(pipline_StableDiffusion_ConsistentID.py:63-64): anchor-center decode of
per-stride score/bbox/keypoint maps, score threshold, NMS, then 5-point
similarity alignment to the 112x112 ArcFace template before embedding.

SURVEY.md §7.4 item 2 flags the dynamic-shape anchor/NMS machinery as the
hard part of a TPU port. Here it is in fixed-shape form:
  - `decode_level`: distance-to-bbox/keypoint decode on dense anchor centers
    (2 anchors per position, strides 8/16/32 — SCRFD layout);
  - `topk_nms`: static top-K candidate selection + greedy IoU suppression as
    a lax.fori_loop over a (K, K) IoU matrix — one compiled graph, no
    data-dependent shapes;
  - `estimate_similarity` / `align_face`: Umeyama similarity transform to the
    ArcFace destination template + bilinear warp (pure jnp; works batched).

The SCRFD backbone itself converts from the ONNX pack via io/onnx_reader
(weights environment-dependent); these functions consume its raw head
outputs, so only backbone conversion remains when packs are available.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SCRFD_STRIDES = (8, 16, 32)
NUM_ANCHORS = 2

# ArcFace 112x112 5-point destination template (insightface convention):
# left eye, right eye, nose, left mouth corner, right mouth corner
ARCFACE_DST = np.array([
    [38.2946, 51.6963],
    [73.5318, 51.5014],
    [56.0252, 71.7366],
    [41.5493, 92.3655],
    [70.7299, 92.2041],
], np.float32)


def anchor_centers(height: int, width: int, stride: int,
                   num_anchors: int = NUM_ANCHORS) -> jnp.ndarray:
    """(H*W*A, 2) anchor center xy coordinates for one stride level."""
    ys = jnp.arange(height, dtype=jnp.float32) * stride
    xs = jnp.arange(width, dtype=jnp.float32) * stride
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H,W,2)
    centers = grid.reshape(-1, 2)
    return jnp.repeat(centers, num_anchors, axis=0)


def decode_level(scores: jax.Array, bbox_deltas: jax.Array,
                 kps_deltas: Optional[jax.Array], stride: int,
                 height: int, width: int):
    """Decode one stride level.

    scores (N,), bbox_deltas (N, 4) distances l/t/r/b in stride units,
    kps_deltas (N, 10) optional; N = H*W*num_anchors.
    Returns (scores (N,), boxes (N, 4) xyxy, kps (N, 5, 2) or None)."""
    centers = anchor_centers(height, width, stride)
    d = bbox_deltas * stride
    boxes = jnp.stack([
        centers[:, 0] - d[:, 0], centers[:, 1] - d[:, 1],
        centers[:, 0] + d[:, 2], centers[:, 1] + d[:, 3]], axis=-1)
    kps = None
    if kps_deltas is not None:
        k = kps_deltas.reshape(-1, 5, 2) * stride
        kps = centers[:, None, :] + k
    return scores, boxes, kps


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """(K, K) pairwise IoU."""
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("top_k",))
def topk_nms(scores: jax.Array, boxes: jax.Array,
             kps: Optional[jax.Array] = None, *, top_k: int = 128,
             score_thresh: float = 0.5, iou_thresh: float = 0.4):
    """Static-shape NMS: top-K by score, greedy suppression over the IoU
    matrix. Returns (keep_scores (K,), keep_boxes (K,4), keep_kps, valid (K,))
    where suppressed/below-threshold slots have valid=False."""
    k_scores, idx = jax.lax.top_k(scores, top_k)
    k_boxes = boxes[idx]
    k_kps = kps[idx] if kps is not None else None
    iou = _iou_matrix(k_boxes)
    candidate = k_scores >= score_thresh

    def body(i, keep):
        # slot i survives iff it's a candidate and no kept higher-score slot
        # overlaps it above the IoU threshold
        suppressed = jnp.any(keep & (jnp.arange(top_k) < i)
                             & (iou[i] > iou_thresh))
        return keep.at[i].set(candidate[i] & ~suppressed)

    keep = jax.lax.fori_loop(0, top_k, body, jnp.zeros(top_k, bool))
    return k_scores, k_boxes, k_kps, keep


def estimate_similarity(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Umeyama similarity transform (rotation+scale+translation) mapping
    src (N,2) -> dst (N,2); returns a (2,3) affine matrix."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / src.shape[0]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.array([1.0, 1.0]) * jnp.array([1.0, 0.0]) + \
        jnp.array([0.0, 1.0]) * d
    rot = u @ jnp.diag(diag) @ vt
    var_src = (src_c ** 2).sum() / src.shape[0]
    scale = (s * diag).sum() / jnp.maximum(var_src, 1e-9)
    t = dst_mean - scale * (rot @ src_mean)
    return jnp.concatenate([scale * rot, t[:, None]], axis=1)  # (2,3)


def warp_affine(image: jax.Array, matrix: jax.Array, out_h: int,
                out_w: int) -> jax.Array:
    """Bilinear inverse-warp of (H, W, C) by a (2,3) forward affine."""
    full = jnp.concatenate(
        [matrix, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    inv = jnp.linalg.inv(full)[:2]
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32),
                          indexing="ij")
    coords = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (h,w,3)
    src = coords @ inv.T                                       # (h,w,2) xy
    sx, sy = src[..., 0], src[..., 1]
    h, w = image.shape[:2]
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(sx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(sy - y0, 0.0, 1.0)[..., None]
    img = image.astype(jnp.float32)
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    out = top * (1 - wy) + bot * wy
    inside = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))
    return jnp.where(inside[..., None], out, 0.0)


def align_face(image: jax.Array, keypoints: jax.Array,
               size: int = 112) -> jax.Array:
    """5-point similarity alignment to the ArcFace template."""
    dst = jnp.asarray(ARCFACE_DST) * (size / 112.0)
    matrix = estimate_similarity(keypoints, dst)
    return warp_affine(image, matrix, size, size)


def detect_and_align(
    level_outputs: Dict[int, Tuple[jax.Array, jax.Array, jax.Array]],
    image: jax.Array,
    input_size: Tuple[int, int],
    top_k: int = 128,
    score_thresh: float = 0.5,
    iou_thresh: float = 0.4,
):
    """Full post-processing: decode all stride levels, NMS, align the
    best-scoring face. level_outputs: {stride: (scores, bbox_deltas,
    kps_deltas)} raw detector-head outputs at `input_size` resolution.
    Returns (aligned (112,112,C), best_score, best_box)."""
    all_scores, all_boxes, all_kps = [], [], []
    for stride, (s, b, k) in level_outputs.items():
        h, w = input_size[0] // stride, input_size[1] // stride
        sc, bx, kp = decode_level(s, b, k, stride, h, w)
        all_scores.append(sc)
        all_boxes.append(bx)
        all_kps.append(kp)
    scores = jnp.concatenate(all_scores)
    boxes = jnp.concatenate(all_boxes)
    kps = jnp.concatenate(all_kps)
    k_scores, k_boxes, k_kps, keep = topk_nms(
        scores, boxes, kps, top_k=top_k, score_thresh=score_thresh,
        iou_thresh=iou_thresh)
    masked = jnp.where(keep, k_scores, -jnp.inf)
    best = jnp.argmax(masked)
    aligned = align_face(image, k_kps[best])
    return aligned, k_scores[best], k_boxes[best]
