"""Face-detection post-processing: anchors, fixed-shape NMS, Umeyama
alignment, affine warp."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.models.detection import (ARCFACE_DST, align_face,
                                               anchor_centers, decode_level,
                                               estimate_similarity, topk_nms,
                                               warp_affine)


def test_anchor_centers():
    c = np.asarray(anchor_centers(2, 3, 8))
    assert c.shape == (12, 2)          # 2x3 grid x 2 anchors
    np.testing.assert_array_equal(c[0], [0, 0])
    np.testing.assert_array_equal(c[1], [0, 0])
    np.testing.assert_array_equal(c[2], [8, 0])
    np.testing.assert_array_equal(c[-1], [16, 8])


def test_decode_level_roundtrip():
    h = w = 4
    stride = 8
    n = h * w * 2
    scores = jnp.ones(n)
    deltas = jnp.ones((n, 4))  # 1 stride-unit in every direction
    s, boxes, _ = decode_level(scores, deltas, None, stride, h, w)
    boxes = np.asarray(boxes)
    # width/height = 2 * stride everywhere
    np.testing.assert_allclose(boxes[:, 2] - boxes[:, 0], 16)
    np.testing.assert_allclose(boxes[:, 3] - boxes[:, 1], 16)


def test_topk_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],     # heavy overlap with box 0 -> suppressed
        [50, 50, 60, 60],   # separate -> kept
        [0, 0, 5, 5],       # low score -> dropped by threshold
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.1])
    k_scores, k_boxes, _, keep = topk_nms(scores, boxes, None, top_k=4,
                                          score_thresh=0.5, iou_thresh=0.4)
    keep = np.asarray(keep)
    order = np.argsort(-np.asarray(k_scores))
    assert keep.sum() == 2
    kept_boxes = np.asarray(k_boxes)[keep]
    assert [0, 0, 10, 10] in kept_boxes.tolist()
    assert [50, 50, 60, 60] in kept_boxes.tolist()


def test_estimate_similarity_recovers_transform():
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2).astype(np.float32) * 100
    theta, scale, t = 0.3, 1.7, np.array([5.0, -3.0])
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]], np.float32)
    dst = scale * src @ rot.T + t
    m = np.asarray(estimate_similarity(jnp.asarray(src), jnp.asarray(dst)))
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-3)


def test_warp_affine_identity_and_shift():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    ident = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    out = warp_affine(img, ident, 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    shift = jnp.asarray([[1.0, 0, 3.0], [0, 1.0, 0]])  # forward shift +3 px x
    out = np.asarray(warp_affine(img, shift, 16, 16))
    np.testing.assert_allclose(out[:, 3:], np.asarray(img)[:, :13], atol=1e-5)


def test_align_face_at_template_is_identity_like():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(112, 112, 3).astype(np.float32))
    aligned = align_face(img, jnp.asarray(ARCFACE_DST))
    # keypoints already at the template -> near-identity warp
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(img),
                               atol=1e-2)
