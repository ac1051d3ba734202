"""ArcFace face-recognition embedder (iresnet backbone) in flax, NHWC.

TPU-native replacement for the reference's insightface "buffalo_l"
recognition model executed through onnxruntime
(pipline_StableDiffusion_ConsistentID.py:63-64,217-226): the 512-d
`normed_embedding` driving ProjPlusModel. Architecture is the published
ArcFace iresnet (stride-1 3x3 stem, pre-activation IBasicBlocks with PReLU,
BN -> flatten -> FC -> feature BN head, 112x112 input -> 512-d embedding).
Weights convert from the insightface ONNX pack via io/onnx_reader.py
(w600k_r50 = iresnet50 [3,4,14,3]).

Detection/alignment note: the reference's SCRFD detector stage is anchor+NMS
heavy; until its TPU port lands (see make_face_embedder fallback) the
embedder consumes a center-cropped face like the reference's no-detection
zero-fallback path degrades (:220-221).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-5
IRESNET_LAYERS = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
}


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],))
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class IBasicBlock(nn.Module):
    out_chan: int
    stride: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = partial(nn.BatchNorm, use_running_average=not self.train,
                     epsilon=BN_EPS, dtype=self.dtype)
        h = bn(name="bn1")(x)
        h = nn.Conv(self.out_chan, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = bn(name="bn2")(h)
        h = PReLU(dtype=self.dtype, name="prelu")(h)
        h = nn.Conv(self.out_chan, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = bn(name="bn3")(h)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_chan:
            shortcut = nn.Conv(self.out_chan, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        return h + shortcut


class IResNet(nn.Module):
    layers: Tuple[int, int, int, int] = IRESNET_LAYERS["iresnet50"]
    embedding_dim: int = 512
    input_size: int = 112
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, 112, 112, 3) normalized to [-1, 1] -> (B, 512) embedding."""
        bn = partial(nn.BatchNorm, use_running_average=not self.train,
                     epsilon=BN_EPS, dtype=self.dtype)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = bn(name="bn1")(h)
        h = PReLU(dtype=self.dtype, name="prelu")(h)
        channels = (64, 128, 256, 512)
        for li, (n_blocks, ch) in enumerate(zip(self.layers, channels)):
            for bi in range(n_blocks):
                h = IBasicBlock(ch, stride=2 if bi == 0 else 1,
                                train=self.train, dtype=self.dtype,
                                name=f"layer{li + 1}_{bi}")(h)
        h = bn(name="bn2")(h)
        h = h.reshape(h.shape[0], -1)   # NHWC flatten; converter permutes fc
        h = nn.Dense(self.embedding_dim, dtype=self.dtype, name="fc")(h)
        # 1-d feature BN (torch BatchNorm1d with affine weight, bias frozen 0
        # in the official recipe but present in checkpoints)
        h = bn(name="features")(h)
        return h


def normalized_embedding(embedding: jax.Array) -> jax.Array:
    """insightface `normed_embedding` (L2-normalized)."""
    return embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True)


def iresnet_arch_from_params(params):
    """(layers, embedding_dim, input_size) inferred from a converted param
    tree, so r50/r100/tiny packs all build the right model without a
    variant table."""
    layers = []
    for li in range(1, 5):
        n = 0
        while f"layer{li}_{n}" in params:
            n += 1
        layers.append(n)
    embedding_dim = int(params["fc"]["bias"].shape[0])
    c = int(params["bn2"]["scale"].shape[0])
    spatial = int(round((params["fc"]["kernel"].shape[0] // c) ** 0.5))
    return tuple(layers), embedding_dim, spatial * 16


def make_face_embedder(params, batch_stats, variant: str = None,
                       detector=None, allow_center_crop: bool = False):
    """PIL image -> (1, D) L2-normalized numpy embedding; the pipeline's
    `face_embedder` hook (reference FaceAnalysis detect->align->embed,
    pipline_StableDiffusion_ConsistentID.py:217-226).

    The iresnet architecture (depth/dim/input size) is inferred from the
    params themselves; `variant` (an IRESNET_LAYERS key) overrides.

    detector: a models.scrfd.make_face_detector callable (PIL -> (aligned
    112x112 RGB float [0,255], score, box)). When the detector finds no face
    the reference substitutes a zero embedding (:220-221) — same here.
    allow_center_crop: explicit opt-in to the detector-free center-crop
    fallback (useful for pre-aligned datasets); without a detector and
    without this flag the call is a configuration error."""
    import numpy as np
    from PIL import Image

    if detector is None and not allow_center_crop:
        raise ValueError(
            "make_face_embedder needs a face detector (models.scrfd."
            "make_face_detector) or allow_center_crop=True for pre-aligned "
            "inputs")

    layers, embedding_dim, input_size = iresnet_arch_from_params(params)
    if variant is not None:
        layers = IRESNET_LAYERS[variant]
    model = IResNet(layers=layers, embedding_dim=embedding_dim,
                    input_size=input_size)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def run(x):
        return normalized_embedding(model.apply(variables, x))

    def embed(image):
        if detector is not None:
            aligned, score, _ = detector(image)
            if score <= 0.0:
                # reference :220-221
                return np.zeros((1, embedding_dim), np.float32)
            arr = np.asarray(aligned, np.float32)
            if arr.shape[0] != input_size:
                arr = np.asarray(Image.fromarray(
                    arr.astype(np.uint8)).resize((input_size, input_size),
                                                 Image.BILINEAR), np.float32)
            arr = arr / 127.5 - 1.0
        else:
            image = image.convert("RGB")
            w, h = image.size
            side = min(w, h)
            image = image.crop(((w - side) // 2, (h - side) // 2,
                                (w + side) // 2, (h + side) // 2))
            image = image.resize((input_size, input_size), Image.BILINEAR)
            arr = np.asarray(image, np.float32) / 127.5 - 1.0
        return np.asarray(run(jnp.asarray(arr[None])))

    return embed
