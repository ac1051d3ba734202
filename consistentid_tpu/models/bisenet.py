"""BiSeNet 19-class face parser in flax (NHWC).

Equivalent of the reference parser (models/BiSeNet/model.py:230-272,
resnet.py:58-88): ResNet-18 context path with two attention-refinement
modules + global average context, res3 feature standing in for the spatial
path (model.py:243-245), SE-style feature fusion, three upsampled logit
heads (align_corners=True bilinear, model.py:251-253).

BatchNorm uses flax nn.BatchNorm: running stats for inference (converted from
the face_parsing.pth checkpoint), and with `axis_name="data"` in training it
compiles to a psum over ICI — the TPU-native form of the reference's dormant
InPlaceABNSync all-reduce (models/BiSeNet/modules/functions.py:163-184);
see also ops/fused_bn_act.py for the Pallas fused kernel variant.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def resize_bilinear_align_corners(x: jax.Array, size: Tuple[int, int]):
    """Bilinear resize with align_corners=True semantics (torch interpolate
    at model.py:251-253); jax.image.resize only offers half-pixel centers."""
    b, h, w, c = x.shape
    out_h, out_w = size
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class ConvBNReLU(nn.Module):
    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_chan, (self.ks, self.ks),
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         axis_name=self.axis_name if self.train else None,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    out_chan: int
    stride: int = 1
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = partial(nn.BatchNorm, use_running_average=not self.train,
                     momentum=BN_MOMENTUM, epsilon=BN_EPS,
                     axis_name=self.axis_name if self.train else None,
                     dtype=self.dtype)
        residual = nn.Conv(self.out_chan, (3, 3),
                           strides=(self.stride, self.stride), padding=1,
                           use_bias=False, dtype=self.dtype, name="conv1")(x)
        residual = nn.relu(bn(name="bn1")(residual))
        residual = nn.Conv(self.out_chan, (3, 3), padding=1, use_bias=False,
                           dtype=self.dtype, name="conv2")(residual)
        residual = bn(name="bn2")(residual)
        shortcut = x
        if x.shape[-1] != self.out_chan or self.stride != 1:
            shortcut = nn.Conv(self.out_chan, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        return nn.relu(shortcut + residual)


class Resnet18(nn.Module):
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(train=self.train, axis_name=self.axis_name,
                  dtype=self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not self.train,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         axis_name=self.axis_name if self.train else None,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            x = BasicBlock(64, name=f"layer1_{i}", **kw)(x)
        x = BasicBlock(128, stride=2, name="layer2_0", **kw)(x)
        feat8 = BasicBlock(128, name="layer2_1", **kw)(x)
        x = BasicBlock(256, stride=2, name="layer3_0", **kw)(feat8)
        feat16 = BasicBlock(256, name="layer3_1", **kw)(x)
        x = BasicBlock(512, stride=2, name="layer4_0", **kw)(feat16)
        feat32 = BasicBlock(512, name="layer4_1", **kw)(x)
        return feat8, feat16, feat32


class AttentionRefinementModule(nn.Module):
    out_chan: int
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, train=self.train,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name="conv")(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=not self.train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             axis_name=self.axis_name if self.train else None,
                             dtype=self.dtype, name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class ContextPath(nn.Module):
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(train=self.train, axis_name=self.axis_name,
                  dtype=self.dtype)
        feat8, feat16, feat32 = Resnet18(name="resnet", **kw)(x)
        h16, w16 = feat16.shape[1:3]
        h8, w8 = feat8.shape[1:3]

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, padding=0, name="conv_avg", **kw)(avg)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0], *feat32.shape[1:3], avg.shape[-1]))

        feat32_arm = AttentionRefinementModule(128, name="arm32", **kw)(feat32)
        feat32_sum = feat32_arm + avg_up
        feat32_up = jax.image.resize(
            feat32_sum, (feat32_sum.shape[0], h16, w16, 128), "nearest")
        feat32_up = ConvBNReLU(128, name="conv_head32", **kw)(feat32_up)

        feat16_arm = AttentionRefinementModule(128, name="arm16", **kw)(feat16)
        feat16_sum = feat16_arm + feat32_up
        feat16_up = jax.image.resize(
            feat16_sum, (feat16_sum.shape[0], h8, w8, 128), "nearest")
        feat16_up = ConvBNReLU(128, name="conv_head16", **kw)(feat16_up)

        return feat8, feat16_up, feat32_up


class FeatureFusionModule(nn.Module):
    out_chan: int
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_chan, ks=1, padding=0, train=self.train,
                          axis_name=self.axis_name, dtype=self.dtype,
                          name="convblk")(fcat)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid_chan: int
    n_classes: int
    train: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_chan, train=self.train,
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv_out")(x)


class BiSeNet(nn.Module):
    n_classes: int = 19
    train: bool = False
    axis_name: Optional[str] = None   # set to mesh axis for SyncBN training
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, 3) ImageNet-normalized; returns 3 (B, H, W, classes)
        logit maps (main, aux16, aux32)."""
        kw = dict(train=self.train, axis_name=self.axis_name,
                  dtype=self.dtype)
        h, w = x.shape[1:3]
        feat_res8, feat_cp8, feat_cp16 = ContextPath(name="cp", **kw)(x)
        feat_fuse = FeatureFusionModule(256, name="ffm", **kw)(
            feat_res8, feat_cp8)
        out = BiSeNetOutput(256, self.n_classes, name="conv_out", **kw)(
            feat_fuse)
        out16 = BiSeNetOutput(64, self.n_classes, name="conv_out16", **kw)(
            feat_cp8)
        out32 = BiSeNetOutput(64, self.n_classes, name="conv_out32", **kw)(
            feat_cp16)
        size = (h, w)
        return (resize_bilinear_align_corners(out, size),
                resize_bilinear_align_corners(out16, size),
                resize_bilinear_align_corners(out32, size))


def make_face_parser(params, batch_stats, size: int = 512):
    """PIL image -> (size, size) uint8 label map, jitted; the pipeline's
    `face_parser` hook (reference parsing_face_mask, :229-262)."""
    import numpy as np
    from ..utils.image import imagenet_preprocess

    model = BiSeNet()
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def run(x):
        logits, _, _ = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1)

    def parse(image):
        x = jnp.asarray(imagenet_preprocess(image, size))
        return np.asarray(run(x))[0].astype(np.uint8)

    return parse
