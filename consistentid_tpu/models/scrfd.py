"""SCRFD face detector (backbone + neck + head) in flax, NHWC.

TPU-native replacement for the detection half of insightface's "buffalo_l"
FaceAnalysis pack, which the reference drives through onnxruntime
(pipline_StableDiffusion_ConsistentID.py:63-64,217-226: SCRFD detect ->
5-point align -> ArcFace embed). The post-processing (anchor decode, static
top-K NMS, Umeyama alignment) already lives in models/detection.py; this
module supplies the network that produces the per-stride head outputs.

Architecture follows the published SCRFD design (Guo et al., "Sample and
Computation Redistribution for Efficient Face Detection"; the insightface
scrfd training code):
  - ResNetV1e-style backbone: deep 3x3x3 stem with stride-2 first conv +
    3x3/2 max-pool, stages of BasicBlocks with avg-pool downsample
    shortcuts; stage depths/widths are NAS-derived per variant.
  - PAFPN neck over the last three stages (top-down FPN + bottom-up path
    aggregation), 3 output levels at strides 8/16/32.
  - Head with stacked 3x3 conv+norm+ReLU feature blocks (shared across
    strides and between cls/reg branches in the shipped variants) and 3x3
    prediction convs: 1 score, 4 bbox distances and 10 keypoint offsets per
    anchor (2 anchors/position), plus a learnable per-level scale on the
    bbox branch.

Weights lift from the pack's ONNX via io/onnx_reader + io/convert.
Variant table defaults are best-effort reconstructions of the public
configs; `scrfd_config_from_state` infers depths/widths from a real
checkpoint's shapes, so a mismatching table entry cannot silently corrupt a
real-weight load.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .detection import NUM_ANCHORS, SCRFD_STRIDES


@dataclass(frozen=True)
class SCRFDConfig:
    stem_channels: int = 28              # first stem conv output (stem/2)
    stage_blocks: Tuple[int, ...] = (3, 5, 3, 3)
    stage_planes: Tuple[int, ...] = (56, 88, 88, 224)
    neck_out_channels: int = 56
    head_stacked_convs: int = 4
    head_feat_channels: int = 80
    num_anchors: int = NUM_ANCHORS
    strides: Tuple[int, ...] = SCRFD_STRIDES
    use_kps: bool = True
    norm: str = "bn"                     # "bn" (bnkps packs) or "gn"
    gn_groups: int = 16
    strides_share: bool = True           # one head tower for all strides
    cls_reg_share: bool = True           # reg branch reuses the cls tower


SCRFD_VARIANTS: Dict[str, SCRFDConfig] = {
    # buffalo_l's det_10g (scrfd_10g_bnkps)
    "scrfd_10g": SCRFDConfig(),
    # buffalo_s-class detector (scrfd_2.5g_bnkps)
    "scrfd_2.5g": SCRFDConfig(stem_channels=12,
                              stage_blocks=(3, 4, 2, 3),
                              stage_planes=(24, 48, 48, 80),
                              neck_out_channels=24,
                              head_stacked_convs=2,
                              head_feat_channels=64),
    "tiny": SCRFDConfig(stem_channels=4, stage_blocks=(1, 1, 1, 1),
                        stage_planes=(8, 8, 8, 16), neck_out_channels=8,
                        head_stacked_convs=1, head_feat_channels=8,
                        gn_groups=4),
}


def _norm(cfg: SCRFDConfig, train: bool, dtype, name: str):
    if cfg.norm == "gn":
        return nn.GroupNorm(num_groups=cfg.gn_groups, dtype=dtype, name=name)
    return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                        dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """ResNet BasicBlock with avg-pool downsample shortcut (ResNetV1e)."""

    planes: int
    stride: int = 1
    cfg: SCRFDConfig = field(default_factory=SCRFDConfig)
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = _norm(self.cfg, self.train, self.dtype, "bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = _norm(self.cfg, self.train, self.dtype, "bn2")(h)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.stride != 1:
                shortcut = nn.avg_pool(shortcut, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            shortcut = nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(
                shortcut)
            shortcut = _norm(self.cfg, self.train, self.dtype,
                             "downsample_bn")(shortcut)
        return nn.relu(h + shortcut)


class SCRFDBackbone(nn.Module):
    cfg: SCRFDConfig
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jax.Array]:
        c = self.cfg
        sc = c.stem_channels
        h = x
        for i, (ch, s) in enumerate(
                [(sc, 2), (sc, 1), (sc * 2, 1)]):
            h = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f"stem_conv{i}")(h)
            h = _norm(c, self.train, self.dtype, f"stem_bn{i}")(h)
            h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for li, (n_blocks, planes) in enumerate(
                zip(c.stage_blocks, c.stage_planes)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                h = BasicBlock(planes, stride=stride, cfg=c,
                               train=self.train, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(h)
            feats.append(h)
        return feats  # strides 4, 8, 16, 32


class PAFPN(nn.Module):
    """Path-aggregation FPN over the last three backbone stages."""

    cfg: SCRFDConfig
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> Sequence[jax.Array]:
        out_ch = self.cfg.neck_out_channels
        ins = feats[1:]  # start_level=1 -> strides 8/16/32
        laterals = [
            nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(ins)]
        # top-down
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                (laterals[i].shape[0], *laterals[i - 1].shape[1:3],
                 laterals[i].shape[-1]),
                method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        fpn = [nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name=f"fpn_{i}")(laterals[i])
               for i in range(len(laterals))]
        # bottom-up path aggregation
        outs = [fpn[0]]
        for i in range(len(fpn) - 1):
            down = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=1,
                           dtype=self.dtype, name=f"downsample_{i}")(outs[-1])
            outs.append(nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                                name=f"pafpn_{i}")(down + fpn[i + 1]))
        return outs


class SCRFDHead(nn.Module):
    cfg: SCRFDConfig
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        c = self.cfg
        a = c.num_anchors

        def tower(prefix, key):
            # conv bias off whenever a norm follows (ConvModule semantics)
            return [(nn.Conv(c.head_feat_channels, (3, 3), padding=1,
                             use_bias=False, dtype=self.dtype,
                             name=f"{prefix}_convs_{key}_{j}"),
                     _norm(c, self.train, self.dtype,
                           f"{prefix}_norm_{key}_{j}"))
                    for j in range(c.head_stacked_convs)]

        # when strides_share the whole conv+norm tower (BN stats included)
        # and the prediction convs are ONE module applied at every level,
        # matching the torch ModuleDict['0'] layout; module instances are
        # created once per key and reused, which is how flax shares weights
        towers, preds = {}, {}
        outputs = {}
        for i, (stride, feat) in enumerate(zip(c.strides, feats)):
            key = "0" if c.strides_share else str(stride)
            if key not in towers:
                towers[key] = {"cls": tower("cls", key)}
                if not c.cls_reg_share:
                    towers[key]["reg"] = tower("reg", key)
                preds[key] = {
                    "cls": nn.Conv(a, (3, 3), padding=1, dtype=self.dtype,
                                   name=f"cls_pred_{key}"),
                    "reg": nn.Conv(a * 4, (3, 3), padding=1,
                                   dtype=self.dtype,
                                   name=f"reg_pred_{key}"),
                }
                if c.use_kps:
                    preds[key]["kps"] = nn.Conv(a * 10, (3, 3), padding=1,
                                                dtype=self.dtype,
                                                name=f"kps_pred_{key}")

            h = feat
            for conv, norm in towers[key]["cls"]:
                h = nn.relu(norm(conv(h)))
            cls_feat = reg_feat = h
            if not c.cls_reg_share:
                r = feat
                for conv, norm in towers[key]["reg"]:
                    r = nn.relu(norm(conv(r)))
                reg_feat = r
            scores = preds[key]["cls"](cls_feat)
            scale = self.param(f"scale_{i}", nn.initializers.ones, ())
            bbox = scale * preds[key]["reg"](reg_feat)
            level = {"scores": scores, "bbox": bbox}
            if c.use_kps:
                level["kps"] = preds[key]["kps"](reg_feat)
            outputs[stride] = level
        return outputs


class SCRFD(nn.Module):
    """Full detector: (B, H, W, 3) image in [-1, 1]-ish detector
    normalization -> {stride: {scores (B,h,w,A), bbox (B,h,w,4A),
    kps (B,h,w,10A)}} raw head outputs (pre-sigmoid scores)."""

    cfg: SCRFDConfig = field(default_factory=SCRFDConfig)
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = SCRFDBackbone(self.cfg, train=self.train, dtype=self.dtype,
                              name="backbone")(x)
        necked = PAFPN(self.cfg, train=self.train, dtype=self.dtype,
                       name="neck")(feats)
        return SCRFDHead(self.cfg, train=self.train, dtype=self.dtype,
                         name="head")(necked)


def flatten_level_outputs(raw: Dict[int, Dict[str, jax.Array]],
                          batch_index: int = 0):
    """Raw head maps -> the {stride: (scores (N,), bbox (N,4), kps (N,5,2))}
    layout consumed by detection.detect_and_align. Applies sigmoid to
    scores. N = h*w*A with anchor-major-last ordering matching
    detection.anchor_centers (each center repeated A times)."""
    out = {}
    for stride, level in raw.items():
        s = level["scores"][batch_index]
        h, w, a = s.shape
        scores = jax.nn.sigmoid(s.reshape(-1))
        bbox = level["bbox"][batch_index].reshape(h * w * a, 4)
        kps = None
        if "kps" in level:
            kps = level["kps"][batch_index].reshape(h * w * a, 10)
        out[stride] = (scores, bbox, kps)
    return out


def make_face_detector(params, batch_stats=None,
                       cfg: SCRFDConfig | None = None,
                       input_size: int = 640,
                       score_thresh: float = 0.5,
                       dtype=jnp.float32):
    """PIL image -> (aligned 112x112 float32 RGB in [0,255], score).

    The reference's FaceAnalysis.get() equivalent: resize-with-padding to
    the detector input (640 SD1.5 / 512 SDXL), jitted SCRFD forward + decode
    + static NMS + Umeyama alignment, all one XLA graph. Returns score 0 when
    no face clears the threshold (caller applies the zero-embedding fallback,
    reference :220-221)."""
    import numpy as np
    from PIL import Image

    from .detection import detect_and_align

    cfg = cfg or SCRFDConfig()
    model = SCRFD(cfg, dtype=dtype)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def run(x, scale):
        raw = model.apply(variables, x)
        levels = flatten_level_outputs(raw)
        aligned, score, box = detect_and_align(
            levels, x[0], (input_size, input_size),
            score_thresh=score_thresh)
        # undo detector normalization for the downstream ArcFace crop;
        # keypoints were found in padded-resized space, so the aligned crop
        # is already consistent (similarity transform composes with the
        # resize scale)
        return aligned * 128.0 + 127.5, score, box / scale

    def detect(image: Image.Image):
        image = image.convert("RGB")
        w, h = image.size
        scale = input_size / max(w, h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        canvas = np.zeros((input_size, input_size, 3), np.float32)
        resized = np.asarray(image.resize((nw, nh), Image.BILINEAR),
                             np.float32)
        canvas[:nh, :nw] = resized
        x = (canvas - 127.5) / 128.0  # insightface detector normalization
        aligned, score, box = run(jnp.asarray(x[None]), scale)
        return np.asarray(aligned), float(score), np.asarray(box)

    return detect
