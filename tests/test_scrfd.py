"""SCRFD detector parity (vs a torch implementation of the published
architecture with mmdet-style naming) + jitted detect->align->embed path.

Mirrors the ArcFace torch-oracle approach (tests/test_arcface.py): an
independent torch model is randomized, its state dict converted, and the
flax forward must match — catching layout/padding/BN-semantics mistakes
that structural tests cannot see."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.io import convert
from consistentid_tpu.models.scrfd import (SCRFD, SCRFDConfig,
                                           flatten_level_outputs,
                                           make_face_detector)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

TINY = SCRFDConfig(stem_channels=4, stage_blocks=(1, 1, 1, 1),
                   stage_planes=(8, 8, 8, 16), neck_out_channels=8,
                   head_stacked_convs=2, head_feat_channels=8,
                   norm="bn")


# ---- torch oracle (mmdet ResNetV1e + PAFPN + SCRFD head semantics) ----------

class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            mods = []
            if stride != 1:
                mods.append(tnn.AvgPool2d(stride, stride, ceil_mode=True,
                                          count_include_pad=False))
            mods += [tnn.Conv2d(inplanes, planes, 1, 1, bias=False),
                     tnn.BatchNorm2d(planes, eps=1e-5)]
            self.downsample = tnn.Sequential(*mods)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchBackbone(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        sc = cfg.stem_channels
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, sc, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(sc), tnn.ReLU(),
            tnn.Conv2d(sc, sc, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(sc), tnn.ReLU(),
            tnn.Conv2d(sc, sc * 2, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(sc * 2), tnn.ReLU())
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = sc * 2
        for li, (n, planes) in enumerate(zip(cfg.stage_blocks,
                                             cfg.stage_planes)):
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(TorchBasicBlock(inp, planes, stride))
                inp = planes
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.stem(x))
        feats = []
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            feats.append(x)
        return feats


class TorchConvModule(tnn.Module):
    """conv (no bias) + BN + ReLU, named .conv/.bn like mmdet ConvModule."""

    def __init__(self, cin, cout, k=3, s=1, p=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-5)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchPAFPN(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        ins = cfg.stage_planes[1:]
        out = cfg.neck_out_channels
        self.lateral_convs = tnn.ModuleList(
            [_plain_conv(c, out, 1, 0) for c in ins])
        self.fpn_convs = tnn.ModuleList(
            [_plain_conv(out, out, 3, 1) for _ in ins])
        self.downsample_convs = tnn.ModuleList(
            [_plain_conv(out, out, 3, 1, stride=2) for _ in range(2)])
        self.pafpn_convs = tnn.ModuleList(
            [_plain_conv(out, out, 3, 1) for _ in range(2)])

    def forward(self, feats):
        lats = [m(f) for m, f in zip(self.lateral_convs, feats)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[2:], mode="nearest")
        fpn = [m(l) for m, l in zip(self.fpn_convs, lats)]
        outs = [fpn[0]]
        for i in range(2):
            outs.append(self.pafpn_convs[i](
                self.downsample_convs[i](outs[-1]) + fpn[i + 1]))
        return outs


class _plain_conv(tnn.Module):
    """ConvModule without norm (conv keeps its bias), named .conv."""

    def __init__(self, cin, cout, k, p, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, p, bias=True)

    def forward(self, x):
        return self.conv(x)


class TorchScale(tnn.Module):
    def __init__(self):
        super().__init__()
        self.scale = tnn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        return x * self.scale


class TorchSCRFDHead(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        a = cfg.num_anchors
        f = cfg.head_feat_channels
        self.cls_stride_convs = tnn.ModuleDict({"0": tnn.Sequential(*[
            TorchConvModule(cfg.neck_out_channels if j == 0 else f, f)
            for j in range(cfg.head_stacked_convs)])})
        self.stride_cls = tnn.ModuleDict(
            {"0": tnn.Conv2d(f, a, 3, 1, 1)})
        self.stride_reg = tnn.ModuleDict(
            {"0": tnn.Conv2d(f, a * 4, 3, 1, 1)})
        self.stride_kps = tnn.ModuleDict(
            {"0": tnn.Conv2d(f, a * 10, 3, 1, 1)})
        self.scales = tnn.ModuleList([TorchScale() for _ in range(3)])

    def forward(self, feats):
        outs = []
        for i, feat in enumerate(feats):
            h = self.cls_stride_convs["0"](feat)
            outs.append((self.stride_cls["0"](h),
                         self.scales[i](self.stride_reg["0"](h)),
                         self.stride_kps["0"](h)))
        return outs


class TorchSCRFD(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.backbone = TorchBackbone(cfg)
        self.neck = TorchPAFPN(cfg)
        self.bbox_head = TorchSCRFDHead(cfg)

    def forward(self, x):
        return self.bbox_head(self.neck(self.backbone(x)[1:]))


def _randomized(model):
    torch.manual_seed(0)
    for p in model.parameters():
        p.data.normal_(0, 0.1)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_scrfd_torch_oracle_parity():
    ref = _randomized(TorchSCRFD(TINY))
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = ref(x)

    sd = convert.torch_state_dict_to_numpy(ref.state_dict())
    params, stats, cfg = convert.scrfd_from_torch(sd)
    assert cfg.stage_blocks == TINY.stage_blocks
    assert cfg.stage_planes == TINY.stage_planes
    assert cfg.head_stacked_convs == TINY.head_stacked_convs
    assert cfg.norm == "bn" and cfg.use_kps and cfg.strides_share

    model = SCRFD(cfg)
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for i, stride in enumerate(cfg.strides):
        for j, name in enumerate(("scores", "bbox", "kps")):
            w = want[i][j].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                np.asarray(got[stride][name]), w, atol=2e-4,
                err_msg=f"stride {stride} {name}")


def test_make_face_detector_jitted_path():
    """Random-weight end-to-end: PIL -> padded resize -> SCRFD -> decode ->
    NMS -> align, one jitted graph, finite outputs and correct shapes."""
    from PIL import Image

    cfg = TINY
    model = SCRFD(cfg)
    rng = np.random.RandomState(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    det = make_face_detector(variables["params"],
                             variables.get("batch_stats"), cfg=cfg,
                             input_size=64, score_thresh=-1.0)
    img = Image.fromarray(rng.randint(0, 255, (80, 60, 3), np.uint8))
    aligned, score, box = det(img)
    assert aligned.shape == (112, 112, 3)
    assert np.isfinite(aligned).all() and np.isfinite(box).all()


def test_detector_plus_embedder_integration():
    """detect->align feeds the ArcFace embedder; no-face (score<=0) returns
    the reference's zero embedding (:220-221). Center-crop is opt-in only."""
    from PIL import Image

    from consistentid_tpu.models.arcface import (IResNet, IRESNET_LAYERS,
                                                 make_face_embedder)

    ir = IResNet(layers=IRESNET_LAYERS["iresnet18"])
    v = ir.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))

    with pytest.raises(ValueError):
        make_face_embedder(v["params"], v["batch_stats"])

    calls = {}

    def fake_detector(image):
        calls["n"] = calls.get("n", 0) + 1
        if calls["n"] == 1:
            return np.full((112, 112, 3), 128.0, np.float32), 0.9, \
                np.zeros(4)
        return np.zeros((112, 112, 3), np.float32), 0.0, np.zeros(4)

    embed = make_face_embedder(v["params"], v["batch_stats"],
                               variant="iresnet18", detector=fake_detector)
    img = Image.new("RGB", (64, 64))
    e1 = embed(img)
    assert e1.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(e1, axis=-1), 1.0, atol=1e-5)
    e2 = embed(img)  # detector finds nothing -> zero embedding
    np.testing.assert_array_equal(e2, np.zeros((1, 512), np.float32))
