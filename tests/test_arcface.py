"""ArcFace iresnet parity (vs a torch implementation of the published
architecture) and ONNX initializer-extractor round-trip."""
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.io import convert
from consistentid_tpu.io.onnx_reader import read_onnx_initializers
from consistentid_tpu.models.arcface import IResNet, normalized_embedding

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


# torch iresnet per the published ArcFace architecture (insightface
# arcface_torch backbones/iresnet.py semantics) — test oracle only
class TorchIBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inplanes, eps=1e-5)
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.prelu = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes, eps=1e-5))

    def forward(self, x):
        identity = x
        out = self.bn1(x)
        out = self.conv1(out)
        out = self.bn2(out)
        out = self.prelu(out)
        out = self.conv2(out)
        out = self.bn3(out)
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class TorchIResNet(tnn.Module):
    def __init__(self, layers, dim=512, size=112):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu = tnn.PReLU(64)
        chans = (64, 128, 256, 512)
        inp = 64
        for li, (n, ch) in enumerate(zip(layers, chans)):
            blocks = []
            for bi in range(n):
                blocks.append(TorchIBasicBlock(inp, ch, 2 if bi == 0 else 1))
                inp = ch
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
        self.bn2 = tnn.BatchNorm2d(512, eps=1e-5)
        spatial = size // 16
        self.fc = tnn.Linear(512 * spatial * spatial, dim)
        self.features = tnn.BatchNorm1d(dim, eps=1e-5)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        x = self.fc(x)
        return self.features(x)


def test_iresnet_parity_tiny():
    layers = (1, 1, 1, 1)
    torch.manual_seed(0)
    ref = TorchIResNet(layers, dim=32, size=32)
    for m in ref.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    ref.eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = ref(x).numpy()

    params, stats = convert.iresnet_from_torch(
        convert.torch_state_dict_to_numpy(ref.state_dict()),
        layers=layers, spatial=2)
    model = IResNet(layers=layers, embedding_dim=32, input_size=32)
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    normed = normalized_embedding(got)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normed), axis=-1), 1.0, atol=1e-5)


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def test_onnx_initializer_roundtrip(tmp_path):
    """Hand-encode a minimal ModelProto with two initializers."""
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.array([7, -1], dtype=np.int64)

    def tensor_proto(name, arr, dtype_code):
        msg = b""
        for d in arr.shape:
            msg += _field(1, 0, _varint(d))
        msg += _field(2, 0, _varint(dtype_code))
        msg += _field(8, 2, name.encode())
        msg += _field(9, 2, arr.tobytes())
        return msg

    graph = (_field(5, 2, tensor_proto("w", w, 1)) +
             _field(5, 2, tensor_proto("b", b, 7)))
    model = _field(7, 2, graph)
    path = tmp_path / "tiny.onnx"
    path.write_bytes(model)

    out = read_onnx_initializers(str(path))
    np.testing.assert_array_equal(out["w"], w)
    np.testing.assert_array_equal(out["b"], b)
