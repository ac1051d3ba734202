"""apps.validate: synthetic reference-layout checkpoints -> full converter
sweep; plus the loader regression its stage 2 caught (adapter params
clobbered by a flat dict.update)."""
import json
import os

import numpy as np
import pytest
from flax import traverse_util

from consistentid_tpu.apps import validate as validate_app


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth_ckpt"))
    validate_app.synthesize(d)
    return d


def test_validate_converters_all_ok(synth_dir, tmp_path):
    out = str(tmp_path / "report.json")
    rc = validate_app.main([
        "--base", os.path.join(synth_dir, "sd15"),
        "--sdxl-base", os.path.join(synth_dir, "sdxl"),
        "--consistentid", os.path.join(synth_dir, "ConsistentID-v1.bin"),
        "--image-encoder", os.path.join(synth_dir, "image_encoder.safetensors"),
        "--bisenet", os.path.join(synth_dir, "face_parsing.pth"),
        "--arcface", os.path.join(synth_dir, "arcface.pt"),
        "--scrfd", os.path.join(synth_dir, "scrfd.pt"),
        "--cpu", "--tiny", "--skip-generate", "--out", out])
    assert rc == 0
    report = json.load(open(out))
    assert len(report["files"]) == 12
    for name, entry in report["files"].items():
        assert entry["ok"], (name, entry)
        assert entry["params"] > 0, name
        assert not entry["unconsumed_source_keys"], name


def test_loader_preserves_adapter_params(synth_dir):
    """load_sd15_consistentid must deep-merge the diffusers UNet weights into
    the init tree: the adapter (LoRA/IP) leaves live under the same
    top-level module keys and a flat update() silently drops them."""
    from consistentid_tpu.pipelines.loading import load_sd15_consistentid
    from consistentid_tpu.testing import tiny_bundle

    pipe = load_sd15_consistentid(
        os.path.join(synth_dir, "sd15"),
        consistentid_path=os.path.join(synth_dir, "ConsistentID-v1.bin"),
        image_encoder_path=os.path.join(synth_dir,
                                        "image_encoder.safetensors"),
        bundle=tiny_bundle())
    flat = traverse_util.flatten_dict(pipe.params["unet"])
    lora_down = [k for k in flat
                 if any("_lora" in str(p) for p in k) and k[-2] == "down"]
    assert lora_down, "LoRA subtrees missing after load (clobbered)"
    # .bin values actually landed (zero-init ups stay zero, downs nonzero)
    assert all(float(np.abs(np.asarray(flat[k], np.float32)).max()) > 0
               for k in lora_down)
    ip = [k for k in flat if "to_k_ip" in k or "to_v_ip" in k]
    assert ip and all(np.isfinite(np.asarray(flat[k], np.float32)).all()
                      for k in ip)
