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


def test_fgid_pipeline_end_to_end(synth_dir, tmp_path):
    """mask -> caption -> faceid -> fuse over a tiny image tree using the
    synthesized weights; exercises the native batched decode path
    (in-order delivery + ok flags) end to end."""
    from PIL import Image

    from consistentid_tpu.apps.fgid import (run_caption, run_faceid,
                                            run_fuse, run_mask)

    images = tmp_path / "images"
    images.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (80, 64, 3), np.uint8)).save(
            images / f"p{i}.jpg")
    (images / "bad.jpg").write_bytes(b"corrupt")
    out = str(tmp_path / "fgid_out")

    run_mask(str(images), out, os.path.join(synth_dir, "face_parsing.pth"),
             batch_size=2, size=64)
    run_caption(str(images), out)
    run_faceid(str(images), out, os.path.join(synth_dir, "arcface.pt"),
               batch_size=2)
    run_fuse(out)

    manifest = json.load(open(os.path.join(out, "JSON_all.json")))
    # the corrupt image is skipped by both decode stages (no image/faceid
    # fields), and decode failures never mispair neighbors
    entries = manifest.values() if isinstance(manifest, dict) else manifest
    good = [e for e in entries if "faceid_path" in e and "image_path" in e]
    assert len(good) == 3
    for e in good:
        emb = np.fromfile(os.path.join(out, e["faceid_path"]), np.float32)
        assert emb.size == 16 and np.isfinite(emb).all()
        assert os.path.exists(os.path.join(out, e["image_path"]))
        assert os.path.exists(os.path.join(out, e["parsing_mask_path"]))
