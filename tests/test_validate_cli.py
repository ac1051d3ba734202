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


def test_mode_sweep_reports_identity_metrics(tmp_path):
    """run_mode_sweep: all seven serving modes scored on identical rows with
    FaceSim deltas vs exact (VERDICT r3 weak #3 — identity metrics, not
    pixel diffs). At tiny config with RANDOM weights the absolute deltas
    are meaningless (a random UNet has no temporal smoothness for DeepCache
    to exploit), so this asserts the machinery + catastrophic-divergence
    bounds; the tight thresholds run on real checkpoints via the same
    `validate --mode-sweep` command."""
    import jax
    import numpy as np
    from PIL import Image

    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines import ConsistentIDPipeline
    from consistentid_tpu.testing import tiny_bundle

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    labels = np.zeros((64, 64), np.uint8)
    labels[16:48, 16:48] = 1
    labels[20:28, 20:30] = 4
    labels[34:42, 26:40] = 10
    rs = np.random.RandomState(7)

    def embedder(img):
        # deterministic pseudo-embedding of the image content so FaceSim
        # responds to output changes
        arr = np.asarray(img.resize((8, 8)), np.float32).reshape(1, -1)
        return arr[:, :16] / (np.linalg.norm(arr[:, :16]) + 1e-6)

    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1),
        face_parser=lambda img: labels,
        face_embedder=embedder)
    face = Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8))

    out = validate_app.run_mode_sweep(pipe, face, 2)
    assert set(out) == {"exact", "int8", "int8_static", "cache2", "cache3",
                        "int8_static_cache2", "int8_static_cache3"}
    for mode, rec in out.items():
        assert rec["img_per_min"] > 0, (mode, rec)
        assert -1.0 <= rec["face_sim"] <= 1.0, (mode, rec)
    for mode in ("int8", "int8_static", "cache2", "cache3",
                 "int8_static_cache2", "int8_static_cache3"):
        assert "d_face_sim" in out[mode]
        assert abs(out[mode]["d_face_sim"]) < 0.9  # not catastrophically off
    assert "d_face_sim" not in out["exact"]


def test_with_quant_shares_params_not_graphs():
    """pipe.with_quant('int8'): same param tree by reference, fresh bundle
    twin + jit cache; the exact pipe keeps serving the bf16 graph (the
    mode-sweep machinery relies on both facts)."""
    import jax
    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines import ConsistentIDPipeline
    from consistentid_tpu.testing import tiny_bundle

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    cfg = PipelineConfig(height=32, width=32, num_inference_steps=2,
                         start_merge_step=1)
    labels = np.zeros((64, 64), np.uint8)
    labels[16:48, 16:48] = 1
    pipe = ConsistentIDPipeline(bundle, params, SimpleTokenizer(),
                                pipeline_config=cfg,
                                face_parser=lambda img: labels)
    q = pipe.with_quant("int8")
    assert q.params is pipe.params
    assert q.bundle.quant == "int8" and pipe.bundle.quant == "none"
    assert q._core_jit is not pipe._core_jit

    from PIL import Image
    face = Image.fromarray(
        np.random.RandomState(3).randint(0, 255, (64, 64, 3), np.uint8))
    a = pipe.generate("a face", face, seed=5)
    b = q.generate("a face", face, seed=5)
    assert np.isfinite(a.astype(np.float32)).all()
    assert np.isfinite(b.astype(np.float32)).all()
    # int8 must actually change the served graph's numerics
    assert not np.array_equal(a, b)


def test_mode_sweep_runs_on_sdxl(tmp_path):
    """run_mode_sweep is pipeline-generic: the SDXL pipe (dual towers,
    2048-d embeds) sweeps the same four serving modes — validate
    --mode-sweep scores XL accelerators too (stage 5b)."""
    import jax
    from PIL import Image

    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines.consistentid_sdxl import \
        ConsistentIDXLPipeline
    from consistentid_tpu.testing import tiny_sdxl_bundle

    bundle = tiny_sdxl_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    labels = np.zeros((64, 64), np.uint8)
    labels[16:48, 16:48] = 1
    labels[20:28, 20:30] = 4

    def embedder(img):
        arr = np.asarray(img.resize((8, 8)), np.float32).reshape(1, -1)
        return arr[:, :16] / (np.linalg.norm(arr[:, :16]) + 1e-6)

    pipe = ConsistentIDXLPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       guidance_scale=7.5,
                                       start_merge_step=1),
        face_parser=lambda img: labels, face_embedder=embedder)
    face = Image.fromarray(
        np.random.RandomState(7).randint(0, 255, (64, 64, 3), np.uint8))

    out = validate_app.run_mode_sweep(pipe, face, 1)
    assert set(out) == {"exact", "int8", "int8_static", "cache2", "cache3",
                        "int8_static_cache2", "int8_static_cache3"}
    for mode in ("int8", "int8_static", "cache2", "cache3",
                 "int8_static_cache2", "int8_static_cache3"):
        assert "d_face_sim" in out[mode]
