"""apps/train CLI end-to-end at tiny config on the CPU mesh.

Covers ADVICE r2: with --steps-per-call N, leftover batches (fewer than N at
dataset end) must be flushed through a single-step fallback instead of being
silently dropped (reference train.py:211-292 trains every batch)."""
import json

import numpy as np
import pytest
from PIL import Image

import jax


def _write_tiny_fgid(tmp_path, n_items):
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8))
    img.save(tmp_path / "im.png")
    parsing = np.zeros((64, 64), np.uint8)
    parsing[10:50, 10:50] = 1
    parsing[15:25, 15:30] = 4
    parsing[30:40, 25:40] = 10
    Image.fromarray(parsing).save(tmp_path / "mask.png")
    manifest = [
        {"image_path": "im.png", "parsing_mask_path": "mask.png",
         "vqa_llva": "a person with a face.",
         "vqa_llva_more_face_detail":
             "The person has a small nose and a wide mouth."}
    ] * n_items
    mpath = tmp_path / "manifest.json"
    mpath.write_text(json.dumps(manifest))
    return str(mpath)


def test_train_cli_flushes_pending_multistep_batches(tmp_path):
    from consistentid_tpu.apps.train import main
    from consistentid_tpu.io.checkpoint import CheckpointManager
    from consistentid_tpu.training import create_train_state
    from consistentid_tpu.core import TrainConfig
    from consistentid_tpu.testing import tiny_bundle

    n_dev = len(jax.devices())
    # 3 loader batches with steps-per-call 4: all three would previously sit
    # in `pending` forever and zero optimizer steps would run
    manifest = _write_tiny_fgid(tmp_path, n_items=3 * n_dev)
    out = tmp_path / "run"
    main([
        "--tiny", "--manifest", manifest, "--data-root", str(tmp_path),
        "--output-dir", str(out), "--resolution", "64",
        "--batch-per-device", "1", "--epochs", "1",
        "--steps-per-call", "4", "--max-steps", "100",
        "--dtype", "fp32", "--save-steps", "1000",
    ])

    bundle = tiny_bundle()
    from consistentid_tpu.training import warm_start_ip_projections
    params = bundle.init_params(jax.random.PRNGKey(42))
    params["unet"] = warm_start_ip_projections(params["unet"])
    state = create_train_state(params, TrainConfig())
    restored = CheckpointManager(str(out)).restore(state)
    assert int(restored.step) == 3, \
        f"expected all 3 pending batches trained, got step {int(restored.step)}"
