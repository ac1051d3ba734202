"""Data-production -> training -> checkpoint -> generation, one loop
(VERDICT r4 next #7): proves the fgid stages' manifest schema and the
training consumer never drift apart (reference contract README.md:98-110,
data/FGID_fuse_JSON.py:16-31).

Pipeline under test, all at tiny config on CPU:
  1. apps/fgid.py mask/caption/faceid/fuse over a 3-image synthetic corpus
     (tiny BiSeNet + ArcFace checkpoints from apps.validate.synthesize)
  2. FGIDDataset consumes the produced JSON_all.json
  3. 10 shard_map-free train steps on those batches
  4. orbax checkpoint save + restore
  5. generate() from the restored params
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from consistentid_tpu.apps import fgid
from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import (PipelineConfig, SchedulerConfig,
                                   TrainConfig)
from consistentid_tpu.io.checkpoint import CheckpointManager
from consistentid_tpu.pipelines import ConsistentIDPipeline
from consistentid_tpu.sampling import NoiseSchedule
from consistentid_tpu.testing import tiny_bundle
from consistentid_tpu.training import (FGIDDataset, create_train_state,
                                       make_train_step, merge_params,
                                       warm_start_ip_projections)


@pytest.mark.slow
def test_fgid_production_feeds_training_and_generation(tmp_path):
    from consistentid_tpu.apps.validate import synthesize

    # -- 0: synthetic corpus + tiny reference-layout checkpoints --
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            imgs / f"person_{i}.jpg")
    paths = synthesize(str(tmp_path / "ckpt"))

    # -- 1: the four fgid stages (reference data/FGID.sh order) --
    out = str(tmp_path / "fgid")
    fgid.main(["mask", "--images", str(imgs), "--out", out,
               "--bisenet", paths["bisenet"], "--batch-size", "2"])
    fgid.main(["caption", "--images", str(imgs), "--out", out])
    fgid.main(["faceid", "--images", str(imgs), "--out", out,
               "--arcface", paths["arcface"], "--batch-size", "2"])
    fgid.main(["fuse", "--out", out])

    manifest = os.path.join(out, "JSON_all.json")
    with open(manifest) as f:
        entries = json.load(f)
    assert len(entries) == 3
    for e in entries.values():
        for key in ("image_path", "parsing_mask_path", "faceid_path",
                    "vqa_llva", "vqa_llva_more_face_detail"):
            assert key in e, key

    # -- 2+3: dataset -> 10 train steps --
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    params["unet"] = warm_start_ip_projections(params["unet"])
    config = TrainConfig(localization_layers=3, save_steps=10)
    schedule = NoiseSchedule.create(SchedulerConfig())
    state = create_train_state(params, config)
    step = make_train_step(bundle, schedule, config)

    dataset = FGIDDataset(manifest, SimpleTokenizer(), size=32,
                          clip_size=bundle.vision_config.image_size,
                          image_root=out, seed=0,
                          id_dim=bundle.adapter_config.id_embeddings_dim)
    assert len(dataset) == 3

    rngk = jax.random.PRNGKey(1)
    losses = []
    n = 0
    for batch in dataset.batches(2, epochs=10):
        state, metrics = step(state, {k: jax.numpy.asarray(v)
                                      for k, v in batch.items()},
                              jax.random.fold_in(rngk, n))
        losses.append(float(metrics["loss"]))
        n += 1
        if n >= 10:
            break
    assert n == 10 and all(np.isfinite(losses)), losses

    # -- 4: checkpoint + restore --
    ckpt = CheckpointManager(str(tmp_path / "runs"))
    ckpt.save(state)
    # fresh process: same base init (frozen params come from base
    # checkpoints, only trainable+opt_state live in the checkpoint)
    fresh_params = bundle.init_params(jax.random.PRNGKey(0))
    fresh_params["unet"] = warm_start_ip_projections(fresh_params["unet"])
    fresh = create_train_state(fresh_params, config)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == 10
    for a, b in zip(jax.tree_util.tree_leaves(restored.trainable),
                    jax.tree_util.tree_leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # -- 5: generate from the trained+restored params --
    trained = merge_params(restored.trainable, restored.frozen)
    pipe = ConsistentIDPipeline(
        bundle, trained, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=2,
                                       start_merge_step=1))
    entry = next(iter(entries.values()))
    face = Image.open(os.path.join(out, entry["image_path"]))
    labels = np.array(Image.open(
        os.path.join(out, entry["parsing_mask_path"])))
    faceid = np.fromfile(os.path.join(out, entry["faceid_path"]),
                         np.float32)[None]
    img = pipe.generate("portrait photo of a person", face,
                        parsing_labels=labels, faceid_embeds=faceid, seed=3)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img.astype(np.float32)).all() and img.std() > 1.0
