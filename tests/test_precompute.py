"""Precomputed frozen-encoder conditioning (training/precompute.py).

Pins the exactness contract that makes the cache safe to ship:
  - the encoded loss is BITWISE-identical to the pixel loss given the
    same rng (the VAE posterior is re-sampled from cached moments exactly
    as AutoencoderKL.encode does),
  - the bf16/uint16 storage packing round-trips exactly,
  - precompute_conditioning -> EncodedFGIDDataset reproduces the pixel
    FGIDDataset's loss on a real (tiny) corpus end-to-end,
  - the CFG-dropout branches swap in exactly the null tensors the pixel
    path would have produced (empty caption, zero image — reference
    utils.py:111-118),
  - the precompute CLI -> train --encoded CLI chain runs.
"""
import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from consistentid_tpu.core import SchedulerConfig, TrainConfig
from consistentid_tpu.models.vae import AutoencoderKL
from consistentid_tpu.sampling import NoiseSchedule
from consistentid_tpu.testing import tiny_bundle
from consistentid_tpu.training import (EncodedFGIDDataset, FGIDDataset,
                                       consistentid_loss,
                                       consistentid_loss_encoded,
                                       precompute_conditioning,
                                       synthetic_batch,
                                       synthetic_encoded_batch)
from consistentid_tpu.training.precompute import pack_float, unpack_float


def test_pack_float_roundtrip_exact():
    x32 = np.random.RandomState(0).randn(3, 5).astype(np.float32)
    np.testing.assert_array_equal(unpack_float(pack_float(x32)), x32)
    xb = jnp.asarray(x32, jnp.bfloat16)
    packed = pack_float(xb)
    assert packed.dtype == np.uint16  # half the fp32 bytes
    np.testing.assert_array_equal(unpack_float(packed),
                                  np.asarray(xb, np.float32))


def _encode_batch(bundle, params, batch):
    """The frozen-encoder forwards, exactly as precompute_conditioning
    runs them (training/precompute.py encode_batch)."""
    mean, logvar = bundle.vae.apply({"params": params["vae"]},
                                    batch["images"],
                                    method=AutoencoderKL.encode_moments)
    b = batch["images"].shape[0]
    s = bundle.vision_config.image_size
    vit_in = jnp.concatenate(
        [batch["face_pixels"],
         batch["region_pixels"].reshape(-1, s, s, 3)], axis=0)
    _, penult = bundle.image_encoder.apply(
        {"params": params["image_encoder"]}, vit_in)
    prompt, _ = bundle.text_encoder.apply(
        {"params": params["text_encoder"]}, batch["clean_ids"])
    enc = {k: v for k, v in batch.items()
           if k in ("faceid_embeds", "facial_idx", "facial_idx_mask",
                    "region_masks", "bg_masks")}
    enc.update(latent_mean=mean, latent_logvar=logvar,
               face_embeds=penult[:b],
               region_embeds=penult[b:].reshape(
                   b, batch["region_pixels"].shape[1], *penult.shape[1:]),
               prompt_embeds=prompt)
    return enc


def test_encoded_loss_bitwise_equals_pixel_loss():
    bundle = tiny_bundle()
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    schedule = NoiseSchedule.create(SchedulerConfig())
    config = TrainConfig(localization_layers=3)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=2, size=32, clip_size=28, id_dim=16).items()}
    rng = jax.random.PRNGKey(7)

    loss_px, metrics_px = jax.jit(
        lambda p, b, r: consistentid_loss(
            p, b, r, bundle=bundle, schedule=schedule, config=config)
    )(params, batch, rng)

    enc = _encode_batch(bundle, params, batch)
    # through the storage packing, like the real cache
    enc = {k: jnp.asarray(unpack_float(pack_float(np.asarray(v)))
                          if np.asarray(v).dtype in (np.float32,)
                          else np.asarray(v))
           for k, v in enc.items()}
    loss_enc, metrics_enc = jax.jit(
        lambda p, b, r: consistentid_loss_encoded(
            p, b, r, bundle=bundle, schedule=schedule, config=config)
    )(params, enc, rng)

    np.testing.assert_array_equal(np.asarray(loss_px), np.asarray(loss_enc))
    for k in metrics_px:
        np.testing.assert_array_equal(np.asarray(metrics_px[k]),
                                      np.asarray(metrics_enc[k]), err_msg=k)


def _tiny_corpus(tmp_path, n=2):
    rng = np.random.RandomState(3)
    manifest = []
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            tmp_path / f"p{i}.png")
        parsing = np.zeros((64, 64), np.uint8)
        parsing[8:40, 8:40] = 1    # skin
        parsing[20:28, 14:20] = 4  # eye -> a real region crop
        Image.fromarray(parsing).save(tmp_path / f"p{i}_mask.png")
        manifest.append({
            "image_path": f"p{i}.png",
            "parsing_mask_path": f"p{i}_mask.png",
            "vqa_llva": f"a photo of person number {i}.",
            "vqa_llva_more_face_detail":
                "The person has a small nose and two brown eyes.",
        })
    mpath = tmp_path / "JSON_all.json"
    mpath.write_text(json.dumps(manifest))
    return str(mpath)


def test_precompute_cache_reproduces_pixel_dataset_loss(tmp_path):
    from consistentid_tpu.conditioning import SimpleTokenizer

    bundle = tiny_bundle()
    params = bundle.fast_random_params(jax.random.PRNGKey(1))
    schedule = NoiseSchedule.create(SchedulerConfig())
    config = TrainConfig(localization_layers=3)
    mpath = _tiny_corpus(tmp_path)

    kw = dict(size=32, clip_size=bundle.vision_config.image_size,
              image_root=str(tmp_path), id_dim=16,
              text_drop_prob=0.0, image_drop_prob=0.0, seed=0)
    pixel = FGIDDataset(mpath, SimpleTokenizer(), **kw)
    # batch_size=8 > corpus size exercises the padding tail
    manifest = precompute_conditioning(bundle, params, pixel,
                                       str(tmp_path / "enc"), batch_size=8,
                                       progress=False)
    encoded = EncodedFGIDDataset(manifest, text_drop_prob=0.0,
                                 image_drop_prob=0.0, seed=0)
    assert len(encoded) == len(pixel) == 2

    px_batch = next(pixel.batches(2, shuffle=False))
    enc_batch = next(encoded.batches(2, shuffle=False))
    rng = jax.random.PRNGKey(11)
    loss_px, m_px = consistentid_loss(
        params, {k: jnp.asarray(v) for k, v in px_batch.items()}, rng,
        bundle=bundle, schedule=schedule, config=config)
    loss_enc, m_enc = consistentid_loss_encoded(
        params, {k: jnp.asarray(v) for k, v in enc_batch.items()}, rng,
        bundle=bundle, schedule=schedule, config=config)
    np.testing.assert_array_equal(np.asarray(loss_px), np.asarray(loss_enc))
    for k in m_px:
        np.testing.assert_array_equal(np.asarray(m_px[k]),
                                      np.asarray(m_enc[k]), err_msg=k)


class _FixedRandom:
    def __init__(self, value):
        self.value = value

    def random(self):
        return self.value

    def shuffle(self, x):
        pass


def test_encoded_dropout_swaps_null_tensors(tmp_path):
    """The two CFG branches (reference utils.py:111-118): p<0.1 drops text
    only, 0.1<=p<0.2 drops text AND image — verified to swap in exactly
    the cached null tensors, which themselves equal the frozen encoders
    run on empty caption / zero image."""
    from consistentid_tpu.conditioning import (
        SimpleTokenizer, prepare_trigger_token_idx,
        tokenize_and_mask_trigger_ends)

    bundle = tiny_bundle()
    params = bundle.fast_random_params(jax.random.PRNGKey(1))
    mpath = _tiny_corpus(tmp_path, n=1)
    tok = SimpleTokenizer()
    pixel = FGIDDataset(mpath, tok, size=32,
                        clip_size=bundle.vision_config.image_size,
                        image_root=str(tmp_path), id_dim=16, seed=0)
    manifest = precompute_conditioning(bundle, params, pixel,
                                       str(tmp_path / "enc"), batch_size=2,
                                       progress=False)
    ds = EncodedFGIDDataset(manifest, seed=0)  # default 0.1/0.1 probs

    ds.rng = _FixedRandom(0.5)                 # no drop
    kept = ds[0]
    ds.rng = _FixedRandom(0.05)                # branch 1: text only
    text_dropped = ds[0]
    ds.rng = _FixedRandom(0.15)                # branch 2: text + image
    both_dropped = ds[0]

    np.testing.assert_array_equal(text_dropped["prompt_embeds"],
                                  ds.null_prompt)
    np.testing.assert_array_equal(text_dropped["facial_idx"], ds.null_idx)
    np.testing.assert_array_equal(text_dropped["face_embeds"],
                                  kept["face_embeds"])  # image kept
    np.testing.assert_array_equal(both_dropped["prompt_embeds"],
                                  ds.null_prompt)
    np.testing.assert_array_equal(both_dropped["face_embeds"], ds.null_face)
    assert not np.array_equal(kept["prompt_embeds"], ds.null_prompt)

    # the null tensors ARE the frozen encoders on ""/zero-image (allclose,
    # not bitwise: precompute runs them jitted at its cache batch size and
    # XLA's fusion/tiling differs by batch context — observed diff 1.5e-8)
    null_ids, img_mask, fac_mask = tokenize_and_mask_trigger_ends(
        "", None, pixel.facial_token_id, tok)
    prompt, _ = bundle.text_encoder.apply(
        {"params": params["text_encoder"]},
        jnp.asarray(null_ids.astype(np.int32)))
    np.testing.assert_allclose(ds.null_prompt, np.asarray(prompt[0]),
                               rtol=1e-4, atol=1e-6)
    _, penult = bundle.image_encoder.apply(
        {"params": params["image_encoder"]},
        jnp.zeros((1, pixel.clip_size, pixel.clip_size, 3), jnp.float32))
    np.testing.assert_allclose(ds.null_face, np.asarray(penult[0]),
                               rtol=1e-4, atol=1e-6)
    _, _, null_idx, null_idx_mask = prepare_trigger_token_idx(
        img_mask, fac_mask, 1, pixel.max_num_facials)
    np.testing.assert_array_equal(ds.null_idx, np.asarray(null_idx[0]))
    np.testing.assert_array_equal(ds.null_idx_mask,
                                  np.asarray(null_idx_mask[0]))


def test_synthetic_encoded_batch_schema_feeds_loss():
    bundle = tiny_bundle()
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    schedule = NoiseSchedule.create(SchedulerConfig())
    batch = {k: jnp.asarray(v) for k, v in synthetic_encoded_batch(
        bundle, batch_size=2, latent_hw=8).items()}
    loss, metrics = consistentid_loss_encoded(
        params, batch, jax.random.PRNGKey(0), bundle=bundle,
        schedule=schedule, config=TrainConfig(localization_layers=3))
    assert np.isfinite(float(loss))
    assert set(metrics) == {"loss", "predict_loss", "facial_loss",
                            "background_loss"}


@pytest.mark.slow
def test_precompute_cli_then_train_cli(tmp_path):
    from consistentid_tpu.apps import precompute as precompute_cli
    from consistentid_tpu.apps import train as train_cli
    from consistentid_tpu.core import TrainConfig
    from consistentid_tpu.io.checkpoint import CheckpointManager
    from consistentid_tpu.training import (create_train_state,
                                           warm_start_ip_projections)

    n_dev = len(jax.devices())
    mpath = _tiny_corpus(tmp_path, n=2 * n_dev)
    out = str(tmp_path / "enc")
    assert precompute_cli.main([
        "--tiny", "--manifest", mpath, "--data-root", str(tmp_path),
        "--out", out, "--resolution", "32", "--batch-size", "4",
        "--dtype", "fp32"]) == 0
    run_dir = str(tmp_path / "runs")
    train_cli.main([
        "--tiny", "--encoded",
        "--manifest", f"{out}/encoded_manifest.json",
        "--output-dir", run_dir, "--epochs", "1",
        "--batch-per-device", "1", "--max-steps", "2", "--save-steps", "2",
        "--localization-layers", "3", "--dtype", "fp32"])

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(42))
    params["unet"] = warm_start_ip_projections(params["unet"])
    restored = CheckpointManager(run_dir).restore(
        create_train_state(params, TrainConfig()))
    assert int(restored.step) == 2
