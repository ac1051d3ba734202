"""SDXL ConsistentID training loss (reference train_SDXL.py:36-132).

Differences from the SD1.5 objective (training/train_step.consistentid_loss):
  - dual text towers: penultimate hidden states concatenated to 2048-d,
    pooled embeds from tower 2 (train_SDXL.py:294-300);
  - added_cond_kwargs = {text_embeds (pooled), time_ids} micro-conditioning
    from the dataset (:302-308, utils_SDXL.py:102-122);
  - localization_layers defaults to 3 (:47) — set via TrainConfig.

Use with make_train_step(..., loss_fn_impl=sdxl_consistentid_loss) and an
SDXLBundle. Extra batch fields: clean_ids2 (B, 77), time_ids (B, 6).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import localization_layer_names
from ..models.vae import AutoencoderKL
from ..sampling import NoiseSchedule
from .losses import collect_attn_probs, localization_loss, masked_mse


def sdxl_consistentid_loss(
    params: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    bundle,                      # pipelines.SDXLBundle
    schedule: NoiseSchedule,
    config,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    rng_noise, rng_t, rng_vae, rng_mask = jax.random.split(rng, 4)
    b = batch["images"].shape[0]

    latents = bundle.vae.apply({"params": params["vae"]}, batch["images"],
                               rng_vae, method=AutoencoderKL.encode)
    latents = jax.lax.stop_gradient(latents)
    noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
    timesteps = jax.random.randint(
        rng_t, (b,), 0, schedule.config.num_train_timesteps)
    noisy = schedule.add_noise(latents, noise, timesteps)

    s = bundle.vision_config.image_size
    n_regions = batch["region_pixels"].shape[1]
    vit_in = jnp.concatenate(
        [batch["face_pixels"],
         batch["region_pixels"].reshape(-1, s, s, 3)], axis=0)
    _, penult = bundle.image_encoder.apply(
        {"params": params["image_encoder"]}, vit_in)
    penult = jax.lax.stop_gradient(penult)
    image_embeds = penult[:b]
    region_embeds = penult[b:].reshape(b, n_regions, *penult.shape[1:])

    h1, _ = bundle.text_encoder.apply(
        {"params": params["text_encoder"]}, batch["clean_ids"],
        output_hidden_state_index=-2)
    h2, pooled2 = bundle.text_encoder_2.apply(
        {"params": params["text_encoder_2"]}, batch["clean_ids2"],
        output_hidden_state_index=-2)
    prompt_embeds = jax.lax.stop_gradient(
        jnp.concatenate([h1, h2], axis=-1))
    pooled2 = jax.lax.stop_gradient(pooled2)

    a = bundle.adapter_config
    faceid_tokens = bundle.proj.apply(
        {"params": params["proj"]}, batch["faceid_embeds"], image_embeds,
        shortcut=a.shortcut, scale=a.shortcut_scale)
    fused = bundle.facial_encoder.apply(
        {"params": params["facial_encoder"]}, prompt_embeds, region_embeds,
        batch["facial_idx"], batch["facial_idx_mask"])
    context = jnp.concatenate([fused, faceid_tokens], axis=1)

    added = {"text_embeds": pooled2, "time_ids": batch["time_ids"]}
    capture = localization_layer_names(config.localization_layers)
    eps_pred, inter = bundle.unet.apply(
        {"params": params["unet"]}, noisy, timesteps, context,
        added_cond=added, capture_layers=capture,
        capture_cols=batch["facial_idx"], mutable=["intermediates"])

    lat_h, lat_w = latents.shape[1:3]
    bg = jax.image.resize(batch["bg_masks"].astype(jnp.float32),
                          (b, lat_h, lat_w), method="bilinear")[..., None]
    apply_mask = (jax.random.uniform(rng_mask, ()) <
                  config.mask_loss_prob).astype(jnp.float32)
    mask = apply_mask * bg + (1.0 - apply_mask)
    predict_loss = masked_mse(eps_pred, noise, mask)
    background_loss = masked_mse(eps_pred * bg, noise * bg)

    probs = collect_attn_probs(inter["intermediates"])
    facial_loss = config.facial_weight * localization_loss(
        probs, batch["region_masks"], batch["facial_idx"],
        batch["facial_idx_mask"], pregathered=True)

    loss = predict_loss + facial_loss
    return loss, {"loss": loss, "predict_loss": predict_loss,
                  "facial_loss": facial_loss,
                  "background_loss": background_loss}
