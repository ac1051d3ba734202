"""Data-parallel ConsistentID adapter training step (shard_map over ICI).

TPU-native replacement for the reference's accelerate/NCCL DDP loop
(train.py:93-292): one jit-compiled step under shard_map on a (data,) mesh —
VAE encode, CLIP encodes, adapter forward, UNet with attention-prob capture,
3-term loss, psum-mean gradients, optax AdamW on the trainable subtree only
(proj + facial encoder + the UNet's LoRA/IP parameters; everything else
frozen, train.py:120-123,181-195).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.config import TrainConfig
from ..models import localization_layer_names
from ..models.vae import AutoencoderKL
from ..sampling import NoiseSchedule
from .losses import collect_attn_probs, localization_loss, masked_mse

TRAINABLE_UNET_MARKERS = ("_lora", "to_k_ip", "to_v_ip")


def is_trainable_path(path: Tuple[str, ...]) -> bool:
    """proj / facial_encoder fully trainable; in the UNet only LoRA + IP
    projections (reference train.py:182-185 'requires_grad' partition)."""
    if path[0] in ("proj", "facial_encoder"):
        return True
    if path[0] == "unet":
        return any(m in part for part in path for m in TRAINABLE_UNET_MARKERS)
    return False


def split_params(params: Dict) -> Tuple[Dict, Dict]:
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if is_trainable_path(k)}
    frozen = {k: v for k, v in flat.items() if not is_trainable_path(k)}
    return (traverse_util.unflatten_dict(trainable),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def warm_start_ip_projections(unet_params: Dict) -> Dict:
    """Initialize each cross-attention's to_k_ip/to_v_ip from its own
    to_k/to_v (reference train.py:168-174)."""
    flat = dict(traverse_util.flatten_dict(unet_params))
    for key in list(flat):
        if key[-2] == "to_k_ip":
            src = key[:-2] + ("to_k", key[-1])
        elif key[-2] == "to_v_ip":
            src = key[:-2] + ("to_v", key[-1])
        else:
            continue
        if src in flat:
            # COPY, never alias: to_k_ip lands in the trainable partition
            # while to_k stays frozen — if they shared one buffer, a
            # donated train step would donate the same buffer twice
            # (XLA INVALID_ARGUMENT: "donate the same buffer twice")
            flat[key] = jnp.array(flat[src])
    return traverse_util.unflatten_dict(flat)


class TrainState(NamedTuple):
    trainable: Dict
    frozen: Dict
    opt_state: Any
    step: jax.Array


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=config.learning_rate,
        b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps,
        weight_decay=config.weight_decay,
        mu_dtype=jnp.dtype(config.mu_dtype))


def create_train_state(params: Dict, config: TrainConfig) -> TrainState:
    trainable, frozen = split_params(params)
    opt = make_optimizer(config)
    return TrainState(trainable=trainable, frozen=frozen,
                      opt_state=opt.init(trainable),
                      step=jnp.zeros((), jnp.int32))


def consistentid_loss(
    params: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    bundle,                      # pipelines.SD15Bundle
    schedule: NoiseSchedule,
    config: TrainConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One device's loss. batch fields (leading dim = per-device batch):
      images         (B, H, W, 3)  in [-1, 1]
      clean_ids      (B, 77)       marker-stripped token ids
      face_pixels    (B, S, S, 3)  CLIP-preprocessed reference image
      region_pixels  (B, 5, S, S, 3)
      faceid_embeds  (B, 512)
      facial_idx     (B, 5) int32, facial_idx_mask (B, 5) bool
      region_masks   (B, 5, Hm, Wm) localization segmaps
      bg_masks       (B, Hm, Wm)    WithoutBackground mask
    """
    rng_noise, rng_t, rng_vae, rng_mask = jax.random.split(rng, 4)
    b = batch["images"].shape[0]

    # frozen encoders (no grad -> stop_gradient keeps memory bounded)
    latents = bundle.vae.apply({"params": params["vae"]}, batch["images"],
                               rng_vae, method=AutoencoderKL.encode)

    s = bundle.vision_config.image_size
    n_regions = batch["region_pixels"].shape[1]
    vit_in = jnp.concatenate(
        [batch["face_pixels"],
         batch["region_pixels"].reshape(-1, s, s, 3)], axis=0)
    _, penult = bundle.image_encoder.apply(
        {"params": params["image_encoder"]}, vit_in)
    image_embeds = penult[:b]
    region_embeds = penult[b:].reshape(b, n_regions, *penult.shape[1:])

    prompt_embeds, _ = bundle.text_encoder.apply(
        {"params": params["text_encoder"]}, batch["clean_ids"])

    return _adapter_losses(params, batch, latents, image_embeds,
                           region_embeds, prompt_embeds,
                           (rng_noise, rng_t, rng_mask),
                           bundle=bundle, schedule=schedule, config=config)


def consistentid_loss_encoded(
    params: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    bundle,                      # pipelines.SD15Bundle
    schedule: NoiseSchedule,
    config: TrainConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """consistentid_loss on PRECOMPUTED frozen-encoder outputs
    (training/precompute.py): the VAE/ViT-H/CLIP-text forwards — measured
    ~28% of the 512px batch-8 step's device time, all of it frozen
    recomputation — happen once per corpus instead of every step. Batch
    fields: latent_mean/latent_logvar (VAE posterior moments),
    face_embeds/region_embeds (ViT-H penultimate states), prompt_embeds,
    plus the passthrough fields of consistentid_loss. Bitwise-identical
    losses given the same rng (the posterior is re-sampled here exactly as
    AutoencoderKL.encode does; CFG dropout happens in the encoded dataset
    by swapping in the precomputed null-conditioning tensors)."""
    rng_noise, rng_t, rng_vae, rng_mask = jax.random.split(rng, 4)
    # cast cached tensors back to the graph dtype BEFORE sampling so the
    # posterior noise draw + arithmetic happen at exactly the dtype
    # AutoencoderKL.encode used (bitwise equality with the pixel path)
    mean = batch["latent_mean"].astype(bundle.dtype)
    logvar = batch["latent_logvar"].astype(bundle.dtype)
    sample = mean + jnp.exp(0.5 * logvar) * \
        jax.random.normal(rng_vae, mean.shape, mean.dtype)
    latents = sample * bundle.vae_config.scaling_factor
    return _adapter_losses(params, batch, latents,
                           batch["face_embeds"].astype(bundle.dtype),
                           batch["region_embeds"].astype(bundle.dtype),
                           batch["prompt_embeds"].astype(bundle.dtype),
                           (rng_noise, rng_t, rng_mask),
                           bundle=bundle, schedule=schedule, config=config)


def _adapter_losses(params, batch, latents, image_embeds, region_embeds,
                    prompt_embeds, rngs, *, bundle, schedule, config):
    """Shared tail of the SD1.5 objective: q-sample, adapters, UNet with
    column-gathered attention capture, 3-term loss (reference
    train.py:41-91). Frozen-encoder outputs arrive as arguments so the
    pixel path (consistentid_loss) and the precomputed path
    (consistentid_loss_encoded) provably share every line after encoding."""
    rng_noise, rng_t, rng_mask = rngs
    b = latents.shape[0]
    latents = jax.lax.stop_gradient(latents)
    image_embeds = jax.lax.stop_gradient(image_embeds)
    region_embeds = jax.lax.stop_gradient(region_embeds)
    prompt_embeds = jax.lax.stop_gradient(prompt_embeds)

    noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
    timesteps = jax.random.randint(
        rng_t, (b,), 0, schedule.config.num_train_timesteps)
    noisy = schedule.add_noise(latents, noise, timesteps)

    # adapters (trainable)
    faceid_tokens = bundle.proj.apply(
        {"params": params["proj"]}, batch["faceid_embeds"], image_embeds)
    fused = bundle.facial_encoder.apply(
        {"params": params["facial_encoder"]}, prompt_embeds, region_embeds,
        batch["facial_idx"], batch["facial_idx_mask"])
    context = jnp.concatenate([fused, faceid_tokens], axis=1)

    capture = localization_layer_names(config.localization_layers)
    # capture_cols: sow only the <=5 facial-token softmax columns the
    # localization loss reads (16x fewer capture bytes than the full
    # (B·H, Sq, K) fp32 maps — the r3 roofline's top bandwidth consumer)
    eps_pred, inter = bundle.unet.apply(
        {"params": params["unet"]}, noisy, timesteps, context,
        capture_layers=capture, capture_cols=batch["facial_idx"],
        mutable=["intermediates"])

    # random foreground masking (p = mask_loss_prob): when it fires, the
    # predict loss itself is computed on masked pred/target
    lat_h, lat_w = latents.shape[1:3]
    bg = jax.image.resize(batch["bg_masks"].astype(jnp.float32),
                          (b, lat_h, lat_w), method="bilinear")[..., None]
    apply_mask = (jax.random.uniform(rng_mask, ()) <
                  config.mask_loss_prob).astype(jnp.float32)
    mask = apply_mask * bg + (1.0 - apply_mask)
    predict_loss = masked_mse(eps_pred, noise, mask)
    background_loss = masked_mse(eps_pred * bg, noise * bg)  # logged only

    probs = collect_attn_probs(inter["intermediates"])
    facial_loss = config.facial_weight * localization_loss(
        probs, batch["region_masks"], batch["facial_idx"],
        batch["facial_idx_mask"], pregathered=True)

    loss = predict_loss + facial_loss
    metrics = {"loss": loss, "predict_loss": predict_loss,
               "facial_loss": facial_loss,
               "background_loss": background_loss}
    return loss, metrics


def make_train_step(bundle, schedule: NoiseSchedule, config: TrainConfig,
                    mesh: Optional[Mesh] = None, data_axis: str = "data",
                    loss_fn_impl=None, donate: bool = False):
    """Build the jitted (optionally shard_mapped) train step.

    Gradient accumulation (config.grad_accum_steps > 1) runs as a lax.scan
    over microbatches with a loop-carried grad pytree — the TPU-native form
    of accelerate.accumulate (reference train.py:223). Each batch leaf must
    then have leading dims (accum_steps, per_device_batch, ...).

    donate=True donates the input TrainState so XLA updates params/opt
    state in place (halves peak state HBM; the production train loop and
    bench enable it — callers must not reuse the passed state afterwards).
    """
    donate_kw = {"donate_argnums": (0,)} if donate else {}
    step_fn = _build_step_fn(bundle, schedule, config, mesh, data_axis,
                             loss_fn_impl)
    if mesh is None:
        return jax.jit(step_fn, **donate_kw)

    pspec_state = TrainState(trainable=P(), frozen=P(), opt_state=P(),
                             step=P())
    # grad-accum batches arrive as (accum, global_batch, ...): shard the
    # per-example dim, replicate the accum dim each device scans over
    accum = config.grad_accum_steps
    batch_spec = P(None, data_axis) if accum > 1 else P(data_axis)
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(pspec_state, batch_spec, P()),
        out_specs=(pspec_state, P()))
    return jax.jit(sharded, **donate_kw)


def make_multi_train_step(bundle, schedule: NoiseSchedule,
                          config: TrainConfig, n_steps: int,
                          mesh: Optional[Mesh] = None,
                          data_axis: str = "data", loss_fn_impl=None,
                          donate: bool = False):
    """N distinct optimizer steps per dispatch, as one lax.scan.

    Amortizes per-call host->device dispatch latency, which dominates small
    executables on remote/tunneled TPUs: the 512px batch-2 step is ~0.19 s
    of device compute but ~0.40 s wall per individual dispatch through the
    tunnel (profiled — see ROUND_NOTES round 2). Each batch leaf must have
    leading dims (n_steps, per_device_batch, ...) — or
    (n_steps, accum, ...) under gradient accumulation; the per-step rng is
    folded from the call rng. Returned metrics are stacked (n_steps, ...).
    """
    step_fn = _build_step_fn(bundle, schedule, config, mesh, data_axis,
                             loss_fn_impl)

    def multi(state: TrainState, batches: Dict, rng: jax.Array):
        def body(s, inp):
            i, b = inp
            s, m = step_fn(s, b, jax.random.fold_in(rng, i))
            return s, m

        return jax.lax.scan(body, state, (jnp.arange(n_steps), batches))

    donate_kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is None:
        return jax.jit(multi, **donate_kw)

    pspec_state = TrainState(trainable=P(), frozen=P(), opt_state=P(),
                             step=P())
    accum = config.grad_accum_steps
    batch_spec = (P(None, None, data_axis) if accum > 1
                  else P(None, data_axis))
    sharded = shard_map(
        multi, mesh=mesh,
        in_specs=(pspec_state, batch_spec, P()),
        out_specs=(pspec_state, P()))
    return jax.jit(sharded, **donate_kw)


def _build_step_fn(bundle, schedule: NoiseSchedule, config: TrainConfig,
                   mesh: Optional[Mesh], data_axis: str, loss_fn_impl):
    optimizer = make_optimizer(config)
    loss_impl = loss_fn_impl or consistentid_loss
    accum = config.grad_accum_steps

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def grad_of(micro, micro_rng):
            def loss_fn(trainable):
                params = merge_params(trainable, state.frozen)
                return loss_impl(params, micro, micro_rng, bundle=bundle,
                                 schedule=schedule, config=config)
            return jax.grad(loss_fn, has_aux=True)(state.trainable)

        if accum > 1:
            def body(carry, inp):
                micro, key = inp
                g, m = grad_of(micro, key)
                return (jax.tree_util.tree_map(jnp.add, carry[0], g),
                        jax.tree_util.tree_map(jnp.add, carry[1], m)), None

            zero_g = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.trainable)
            g0, m0 = grad_of(
                jax.tree_util.tree_map(lambda x: x[0], batch),
                jax.random.fold_in(rng, 0))
            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                jnp.arange(1, accum))
            (grads, metrics), _ = jax.lax.scan(body, (g0, m0), (rest, keys))
            grads = jax.tree_util.tree_map(lambda x: x / accum, grads)
            metrics = jax.tree_util.tree_map(lambda x: x / accum, metrics)
        else:
            grads, metrics = grad_of(batch, rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, data_axis)
            metrics = jax.lax.pmean(metrics, data_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return TrainState(trainable=trainable, frozen=state.frozen,
                          opt_state=opt_state, step=state.step + 1), metrics

    return step_fn
