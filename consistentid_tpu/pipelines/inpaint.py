"""ConsistentID inpainting and ControlNet-inpainting pipelines.

Equivalents of the reference pipelines/StableDIffusionInpaint_ConsistentID.py
(:94-389) and StableDIffusionControlNetInpaint_ConsistentID.py (:94-486):
  - strength -> timestep truncation (:246-248): run only the last
    int(T * strength) steps, starting from noise-perturbed image latents;
  - masked_image = init * (mask < 0.5) (:241);
  - 4-channel UNet path with per-step latent recomposition
    (1-mask) * init_noised + mask * latents (:340-352), or the 9-channel
    inpaint-UNet path via channel concat (:320-321);
  - ControlNet residuals per step with a start/end keep schedule
    (:363-370,:405-425), expressed as a per-step conditioning-scale table
    folded into the same lax.scan.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..models import AutoencoderKL
from ..models.controlnet import ControlNet
from ..sampling import CondBranch, denoise, make_plan
from ..sampling.schedulers import SamplerPlan, plan_tail
from ..utils.image import sd_image_preprocess
from .consistentid_sd15 import ConsistentIDPipeline


def _noised_init_latents(plan: SamplerPlan, image_latents, noise):
    """Image latents noised to the plan's first step, in the plan's own
    latent space (VP for ddim/ddpm/dpmpp, sigma space for euler)."""
    return (jnp.float32(plan.noise_x[0]) * image_latents
            + jnp.float32(plan.noise_e[0]) * noise)


def _inpaint_target_table(plan: SamplerPlan, image_latents, noise):
    """(T, B, h, w, C) per-step blend targets for 4-channel inpainting:
    init latents re-noised to the NEXT step's noise level; the final step
    blends the clean image latents (reference :344-352)."""
    nx = jnp.asarray(np.concatenate([plan.noise_x[1:], [1.0]]), jnp.float32)
    ne = jnp.asarray(np.concatenate([plan.noise_e[1:], [0.0]]), jnp.float32)
    return (nx[:, None, None, None, None] * image_latents[None]
            + ne[:, None, None, None, None] * noise[None])


def preprocess_mask(mask_image: Image.Image, height: int, width: int,
                    latent_h: int, latent_w: int):
    """Binary inpaint mask -> (pixel mask (1,H,W,1), latent mask (1,h,w,1))."""
    m = mask_image.convert("L").resize((width, height), Image.NEAREST)
    m = (np.asarray(m, np.float32) / 255.0 >= 0.5).astype(np.float32)
    latent = np.asarray(Image.fromarray((m * 255).astype(np.uint8)).resize(
        (latent_w, latent_h), Image.NEAREST), np.float32) / 255.0
    return m[None, :, :, None], latent[None, :, :, None]


class ConsistentIDInpaintPipeline(ConsistentIDPipeline):
    """generate(prompt, face_image, init_image, mask_image, strength=...)."""

    def _inpaint_core(self, params, cond, noise, guidance_scale,
                      start_merge_step, num_steps, scheduler, ip_scale,
                      lora_scale, strength, vae_rng, sampler_rng=None):
        bundle = self.bundle
        null_e, aug_e, text_e = self.encode_embeddings(params, cond)
        plan = plan_tail(make_plan(self.schedule, scheduler, num_steps),
                         strength)
        is_full_strength = strength >= 1.0

        vae_apply = functools.partial(bundle.vae.apply,
                                      {"params": params["vae"]})
        image_latents = vae_apply(cond["init_image"], vae_rng,
                                  method=AutoencoderKL.encode)
        latent_mask = cond["latent_mask"]

        nine_channel = bundle.unet_config.sample_channels == 9
        if nine_channel:
            masked_image = cond["init_image"] * (cond["pixel_mask"] < 0.5)
            masked_latents = vae_apply(masked_image, vae_rng,
                                       method=AutoencoderKL.encode)

        # initial latents: image latents noised to the first kept step, in
        # the plan's own latent space (pure noise when strength == 1,
        # reference prepare_latents semantics)
        if is_full_strength:
            latents = noise
        else:
            latents = _noised_init_latents(plan, image_latents, noise)
            # override the plan's init_scale (only meaningful for pure noise)
            plan = dataclasses.replace(plan, init_scale=1.0)

        inpaint_mask = inpaint_targets = None
        if not nine_channel:
            inpaint_targets = _inpaint_target_table(plan, image_latents,
                                                    noise)
            inpaint_mask = latent_mask

        unet, unet_params = bundle.infer_unet(params["unet"], lora_scale)

        def unet_fn(x, t, context, added, step_i):
            if nine_channel:
                m2 = jnp.concatenate([latent_mask, latent_mask], axis=0)
                ml2 = jnp.concatenate([masked_latents, masked_latents], axis=0)
                x = jnp.concatenate([x, m2.astype(x.dtype),
                                     ml2.astype(x.dtype)], axis=-1)
            return unet.apply(
                {"params": unet_params}, x, t, context,
                added_cond=added, ip_scale=ip_scale)

        final = denoise(unet_fn, latents,
                        CondBranch(context=text_e, null=null_e),
                        CondBranch(context=aug_e, null=null_e),
                        plan, guidance_scale, start_merge_step,
                        rng=sampler_rng,
                        inpaint_mask=inpaint_mask,
                        inpaint_targets=inpaint_targets)
        return vae_apply(final, method=AutoencoderKL.decode)

    def generate(self, prompt: str, face_image: Image.Image,
                 init_image: Image.Image, mask_image: Image.Image,
                 strength: float = 1.0, negative_prompt: str = "",
                 seed: int = 0, height: Optional[int] = None,
                 width: Optional[int] = None,
                 num_inference_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 start_merge_step: Optional[int] = None,
                 scheduler: Optional[str] = None, ip_scale: float = 1.0,
                 lora_scale: float = 1.0, parsing_labels=None,
                 faceid_embeds=None, return_device: bool = False,
                 **extra) -> np.ndarray:
        cfg = self.config
        height = height or cfg.height
        width = width or cfg.width
        num_steps = num_inference_steps or cfg.num_inference_steps
        scheduler = scheduler or cfg.scheduler
        sf = self.bundle.vae_scale_factor
        lh, lw = height // sf, width // sf

        cond = self.prepare_conditioning(
            prompt, face_image, parsing_labels=parsing_labels,
            faceid_embeds=faceid_embeds, negative_prompt=negative_prompt)
        cond["init_image"] = sd_image_preprocess(init_image, height, width)
        cond["pixel_mask"], cond["latent_mask"] = preprocess_mask(
            mask_image, height, width, lh, lw)
        cond = self._device_cond(cond)
        extra_cond = self._extra_cond(cond, height, width, **extra)

        rng = jax.random.PRNGKey(seed)
        noise = jax.random.normal(
            rng, (1, lh, lw, self.bundle.vae_config.latent_channels),
            jnp.float32)

        if not hasattr(self, "_inpaint_jit"):
            self._inpaint_jit = jax.jit(
                self._inpaint_core,
                static_argnames=("num_steps", "scheduler", "strength"))
        images = self._inpaint_jit(
            self.params, {**cond, **extra_cond}, noise,
            jnp.float32(guidance_scale if guidance_scale is not None
                        else cfg.guidance_scale),
            jnp.int32(start_merge_step if start_merge_step is not None
                      else cfg.start_merge_step),
            num_steps, scheduler, jnp.float32(ip_scale),
            jnp.float32(lora_scale), float(strength),
            jax.random.fold_in(rng, 1), jax.random.fold_in(rng, 2))
        if return_device:
            # device float images in [-1,1], the contract generate_async's
            # uint8 quantization relies on (consistentid_sd15.py:501-509)
            return images
        return self._postprocess(images)

    def generate_batch(self, *args, **kwargs):
        raise NotImplementedError(
            "batched inpainting is not supported; the inherited text-to-image "
            "batch path would silently ignore init_image/mask_image — call "
            "generate() per image (generate_async overlaps them)")

    def _extra_cond(self, cond, height, width, **extra):
        if extra:
            raise TypeError(
                f"unknown generate() arguments: {sorted(extra)}")
        return {}


class ConsistentIDControlNetInpaintPipeline(ConsistentIDInpaintPipeline):
    """Adds per-step ControlNet residuals (control image, keep schedule).

    Construct with controlnet=(ControlNet config or model) and its params in
    params["controlnet"]. guess_mode=True conditions the text branch only
    (reference :389-392) by zeroing the uncond half's residuals.
    """

    def __init__(self, *args, controlnet: Optional[ControlNet] = None,
                 controlnet_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0,
                 guess_mode: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.controlnet = controlnet or ControlNet(self.bundle.unet_config,
                                                   dtype=self.bundle.dtype)
        self.controlnet_scale = controlnet_scale
        self.control_guidance_start = control_guidance_start
        self.control_guidance_end = control_guidance_end
        self.guess_mode = guess_mode

    def _extra_cond(self, cond, height, width, control_image=None, **extra):
        if extra:
            raise TypeError(
                f"unknown generate() arguments: {sorted(extra)}")
        assert control_image is not None, "pass control_image=PIL"
        return {"control_image":
                jnp.asarray(sd_image_preprocess(control_image, height, width)
                            * 0.5 + 0.5)}  # control images stay in [0,1]

    def _inpaint_core(self, params, cond, noise, guidance_scale,
                      start_merge_step, num_steps, scheduler, ip_scale,
                      lora_scale, strength, vae_rng, sampler_rng=None):
        bundle = self.bundle
        null_e, aug_e, text_e = self.encode_embeddings(params, cond)
        plan = plan_tail(make_plan(self.schedule, scheduler, num_steps),
                         strength)

        vae_apply = functools.partial(bundle.vae.apply,
                                      {"params": params["vae"]})
        image_latents = vae_apply(cond["init_image"], vae_rng,
                                  method=AutoencoderKL.encode)
        latent_mask = cond["latent_mask"]

        if strength >= 1.0:
            latents = noise
        else:
            latents = _noised_init_latents(plan, image_latents, noise)
            plan = dataclasses.replace(plan, init_scale=1.0)

        inpaint_targets = _inpaint_target_table(plan, image_latents, noise)

        # controlnet keep schedule: 1 inside [start, end] of progress
        progress = (np.arange(plan.num_steps) + 0.5) / plan.num_steps
        keep = ((progress >= self.control_guidance_start) &
                (progress <= self.control_guidance_end)).astype(np.float32)
        scale_table = jnp.asarray(keep * self.controlnet_scale)

        control2 = jnp.concatenate([cond["control_image"]] * 2, axis=0)
        unet, unet_params = bundle.infer_unet(params["unet"], lora_scale)

        def unet_fn(x, t, context, added, step_i):
            down_res, mid_res = self.controlnet.apply(
                {"params": params["controlnet"]}, x, t, context, control2,
                conditioning_scale=scale_table[step_i], added_cond=added)
            if self.guess_mode:
                # guess mode conditions the text branch only: zero the
                # residuals of the uncond half (reference ControlNet-inpaint
                # :389-392 runs controlnet on the cond inputs alone)
                b = x.shape[0] // 2
                gate = jnp.concatenate(
                    [jnp.zeros((b,)), jnp.ones((b,))]).reshape(-1, 1, 1, 1)
                down_res = tuple(r * gate.astype(r.dtype) for r in down_res)
                mid_res = mid_res * gate.astype(mid_res.dtype)
            return unet.apply(
                {"params": unet_params}, x, t, context,
                added_cond=added, ip_scale=ip_scale,
                down_block_residuals=down_res, mid_residual=mid_res)

        final = denoise(unet_fn, latents,
                        CondBranch(context=text_e, null=null_e),
                        CondBranch(context=aug_e, null=null_e),
                        plan, guidance_scale, start_merge_step,
                        rng=sampler_rng,
                        inpaint_mask=latent_mask,
                        inpaint_targets=inpaint_targets)
        return vae_apply(final, method=AutoencoderKL.decode)
