"""ConsistentID image-to-image pipeline.

The reference ships a Base mixin expressly "for composing with other
diffusers pipelines" (pipelines/BaseConsistentID.py:27-368) and composes it
with the inpaint family; img2img is the remaining stock diffusers
composition a user of that mixin reaches for. Semantics follow the
diffusers StableDiffusionImg2ImgPipeline contract, expressed with the same
strength -> timestep-truncation machinery as our inpaint pipeline
(reference pipelines/StableDIffusionInpaint_ConsistentID.py:246-248):

  - encode the init image to latents through the VAE;
  - keep only the last ``int(T * strength)`` steps of the sampling plan;
  - start from the init latents noised to the first kept step
    (``strength >= 1`` degenerates to pure noise == text-to-image for the
    deterministic schedulers — ddim/euler/dpmpp/pndm; ancestral ddpm draws
    its in-scan noise from a differently-folded rng than the t2i path, so
    there the equivalence is distributional, not bitwise);
  - denoise with the full ConsistentID conditioning (3-way embeds, merge
    step, decoupled IP attention, LoRA) — no mask, no recomposition.
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
from ..sampling import CondBranch, denoise, make_plan
from ..sampling.schedulers import plan_tail
from ..utils.image import sd_image_preprocess
from .consistentid_sd15 import ConsistentIDPipeline
from .inpaint import _noised_init_latents


class ConsistentIDImg2ImgPipeline(ConsistentIDPipeline):
    """generate(prompt, face_image, init_image, strength=0.8, ...)."""

    def _img2img_core(self, params, cond, noise, guidance_scale,
                      start_merge_step, num_steps, scheduler, ip_scale,
                      lora_scale, strength, vae_rng, sampler_rng=None):
        bundle = self.bundle
        null_e, aug_e, text_e = self.encode_embeddings(params, cond)
        plan = plan_tail(make_plan(self.schedule, scheduler, num_steps),
                         strength)

        vae_apply = functools.partial(bundle.vae.apply,
                                      {"params": params["vae"]})
        if strength >= 1.0:
            # pure noise: identical to the text-to-image path (the init
            # image only contributes through the ID conditioning)
            latents = noise
        else:
            image_latents = vae_apply(cond["init_image"], vae_rng,
                                      method=AutoencoderKL.encode)
            latents = _noised_init_latents(plan, image_latents, noise)
            # init_scale is only meaningful for pure-noise starts
            plan = dataclasses.replace(plan, init_scale=1.0)

        unet, unet_params = bundle.infer_unet(params["unet"], lora_scale)

        def unet_fn(x, t, context, added, step_i):
            return unet.apply(
                {"params": unet_params}, x, t, context,
                added_cond=added, ip_scale=ip_scale)

        final = denoise(unet_fn, latents,
                        CondBranch(context=text_e, null=null_e),
                        CondBranch(context=aug_e, null=null_e),
                        plan, guidance_scale, start_merge_step,
                        rng=sampler_rng)
        return vae_apply(final, method=AutoencoderKL.decode)

    def generate(self, prompt: str, face_image: Image.Image,
                 init_image: Image.Image, strength: float = 0.8,
                 negative_prompt: str = "", seed: int = 0,
                 height: Optional[int] = None, width: Optional[int] = None,
                 num_inference_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 start_merge_step: Optional[int] = None,
                 scheduler: Optional[str] = None, ip_scale: float = 1.0,
                 lora_scale: float = 1.0, parsing_labels=None,
                 faceid_embeds=None, return_device: bool = False,
                 **extra) -> np.ndarray:
        if extra:
            raise TypeError(
                f"unknown generate() arguments: {sorted(extra)}")
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
        cond = self._device_cond(cond)

        rng = jax.random.PRNGKey(seed)
        noise = jax.random.normal(
            rng, (1, lh, lw, self.bundle.vae_config.latent_channels),
            jnp.float32)

        if not hasattr(self, "_img2img_jit"):
            self._img2img_jit = jax.jit(
                self._img2img_core,
                static_argnames=("num_steps", "scheduler", "strength"))
        images = self._img2img_jit(
            self.params, cond, noise,
            jnp.float32(guidance_scale if guidance_scale is not None
                        else cfg.guidance_scale),
            jnp.int32(start_merge_step if start_merge_step is not None
                      else cfg.start_merge_step),
            num_steps, scheduler, jnp.float32(ip_scale),
            jnp.float32(lora_scale), float(strength),
            jax.random.fold_in(rng, 1), jax.random.fold_in(rng, 2))
        if return_device:
            # device float images in [-1,1], the contract generate_async's
            # uint8 quantization relies on (consistentid_sd15.py:562-582)
            return images
        return self._postprocess(images)

    def generate_batch(self, *args, **kwargs):
        raise NotImplementedError(
            "batched img2img is not supported; the inherited text-to-image "
            "batch path would silently ignore init_image — call generate() "
            "per image (generate_async overlaps them)")
