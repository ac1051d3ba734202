"""ConsistentID SDXL text-to-image pipeline, TPU-native.

Equivalent surface to the reference ConsistentIDStableDiffusionXLPipeline
(pipline_StableDiffusionXL_ConsistentID.py:44-692):
  - dual tokenizers / text encoders, penultimate hidden states concatenated
    to 2048-d (:514-524); pooled embeds from text_encoder_2;
  - `text_time` micro-conditioning (add_time_ids + pooled, :527-539,:631);
  - FacialEncoder with 2048-d output, shortcut=True ID projection (:568),
    1280px region-mask resolution (:570);
  - per-branch negative AND pooled switching at the merge step (:619-628);
  - fp32 VAE decode (force_upcast, :670-672).

Inherits all host-side prepare machinery from the SD1.5 pipeline; the encode
and denoise cores are SDXL-specific.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (AdapterConfig, CLIPTextConfig,
                           PipelineConfig, clip_text_bigg_config)
from ..models import AutoencoderKL, CLIPTextEncoder
from ..sampling import CondBranch, denoise, make_plan
from .consistentid_sd15 import ConsistentIDPipeline, SD15Bundle


def sdxl_adapter_config(**overrides) -> AdapterConfig:
    base = dict(cross_attention_dim=2048, facial_output_dim=2048,
                shortcut=True)
    base.update(overrides)
    return AdapterConfig(**base)


@dataclass
class SDXLBundle(SD15Bundle):
    """SDXL model set: adds the bigG second text encoder; pooled projection
    dim comes from text_config_2.hidden_size."""

    text_config_2: CLIPTextConfig = field(
        default_factory=clip_text_bigg_config)

    def __post_init__(self):
        super().__post_init__()
        self.text_encoder_2 = CLIPTextEncoder(self.text_config_2,
                                              dtype=self.dtype)

    def init_params(self, rng: jax.Array, latent_hw: int = 8) -> Dict:
        params = super().init_params(rng, latent_hw)
        t2 = self.text_config_2
        params["text_encoder_2"] = self.text_encoder_2.init(
            jax.random.fold_in(rng, 99),
            jnp.zeros((1, t2.max_position_embeddings), jnp.int32))["params"]
        return params


class ConsistentIDXLPipeline(ConsistentIDPipeline):
    """SDXL generate(); requires bundle.unet_config.addition_embed_type ==
    'text_time' and a second tokenizer."""

    def __init__(self, bundle: SDXLBundle, params: Dict, tokenizer,
                 tokenizer_2=None, pipeline_config=None,
                 scheduler_config=None, face_parser=None, face_embedder=None,
                 mesh=None):
        if pipeline_config is None:
            pipeline_config = PipelineConfig(
                height=1024, width=1024, guidance_scale=7.5,
                num_inference_steps=50, start_merge_step=30)
        super().__init__(bundle, params, tokenizer,
                         pipeline_config=pipeline_config,
                         scheduler_config=scheduler_config,
                         face_parser=face_parser,
                         face_embedder=face_embedder,
                         mesh=mesh)
        self.tokenizer_2 = tokenizer_2 or tokenizer
        if hasattr(self.tokenizer_2, "add_tokens"):
            self.tokenizer_2.add_tokens(["<|image|>", "<|facial|>"])
        self.region_mask_size = 1280   # reference SDXL :570

    # -- SDXL dual-tower text encode --

    def _encode_dual(self, params, ids1, ids2):
        """Penultimate hidden states of both towers concatenated (2048-d),
        plus pooled output of tower 2."""
        h1, _ = self.bundle.text_encoder.apply(
            {"params": params["text_encoder"]}, ids1,
            output_hidden_state_index=-2)
        h2, pooled2 = self.bundle.text_encoder_2.apply(
            {"params": params["text_encoder_2"]}, ids2,
            output_hidden_state_index=-2)
        return jnp.concatenate([h1, h2], axis=-1), pooled2

    def encode_embeddings_xl(self, params, cond):
        b = self.bundle
        a = b.adapter_config

        enc_marked, pooled_marked = self._encode_dual(
            params, cond["clean_ids"], cond["clean_ids2"])
        enc_text_only, pooled_text_only = self._encode_dual(
            params, cond["text_only_ids"], cond["text_only_ids2"])
        enc_negative, pooled_negative = self._encode_dual(
            params, cond["negative_ids"], cond["negative_ids2"])

        # one batched ViT forward over stacked requests, mirroring the
        # SD1.5 path (consistentid_sd15.py:353-367): [face x B, zeros,
        # regions x B*5] — request batches (generate_batch/serving) work
        # identically on the 2048-d path
        size = b.vision_config.image_size
        bs, n_regions = cond["region_pixels"].shape[:2]
        regions = cond["region_pixels"].reshape(-1, size, size, 3)
        vit_in = jnp.concatenate(
            [cond["face_pixels"],
             jnp.zeros((1, size, size, 3), cond["face_pixels"].dtype),
             regions], axis=0)
        _, penult = b.image_encoder.apply(
            {"params": params["image_encoder"]}, vit_in)
        face_emb, zero_emb = penult[:bs], penult[bs:bs + 1]
        region_embs = penult[bs + 1:].reshape(
            bs, n_regions, *penult.shape[1:])
        zero_regions = jnp.broadcast_to(zero_emb[:, None], region_embs.shape)

        proj_apply = functools.partial(b.proj.apply, {"params": params["proj"]})
        faceid_tokens = proj_apply(cond["faceid_embeds"], face_emb,
                                   shortcut=a.shortcut, scale=a.shortcut_scale)
        zero_emb_b = jnp.broadcast_to(zero_emb, (bs, *zero_emb.shape[1:]))
        uncond_faceid_tokens = proj_apply(
            jnp.zeros_like(cond["faceid_embeds"]), zero_emb_b,
            shortcut=a.shortcut, scale=a.shortcut_scale)

        fe_apply = functools.partial(b.facial_encoder.apply,
                                     {"params": params["facial_encoder"]})
        fused = fe_apply(enc_marked, region_embs, cond["facial_idx"],
                         cond["facial_idx_mask"])
        uncond_fused = fe_apply(enc_negative, zero_regions,
                                cond["facial_idx"], cond["facial_idx_mask"])

        facial = CondBranch(
            context=jnp.concatenate([fused, faceid_tokens], axis=1),
            null=jnp.concatenate([uncond_fused, uncond_faceid_tokens], axis=1),
            pooled=pooled_marked, pooled_null=pooled_negative)
        text = CondBranch(
            context=jnp.concatenate([enc_text_only, faceid_tokens], axis=1),
            null=jnp.concatenate([enc_negative, uncond_faceid_tokens], axis=1),
            pooled=pooled_text_only, pooled_null=pooled_negative)
        return text, facial

    def _calibration_batch(self, params, cond):
        """SDXL twist on the SD1.5 calibration batch: dual-tower contexts
        plus the pooled/time_ids added-cond the serving graph always
        feeds the UNet (sampling/sampler.py added handling)."""
        text_b, facial_b = self.encode_embeddings_xl(params, cond)
        ctx = jnp.concatenate(
            [facial_b.null, facial_b.context, text_b.context], axis=0)
        pooled = jnp.concatenate(
            [facial_b.pooled_null, facial_b.pooled, text_b.pooled], axis=0)
        time_ids = jnp.concatenate([cond["time_ids"]] * 3, axis=0)
        return ctx, {"text_embeds": pooled, "time_ids": time_ids}

    def _generate_core(self, params, cond, latents, guidance_scale,
                       start_merge_step, num_steps, scheduler, ip_scale,
                       lora_scale, rng=None, cache_interval=1):
        text_b, facial_b = self.encode_embeddings_xl(params, cond)
        n = latents.shape[0]
        time_ids = cond["time_ids"]
        if text_b.context.shape[0] != n:
            rep = lambda e: (jnp.repeat(e, n // e.shape[0], axis=0)
                             if e is not None else None)
            text_b, facial_b = (
                CondBranch(context=rep(b.context), null=rep(b.null),
                           pooled=rep(b.pooled),
                           pooled_null=rep(b.pooled_null))
                for b in (text_b, facial_b))
            time_ids = rep(time_ids)
        plan = make_plan(self.schedule, scheduler, num_steps)

        unet, unet_params = self.bundle.infer_unet(params["unet"], lora_scale)
        unet_fn, unet_cached_fn = self._unet_fns(unet, unet_params, ip_scale,
                                                 cache_interval)

        final = denoise(unet_fn, latents, text_b, facial_b, plan,
                        guidance_scale, start_merge_step, rng=rng,
                        time_ids=time_ids, cache_interval=cache_interval,
                        unet_cached_fn=unet_cached_fn)
        if self.bundle.vae_config.force_upcast:
            # fp32 VAE decode (SDXL force_upcast path, reference :670-672 —
            # gated on the vae config exactly like the reference)
            vae_params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, params["vae"])
            fp32_vae = AutoencoderKL(self.bundle.vae_config,
                                     dtype=jnp.float32)
            return fp32_vae.apply({"params": vae_params},
                                  final.astype(jnp.float32),
                                  method=AutoencoderKL.decode)
        return self.bundle.vae.apply({"params": params["vae"]}, final,
                                     method=AutoencoderKL.decode)

    def _step_example(self):
        """SDXL variant: dual-tower context width + pooled/time_ids added
        conds in the in-scan CFG UNet pair call."""
        params, cond, latents = self._last_core_args[:3]
        n = latents.shape[0]
        text_b, _ = jax.eval_shape(self.encode_embeddings_xl, params, cond)
        x = jnp.zeros((2 * n, *latents.shape[1:]), latents.dtype)
        t = jnp.zeros((2 * n,), jnp.float32)
        ctx = jnp.zeros((2 * n, text_b.context.shape[1],
                         text_b.context.shape[2]), text_b.context.dtype)
        added = {
            "text_embeds": jnp.zeros((2 * n, text_b.pooled.shape[-1]),
                                     text_b.pooled.dtype),
            "time_ids": jnp.zeros((2 * n, 6), jnp.float32),
        }
        return x, t, ctx, added

    def prepare_conditioning(self, prompt, face_image, parsing_labels=None,
                             faceid_embeds=None, face_caption=None,
                             negative_prompt="", max_num_facials=5,
                             original_size=None, target_size=None,
                             crops_coords_top_left=(0, 0)):
        cond = super().prepare_conditioning(
            prompt, face_image, parsing_labels=parsing_labels,
            faceid_embeds=faceid_embeds, face_caption=face_caption,
            negative_prompt=negative_prompt, max_num_facials=max_num_facials)
        # second-tokenizer ids for the dual towers (reference :378-385)
        tok2 = self.tokenizer_2

        def pad2(text):
            ids = list(tok2.encode(text))[: tok2.model_max_length]
            ids += [tok2.pad_token_id] * (tok2.model_max_length - len(ids))
            return np.asarray(ids, np.int32)[None]

        # rebuild the marked/clean ids with tokenizer_2
        from ..conditioning import tokenize_and_mask_trigger_ends
        fac2 = tok2.convert_tokens_to_ids("<|facial|>")
        # reconstruct prompt_face from the tokenizer-1 path outputs: redo the
        # host composition with tokenizer_2 lengths is equivalent here since
        # both CLIP tokenizers share model_max_length 77
        cond["clean_ids2"] = cond["clean_ids"].copy() if tok2 is self.tokenizer \
            else tokenize_and_mask_trigger_ends(
                self._last_prompt_face, None, fac2, tok2)[0].astype(np.int32)
        cond["text_only_ids2"] = (cond["text_only_ids"].copy()
                                  if tok2 is self.tokenizer
                                  else pad2(self._last_prompt_text_only))
        cond["negative_ids2"] = (cond["negative_ids"].copy()
                                 if tok2 is self.tokenizer
                                 else pad2(negative_prompt))
        h = target_size or (self.config.height, self.config.width)
        orig = original_size or h
        cond["time_ids"] = np.asarray(
            [[orig[0], orig[1], crops_coords_top_left[0],
              crops_coords_top_left[1], h[0], h[1]]], np.float32)
        return cond
