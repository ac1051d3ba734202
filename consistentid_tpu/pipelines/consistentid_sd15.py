"""ConsistentID SD1.5 text-to-image pipeline, TPU-native.

Equivalent surface to the reference ConsistentIDStableDiffusionPipeline
(pipline_StableDiffusion_ConsistentID.py:33-613), restructured as
  host prepare (strings/masks/PIL -> fixed-shape numpy)
    -> one jitted encode+denoise+decode graph.

Key idiomatic departures (SURVEY.md §7.1):
  - all CLIP-vision work is batched into a single ViT forward of
    [face, zero, region x 5] (7 images) instead of the reference's 12
    sequential forwards (:181-185,202-203); the zero image's embedding is
    shared by the unconditional branches;
  - the 50-step CFG merge-step denoise loop is a lax.scan (sampling.denoise);
  - the VAE decode is part of the same compiled graph.

Perception inputs (face parsing labels + ArcFace embedding) are injected:
pass `parsing_labels`/`faceid_embeds` directly, or set `face_parser` /
`face_embedder` callables (models.bisenet / models.arcface provide them once
their weights are converted). A missing face embed falls back to zeros like
the reference (:220-221).
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..adapter import FacialEncoder, ProjPlusModel
from ..conditioning import (masks_for_unique_values, fetch_mask_raw_image,
                            prepare_trigger_token_idx,
                            process_text_with_markers,
                            tokenize_and_mask_trigger_ends)
from ..core.config import (AdapterConfig, PipelineConfig, SchedulerConfig,
                           UNetConfig, VAEConfig, CLIPTextConfig,
                           CLIPVisionConfig, sd15_unet_config)
from ..models import AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder, UNet
from ..models.lora import fold_lora_params
from ..ops.quant import (act_scales_from_calib, merge_act_scales,
                         quantize_params_like)
from ..sampling import CondBranch, NoiseSchedule, denoise, make_plan
from ..utils.image import center_crop_mask, clip_preprocess, postprocess_to_uint8

FACE_CAPTION_TEMPLATE = (
    "The person has one face, one nose, two eyes, two ears, and one mouth.")

# conditioning fields no jitted inference graph reads; kept host-side.
# (Uploading the (1, 5, 512, 512) fp32 region masks through a remote-TPU
# tunnel measured ~110 ms/call of pure waste; they exist for training's
# localization loss and for callers that want them, not for generate().)
DEVICE_COND_EXCLUDE = ("region_masks",)


@functools.partial(jax.jit, donate_argnums=(0,))
def _to_uint8_device(images: jax.Array) -> jax.Array:
    """[-1,1] float -> uint8 ON DEVICE, so the host fetch moves 1/4 the
    bytes (fp32 -> uint8) through the TPU tunnel. Semantics identical to
    utils.image.postprocess_to_uint8 (clip, *255, round-half-even)."""
    x = jnp.clip(images.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(x * 255).astype(jnp.uint8)
KEY_REGIONS = ("Face", "Left_Ear", "Right_Ear", "Left_Eye", "Right_Eye",
               "Nose", "Upper_Lip", "Lower_Lip")
MAX_CAPTION_CHARS = 330


def select_key_regions(parsing_mask_list: Dict) -> Dict:
    """Keep Face/Nose plus the first of each Ear/Eye/Lip pair (<=5 regions),
    reproducing reference get_prepare_facemask (:294-309)."""
    out, seen = {}, set()
    for key, mask in parsing_mask_list.items():
        if key not in KEY_REGIONS:
            continue
        if "_" in key:
            suffix = key.split("_")[1]
            if suffix in seen:
                continue
            seen.add(suffix)
        out[key] = mask
    return out


@dataclass
class SD15Bundle:
    """Model definitions + their parameters for one pipeline instance."""

    unet_config: UNetConfig
    adapter_config: AdapterConfig = field(default_factory=AdapterConfig)
    vae_config: VAEConfig = field(default_factory=VAEConfig)
    text_config: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    vision_config: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)
    dtype: Any = jnp.float32
    remat: bool = False   # rematerialize UNet blocks (training memory)
    remat_policy: str = "full"  # "full" | "dots" (save MXU outputs)
    # restructured GroupNorm+SiLU in the TRAINING UNet (ops/group_norm.py)
    # — A/B lever for the bandwidth-bound norm share of the train step;
    # the inference twin always runs the stock nn.GroupNorm (measured
    # faster in the denoise scan, 558410e)
    fused_gn: bool = False
    # "int8": W8A8 UNet serving path (ops/quant.py) — LoRA-folded kernels
    # quantized once per generate() inside the jitted graph, block convs +
    # attention/FF projections run on the int8 MXU (2x bf16 peak on v5e).
    # "int8_static": same int8 layers but with CALIBRATED per-tensor
    # activation scales (act_scales below) instead of the per-call amax
    # prologue — the prologue is bandwidth-bound and made dynamic int8 a
    # 35% net loss at SDXL 1024px (ROUND_NOTES r4). Calibrate via
    # pipeline.calibrate_int8().
    quant: str = "none"
    # act_scale tree for quant="int8_static" (module path -> {"act_scale"}),
    # from ops.quant.act_scales_from_calib over dynamic-int8 applies
    act_scales: Optional[Dict] = None

    _QUANT_MODES = {"none": False, "int8": True, "int8_static": "static"}

    def __post_init__(self):
        if self.quant not in self._QUANT_MODES:
            raise ValueError("quant must be one of "
                             f"{sorted(self._QUANT_MODES)}: {self.quant}")
        if self.quant == "int8_static" and self.act_scales is None:
            raise ValueError(
                "quant='int8_static' needs calibrated act_scales — run "
                "pipeline.calibrate_int8() (dynamic-int8 applies with "
                "mutable calib) and pass the result")
        self.unet = UNet(self.unet_config, dtype=self.dtype,
                         remat=self.remat, remat_policy=self.remat_policy,
                         fused_gn=self.fused_gn)
        # inference twin: LoRA folded into the base kernels (models/lora.py),
        # so the denoise scan runs a lora_rank=0 graph; with quant="int8*"
        # the twin additionally runs the W8A8 layers
        self.unet_infer = (UNet(
            dataclasses.replace(self.unet_config, lora_rank=0),
            dtype=self.dtype, quant=self._QUANT_MODES[self.quant])
            if self.unet_config.lora_rank > 0 or self.quant != "none"
            else self.unet)
        self._quant_struct_cache = None
        self.vae = AutoencoderKL(self.vae_config, dtype=self.dtype)
        self.text_encoder = CLIPTextEncoder(self.text_config, dtype=self.dtype)
        self.image_encoder = CLIPVisionEncoder(self.vision_config,
                                               dtype=self.dtype)
        a = self.adapter_config
        self.proj = ProjPlusModel(
            cross_attention_dim=a.cross_attention_dim,
            id_embeddings_dim=a.id_embeddings_dim,
            clip_embeddings_dim=a.clip_embeddings_dim,
            num_tokens=a.num_id_tokens, dtype=self.dtype)
        self.facial_encoder = FacialEncoder(
            embedding_dim=a.clip_embeddings_dim,
            output_dim=a.facial_output_dim,
            embed_dim=a.cross_attention_dim,
            facial_dim=a.facial_dim, facial_depth=a.facial_depth,
            facial_heads=a.facial_heads, facial_dim_head=a.facial_dim_head,
            dtype=self.dtype)

    @property
    def vae_scale_factor(self) -> int:
        return 2 ** (len(self.vae_config.block_out_channels) - 1)

    def infer_unet(self, unet_params: Dict, lora_scale):
        """(unet, params) for the inference path: LoRA folded into the base
        kernels once per call (scale may be traced — no recompile on
        change), so every step of the denoise scan is LoRA-free. With
        quant="int8" the folded kernels are then quantized (per-out-channel
        symmetric int8 + fp32 scales) — still once per call, amortized over
        the denoise scan."""
        if self.unet_config.lora_rank > 0:
            unet_params = fold_lora_params(unet_params, lora_scale)
        if self.quant in ("int8", "int8_static"):
            unet_params = quantize_params_like(self._quant_param_struct(),
                                               unet_params,
                                               act_scales=self.act_scales)
        return self.unet_infer, unet_params

    def calibration_unet(self):
        """The dynamic-int8 twin used for calibration applies: identical
        graph to quant="int8" serving, with the Int8 layers sowing their
        observed activation amax into the "calib" collection."""
        return UNet(dataclasses.replace(self.unet_config, lora_rank=0),
                    dtype=self.dtype, quant=True)

    def _quant_param_struct(self):
        """Param structure (ShapeDtypeStructs) of the quantized inference
        UNet — the rewrite target for quantize_params_like. Host-side
        eval_shape, computed once per bundle."""
        if self._quant_struct_cache is None:
            dummy_latent, dummy_ctx, added = self._unet_init_args(8)
            self._quant_struct_cache = jax.eval_shape(
                lambda: self.unet_infer.init(
                    jax.random.PRNGKey(0), dummy_latent, jnp.array([0]),
                    dummy_ctx, added_cond=added))["params"]
        return self._quant_struct_cache

    def _unet_init_args(self, latent_hw: int):
        """Dummy (latent, context, added_cond) for UNet init/eval_shape."""
        a, t = self.adapter_config, self.text_config
        n_ctx = t.max_position_embeddings + a.num_id_tokens
        dummy_latent = jnp.zeros((1, latent_hw, latent_hw,
                                  self.unet_config.sample_channels))
        dummy_ctx = jnp.zeros((1, n_ctx, self.unet_config.cross_attention_dim))
        added = None
        if self.unet_config.addition_embed_type == "text_time":
            pooled_dim = (self.unet_config.projection_class_embeddings_input_dim
                          - 6 * self.unet_config.addition_time_embed_dim)
            added = {"text_embeds": jnp.zeros((1, pooled_dim)),
                     "time_ids": jnp.zeros((1, 6))}
        return dummy_latent, dummy_ctx, added

    def fast_random_params(self, rng: jax.Array, stddev: float = 0.02,
                           latent_hw: int = 8) -> Dict:
        """Shape-only init + one fused N(0, stddev) fill. Benchmarks and
        compile checks only: semantic initializers (LoRA zero-up, norm ones)
        are NOT applied. Avoids running six separate init graphs on a slow
        first-compile device."""
        shapes = jax.eval_shape(
            functools.partial(self.init_params, latent_hw=latent_hw), rng)
        leaves, treedef = jax.tree_util.tree_flatten(shapes)

        # fused on-device fill in chunks: per-buffer host transfers are slow
        # through remote-TPU tunnels, and one giant graph (SDXL has ~1900
        # leaves) can OOM the compile service — ~256 RNG ops per program
        chunk = 256

        def make_fill(chunk_shapes, base):
            @jax.jit
            def fill(key):
                out = []
                for i, s in enumerate(chunk_shapes):
                    if jnp.issubdtype(s.dtype, jnp.floating):
                        # flax param_dtype defaults to fp32 even under a bf16
                        # compute dtype; store at the bundle dtype (halves
                        # HBM + weight bandwidth, like the cast the real
                        # checkpoint loaders apply)
                        out.append(jax.random.normal(
                            jax.random.fold_in(key, base + i), s.shape,
                            self.dtype) * stddev)
                    else:
                        out.append(jnp.zeros(s.shape, s.dtype))
                return out

            return fill

        filled = []
        for start in range(0, len(leaves), chunk):
            part = leaves[start:start + chunk]
            filled.extend(make_fill(part, start)(rng))
        return treedef.unflatten(filled)

    def init_params(self, rng: jax.Array, latent_hw: int = 8) -> Dict:
        """Random-init the full param bundle (tests / training-from-scratch)."""
        a, t = self.adapter_config, self.text_config
        keys = jax.random.split(rng, 6)
        dummy_latent, dummy_ctx, added = self._unet_init_args(latent_hw)
        vdim = self.vision_config
        return {
            "unet": self.unet.init(keys[0], dummy_latent, jnp.array([0]),
                                   dummy_ctx, added_cond=added)["params"],
            "vae": self.vae.init(
                keys[1], jnp.zeros((1, latent_hw * self.vae_scale_factor,
                                    latent_hw * self.vae_scale_factor, 3))
            )["params"],
            "text_encoder": self.text_encoder.init(
                keys[2], jnp.zeros((1, t.max_position_embeddings),
                                   jnp.int32))["params"],
            "image_encoder": self.image_encoder.init(
                keys[3], jnp.zeros((1, vdim.image_size, vdim.image_size, 3))
            )["params"],
            "proj": self.proj.init(
                keys[4], jnp.zeros((1, a.id_embeddings_dim)),
                jnp.zeros((1, vdim.num_tokens, a.clip_embeddings_dim))
            )["params"],
            "facial_encoder": self.facial_encoder.init(
                keys[5],
                jnp.zeros((1, t.max_position_embeddings,
                           a.cross_attention_dim)),
                jnp.zeros((1, a.max_num_facials, vdim.num_tokens,
                           a.clip_embeddings_dim)),
                jnp.zeros((1, a.max_num_facials), jnp.int32),
                jnp.zeros((1, a.max_num_facials), bool))["params"],
        }


class ConsistentIDPipeline:
    """generate(prompt, face_image, ...) -> uint8 image array."""

    def __init__(
        self,
        bundle: SD15Bundle,
        params: Dict,
        tokenizer,
        pipeline_config: Optional[PipelineConfig] = None,
        scheduler_config: Optional[SchedulerConfig] = None,
        face_parser: Optional[Callable] = None,    # PIL -> (H, W) label map
        face_embedder: Optional[Callable] = None,  # PIL -> (1, 512) np
        safety_checker: Optional[Callable] = None,  # uint8 (B,H,W,3) ->
        #                                             (images, flags)
        mesh=None,  # jax Mesh: batch shards over 'data'; a 'model' axis of
        #             size > 1 additionally serves the UNet tensor-parallel
        #             (parallel/tensor_parallel.py — attention/FF kernels
        #             split over the axis, XLA SPMD inserts the collectives)
    ):
        self.bundle = bundle
        self.params = params
        self.tokenizer = tokenizer
        # register the trigger tokens (reference :148-150); add_tokens is
        # idempotent on every supported tokenizer (CLIPBPETokenizer,
        # SimpleTokenizer, transformers.CLIPTokenizer)
        tokenizer.add_tokens(["<|image|>", "<|facial|>"])
        self.config = pipeline_config or PipelineConfig()
        self.schedule = NoiseSchedule.create(
            scheduler_config or SchedulerConfig())
        self.face_parser = face_parser
        self.face_embedder = face_embedder
        self.safety_checker = safety_checker
        self.last_nsfw_flags = None  # set per call when a checker is active
        self.mesh = mesh
        self._dp_size = 1
        if mesh is not None:
            from ..parallel import MODEL_AXIS, data_axis_size
            self._dp_size = data_axis_size(mesh)
            if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
                # tensor-parallel UNet: shard the attention/FF kernels over
                # the model axis once at construction; every jitted graph
                # (t2i/batch/inpaint/img2img) then runs GSPMD-partitioned
                from ..parallel.tensor_parallel import apply_tensor_parallel
                self.params = apply_tensor_parallel(self.params, mesh)
        self._facial_token_id = tokenizer.convert_tokens_to_ids("<|facial|>")
        # jit once; a fresh jax.jit per generate() would recompile every call.
        # ip_scale/lora_scale are traced scalars (like guidance/merge-step),
        # so changing them never recompiles (reference set_scale :211-215).
        self._core_jit = jax.jit(
            self._generate_core,
            static_argnames=("num_steps", "scheduler", "cache_interval"))
        self._last_core_args = None  # for last_cost_analysis()

    def with_quant(self, quant: str,
                   act_scales=None) -> "ConsistentIDPipeline":
        """The same pipeline serving its UNet at a different quant mode
        ("none"/"int8"/"int8_static"). Params, tokenizers, and host helpers
        are shared; the bundle twin and the jit cache are fresh (quant
        changes the compiled denoise graph, so the caller's compiled graphs
        must not be reused). Works for every subclass — used by
        apps/validate.py's --mode-sweep to score int8 against exact.
        "int8_static" needs `act_scales` (or a previously calibrated
        bundle) — see calibrate_int8()."""
        import copy
        import dataclasses

        p = copy.copy(self)
        p.bundle = dataclasses.replace(
            self.bundle, quant=quant,
            act_scales=(act_scales if act_scales is not None
                        else self.bundle.act_scales))
        p._core_jit = jax.jit(
            p._generate_core,
            static_argnames=("num_steps", "scheduler", "cache_interval"))
        p._last_core_args = None
        return p

    def _calibration_batch(self, params, cond):
        """(contexts, added_cond) covering every context the serving graph
        feeds the UNet: CFG null + facial-augmented + text-only (the
        pre-merge branch). One UNet apply over this batch observes the
        activation ranges of all three."""
        null_e, aug_e, text_e = self.encode_embeddings(params, cond)
        return jnp.concatenate([null_e, aug_e, text_e], axis=0), None

    def calibrate_int8(self, prompt: Optional[str] = None, face_image=None,
                       num_calib_steps: int = 8, seed: int = 0,
                       margin: float = 1.1, negative_prompt: str = "",
                       parsing_labels=None, faceid_embeds=None,
                       height=None, width=None, lora_scale: float = 1.0,
                       samples=None) -> "ConsistentIDPipeline":
        """Post-training calibration -> a pipeline serving
        quant="int8_static" (int8 MXU matmuls/convs WITHOUT the per-call
        dynamic activation-amax prologue, the bandwidth-bound reduction
        that made dynamic int8 a 35% net loss at SDXL 1024px).

        Q-Diffusion-style max calibration: the dynamic-int8 UNet twin runs
        over q-sample latents x_t = sqrt(a_t)*x0 + sqrt(1-a_t)*eps built
        from the VAE encoding of the identity image at `num_calib_steps`
        timesteps spread across the schedule, with the real CFG contexts;
        each Int8 layer sows its observed activation amax ("calib"
        collection), max-merged across steps/samples and scaled by
        `margin` into per-tensor act_scale params.

        Pass either a single (prompt, face_image) or `samples` — a list of
        (prompt, face_image) pairs or dicts with keys prompt/face_image
        (+ optional negative_prompt/parsing_labels/faceid_embeds) — whose
        amax trees are max-merged; multi-sample calibration is the robust
        default for serving (a single sample's max is fragile to
        activation outliers on other inputs).

        `lora_scale` must match the scale generation will fold at
        (infer_unet folds LoRA into the base kernels before quantizing);
        calibrating at 1.0 and serving at a different scale shifts
        activation ranges against the calibrated clip points. Calibrate at
        the serving scale, or at the max intended scale. Persist the
        result with save_act_scales()/load_act_scales (io.quant_scales)."""
        cfg = self.config
        height = height or cfg.height
        width = width or cfg.width

        if samples is None:
            if prompt is None or face_image is None:
                raise ValueError(
                    "calibrate_int8 needs (prompt, face_image) or samples=")
            samples = [{"prompt": prompt, "face_image": face_image,
                        "negative_prompt": negative_prompt,
                        "parsing_labels": parsing_labels,
                        "faceid_embeds": faceid_embeds}]
        else:
            samples = [s if isinstance(s, dict)
                       else {"prompt": s[0], "face_image": s[1]}
                       for s in samples]

        calib_unet = self.bundle.calibration_unet()
        dummy_latent, dummy_ctx, dummy_added = self.bundle._unet_init_args(8)
        struct = jax.eval_shape(
            lambda: calib_unet.init(jax.random.PRNGKey(0), dummy_latent,
                                    jnp.array([0]), dummy_ctx,
                                    added_cond=dummy_added))["params"]
        uparams = self.params["unet"]
        if self.bundle.unet_config.lora_rank > 0:
            uparams = fold_lora_params(uparams, lora_scale)
        qparams = jax.jit(
            lambda p: quantize_params_like(struct, p))(uparams)

        # jit the one-off preps once; shapes are identical across samples
        # (batch-1 conditioning), so these compile a single graph each.
        # Eager op-by-op execution costs a dispatch per op through a
        # remote-TPU tunnel.
        prep_jit = jax.jit(self._calibration_batch)
        encode_jit = jax.jit(lambda p, x: self.bundle.vae.apply(
            {"params": p}, x, method=AutoencoderKL.encode))

        # one jitted graph per calibration step (q-sample + dynamic-int8
        # UNet apply + amax->scale + merge): eager per-layer scale math
        # would cost hundreds of tunnel dispatches per step
        def step_scales(p, x0_, key, t, c, a):
            noise = jax.random.normal(key, x0_.shape, jnp.float32)
            xt = self.schedule.add_noise(x0_.astype(jnp.float32), noise,
                                         jnp.full((1,), t))
            xt = jnp.broadcast_to(xt, (c.shape[0], *xt.shape[1:]))
            calib = calib_unet.apply(
                {"params": p}, xt, jnp.full((c.shape[0],), t, jnp.int32), c,
                added_cond=a, mutable=["calib"])[1]["calib"]
            return act_scales_from_calib(calib, margin)

        first_jit = jax.jit(step_scales)
        merge_jit = jax.jit(lambda p, x0_, key, t, c, a, prev:
                            merge_act_scales(
                                [prev, step_scales(p, x0_, key, t, c, a)]))
        n_train = len(self.schedule.alphas_cumprod)
        ts = np.linspace(0, n_train - 1,
                         num_calib_steps).round().astype(np.int32)
        scales = None
        for sample in samples:
            # same q-sample noise sequence for every sample: per-sample
            # scales are then independent of sample order, and the merged
            # tree is exactly the elementwise max of the per-sample trees
            # (calibrate on subsets and merge later — same artifact)
            rng = jax.random.PRNGKey(seed)
            cond = self.prepare_conditioning(
                sample["prompt"], sample["face_image"],
                parsing_labels=sample.get("parsing_labels"),
                faceid_embeds=sample.get("faceid_embeds"),
                negative_prompt=sample.get("negative_prompt", ""))
            cond = self._device_cond(cond)
            ctx, added = prep_jit(self.params, cond)

            # real-data latent: VAE-encode the identity at generation size
            img = np.asarray(
                sample["face_image"].convert("RGB").resize(
                    (width, height), Image.BICUBIC),
                np.float32) / 127.5 - 1.0
            x0 = encode_jit(self.params["vae"], jnp.asarray(img)[None])

            for t in ts:
                rng, k = jax.random.split(rng)
                args = (qparams, x0, k, jnp.int32(int(t)), ctx, added)
                scales = (first_jit(*args) if scales is None
                          else merge_jit(*args, scales))
        scales = jax.device_get(scales)
        return self.with_quant("int8_static", act_scales=scales)

    # ---------------- host-side prepare ----------------

    def _tokenize_padded(self, text: str) -> np.ndarray:
        ids = list(self.tokenizer.encode(text))[: self.tokenizer.model_max_length]
        ids += [self.tokenizer.pad_token_id] * (
            self.tokenizer.model_max_length - len(ids))
        return np.asarray(ids, np.int64)[None]

    def prepare_conditioning(
        self,
        prompt: str,
        face_image: Image.Image,
        parsing_labels: Optional[np.ndarray] = None,
        faceid_embeds: Optional[np.ndarray] = None,
        face_caption: Optional[str] = None,
        negative_prompt: str = "",
        max_num_facials: int = 5,
    ) -> Dict[str, np.ndarray]:
        """All string/PIL/cv2 work; returns fixed-shape numpy tensors."""
        if parsing_labels is None:
            assert self.face_parser is not None, \
                "pass parsing_labels or configure face_parser"
            parsing_labels = self.face_parser(face_image)
        if faceid_embeds is None:
            if self.face_embedder is not None:
                faceid_embeds = self.face_embedder(face_image)
            else:  # no detector: zero fallback (reference :220-221)
                faceid_embeds = np.zeros(
                    (1, self.bundle.adapter_config.id_embeddings_dim),
                    np.float32)
        face_caption = face_caption or FACE_CAPTION_TEMPLATE

        region_masks = select_key_regions(
            masks_for_unique_values(parsing_labels))
        caption_aligned, region_masks = process_text_with_markers(
            face_caption, region_masks)

        prompt_face = prompt + "Detail:" + caption_aligned
        if len(self.tokenizer.encode(prompt_face)) > \
                self.tokenizer.model_max_length:
            prompt_face = "Detail:" + caption_aligned + " Caption:" + prompt
        if len(face_caption) > MAX_CAPTION_CHARS:
            prompt_face = prompt
        prompt_text_only = prompt_face.replace("<|facial|>", "").replace(
            "<|image|>", "")
        # recorded for dual-tokenizer variants (SDXL re-tokenizes these)
        self._last_prompt_face = prompt_face
        self._last_prompt_text_only = prompt_text_only

        clean_ids, img_mask, fac_mask = tokenize_and_mask_trigger_ends(
            prompt_face, None, self._facial_token_id, self.tokenizer)
        _, _, facial_idx, facial_idx_mask = prepare_trigger_token_idx(
            img_mask, fac_mask, 1, max_num_facials)

        # per-region CLIP pixels (zero-padded to max_num_facials slots)
        size = self.bundle.vision_config.image_size
        regions = np.zeros((max_num_facials, size, size, 3), np.float32)
        region_mask_maps = np.zeros((max_num_facials, 512, 512), np.float32)
        for i, (key, mask) in enumerate(region_masks.items()):
            if i >= max_num_facials:
                break
            masked = fetch_mask_raw_image(face_image.convert("RGB"), mask)
            regions[i] = clip_preprocess(masked, size)[0]
            region_mask_maps[i] = center_crop_mask(mask, 512)

        return {
            "clean_ids": clean_ids.astype(np.int32),
            "text_only_ids": self._tokenize_padded(prompt_text_only).astype(np.int32),
            "negative_ids": self._tokenize_padded(negative_prompt).astype(np.int32),
            "facial_idx": facial_idx.astype(np.int32),
            "facial_idx_mask": facial_idx_mask,
            "face_pixels": clip_preprocess(face_image, size).astype(np.float32),
            "region_pixels": regions[None],          # (1, 5, S, S, 3)
            "region_masks": region_mask_maps[None],  # (1, 5, 512, 512)
            "faceid_embeds": faceid_embeds.astype(np.float32),
        }

    # ---------------- jitted core ----------------

    def encode_embeddings(self, params, cond):
        """Build (null, augmented, text_only) 81-token embedding triple.

        Works for request batches: every cond field may have leading dim
        B > 1 (stacked requests), giving one batched graph for the whole
        encode (B*(1+5)+1 ViT images in a single forward)."""
        b = self.bundle
        a = b.adapter_config
        text_apply = functools.partial(b.text_encoder.apply,
                                       {"params": params["text_encoder"]})
        enc_marked, _ = text_apply(cond["clean_ids"])
        enc_text_only, _ = text_apply(cond["text_only_ids"])
        enc_negative, _ = text_apply(cond["negative_ids"])

        # one batched ViT forward: [face x B, zeros, regions x B*5]
        size = b.vision_config.image_size
        bs, n_regions = cond["region_pixels"].shape[:2]
        regions = cond["region_pixels"].reshape(-1, size, size, 3)
        vit_in = jnp.concatenate(
            [cond["face_pixels"], jnp.zeros((1, size, size, 3),
                                            cond["face_pixels"].dtype),
             regions], axis=0)
        _, penult = b.image_encoder.apply(
            {"params": params["image_encoder"]}, vit_in)
        face_emb, zero_emb = penult[:bs], penult[bs:bs + 1]
        region_embs = penult[bs + 1:].reshape(
            bs, n_regions, *penult.shape[1:])
        zero_regions = jnp.broadcast_to(
            zero_emb[:, None], region_embs.shape)

        proj_apply = functools.partial(b.proj.apply, {"params": params["proj"]})
        faceid_tokens = proj_apply(cond["faceid_embeds"], face_emb,
                                   shortcut=a.shortcut,
                                   scale=a.shortcut_scale)
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

        augmented = jnp.concatenate([fused, faceid_tokens], axis=1)
        null = jnp.concatenate([uncond_fused, uncond_faceid_tokens], axis=1)
        text_only = jnp.concatenate([enc_text_only, faceid_tokens], axis=1)
        return null, augmented, text_only

    def _unet_fns(self, unet, unet_params, ip_scale, cache_interval):
        """(unet_fn, unet_cached_fn) for denoise(). With cache_interval > 1
        (DeepCache-style reuse, models/unet.py deep_feature) the full fn
        also returns the deep feature and the cached fn consumes it."""
        if cache_interval > 1:
            def unet_fn(x, t, context, added, step_i):
                return unet.apply(
                    {"params": unet_params}, x, t, context,
                    added_cond=added, ip_scale=ip_scale, return_deep=True)

            def unet_cached_fn(x, t, context, added, step_i, deep):
                return unet.apply(
                    {"params": unet_params}, x, t, context,
                    added_cond=added, ip_scale=ip_scale, deep_feature=deep)

            return unet_fn, unet_cached_fn

        def unet_fn(x, t, context, added, step_i):
            return unet.apply(
                {"params": unet_params}, x, t, context,
                added_cond=added, ip_scale=ip_scale)

        return unet_fn, None

    def _generate_core(self, params, cond, latents, guidance_scale,
                       start_merge_step, num_steps, scheduler, ip_scale,
                       lora_scale, rng=None, cache_interval=1):
        null_e, aug_e, text_e = self.encode_embeddings(params, cond)
        # num_images_per_prompt: conditioning is computed once and tiled to
        # the latent batch (reference num_images_per_prompt repeat, :472-477)
        n = latents.shape[0]
        if null_e.shape[0] != n:
            null_e, aug_e, text_e = (
                jnp.repeat(e, n // e.shape[0], axis=0)
                for e in (null_e, aug_e, text_e))
        plan = make_plan(self.schedule, scheduler, num_steps)

        unet, unet_params = self.bundle.infer_unet(params["unet"], lora_scale)
        unet_fn, unet_cached_fn = self._unet_fns(unet, unet_params, ip_scale,
                                                 cache_interval)

        final = denoise(unet_fn, latents,
                        CondBranch(context=text_e, null=null_e),
                        CondBranch(context=aug_e, null=null_e),
                        plan, guidance_scale, start_merge_step, rng=rng,
                        cache_interval=cache_interval,
                        unet_cached_fn=unet_cached_fn)
        images = self.bundle.vae.apply(
            {"params": params["vae"]}, final, method=AutoencoderKL.decode)
        return images


    def _device_cond(self, cond: Dict[str, np.ndarray]) -> Dict:
        """Host cond -> device arrays, excluding fields the graphs never
        read (DEVICE_COND_EXCLUDE)."""
        return {k: jnp.asarray(v) for k, v in cond.items()
                if k not in DEVICE_COND_EXCLUDE}

    def _postprocess(self, images) -> np.ndarray:
        """Decoded floats -> uint8 (quantized on device when the input is a
        jax array), through the safety checker when one is configured
        (reference :586-594: flagged images blacked out, flags surfaced via
        last_nsfw_flags)."""
        if isinstance(images, jax.Array):
            out = np.asarray(_to_uint8_device(images))
        else:
            out = postprocess_to_uint8(np.asarray(images))
        if self.safety_checker is not None:
            out, self.last_nsfw_flags = self.safety_checker(out)
        return out

    def generate(
        self,
        prompt: str,
        face_image: Image.Image,
        negative_prompt: str = "",
        seed: int = 0,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        start_merge_step: Optional[int] = None,
        scheduler: Optional[str] = None,
        ip_scale: float = 1.0,
        lora_scale: float = 1.0,
        parsing_labels: Optional[np.ndarray] = None,
        faceid_embeds: Optional[np.ndarray] = None,
        return_latents: bool = False,
        num_images_per_prompt: int = 1,
        return_device: bool = False,
        cache_interval: Optional[int] = None,
    ) -> np.ndarray:
        cfg = self.config
        height = height or cfg.height
        width = width or cfg.width
        num_steps = num_inference_steps or cfg.num_inference_steps
        scheduler = scheduler or cfg.scheduler
        cache_interval = (cache_interval if cache_interval is not None
                          else cfg.cache_interval)

        cond = self.prepare_conditioning(
            prompt, face_image, parsing_labels=parsing_labels,
            faceid_embeds=faceid_embeds, negative_prompt=negative_prompt)
        cond = self._device_cond(cond)

        sf = self.bundle.vae_scale_factor
        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            rng,
            (num_images_per_prompt, height // sf, width // sf,
             self.bundle.unet_config.sample_channels),
            jnp.float32)
        if self.mesh is not None and \
                num_images_per_prompt % self._dp_size == 0:
            # data-parallel image batch: XLA partitions the whole compiled
            # graph (scan included) over the mesh's data axis
            from ..parallel import data_sharding, replicated
            latents = jax.device_put(
                latents, data_sharding(self.mesh, latents.ndim))
            cond = {k: jax.device_put(v, replicated(self.mesh))
                    for k, v in cond.items()}

        self._last_core_args = (
            self.params, cond, latents,
            jnp.float32(guidance_scale if guidance_scale is not None
                        else cfg.guidance_scale),
            jnp.int32(start_merge_step if start_merge_step is not None
                      else cfg.start_merge_step),
            num_steps, scheduler, jnp.float32(ip_scale),
            jnp.float32(lora_scale), jax.random.fold_in(rng, 1),
            cache_interval)
        images = self._core_jit(*self._last_core_args)
        if return_device:
            return images
        if return_latents:
            return np.asarray(images)
        return self._postprocess(images)

    def generate_async(self, *args, **kwargs):
        """Submit a generation; return a zero-arg callable yielding the
        uint8 images. The device->host copy starts immediately and overlaps
        any device work submitted before the callable runs — double-buffered
        serving: submit request i+1, then collect request i. Through a
        remote-TPU tunnel the fetch costs ~0.2s at batch 4, all of it
        hidden once calls are pipelined."""
        images = self.generate(*args, return_device=True, **kwargs)
        u8 = _to_uint8_device(images)
        try:
            u8.copy_to_host_async()
        except Exception:
            pass  # copy_to_host_async is best-effort on some backends

        def finish() -> np.ndarray:
            out = np.asarray(u8)
            if self.safety_checker is not None:
                out, self.last_nsfw_flags = self.safety_checker(out)
            return out

        return finish

    def generate_batch(
        self,
        prompts,
        face_images,
        negative_prompts=None,
        seed: int = 0,
        seeds=None,
        parsing_labels_list=None,
        faceid_embeds_list=None,
        **kwargs,
    ) -> np.ndarray:
        """Batch distinct requests through one compiled graph: conditioning
        is prepared per request on the host, stacked, and the whole
        encode+denoise+decode runs once at batch len(prompts). The serving /
        eval-sweep throughput path.

        seeds: optional per-request seed list; each request's initial
        latents derive from its own PRNGKey, so for ODE samplers
        (ddim/euler/dpmpp) a request's output is independent of its batch
        position and co-batched neighbors. Ancestral ddpm additionally draws
        batch-level in-scan noise keyed off seeds[0]."""
        cfg = self.config
        n = len(prompts)
        negative_prompts = negative_prompts or [""] * n
        conds = []
        for i in range(n):
            conds.append(self.prepare_conditioning(
                prompts[i], face_images[i],
                parsing_labels=(parsing_labels_list[i]
                                if parsing_labels_list else None),
                faceid_embeds=(faceid_embeds_list[i]
                               if faceid_embeds_list else None),
                negative_prompt=negative_prompts[i]))
        cond = {k: jnp.asarray(np.concatenate([c[k] for c in conds]))
                for k in conds[0] if k not in DEVICE_COND_EXCLUDE}

        height = kwargs.pop("height", cfg.height)
        width = kwargs.pop("width", cfg.width)
        num_steps = kwargs.pop("num_inference_steps",
                               cfg.num_inference_steps)
        scheduler = kwargs.pop("scheduler", cfg.scheduler)
        guidance = kwargs.pop("guidance_scale", cfg.guidance_scale)
        merge = kwargs.pop("start_merge_step", cfg.start_merge_step)
        sf = self.bundle.vae_scale_factor
        shape = (height // sf, width // sf,
                 self.bundle.unet_config.sample_channels)
        if seeds is not None:
            assert len(seeds) == n, (len(seeds), n)
            rng = jax.random.PRNGKey(int(seeds[0]))
            latents = jnp.stack([
                jax.random.normal(jax.random.PRNGKey(int(s)), shape,
                                  jnp.float32) for s in seeds])
        else:
            rng = jax.random.PRNGKey(seed)
            latents = jax.random.normal(rng, (n, *shape), jnp.float32)
        if self.mesh is not None and n % self._dp_size == 0:
            # data-parallel request batch (serving): every cond row aligns
            # with its latent row (facial-region keys carry 5 rows per
            # request, contiguous per request, so dim-0 sharding keeps each
            # request's rows on one device). XLA partitions the whole
            # compiled graph over the mesh's data axis.
            from ..parallel import data_sharding
            latents = jax.device_put(
                latents, data_sharding(self.mesh, latents.ndim))
            cond = {k: jax.device_put(v, data_sharding(self.mesh, v.ndim))
                    for k, v in cond.items()}
        self._last_core_args = (
            self.params, cond, latents, jnp.float32(guidance),
            jnp.int32(merge), num_steps, scheduler,
            jnp.float32(kwargs.pop("ip_scale", 1.0)),
            jnp.float32(kwargs.pop("lora_scale", 1.0)),
            jax.random.fold_in(rng, 1),
            kwargs.pop("cache_interval", cfg.cache_interval))
        images = self._core_jit(*self._last_core_args)
        if kwargs.pop("return_device", False):
            return images
        return self._postprocess(images)

    def generate_batch_async(self, *args, **kwargs):
        """generate_batch, double-buffered: returns a zero-arg callable
        yielding the uint8 batch (see generate_async)."""
        images = self.generate_batch(*args, return_device=True, **kwargs)
        u8 = _to_uint8_device(images)
        try:
            u8.copy_to_host_async()
        except Exception:
            pass

        def finish() -> np.ndarray:
            out = np.asarray(u8)
            if self.safety_checker is not None:
                out, self.last_nsfw_flags = self.safety_checker(out)
            return out

        return finish

    def _step_example(self):
        """(x, t, context, added) example arrays replicating one in-scan CFG
        UNet pair call from the last generate() — shapes via eval_shape, no
        device execution."""
        params, cond, latents = self._last_core_args[:3]
        n = latents.shape[0]
        _, aug_e, _ = jax.eval_shape(self.encode_embeddings, params, cond)
        x = jnp.zeros((2 * n, *latents.shape[1:]), latents.dtype)
        t = jnp.zeros((2 * n,), jnp.float32)
        ctx = jnp.zeros((2 * n, aug_e.shape[1], aug_e.shape[2]), aug_e.dtype)
        return x, t, ctx, None

    def step_flops(self) -> Optional[float]:
        """FLOPs of one CFG denoise step (the in-scan UNet pair call).

        XLA's cost analysis counts a lax.scan body ONCE regardless of trip
        count, and Pallas flash-attention custom calls report zero flops —
        so last_cost_analysis() alone wildly under-reports the denoise loop.
        This lowers a single UNet pair call on the XLA attention path (same
        matmuls as the flash kernel) and counts that; bench-level totals are
        step_flops * num_steps + encode/decode from last_cost_analysis()."""
        if self._last_core_args is None:
            return None
        from ..ops import attention as attn_ops
        params = self._last_core_args[0]
        x, t, ctx, added = self._step_example()

        def pair(params, x, t, ctx, added):
            # matches the executed graph: LoRA folded out of the scan body
            unet, unet_params = self.bundle.infer_unet(params["unet"], 1.0)
            return unet.apply(
                {"params": unet_params}, x, t, ctx, added_cond=added)

        old = attn_ops._FLASH_DISABLED
        attn_ops._FLASH_DISABLED = True
        try:
            lowered = jax.jit(pair).lower(params, x, t, ctx, added)
        finally:
            attn_ops._FLASH_DISABLED = old
        try:
            ca = lowered.cost_analysis()
        except Exception:
            ca = None
        if not ca:  # some backends (TPU) only analyze post-compile
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else None

    def last_cost_analysis(self) -> Optional[dict]:
        """XLA cost analysis of the last executed core graph (flops, bytes
        accessed) — the exact compiled executable's numbers, not an analytic
        estimate. Returns None before the first generate call. Cheap after a
        call: lower/compile hit jit's in-memory executable cache."""
        if self._last_core_args is None:
            return None
        compiled = self._core_jit.lower(*self._last_core_args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0]
        return dict(ca) if ca else None
