"""Checkpoint assembly: build ready-to-run pipelines from local checkpoint
files — the equivalent of the reference's load_ConsistentID_model
(pipline_StableDiffusion_ConsistentID.py:36-150), zero-download by design
(this environment has no network egress; the reference pulls from the HF hub).

Expected inputs (all local paths):
  base_dir/            diffusers-format SD1.5 dump with subfolders
    unet/diffusion_pytorch_model.safetensors
    vae/diffusion_pytorch_model.safetensors
    text_encoder/model.safetensors
  image_encoder/model.safetensors       CLIP ViT-H vision tower
  ConsistentID-v1.bin                   adapter checkpoint (torch pickle or
                                        safetensors with the reference's
                                        {FacialEncoder,image_proj,
                                         adapter_modules} sections)
  face_parsing.pth                      BiSeNet weights
  arcface (w600k_r50.onnx or .pt)       recognition backbone
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import AdapterConfig, PipelineConfig, sd15_unet_config
from ..io import convert
from ..io.convert_backbones import (clip_text_from_hf, clip_vision_from_hf,
                                    unet_from_diffusers, vae_from_diffusers)
from ..io.safetensors_reader import read_checkpoint
from ..models.arcface import make_face_embedder
from ..models.bisenet import make_face_parser
from ..training.train_step import warm_start_ip_projections
from .consistentid_sd15 import ConsistentIDPipeline, SD15Bundle


def _subcheckpoint(base_dir: str, sub: str) -> Dict[str, np.ndarray]:
    path = os.path.join(base_dir, sub)
    return read_checkpoint(path)


def _deep_update(dst: Dict, src: Dict) -> Dict:
    """Recursive merge: the diffusers UNet converter emits only base params,
    while the init tree carries adapter (LoRA/IP) leaves nested under the
    SAME top-level module keys — a flat dict.update would clobber them
    (caught by apps.validate's synthetic self-test)."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def _read_maybe_onnx(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".onnx"):
        from ..io.onnx_reader import read_onnx_initializers
        return read_onnx_initializers(path)
    return read_checkpoint(path)


def _default_tokenizer(base_dir: str, subfolder: str = "tokenizer"):
    """Real CLIP BPE tokenizer from the checkpoint's own vocab files
    (diffusers dumps ship tokenizer/vocab.json + merges.txt); the word-hash
    SimpleTokenizer is a tests-only stand-in and is used only when the dump
    carries no vocab."""
    import warnings

    from ..conditioning import CLIPBPETokenizer, SimpleTokenizer

    tok_dir = os.path.join(base_dir, subfolder)
    if os.path.isfile(os.path.join(tok_dir, "vocab.json")):
        return CLIPBPETokenizer.from_pretrained(tok_dir)
    warnings.warn(
        f"no {subfolder}/vocab.json under {base_dir}; falling back to the "
        "hash-based SimpleTokenizer (token ids will NOT match reference "
        "checkpoints)")
    return SimpleTokenizer()


def _safety_checker_vision_config(sc_dir: str):
    """Vision-tower config of a diffusers safety_checker/ dump: read the
    shipped config.json (CLIPConfig schema, vision_config subsection) when
    present; fall back to the stock SD1.5 checker tower otherwise."""
    import json

    from ..core.config import CLIPVisionConfig
    from ..models.safety_checker import SafetyChecker

    cfg = SafetyChecker().vision_config
    cfg_path = os.path.join(sc_dir, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path, encoding="utf-8") as f:
            vc = json.load(f).get("vision_config", {})
        cfg = CLIPVisionConfig(
            image_size=vc.get("image_size", cfg.image_size),
            patch_size=vc.get("patch_size", cfg.patch_size),
            hidden_size=vc.get("hidden_size", cfg.hidden_size),
            intermediate_size=vc.get("intermediate_size",
                                     cfg.intermediate_size),
            num_layers=vc.get("num_hidden_layers", cfg.num_layers),
            num_heads=vc.get("num_attention_heads", cfg.num_heads),
            hidden_act=vc.get("hidden_act", cfg.hidden_act))
    return cfg


def load_face_stack(bisenet_path=None, arcface_path=None, scrfd_path=None,
                    det_size: int = 640, allow_center_crop: bool = False):
    """(face_parser, face_embedder) hooks from local checkpoint files —
    the reference's BiSeNet + FaceAnalysis(SCRFD det -> align -> ArcFace)
    stack (pipline_StableDiffusion_ConsistentID.py:63-71,217-226).
    det_size: 640 for SD1.5, 512 for SDXL (:63-64 vs XL :75)."""
    face_parser = face_embedder = None
    if bisenet_path:
        bn_params, bn_stats = convert.bisenet_from_torch(
            read_checkpoint(bisenet_path))
        face_parser = make_face_parser(bn_params, bn_stats)
    if arcface_path:
        detector = None
        if scrfd_path:
            from ..models.scrfd import make_face_detector
            det_p, det_s, det_cfg = convert.scrfd_from_torch(
                _read_maybe_onnx(scrfd_path))
            detector = make_face_detector(det_p, det_s, cfg=det_cfg,
                                          input_size=det_size)
        ir_params, ir_stats = convert.iresnet_from_torch(
            _read_maybe_onnx(arcface_path))
        face_embedder = make_face_embedder(
            ir_params, ir_stats, detector=detector,
            allow_center_crop=allow_center_crop or detector is None)
    return face_parser, face_embedder


def load_sd15_consistentid(
    base_dir: str,
    consistentid_path: Optional[str] = None,
    image_encoder_path: Optional[str] = None,
    bisenet_path: Optional[str] = None,
    arcface_path: Optional[str] = None,
    scrfd_path: Optional[str] = None,
    tokenizer=None,
    dtype=jnp.bfloat16,
    lora_rank: int = 128,
    num_tokens: int = 4,
    pipeline_config: Optional[PipelineConfig] = None,
    with_safety_checker: bool = True,
    bundle: Optional[SD15Bundle] = None,
    quant: str = "none",
    pipeline_cls: type = None,
    mesh=None,
) -> ConsistentIDPipeline:
    """Assemble the SD1.5 ConsistentID pipeline from local checkpoints.

    bundle: override the model configs (default: full-size SD1.5) — used by
    apps.validate to drive the full load path at toy scale.
    quant: "int8" enables the W8A8 UNet serving path (ops/quant.py) —
    checkpoints stay float; kernels are quantized inside the jitted graph.
    pipeline_cls: ConsistentIDPipeline subclass to assemble (img2img /
    inpaint share the same checkpoint layout, matching the reference
    Base-mixin composition, pipelines/BaseConsistentID.py). Classes needing
    params this loader does not assemble (controlnet-inpaint requires
    params["controlnet"]) are rejected — construct those directly."""
    if pipeline_cls is not None:
        from .inpaint import ConsistentIDControlNetInpaintPipeline
        if issubclass(pipeline_cls, ConsistentIDControlNetInpaintPipeline):
            raise ValueError(
                "load_sd15_consistentid does not assemble "
                "params['controlnet']; construct "
                "ConsistentIDControlNetInpaintPipeline directly with a "
                "loaded ControlNet (see pipelines/inpaint.py)")
    bundle = bundle or SD15Bundle(
        unet_config=sd15_unet_config(lora_rank=lora_rank,
                                     ip_num_tokens=num_tokens),
        adapter_config=AdapterConfig(lora_rank=lora_rank,
                                     num_id_tokens=num_tokens),
        dtype=dtype,
        quant=quant,
    )
    params = bundle.init_params(jax.random.PRNGKey(0))

    _deep_update(params["unet"], unet_from_diffusers(
        _subcheckpoint(base_dir, "unet"), bundle.unet_config))
    params["unet"] = warm_start_ip_projections(params["unet"])
    params["vae"] = vae_from_diffusers(
        _subcheckpoint(base_dir, "vae"), bundle.vae_config)
    params["text_encoder"] = clip_text_from_hf(
        _subcheckpoint(base_dir, "text_encoder"), bundle.text_config)
    if image_encoder_path:
        params["image_encoder"] = clip_vision_from_hf(
            read_checkpoint(image_encoder_path), bundle.vision_config)
    if consistentid_path:
        sd = read_checkpoint(consistentid_path)
        params = convert.load_consistentid_checkpoint(
            params, sd, bundle.unet_config)

    from ..core.dtypes import cast_floating
    params = cast_floating(params, dtype)

    face_parser, face_embedder = load_face_stack(
        bisenet_path, arcface_path, scrfd_path, det_size=640)

    # reference SD1.5 runs the CLIP safety checker on every output
    # (:586-594); loaded when the dump ships one, unless opted out
    safety_checker = None
    sc_dir = os.path.join(base_dir, "safety_checker")
    if with_safety_checker and os.path.isdir(sc_dir):
        from ..io.convert_backbones import safety_checker_from_hf
        from ..models.safety_checker import SafetyChecker, make_safety_checker
        sc_cfg = _safety_checker_vision_config(sc_dir)
        safety_checker = make_safety_checker(
            safety_checker_from_hf(read_checkpoint(sc_dir), sc_cfg),
            vision_config=sc_cfg)

    if tokenizer is None:
        tokenizer = _default_tokenizer(base_dir)

    return (pipeline_cls or ConsistentIDPipeline)(
        bundle, params, tokenizer, pipeline_config=pipeline_config,
        face_parser=face_parser, face_embedder=face_embedder,
        safety_checker=safety_checker, mesh=mesh)


# discoverability alias matching the reference method name
load_ConsistentID_model = load_sd15_consistentid


def load_sdxl_consistentid(
    base_dir: str,
    consistentid_path: Optional[str] = None,
    image_encoder_path: Optional[str] = None,
    bisenet_path: Optional[str] = None,
    arcface_path: Optional[str] = None,
    scrfd_path: Optional[str] = None,
    tokenizer=None,
    tokenizer_2=None,
    dtype=jnp.bfloat16,
    lora_rank: int = 128,
    num_tokens: int = 4,
    pipeline_config: Optional[PipelineConfig] = None,
    bundle=None,
    quant: str = "none",
    mesh=None,
):
    """Assemble the SDXL ConsistentID pipeline from local checkpoints
    (reference pipline_StableDiffusionXL_ConsistentID.py:104-176: prefixes
    image_proj_model/adapter_modules/FacialEncoder, tokenizer_2 trigger)."""
    from ..core.config import VAEConfig, sdxl_unet_config
    from ..core.dtypes import cast_floating
    from .consistentid_sdxl import (ConsistentIDXLPipeline, SDXLBundle,
                                    sdxl_adapter_config)

    bundle = bundle or SDXLBundle(
        unet_config=sdxl_unet_config(lora_rank=lora_rank,
                                     ip_num_tokens=num_tokens),
        adapter_config=sdxl_adapter_config(lora_rank=lora_rank,
                                           num_id_tokens=num_tokens),
        vae_config=VAEConfig(scaling_factor=0.13025, force_upcast=True),
        dtype=dtype,
        quant=quant,
    )
    params = bundle.init_params(jax.random.PRNGKey(0))
    _deep_update(params["unet"], unet_from_diffusers(
        _subcheckpoint(base_dir, "unet"), bundle.unet_config))
    params["unet"] = warm_start_ip_projections(params["unet"])
    params["vae"] = vae_from_diffusers(
        _subcheckpoint(base_dir, "vae"), bundle.vae_config)
    params["text_encoder"] = clip_text_from_hf(
        _subcheckpoint(base_dir, "text_encoder"), bundle.text_config)
    params["text_encoder_2"] = clip_text_from_hf(
        _subcheckpoint(base_dir, "text_encoder_2"), bundle.text_config_2)
    if image_encoder_path:
        params["image_encoder"] = clip_vision_from_hf(
            read_checkpoint(image_encoder_path), bundle.vision_config)
    if consistentid_path:
        sd = read_checkpoint(consistentid_path)
        params = convert.load_consistentid_checkpoint(
            params, sd, bundle.unet_config)
    params = cast_floating(params, dtype)

    face_parser, face_embedder = load_face_stack(
        bisenet_path, arcface_path, scrfd_path, det_size=512)

    if tokenizer is None:
        tokenizer = _default_tokenizer(base_dir)
    if tokenizer_2 is None:
        tokenizer_2 = _default_tokenizer(base_dir, subfolder="tokenizer_2")
    return ConsistentIDXLPipeline(
        bundle, params, tokenizer, tokenizer_2=tokenizer_2,
        pipeline_config=pipeline_config, face_parser=face_parser,
        face_embedder=face_embedder, mesh=mesh)
