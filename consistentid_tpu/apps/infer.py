"""CLI: single-image ConsistentID generation (reference infer.py:10-73).

    python -m consistentid_tpu.apps.infer \
        --base /path/sd15 --consistentid ConsistentID-v1.bin \
        --image examples/face.jpg --prompt "cinematic photo, a man ..." \
        --out out.png

Defaults mirror the reference: 50 steps, start_merge_step 30, CFG 5.0,
512x768, seed 2024 (infer.py:48-64).
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True, help="diffusers SD1.5 dir")
    p.add_argument("--consistentid", default=None,
                   help="ConsistentID-v1.bin / .safetensors")
    p.add_argument("--image-encoder", default=None,
                   help="CLIP ViT-H checkpoint")
    p.add_argument("--bisenet", default=None, help="face_parsing.pth")
    p.add_argument("--arcface", default=None, help="w600k_r50.onnx / .pt")
    p.add_argument("--scrfd", default=None,
                   help="det_10g.onnx / .pt face detector (enables "
                        "detect->align like insightface FaceAnalysis)")
    p.add_argument("--tokenizer", default=None,
                   help="local CLIPTokenizer dir (transformers)")
    p.add_argument("--image", required=True, help="reference face image")
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative-prompt", default=(
        "monochrome, lowres, bad anatomy, worst quality, low quality, "
        "blurry"))
    p.add_argument("--out", default="out.png")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--start-merge-step", type=int, default=30)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--scheduler", default="euler",
                   choices=["ddim", "euler", "ddpm", "dpmpp_2m", "pndm"])
    p.add_argument("--num-images", type=int, default=1)
    p.add_argument("--ip-scale", type=float, default=1.0,
                   help="identity-adapter strength (traced; no recompile)")
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument("--tiny", action="store_true",
                   help="toy-scale model configs (smoke tests against "
                        "apps.validate --synthesize checkpoints)")
    p.add_argument("--no-safety-checker", action="store_true",
                   help="skip the CLIP safety checker even if the dump "
                        "ships one (the reference's safety_checker=None)")
    p.add_argument("--cache-interval", type=int, default=1,
                   help="DeepCache-style acceleration: run the full UNet "
                        "every N-th denoise step, only the shallow blocks "
                        "in between (1 = off; 2-3 = 30-50%% faster with a "
                        "small quality trade)")
    p.add_argument("--quant", choices=["none", "int8", "int8_static"],
                   default="none",
                   help="int8: W8A8 UNet on the int8 MXU (2x bf16 peak on "
                        "v5e) — same checkpoints, kernels quantized "
                        "in-graph, activations quantized dynamically per "
                        "call. int8_static: the quantized mode of record — "
                        "calibrates per-tensor activation scales on YOUR "
                        "prompt+image first (pipeline.calibrate_int8, a "
                        "few seconds), then serves without the dynamic "
                        "activation-amax prologue (measured r4: +13%% "
                        "SD1.5 512px, +16.6%% SDXL 1024px vs exact, where "
                        "dynamic int8 LOSES 35%% on SDXL)")
    p.add_argument("--act-scales", default=None,
                   help="int8_static: load calibrated activation scales "
                        "from this .npz artifact (save_act_scales) instead "
                        "of calibrating at startup")
    p.add_argument("--save-act-scales", default=None,
                   help="int8_static: after startup calibration, persist "
                        "the activation scales to this .npz so later "
                        "processes can skip calibration (--act-scales)")
    p.add_argument("--sdxl", action="store_true",
                   help="SDXL base (reference infer_SDXL.py defaults: "
                        "864x1152, CFG 7.5)")
    p.add_argument("--tokenizer-2", default=None)
    p.add_argument("--init-image", default=None,
                   help="img2img: edit this image instead of starting from "
                        "noise (SD1.5 only); with --mask-image, inpaint it "
                        "(reference demo/inpaint_demo.py)")
    p.add_argument("--mask-image", default=None,
                   help="binary inpaint mask (white = regenerate); requires "
                        "--init-image")
    p.add_argument("--strength", type=float, default=0.8,
                   help="img2img/inpaint: fraction of the schedule applied "
                        "to the init image (1.0 = ignore init content)")
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.mask_image and not args.init_image:
        parser.error("--mask-image requires --init-image")
    if args.init_image and args.sdxl:
        parser.error("--init-image is SD1.5-only (the reference has no "
                     "SDXL img2img/inpaint variant either)")
    if not 0.0 < args.strength <= 1.0:
        parser.error(f"--strength must be in (0, 1]: {args.strength}")
    if args.init_image and args.num_images != 1:
        parser.error("--num-images > 1 is t2i-only; the img2img/inpaint "
                     "generate() paths run one image per call")
    if args.init_image and args.cache_interval != 1:
        parser.error("--cache-interval applies to the t2i path only; the "
                     "img2img/inpaint pipelines run the exact UNet")
    if args.init_image and args.quant == "int8_static":
        parser.error("--quant int8_static calibrates/serves the t2i path "
                     "only; use --quant int8 (dynamic) with --init-image")

    from PIL import Image

    from ..core.cache import enable_compilation_cache
    from ..core.config import PipelineConfig
    from ..pipelines.loading import (load_sd15_consistentid,
                                     load_sdxl_consistentid)

    enable_compilation_cache()
    tokenizer = tokenizer_2 = None
    if args.tokenizer:
        from transformers import CLIPTokenizer
        tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer)
    if args.tokenizer_2:
        from transformers import CLIPTokenizer
        tokenizer_2 = CLIPTokenizer.from_pretrained(args.tokenizer_2)

    config = PipelineConfig(
        height=args.height, width=args.width,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        start_merge_step=args.start_merge_step,
        scheduler=args.scheduler)
    # int8_static needs calibrated activation scales: load the exact
    # pipeline first, calibrate on the user's prompt+image below, and only
    # then switch the bundle to the static-int8 serving graph.
    load_quant = "none" if args.quant == "int8_static" else args.quant
    kw = dict(consistentid_path=args.consistentid,
              image_encoder_path=args.image_encoder,
              bisenet_path=args.bisenet, arcface_path=args.arcface,
              scrfd_path=args.scrfd,
              tokenizer=tokenizer, pipeline_config=config,
              quant=load_quant)
    if args.tiny:
        import dataclasses

        from ..testing import tiny_bundle, tiny_sdxl_bundle
        bundle = tiny_sdxl_bundle() if args.sdxl else tiny_bundle()
        kw["bundle"] = dataclasses.replace(bundle, quant=load_quant)
    if args.no_safety_checker and not args.sdxl:
        kw["with_safety_checker"] = False
    if args.sdxl:
        pipe = load_sdxl_consistentid(args.base, tokenizer_2=tokenizer_2,
                                      **kw)
    else:
        if args.init_image:
            from ..pipelines import (ConsistentIDImg2ImgPipeline,
                                     ConsistentIDInpaintPipeline)
            kw["pipeline_cls"] = (ConsistentIDInpaintPipeline
                                  if args.mask_image
                                  else ConsistentIDImg2ImgPipeline)
        pipe = load_sd15_consistentid(args.base, **kw)

    face = Image.open(args.image)
    if args.quant == "int8_static":
        if args.act_scales:
            from ..io.quant_scales import load_act_scales
            pipe = pipe.with_quant("int8_static",
                                   act_scales=load_act_scales(args.act_scales))
        else:
            # calibrate at the serving lora_scale: folding at a different
            # scale than generation shifts activation ranges against the
            # calibrated clip points
            pipe = pipe.calibrate_int8(args.prompt, face,
                                       negative_prompt=args.negative_prompt,
                                       lora_scale=args.lora_scale)
            if args.save_act_scales:
                from ..io.quant_scales import save_act_scales
                save_act_scales(args.save_act_scales,
                                pipe.bundle.act_scales)
                print(f"saved act scales -> {args.save_act_scales}")
    gen_kw = dict(negative_prompt=args.negative_prompt, seed=args.seed,
                  ip_scale=args.ip_scale, lora_scale=args.lora_scale)
    if args.init_image:
        init = Image.open(args.init_image)
        if args.mask_image:
            imgs = pipe.generate(args.prompt, face, init,
                                 Image.open(args.mask_image),
                                 strength=args.strength, **gen_kw)
        else:
            imgs = pipe.generate(args.prompt, face, init,
                                 strength=args.strength, **gen_kw)
    else:
        imgs = pipe.generate(args.prompt, face,
                             num_images_per_prompt=args.num_images,
                             cache_interval=args.cache_interval, **gen_kw)
    stem, ext = (args.out.rsplit(".", 1) + ["png"])[:2]
    for i, img in enumerate(imgs):
        name = args.out if len(imgs) == 1 else f"{stem}_{i}.{ext}"
        Image.fromarray(img).save(name)
        print(f"saved {name}")


if __name__ == "__main__":
    main()
