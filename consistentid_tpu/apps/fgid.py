"""FGID dataset production pipeline (reference data/FGID.sh + FGID_mask.py,
FGID_caption.py, FGID_faceid_embeds.py, FGID_fuse_JSON.py — SURVEY.md §2.7),
re-designed as batched TPU jobs:

  mask     BiSeNet parse over the image tree in device-sized batches
           (vs. the reference's one-image-at-a-time loop at ~1.85 img/s on a
           3090, data/FGID_mask.py:146) -> resized copy, gray mask PNG,
           color overlay PNG, per-image JSON stub
  caption  facial captions; pluggable captioner callable (LLaVA runs as an
           external service in the reference; default = fixed template, the
           same fallback the reference inference uses)
  faceid   ArcFace embeddings in batches -> .bin + JSON field
  fuse     merge per-image JSONs -> JSON_all.json manifest

Usage: python -m consistentid_tpu.apps.fgid mask --images DIR --out DIR ...
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Callable, List, Optional

import numpy as np

FACE_CAPTION_TEMPLATE = (
    "The person has one face, one nose, two eyes, two ears, and one mouth.")

PART_COLORS = np.array([
    [0, 0, 0], [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 0, 85],
    [255, 0, 170], [0, 0, 255], [85, 0, 255], [170, 0, 255], [0, 255, 85],
    [0, 255, 0], [0, 255, 170], [85, 255, 0], [170, 255, 0], [0, 85, 255],
    [0, 170, 255], [255, 255, 0], [255, 0, 255], [255, 85, 255],
    [255, 255, 85],
], np.uint8)


def _image_paths(root: str) -> List[str]:
    exts = (".jpg", ".jpeg", ".png", ".webp")
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(exts):
                out.append(os.path.join(dirpath, f))
    return out


def _json_path(out_dir: str, image_path: str) -> str:
    stem = os.path.splitext(os.path.basename(image_path))[0]
    return os.path.join(out_dir, "json", f"{stem}.json")


def _update_json(out_dir: str, image_path: str, fields: dict):
    path = _json_path(out_dir, image_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.update(fields)
    with open(path, "w") as f:
        json.dump(data, f)


def _decoded_batches(paths: List[str], height: int, width: int,
                     batch_size: int, mean, std, center_crop: bool = False,
                     threads: int = 4):
    """Yield (path_chunk, (B,H,W,3) fp32 normalized, ok flags): the C++
    worker pool (native/fgid_loader.cpp) decodes/resizes/normalizes off the
    Python thread with in-order delivery — the torch-DataLoader-worker
    analogue of the reference's per-image PIL loops (data/FGID_mask.py:146).
    Falls back to PIL when the native lib is unavailable."""
    from ..io.native_loader import NativeImageLoader, get_lib

    if get_lib() is not None:
        loader = NativeImageLoader(paths, height, width, batch_size,
                                   threads=threads, mean=mean, std=std,
                                   center_crop=center_crop)
        try:
            for b in loader:
                yield (paths[b.start:b.start + batch_size], b.images, b.ok)
        finally:
            loader.close()
        return

    from PIL import Image
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        batch = np.zeros((batch_size, height, width, 3), np.float32)
        ok = np.zeros((batch_size,), bool)
        for i, p in enumerate(chunk):
            try:
                im = Image.open(p).convert("RGB")
            except Exception:
                continue
            if center_crop:
                w, h = im.size
                side = min(w, h)
                im = im.crop(((w - side) // 2, (h - side) // 2,
                              (w + side) // 2, (h + side) // 2))
            im = im.resize((width, height), Image.BILINEAR)
            batch[i] = (np.asarray(im, np.float32) / 255.0 - mean_a) / std_a
            ok[i] = True
        yield chunk, batch, ok


def run_mask(images_dir: str, out_dir: str, bisenet_path: str,
             batch_size: int = 8, size: int = 512):
    """Batched BiSeNet parsing over the image tree."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..io import convert
    from ..io.safetensors_reader import read_checkpoint
    from ..models.bisenet import BiSeNet

    params, stats = convert.bisenet_from_torch(read_checkpoint(bisenet_path))
    model = BiSeNet()
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def parse_batch(x):
        logits, _, _ = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    paths = _image_paths(images_dir)
    for d in ("resize", "mask", "color", "json"):
        os.makedirs(os.path.join(out_dir, d), exist_ok=True)

    from ..utils.image import IMAGENET_MEAN, IMAGENET_STD

    def save_outputs(p, rgb_uint8, lab):
        stem = os.path.splitext(os.path.basename(p))[0]
        Image.fromarray(rgb_uint8).save(
            os.path.join(out_dir, "resize", f"{stem}.png"))
        Image.fromarray(lab).save(
            os.path.join(out_dir, "mask", f"{stem}.png"))
        color = PART_COLORS[np.clip(lab, 0, len(PART_COLORS) - 1)]
        overlay = (0.4 * rgb_uint8 + 0.6 * color).astype(np.uint8)
        Image.fromarray(overlay).save(
            os.path.join(out_dir, "color", f"{stem}.png"))
        _update_json(out_dir, p, {
            "image_path": os.path.join("resize", f"{stem}.png"),
            "parsing_mask_path": os.path.join("mask", f"{stem}.png"),
        })

    # PNG encode dominates wall time once the parse runs on an accelerator
    # (3 PNGs per image); fan the saves out to a thread pool so device
    # parse of batch i+1 overlaps host encode of batch i (PIL encode
    # releases the GIL). Safe: every task touches only its own image's
    # files, including its per-image JSON stub. On the CPU backend the
    # encode threads would steal cores from the XLA parse itself (measured
    # 2x slower), so saves stay inline there.
    from concurrent.futures import ThreadPoolExecutor

    pool_workers = 0 if jax.default_backend() == "cpu" else 8
    n_done = n_failed = 0
    futures = []
    pool = ThreadPoolExecutor(max_workers=pool_workers) if pool_workers \
        else None
    try:
        for chunk, batch, ok in _decoded_batches(
                paths, size, size, batch_size,
                mean=tuple(np.asarray(IMAGENET_MEAN).reshape(-1)),
                std=tuple(np.asarray(IMAGENET_STD).reshape(-1))):
            labels = np.asarray(parse_batch(jnp.asarray(batch)))[:len(chunk)]
            for i, (p, lab) in enumerate(zip(chunk, labels)):
                if not ok[i]:
                    n_failed += 1
                    continue
                rgb = np.clip(
                    (batch[i] * IMAGENET_STD + IMAGENET_MEAN) * 255.0,
                    0, 255).astype(np.uint8)
                if pool is not None:
                    futures.append(pool.submit(save_outputs, p, rgb, lab))
                else:
                    save_outputs(p, rgb, lab)
                n_done += 1
        for f in futures:
            f.result()  # surface encode errors
    finally:
        if pool is not None:
            pool.shutdown(wait=True)
    print(f"parsed {n_done} images" +
          (f" ({n_failed} failed decodes skipped)" if n_failed else ""))


def run_caption(images_dir: str, out_dir: str,
                captioner: Optional[Callable] = None,
                batch_size: int = 1):
    """Caption stage; captioner(image_path) -> (caption, facial_caption).
    Default emits the fixed template the reference inference path uses
    (pipline_StableDiffusion_ConsistentID.py:284).

    batch_size > 1 on a batch-capable captioner (LlavaCaptioner
    .caption_batch) stacks images through one decode dispatch per prompt;
    the final short chunk is padded by repeating the last image so the jit
    serves exactly one batch shape."""
    paths = _image_paths(images_dir)
    batched = batch_size > 1 and hasattr(captioner, "caption_batch")
    if batched:
        for start in range(0, len(paths), batch_size):
            chunk = paths[start:start + batch_size]
            padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
            results = captioner.caption_batch(padded)[: len(chunk)]
            for p, (caption, detail) in zip(chunk, results):
                _update_json(out_dir, p, {
                    "vqa_llva": caption,
                    "vqa_llva_more_face_detail": detail})
        print(f"captioned {len(paths)} images (batch {batch_size})")
        return
    for p in paths:
        if captioner is not None:
            caption, detail = captioner(p)
        else:
            caption, detail = "a photo of a person.", FACE_CAPTION_TEMPLATE
        _update_json(out_dir, p, {"vqa_llva": caption,
                                  "vqa_llva_more_face_detail": detail})
    print(f"captioned {len(paths)} images")


def run_faceid(images_dir: str, out_dir: str, arcface_path: str,
               batch_size: int = 32):
    """Batched ArcFace embeddings -> .bin files + JSON fields."""
    import jax
    import jax.numpy as jnp

    from ..io import convert
    from ..io.safetensors_reader import read_checkpoint
    from ..models.arcface import (IResNet, iresnet_arch_from_params,
                                  normalized_embedding)

    if arcface_path.endswith(".onnx"):
        from ..io.onnx_reader import read_onnx_initializers
        sd = read_onnx_initializers(arcface_path)
    else:
        sd = read_checkpoint(arcface_path)
    params, stats = convert.iresnet_from_torch(sd)
    layers, emb_dim, in_size = iresnet_arch_from_params(params)
    model = IResNet(layers=layers, embedding_dim=emb_dim, input_size=in_size)
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def embed_batch(x):
        return normalized_embedding(model.apply(variables, x))

    os.makedirs(os.path.join(out_dir, "faceid"), exist_ok=True)
    paths = _image_paths(images_dir)
    n_done = n_failed = 0
    # x/127.5 - 1 == (x/255 - 0.5)/0.5; center-crop-to-square like the
    # reference's pre-aligned FGID assumption
    for chunk, batch, ok in _decoded_batches(
            paths, in_size, in_size, batch_size,
            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), center_crop=True):
        embeds = np.asarray(embed_batch(jnp.asarray(batch)))[:len(chunk)]
        for i, (p, e) in enumerate(zip(chunk, embeds)):
            if not ok[i]:
                n_failed += 1
                continue
            stem = os.path.splitext(os.path.basename(p))[0]
            bin_path = os.path.join(out_dir, "faceid", f"{stem}.bin")
            e.astype(np.float32).tofile(bin_path)
            _update_json(out_dir, p, {
                "faceid_path": os.path.join("faceid", f"{stem}.bin")})
            n_done += 1
    print(f"embedded {n_done} images" +
          (f" ({n_failed} failed decodes skipped)" if n_failed else ""))


def run_fuse(out_dir: str):
    """Merge per-image JSONs into the training manifest
    (reference data/FGID_fuse_JSON.py:16-31)."""
    json_dir = os.path.join(out_dir, "json")
    merged = {}
    for name in sorted(os.listdir(json_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(json_dir, name)) as f:
            merged[os.path.splitext(name)[0]] = json.load(f)
    with open(os.path.join(out_dir, "JSON_all.json"), "w") as f:
        json.dump(merged, f)
    print(f"fused {len(merged)} entries -> JSON_all.json")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="stage", required=True)
    for stage in ("mask", "caption", "faceid", "fuse"):
        sp = sub.add_parser(stage)
        if stage != "fuse":
            sp.add_argument("--images", required=True)
        sp.add_argument("--out", required=True)
        if stage == "mask":
            sp.add_argument("--bisenet", required=True)
            sp.add_argument("--batch-size", type=int, default=8)
        if stage == "caption":
            sp.add_argument("--captioner-cmd", default=None,
                            help="external VLM worker command (JSONL "
                                 "stdin/stdout protocol, see conditioning."
                                 "captioner.SubprocessCaptioner)")
            sp.add_argument("--captioner-url", default=None,
                            help="external VLM HTTP endpoint")
            sp.add_argument("--captioner-llava", default=None,
                            help="HF llava-1.5 checkpoint dir to run the "
                                 "in-repo TPU LLaVA captioner "
                                 "(conditioning.captioner.LlavaCaptioner)")
            sp.add_argument("--batch", type=int, default=1,
                            help="images per decode dispatch for batch-"
                                 "capable captioners (LlavaCaptioner); the "
                                 "KV cache and greedy decode are batch-"
                                 "shaped so B images cost ~1 execution")
            sp.add_argument("--quant", default="none",
                            choices=("none", "int8"),
                            help="LlavaCaptioner decoder weights: int8 "
                                 "halves param HBM (7B batch>1 fits 16 GB) "
                                 "and the per-token weight read that bounds "
                                 "greedy decode")
            sp.add_argument("--tp", type=int, default=1,
                            help="tensor-parallel degree for the "
                                 "LlavaCaptioner decoder (model-axis mesh; "
                                 "N-way TP reads 1/N of the weights per "
                                 "chip per decoded token)")
            sp.add_argument("--kv-quant", action="store_true",
                            help="int8 KV cache for the LlavaCaptioner — "
                                 "halves the batch-linear KV read of "
                                 "greedy decode")
        if stage == "faceid":
            sp.add_argument("--arcface", required=True)
            sp.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args(argv)

    if args.stage == "mask":
        run_mask(args.images, args.out, args.bisenet, args.batch_size)
    elif args.stage == "caption":
        from ..conditioning.captioner import make_captioner
        captioner = make_captioner(args.captioner_cmd, args.captioner_url,
                                   args.captioner_llava, quant=args.quant,
                                   tp=args.tp, kv_quant=args.kv_quant)
        try:
            run_caption(args.images, args.out, captioner,
                        batch_size=args.batch)
        finally:
            if hasattr(captioner, "close"):
                captioner.close()
    elif args.stage == "faceid":
        run_faceid(args.images, args.out, args.arcface, args.batch_size)
    elif args.stage == "fuse":
        run_fuse(args.out)


if __name__ == "__main__":
    main()
