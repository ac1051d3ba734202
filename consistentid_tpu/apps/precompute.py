"""CLI: precompute frozen-encoder conditioning for training.

    python -m consistentid_tpu.apps.precompute \
        --base /path/sd15 --image-encoder /path/vit-h.safetensors \
        --manifest JSON_all.json --data-root /data/fgid --out /data/encoded

then train from the cache (skips the per-step VAE/ViT-H/CLIP-text
forwards — measured ~28% of the 512px batch-8 device step — with
bitwise-identical losses, training/precompute.py):

    python -m consistentid_tpu.apps.train \
        --encoded --manifest /data/encoded/encoded_manifest.json ...
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", default=None,
                   help="diffusers SD1.5 dir (required unless --tiny)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight bundle (tests/smoke)")
    p.add_argument("--image-encoder", default=None)
    p.add_argument("--manifest", required=True, help="FGID JSON_all.json")
    p.add_argument("--data-root", default="")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--out", required=True, help="output cache directory")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from ..core.cache import enable_compilation_cache
    enable_compilation_cache()

    from ..training import FGIDDataset, precompute_conditioning

    if args.tiny:
        import dataclasses as _dc

        from ..testing import tiny_bundle
        bundle = _dc.replace(
            tiny_bundle(),
            dtype=jax.numpy.bfloat16 if args.dtype == "bf16"
            else jax.numpy.float32)
        params = bundle.init_params(jax.random.PRNGKey(args.seed))
    else:
        assert args.base, "--base is required unless --tiny"
        import os

        from ..core import AdapterConfig, sd15_unet_config
        from ..io.convert_backbones import (clip_text_from_hf,
                                            clip_vision_from_hf,
                                            vae_from_diffusers)
        from ..io.safetensors_reader import read_checkpoint
        from ..pipelines import SD15Bundle
        bundle = SD15Bundle(
            unet_config=sd15_unet_config(),
            adapter_config=AdapterConfig(),
            dtype=jax.numpy.bfloat16 if args.dtype == "bf16"
            else jax.numpy.float32)
        params = bundle.init_params(jax.random.PRNGKey(args.seed))
        params["vae"] = vae_from_diffusers(
            read_checkpoint(os.path.join(args.base, "vae")),
            bundle.vae_config)
        params["text_encoder"] = clip_text_from_hf(
            read_checkpoint(os.path.join(args.base, "text_encoder")),
            bundle.text_config)
        if args.image_encoder:
            params["image_encoder"] = clip_vision_from_hf(
                read_checkpoint(args.image_encoder), bundle.vision_config)

    if args.tokenizer:
        from transformers import CLIPTokenizer
        tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer)
        tokenizer.add_tokens(["<|image|>", "<|facial|>"])
    else:
        from ..conditioning import SimpleTokenizer
        tokenizer = SimpleTokenizer()

    dataset = FGIDDataset(args.manifest, tokenizer, size=args.resolution,
                          image_root=args.data_root, seed=args.seed,
                          clip_size=bundle.vision_config.image_size,
                          id_dim=bundle.adapter_config.id_embeddings_dim)
    path = precompute_conditioning(bundle, params, dataset, args.out,
                                   batch_size=args.batch_size)
    print(f"encoded manifest -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
