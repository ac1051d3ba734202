"""ConsistentID inpainting example (mirrors reference demo/inpaint_demo.py:50-97).

Regenerates the masked region of a portrait while preserving the
reference identity. Runs end-to-end with NO downloads: by default it
synthesizes a complete tiny reference-layout checkpoint set
(apps.validate.synthesize) and drives the real load path
(pipelines.loading.load_sd15_consistentid with
pipeline_cls=ConsistentIDInpaintPipeline). Point --base/--consistentid at
real checkpoint dumps for full-size results — the code path is identical.

    python examples/inpaint_demo.py                     # tiny, synthesized
    python examples/inpaint_demo.py --base /ckpt/sd15 \
        --consistentid ConsistentID-v1.bin --image face.jpg \
        --init-image room.jpg --mask-image mask.png --full-size
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def synthetic_inputs(size=64):
    """Deterministic stand-ins for the reference demo's URL placeholders
    (demo/inpaint_demo.py:23-26 — undefined init_image_url/mask_image_url)."""
    rng = np.random.RandomState(0)
    face = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    init = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    mask = np.zeros((size, size), np.uint8)
    mask[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = 255
    labels = np.zeros((size, size), np.uint8)
    labels[10:size - 14, 10:size - 10] = 1      # skin
    labels[16:22, 14:26] = 4                    # eyes
    labels[26:32, 28:36] = 10                   # nose
    labels[36:42, 22:40] = 12                   # mouth
    return face, init, Image.fromarray(mask), labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", default=None, help="SD1.5 diffusers dump")
    p.add_argument("--consistentid", default=None)
    p.add_argument("--image-encoder", default=None)
    p.add_argument("--image", default=None, help="identity photo")
    p.add_argument("--init-image", default=None, help="image to inpaint")
    p.add_argument("--mask-image", default=None,
                   help="white = regenerate, black = keep")
    p.add_argument("--prompt",
                   default="photo of a person in a library, bookshelves")
    p.add_argument("--negative-prompt", default="blurry, deformed")
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--out", default="inpaint_out.png")
    p.add_argument("--full-size", action="store_true",
                   help="full SD1.5 config (needs real checkpoints)")
    args = p.parse_args()

    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines import ConsistentIDInpaintPipeline
    from consistentid_tpu.pipelines.loading import load_sd15_consistentid

    tiny = not args.full_size
    if args.base is None:
        from consistentid_tpu.apps.validate import synthesize
        outdir = tempfile.mkdtemp(prefix="consistentid_synth_")
        print(f"synthesizing tiny reference-layout checkpoints -> {outdir}")
        paths = synthesize(outdir)
        args.base = paths["base"]
        args.consistentid = paths["consistentid"]
        args.image_encoder = paths["image_encoder"]

    bundle = None
    kw = {}
    if tiny:
        from consistentid_tpu.conditioning import SimpleTokenizer
        from consistentid_tpu.testing import tiny_bundle
        bundle = tiny_bundle()
        kw["tokenizer"] = SimpleTokenizer()
    h = w = 64 if tiny else 512
    steps = args.steps or (4 if tiny else 50)
    pipe = load_sd15_consistentid(
        args.base, consistentid_path=args.consistentid,
        image_encoder_path=args.image_encoder, bundle=bundle,
        pipeline_cls=ConsistentIDInpaintPipeline,
        pipeline_config=PipelineConfig(
            height=h, width=w, num_inference_steps=steps,
            start_merge_step=max(1, steps * 3 // 5)),
        **kw)

    labels = None
    if args.image:
        face = Image.open(args.image).convert("RGB")
        init = Image.open(args.init_image).convert("RGB")
        mask = Image.open(args.mask_image).convert("L")
        faceid = None  # real face stack (bisenet/arcface) fills these in
    else:
        face, init, mask, labels = synthetic_inputs()
        faceid = np.zeros((1, pipe.bundle.adapter_config.id_embeddings_dim),
                          np.float32)

    img = pipe.generate(
        args.prompt, face, init, mask, strength=args.strength,
        negative_prompt=args.negative_prompt, seed=2024,
        parsing_labels=labels, faceid_embeds=faceid)
    Image.fromarray(img[0]).save(args.out)
    print(f"wrote {args.out}  shape={img.shape}  std={img.std():.1f}")


if __name__ == "__main__":
    main()
