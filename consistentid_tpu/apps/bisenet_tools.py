"""BiSeNet face-parsing tools (reference models/BiSeNet/ evaluate.py:59-95,
test.py:51-88, makeup.py, prepropess_data.py).

  evaluate    batched parse over a directory -> color overlays for eyeballing
  makeup      parsing-guided recoloring demo (hair/lip color transfer)
  preprocess  CelebAMask-HQ per-part masks -> combined gray label PNGs

Usage: python -m consistentid_tpu.apps.bisenet_tools evaluate --images d/ ...
"""
from __future__ import annotations

import argparse
import os
import numpy as np

# CelebAMask-HQ part file suffixes -> our 19-class label ids (the combine
# order of the reference prepropess_data.py)
CELEBA_PARTS = [
    ("skin", 1), ("l_brow", 2), ("r_brow", 3), ("l_eye", 4), ("r_eye", 5),
    ("eye_g", 6), ("l_ear", 7), ("r_ear", 8), ("ear_r", 9), ("nose", 10),
    ("mouth", 11), ("u_lip", 12), ("l_lip", 13), ("neck", 14),
    ("neck_l", 15), ("cloth", 16), ("hair", 17), ("hat", 18),
]

PART_COLORS = None  # reuse fgid palette


def _parser_fn(bisenet_path: str, batch: int, size: int = 512):
    import jax
    import jax.numpy as jnp

    from ..io import convert
    from ..io.safetensors_reader import read_checkpoint
    from ..models.bisenet import BiSeNet

    params, stats = convert.bisenet_from_torch(read_checkpoint(bisenet_path))
    model = BiSeNet()
    variables = {"params": params, "batch_stats": stats}

    @jax.jit
    def parse(x):
        logits, _, _ = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return parse


def run_evaluate(images_dir: str, out_dir: str, bisenet_path: str,
                 batch: int = 8, size: int = 512):
    """Directory sweep -> color overlays (reference evaluate.py/test.py)."""
    import jax.numpy as jnp
    from PIL import Image

    from .fgid import PART_COLORS, _image_paths
    from ..utils.image import imagenet_preprocess

    parse = _parser_fn(bisenet_path, batch, size)
    os.makedirs(out_dir, exist_ok=True)
    paths = _image_paths(images_dir)
    for start in range(0, len(paths), batch):
        chunk = paths[start:start + batch]
        pils = [Image.open(p).convert("RGB").resize((size, size))
                for p in chunk]
        x = np.concatenate([imagenet_preprocess(im, size) for im in pils])
        pad = batch - len(chunk)
        if pad:
            x = np.concatenate([x, np.zeros((pad, size, size, 3),
                                            np.float32)])
        labels = np.asarray(parse(jnp.asarray(x)))[:len(chunk)]
        for p, im, lab in zip(chunk, pils, labels):
            color = PART_COLORS[np.clip(lab, 0, len(PART_COLORS) - 1)]
            overlay = (0.4 * np.asarray(im) + 0.6 * color).astype(np.uint8)
            stem = os.path.splitext(os.path.basename(p))[0]
            Image.fromarray(overlay).save(
                os.path.join(out_dir, f"{stem}_parsed.png"))
    print(f"evaluated {len(paths)} images -> {out_dir}")


# reference makeup.py label ids: hair 17 is CelebA-combined; the BiSeNet
# 19-class head uses hair=6 per the FGID mapping table
MAKEUP_PARTS = {"hair": 6, "upper_lip": 12, "lower_lip": 13}


def recolor(image: np.ndarray, labels: np.ndarray, part: str,
            color, alpha: float = 0.7) -> np.ndarray:
    """Parsing-guided recoloring (reference makeup.py hair/lip demo):
    blend `color` into pixels of `part`, preserving luminance-ish detail."""
    out = image.astype(np.float32).copy()
    mask = labels == MAKEUP_PARTS[part]
    tint = np.asarray(color, np.float32)
    out[mask] = out[mask] * (1 - alpha) + tint * alpha
    return out.astype(np.uint8)


def run_makeup(image_path: str, out_path: str, bisenet_path: str,
               hair_color=(30, 30, 160), lip_color=(160, 30, 60)):
    import jax.numpy as jnp
    from PIL import Image

    from ..utils.image import imagenet_preprocess

    parse = _parser_fn(bisenet_path, 1)
    im = Image.open(image_path).convert("RGB").resize((512, 512))
    labels = np.asarray(parse(jnp.asarray(
        imagenet_preprocess(im, 512))))[0]
    arr = np.asarray(im)
    arr = recolor(arr, labels, "hair", hair_color)
    arr = recolor(arr, labels, "upper_lip", lip_color)
    arr = recolor(arr, labels, "lower_lip", lip_color)
    Image.fromarray(arr).save(out_path)
    print(f"saved {out_path}")


def run_preprocess_celeba(mask_root: str, out_dir: str,
                          num_images: int = 30000):
    """Combine CelebAMask-HQ per-part binary masks into gray label PNGs
    (reference prepropess_data.py:1-37)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    done = 0
    for idx in range(num_images):
        folder = os.path.join(mask_root, str(idx // 2000))
        label = np.zeros((512, 512), np.uint8)
        found = False
        for part, value in CELEBA_PARTS:
            p = os.path.join(folder, f"{idx:05d}_{part}.png")
            if os.path.exists(p):
                m = np.array(Image.open(p).convert("L"))
                label[m == 225] = value
                label[m == 255] = value
                found = True
        if found:
            Image.fromarray(label).save(os.path.join(out_dir, f"{idx}.png"))
            done += 1
    print(f"combined {done} label maps -> {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("evaluate")
    e.add_argument("--images", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--bisenet", required=True)
    e.add_argument("--batch", type=int, default=8)
    m = sub.add_parser("makeup")
    m.add_argument("--image", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--bisenet", required=True)
    c = sub.add_parser("preprocess")
    c.add_argument("--mask-root", required=True)
    c.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.cmd == "evaluate":
        run_evaluate(args.images, args.out, args.bisenet, args.batch)
    elif args.cmd == "makeup":
        run_makeup(args.image, args.out, args.bisenet)
    else:
        run_preprocess_celeba(args.mask_root, args.out)


if __name__ == "__main__":
    main()
