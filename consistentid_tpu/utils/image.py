"""Host-side image preprocessing (numpy/PIL) feeding the jitted graphs.

Replaces the reference's torchvision/CLIPImageProcessor transforms
(pipline_StableDiffusion_ConsistentID.py:200,231-234,354-355) with numpy
equivalents producing NHWC fp32 arrays.
"""
from __future__ import annotations

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _to_rgb(image) -> Image.Image:
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    return image.convert("RGB")


def clip_preprocess(image, size: int = 224) -> np.ndarray:
    """CLIPImageProcessor defaults: shortest-side resize (bicubic), center
    crop, rescale, normalize. Returns (1, size, size, 3) fp32 NHWC."""
    image = _to_rgb(image)
    w, h = image.size
    short = min(w, h)
    new_w, new_h = round(w * size / short), round(h * size / short)
    image = image.resize((new_w, new_h), Image.BICUBIC)
    left, top = (new_w - size) // 2, (new_h - size) // 2
    image = image.crop((left, top, left + size, top + size))
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr[None]


def imagenet_preprocess(image, size: int = 512) -> np.ndarray:
    """BiSeNet input transform: bilinear resize + ImageNet normalize,
    (1, size, size, 3) NHWC (reference :231-241)."""
    image = _to_rgb(image).resize((size, size), Image.BILINEAR)
    arr = np.asarray(image, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr[None]


def sd_image_preprocess(image, height: int, width: int) -> np.ndarray:
    """Diffusion image input: resize + scale to [-1, 1], (1, H, W, 3)."""
    image = _to_rgb(image).resize((width, height), Image.LANCZOS)
    arr = np.asarray(image, np.float32) / 255.0
    return (arr * 2.0 - 1.0)[None]


def center_crop_mask(mask: Image.Image, size: int = 512) -> np.ndarray:
    """CenterCrop + ToTensor for binary region masks
    (reference :354, transform_mask). Returns (size, size) fp32 in [0,1]."""
    w, h = mask.size
    left, top = (w - size) // 2, (h - size) // 2
    # PIL crop pads with 0 if the crop box exceeds the image, matching
    # torchvision CenterCrop's padding behavior for smaller images
    mask = mask.crop((left, top, left + size, top + size))
    return np.asarray(mask, np.float32) / 255.0


def postprocess_to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1] NHWC float -> uint8."""
    images = np.clip(images / 2 + 0.5, 0.0, 1.0)
    return (images * 255).round().astype(np.uint8)


def crop_to_content(image: Image.Image, threshold: int = 10) -> Image.Image:
    """Crop away the black border around the content (reference
    evaluation/eval_function.py:12-28)."""
    gray = np.array(_to_rgb(image).convert("L"))
    nz = np.where(gray > threshold)
    if nz[0].size == 0:
        return image
    top, bottom = nz[0].min(), nz[0].max()
    left, right = nz[1].min(), nz[1].max()
    return image.crop((left, top, right, bottom))


def white_balance_correction(image: np.ndarray) -> np.ndarray:
    """Mean-shift each channel to 128 (reference eval_function.py:58-74)."""
    arr = image.astype(np.float64)
    offsets = 128.0 - arr.reshape(-1, 3).mean(axis=0)
    return np.clip(arr + offsets, 0, 255).astype(np.uint8)
