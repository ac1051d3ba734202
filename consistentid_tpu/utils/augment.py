"""Object-image augmentations (reference evaluation/eval_function.py:76-187,
the FastComposer-style get_object_transforms set): pad-to-square, random
horizontal flip, random zoom-in/zoom-out with re-padding, all on numpy
arrays so they compose with the native loader.
"""
from __future__ import annotations

import numpy as np


def pad_to_square(image: np.ndarray, fill: int = 0) -> np.ndarray:
    """(H, W, C) -> (S, S, C), centered."""
    h, w = image.shape[:2]
    s = max(h, w)
    out = np.full((s, s) + image.shape[2:], fill, image.dtype)
    top, left = (s - h) // 2, (s - w) // 2
    out[top:top + h, left:left + w] = image
    return out


def random_flip(image: np.ndarray, rng: np.random.RandomState,
                p: float = 0.5) -> np.ndarray:
    return image[:, ::-1] if rng.rand() < p else image


def random_zoom_in(image: np.ndarray, rng: np.random.RandomState,
                   min_scale: float = 1.0, max_scale: float = 1.25
                   ) -> np.ndarray:
    """Crop a random sub-window of 1/scale size (zoom-in), keep output size
    via nearest resize."""
    from PIL import Image as PILImage

    h, w = image.shape[:2]
    scale = rng.uniform(min_scale, max_scale)
    ch, cw = int(h / scale), int(w / scale)
    top = rng.randint(0, h - ch + 1)
    left = rng.randint(0, w - cw + 1)
    crop = image[top:top + ch, left:left + cw]
    return np.asarray(PILImage.fromarray(crop).resize((w, h),
                                                      PILImage.BILINEAR))


def random_zoom_out(image: np.ndarray, rng: np.random.RandomState,
                    min_scale: float = 0.75, max_scale: float = 1.0,
                    fill: int = 0) -> np.ndarray:
    """Shrink the content and re-pad to the original size at a random
    position (zoom-out)."""
    from PIL import Image as PILImage

    h, w = image.shape[:2]
    scale = rng.uniform(min_scale, max_scale)
    nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
    small = np.asarray(PILImage.fromarray(image).resize((nw, nh),
                                                        PILImage.BILINEAR))
    out = np.full_like(image, fill)
    top = rng.randint(0, h - nh + 1)
    left = rng.randint(0, w - nw + 1)
    out[top:top + nh, left:left + nw] = small
    return out


def object_transforms(image: np.ndarray, rng: np.random.RandomState,
                      size: int = 224, augment: bool = True) -> np.ndarray:
    """The composed pipeline: pad-to-square (+ random flip/zoom when
    augmenting) -> resize to `size`."""
    from PIL import Image as PILImage

    out = pad_to_square(image)
    if augment:
        out = random_flip(out, rng)
        if rng.rand() < 0.5:
            out = random_zoom_in(out, rng)
        else:
            out = random_zoom_out(out, rng)
    return np.asarray(PILImage.fromarray(out).resize((size, size),
                                                     PILImage.BILINEAR))
