"""Face-parsing region masks (host-side numpy/cv2/PIL).

Behavioral reimplementation of reference functions.py:326-387: per-value
filled-contour binary masks keyed by body part from a BiSeNet gray parsing
map, plus the inverted WithoutBackground mask and PIL mask compositing.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except Exception:  # pragma: no cover
    HAS_CV2 = False

from PIL import Image

# BiSeNet 19-class face-parsing label -> body part + overlay color
# (reference functions.py:333-359)
MASK_VALUE_TABLE = {
    0: ("Background", (0, 0, 0)),
    1: ("Face", (255, 0, 0)),
    2: ("Left_Eyebrow", (255, 85, 0)),
    3: ("Right_Eyebrow", (255, 170, 0)),
    4: ("Left_Eye", (255, 0, 85)),
    5: ("Right_Eye", (255, 0, 170)),
    6: ("Hair", (0, 0, 255)),
    7: ("Left_Ear", (85, 0, 255)),
    8: ("Right_Ear", (170, 0, 255)),
    9: ("Mouth_External Contour", (0, 255, 85)),
    10: ("Nose", (0, 255, 0)),
    11: ("Mouth_Inner_Contour", (0, 255, 170)),
    12: ("Upper_Lip", (85, 255, 0)),
    13: ("Lower_Lip", (170, 255, 0)),
    14: ("Neck", (0, 85, 255)),
    15: ("Neck_Inner Contour", (0, 170, 255)),
    16: ("Cloth", (255, 255, 0)),
    17: ("Hat", (255, 0, 255)),
    18: ("Earring", (255, 85, 255)),
    19: ("Necklace", (255, 255, 85)),
    20: ("Glasses", (255, 170, 255)),
    21: ("Hand", (255, 0, 255)),
    22: ("Wristband", (0, 255, 255)),
    23: ("Clothes_Upper", (85, 255, 255)),
    24: ("Clothes_Lower", (170, 255, 255)),
}


def _filled_contour_mask(binary: np.ndarray) -> np.ndarray:
    """255-filled external contours of a {0,255} uint8 image."""
    contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    mask = np.zeros_like(binary)
    for contour in contours:
        cv2.drawContours(mask, [contour], -1, (255,), thickness=cv2.FILLED)
    return mask


def masks_for_unique_values(parsing_map) -> Dict[str, Image.Image]:
    """Gray parsing map (PIL or ndarray) -> {body_part: binary PIL mask}.

    Value 0 becomes the inverted 'WithoutBackground' mask; unknown label
    values are skipped (reference functions.py:361-387).
    """
    arr = np.array(parsing_map)
    out: Dict[str, Image.Image] = {}
    for value in np.unique(arr):
        binary = (np.uint8(arr == value)) * 255
        filled = _filled_contour_mask(binary)
        if value == 0:
            # value 0 yields BOTH the inverted WithoutBackground mask and the
            # plain Background mask (reference functions.py:376-385 falls
            # through after the background branch)
            inverted = np.where(filled == 255, 0, 255).astype(filled.dtype)
            out["WithoutBackground"] = Image.fromarray(inverted)
        entry = MASK_VALUE_TABLE.get(int(value))
        if entry is None:
            continue
        out[entry[0]] = Image.fromarray(filled)
    return out


def fetch_mask_raw_image(raw_image: Image.Image,
                         mask_image: Image.Image) -> Image.Image:
    """image x binary mask composite (black background),
    reference functions.py:326-331."""
    mask_image = mask_image.resize(raw_image.size)
    black = Image.new("RGB", raw_image.size, (0, 0, 0))
    return Image.composite(raw_image, black, mask_image)
