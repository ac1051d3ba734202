"""Facial captioner interface.

The reference optionally drives LLaVA-1.5 for facial captions
(models/LLaVA, data/FGID_caption.py:36-116) but ships with it disabled: at
inference a fixed template is used instead
(pipline_StableDiffusion_ConsistentID.py:265-286). This module defines the
pluggable interface: any callable image -> (caption, facial_detail_caption).

`TemplateCaptioner` is the default (the reference's built-in template);
`VLMCaptioner` adapts any local vision-language model exposing a
`generate(image, prompt) -> str` method (e.g. a JAX/transformers VLM), using
the reference's two FGID prompts.
"""
from __future__ import annotations

from typing import Callable, Protocol, Tuple

FACE_CAPTION_TEMPLATE = (
    "The person has one face, one nose, two eyes, two ears, and one mouth.")
CAPTION_PROMPT = "Please describe the people in the image, including their gender, age, clothing, and actions."
DETAIL_PROMPT = ("Describe this person's facial features for me, including "
                 "face, ears, eyes, nose, and mouth.")


class Captioner(Protocol):
    def __call__(self, image) -> Tuple[str, str]: ...


class TemplateCaptioner:
    """Fixed-template captions (the reference's shipped behavior)."""

    def __init__(self, caption: str = "a photo of a person.",
                 detail: str = FACE_CAPTION_TEMPLATE):
        self.caption = caption
        self.detail = detail

    def __call__(self, image) -> Tuple[str, str]:
        return self.caption, self.detail


class VLMCaptioner:
    """Adapter over a local VLM with generate(image, prompt) -> str."""

    def __init__(self, vlm, caption_prompt: str = CAPTION_PROMPT,
                 detail_prompt: str = DETAIL_PROMPT):
        self.vlm = vlm
        self.caption_prompt = caption_prompt
        self.detail_prompt = detail_prompt

    def __call__(self, image) -> Tuple[str, str]:
        return (self.vlm.generate(image, self.caption_prompt),
                self.vlm.generate(image, self.detail_prompt))
