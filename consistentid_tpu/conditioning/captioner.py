"""Facial captioner interface + external-VLM adapters.

The reference optionally drives LLaVA-1.5 for facial captions
(models/LLaVA, data/FGID_caption.py:36-116) but ships with it disabled: at
inference a fixed template is used instead
(pipline_StableDiffusion_ConsistentID.py:265-286). This module defines the
pluggable interface: any callable image -> (caption, facial_detail_caption).

`TemplateCaptioner` is the default (the reference's built-in template);
`VLMCaptioner` adapts any in-process vision-language model exposing
`generate(image, prompt) -> str`; `SubprocessCaptioner`/`HTTPCaptioner`
adapt an external VLM (a LLaVA server, a llama.cpp worker, any process)
through a one-JSON-per-line stdin/stdout protocol or a POST endpoint, using
the reference's two FGID prompts (data/FGID_caption.py:21-24). TPU stays
dedicated to diffusion; the captioner runs wherever its weights live.
"""
from __future__ import annotations

import base64
import io
import json
import subprocess
from typing import Callable, Optional, Protocol, Tuple

FACE_CAPTION_TEMPLATE = (
    "The person has one face, one nose, two eyes, two ears, and one mouth.")
# reference FGID prompts, whitespace quirk from the \-continuation included
# (data/FGID_caption.py:21-24)
CAPTION_PROMPT = ("Please describe the people in the image, including their "
                  "gender,         age, clothing, facial expressions, and "
                  "any other distinguishing features.")
DETAIL_PROMPT = ("Describe this person's facial features for me, including "
                 "        face, ears, eyes, nose, and mouth.")


class Captioner(Protocol):
    def __call__(self, image) -> Tuple[str, str]: ...


def _has_leaf(tree, name: str) -> bool:
    """True if any nested-dict key equals `name` (quant-layout detection)."""
    if not isinstance(tree, dict):
        return False
    return any(k == name or _has_leaf(v, name) for k, v in tree.items())


# ---------------------------------------------------------------------------
# In-repo LLaVA captioner (TPU-native equivalent of models/LLaVA +
# data/FGID_caption.py:36-116)
# ---------------------------------------------------------------------------

# llava_v1 conversation template (what the reference's vendored driver
# resolves to for llava-v1.5 with conv_mode=None,
# models/LLaVA/demo_llva_use.py:28): "{system} USER: <image>\n{query}
# ASSISTANT:" with sep=" " after the user turn.
LLAVA_SYSTEM = (
    "A chat between a curious human and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the human's questions.")


def llava_v1_prompt_parts(query: str,
                          system: str = LLAVA_SYSTEM) -> Tuple[str, str]:
    """Text before/after the `<image>` slot in the llava_v1 prompt.

    Matches upstream LLaVA's conv_llava_v1.get_prompt() split at
    DEFAULT_IMAGE_TOKEN: the image features replace `<image>` in
    `{system} USER: <image>\\n{query} ASSISTANT:`.
    """
    return f"{system} USER: ", f"\n{query} ASSISTANT:"


class LlavaCaptioner:
    """Runs the in-repo LLaVA-1.5 (models/llava.py) as a jitted TPU
    prefill+decode captioner — the runnable equivalent of the reference's
    torch LLaVA driver (data/FGID_caption.py:20-78).

    `tokenizer` is any HF-style Llama tokenizer: `encode(text) -> ids`
    (prepending BOS), `decode(ids, skip_special_tokens=True) -> str`, and
    `bos_token_id`/`eos_token_id` attributes. Prompt ids follow upstream
    `tokenizer_image_token` semantics: [bos] + pre + <features> +
    post-without-bos. The two FGID prompts give exactly two compilations
    (shape-specialized jit); greedy decode = the reference's temperature=0.
    """

    def __init__(self, params, tokenizer, config=None,
                 max_new_tokens: int = 512, dtype=None,
                 caption_prompt: str = CAPTION_PROMPT,
                 detail_prompt: str = DETAIL_PROMPT,
                 system: str = LLAVA_SYSTEM, quant: str = "none",
                 kv_quant: bool = False, mesh=None):
        import jax.numpy as jnp

        from ..core.config import LlavaConfig
        from ..models.llava import make_caption_fn

        self.config = config or LlavaConfig()
        if quant == "int8":
            # int8 decoder weights: halves HBM (batch > 1 fits a 16 GB
            # chip at 7B) and the per-token weight read (decode roofline).
            # Float-tree input converted here; pre-quantized trees (with
            # kernel_q leaves) pass through untouched.
            from ..models.llama import quantize_llama_params

            if not _has_leaf(params["llama"], "kernel_q"):
                params = dict(params)
                params["llama"] = quantize_llama_params(
                    self.config.text, params["llama"],
                    dtype=dtype or jnp.bfloat16)
        elif quant != "none":
            raise ValueError(f"unknown quant mode {quant!r} "
                             "(expected 'none' or 'int8')")
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # Megatron-style TP over the mesh's model axis: params are
            # device_put with column/row shardings and XLA's SPMD
            # partitioner splits every jitted graph (prefill + decode
            # while-loop included). Decode is weight-read-bound, so N-way
            # TP reads 1/N of the weights per chip per token.
            from ..parallel.tensor_parallel import apply_llava_tensor_parallel
            params = apply_llava_tensor_parallel(params, mesh)
        self.params = params
        self.tokenizer = tokenizer
        self.caption_prompt = caption_prompt
        self.detail_prompt = detail_prompt
        self.system = system
        self._fn = make_caption_fn(
            self.config, max_new_tokens=max_new_tokens,
            eos_token_id=int(tokenizer.eos_token_id),
            pad_token_id=0, dtype=dtype or jnp.bfloat16,
            quant=(quant == "int8"), kv_quant=kv_quant)

    @classmethod
    def from_pretrained(cls, model_dir: str, **kw) -> "LlavaCaptioner":
        """Load an HF llava-1.5 checkpoint directory (safetensors shards +
        tokenizer files) into the flax model."""
        import os

        from ..core.config import LlavaConfig
        from ..io.convert_backbones import llava_from_hf
        from ..io.safetensors_reader import read_checkpoint

        from transformers import AutoTokenizer

        cfg = kw.pop("config", None) or LlavaConfig()
        sd = read_checkpoint(model_dir)
        params = llava_from_hf(sd, cfg)
        tok = AutoTokenizer.from_pretrained(model_dir)
        return cls(params, tok, config=cfg, **kw)

    def _encode_parts(self, query: str):
        import numpy as np

        pre_text, post_text = llava_v1_prompt_parts(query, self.system)
        pre = list(self.tokenizer.encode(pre_text))
        post = list(self.tokenizer.encode(post_text))
        # upstream tokenizer_image_token: the post chunk's BOS is dropped
        bos = getattr(self.tokenizer, "bos_token_id", None)
        if bos is not None and post and post[0] == bos:
            post = post[1:]
        return np.asarray(pre, np.int32), np.asarray(post, np.int32)

    def _decode_row(self, toks) -> str:
        # pads (0) only ever appear after EOS, so cutting at EOS is enough
        eos = int(self.tokenizer.eos_token_id)
        ids = toks[:toks.index(eos)] if eos in toks else toks
        return self.tokenizer.decode(ids, skip_special_tokens=True).strip()

    def _pixels(self, image):
        from ..models.llava import preprocess_image

        if isinstance(image, str):
            from PIL import Image
            image = Image.open(image)
        return preprocess_image(image, self.config.vision.image_size)

    def generate(self, image, prompt: str) -> str:
        import numpy as np

        pre, post = self._encode_parts(prompt)
        out = np.asarray(self._fn(self.params, self._pixels(image),
                                  pre, post))[0]
        return self._decode_row(out.tolist())

    def generate_batch(self, images, prompt: str) -> list:
        """One prefill+decode dispatch over a stacked image batch — the
        KV cache, splice, and while-loop decode are all batch-shaped
        (models/llama.py greedy_generate), so B images cost one graph
        execution instead of B. The FGID prompt is shared across the batch
        (the protocol runs one fixed prompt per pass over the corpus), so
        the spliced pre/post embeddings tile for free. The jit specializes
        per (B, prompt) — drive fixed-size chunks (apps/fgid.py --batch)
        so a corpus costs two compilations per batch size."""
        import numpy as np

        pre, post = self._encode_parts(prompt)
        pixels = np.concatenate([self._pixels(im) for im in images])
        out = np.asarray(self._fn(self.params, pixels, pre, post))
        return [self._decode_row(row.tolist()) for row in out]

    def caption_batch(self, images) -> list:
        """[(caption, facial_detail_caption)] for a batch of images; two
        batched passes (one per FGID prompt)."""
        caps = self.generate_batch(images, self.caption_prompt)
        details = self.generate_batch(images, self.detail_prompt)
        return list(zip(caps, details))

    def __call__(self, image) -> Tuple[str, str]:
        return (self.generate(image, self.caption_prompt),
                self.generate(image, self.detail_prompt))


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


def _image_payload(image) -> dict:
    """str path -> {"image_path": ...}; PIL image -> {"image_b64": ...}."""
    if isinstance(image, str):
        return {"image_path": image}
    buf = io.BytesIO()
    image.save(buf, "PNG")
    return {"image_b64": base64.b64encode(buf.getvalue()).decode()}


class SubprocessCaptioner:
    """External-process VLM over a persistent worker.

    Protocol: one JSON object per line on stdin
        {"prompt": str, "image_path": str} or {..., "image_b64": str}
    one JSON object per line on stdout
        {"text": str}   (or {"error": str} -> RuntimeError)

    The worker is spawned once and reused for the whole dataset — the
    process-per-stage layout of the reference's data/FGID.sh, but without
    reloading 7B of weights per image. Use as a context manager or call
    close() to terminate the worker.
    """

    def __init__(self, command, caption_prompt: str = CAPTION_PROMPT,
                 detail_prompt: str = DETAIL_PROMPT):
        if isinstance(command, str):
            import shlex
            command = shlex.split(command)
        self._proc = subprocess.Popen(
            command, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1)
        self.caption_prompt = caption_prompt
        self.detail_prompt = detail_prompt

    def _ask(self, image, prompt: str) -> str:
        req = {"prompt": prompt, **_image_payload(image)}
        self._proc.stdin.write(json.dumps(req) + "\n")
        self._proc.stdin.flush()
        line = self._proc.stdout.readline()
        if not line:
            rc = self._proc.poll()
            raise RuntimeError(f"captioner worker died (exit {rc})")
        out = json.loads(line)
        if "error" in out:
            raise RuntimeError(f"captioner error: {out['error']}")
        return out["text"]

    def __call__(self, image) -> Tuple[str, str]:
        return (self._ask(image, self.caption_prompt),
                self._ask(image, self.detail_prompt))

    def close(self):
        if self._proc.poll() is None:
            self._proc.stdin.close()
            self._proc.wait(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class HTTPCaptioner:
    """External VLM behind an HTTP endpoint.

    POST {url} with JSON {"prompt": str, "image_b64"/"image_path": str},
    response JSON {"text": str}.
    """

    def __init__(self, url: str, caption_prompt: str = CAPTION_PROMPT,
                 detail_prompt: str = DETAIL_PROMPT,
                 timeout: float = 120.0):
        self.url = url
        self.caption_prompt = caption_prompt
        self.detail_prompt = detail_prompt
        self.timeout = timeout

    def _ask(self, image, prompt: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=json.dumps({"prompt": prompt,
                             **_image_payload(image)}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())["text"]

    def __call__(self, image) -> Tuple[str, str]:
        return (self._ask(image, self.caption_prompt),
                self._ask(image, self.detail_prompt))


def make_captioner(command: Optional[str] = None,
                   url: Optional[str] = None,
                   llava_dir: Optional[str] = None,
                   quant: str = "none", tp: int = 1,
                   kv_quant: bool = False) -> Callable:
    """CLI helper: build the captioner from
    --captioner-cmd/--captioner-url/--captioner-llava flags; the template
    default when none is given (the reference's shipped inference
    behavior). `quant`/`tp`/`kv_quant` apply to the in-repo LLaVA only;
    tp > 1 shards the 7B decoder over a model-axis mesh of tp devices."""
    if llava_dir:
        mesh = None
        if tp > 1:
            import jax
            from ..parallel import make_mesh
            # slice explicitly: make_mesh over all devices asserts
            # data*model == n_devices, which would crash --tp N on any
            # host with more than N chips (serve.py does the same slice)
            mesh = make_mesh(jax.devices()[:tp], data=1, model=tp)
        return LlavaCaptioner.from_pretrained(llava_dir, quant=quant,
                                              kv_quant=kv_quant, mesh=mesh)
    if command:
        return SubprocessCaptioner(command)
    if url:
        return HTTPCaptioner(url)
    return TemplateCaptioner()
