"""Typed configuration tree for the whole framework.

The reference scatters configuration across argparse (reference utils.py:220-352,
utils_SDXL.py:313-481), hard-coded module constants (train.py:33-35,151) and
pipeline kwargs. Here everything is a frozen dataclass so a config can be
serialized into checkpoints and hashed for jit cache keys.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


def _freeze(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


# ---------------------------------------------------------------------------
# Backbone model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    """Config for the SD UNet (covers SD1.5 and SDXL variants).

    Mirrors the information in diffusers' UNet2DConditionModel config that the
    reference relies on (reference pipline_StableDiffusion_ConsistentID.py:156-164
    reads block_out_channels / attention head layout to size adapters).
    """

    sample_channels: int = 4            # latent channels in (9 for inpaint UNet)
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # which down blocks carry transformer (cross-attn) layers; mirrored for up
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 0)
    mid_transformer_depth: int = 1
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    time_embed_dim_mult: int = 4        # time_embed_dim = block_out[0] * mult
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True
    # SDXL micro-conditioning ("text_time" addition embeddings)
    addition_embed_type: Optional[str] = None      # None | "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    # ConsistentID adapter hooks (0 disables → vanilla SD UNet)
    lora_rank: int = 0
    lora_scale: float = 1.0
    ip_num_tokens: int = 0              # decoupled IP tokens at tail of context
    ip_scale: float = 1.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * self.time_embed_dim_mult

    def head_dim(self, level: int) -> int:
        return self.block_out_channels[level] // self.num_attention_heads[level]


def sd15_unet_config(**overrides) -> UNetConfig:
    """SD1.5 UNet2DConditionModel layout (runwayml/stable-diffusion-v1-5)."""
    return UNetConfig(**overrides)


def sdxl_unet_config(**overrides) -> UNetConfig:
    """SDXL base UNet layout (stabilityai/stable-diffusion-xl-base-1.0).

    Down blocks: plain, cross-attn(2 tf layers), cross-attn(10 tf layers);
    heads 10/20 at attn levels (head_dim 64); text_time micro-conditioning
    (reference pipline_StableDiffusionXL_ConsistentID.py:527-539).
    """
    base = dict(
        block_out_channels=(320, 640, 1280),
        down_block_has_attn=(False, True, True),
        transformer_layers_per_block=(0, 2, 10),
        mid_transformer_depth=10,
        num_attention_heads=(5, 10, 20),
        cross_attention_dim=2048,
        addition_embed_type="text_time",
        addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=2816,
    )
    base.update(overrides)
    return UNetConfig(**base)


@dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL config (SD 1.5 / SDXL share this layout)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215     # 0.13025 for SDXL
    force_upcast: bool = False          # SDXL decodes in fp32 (reference :670-672)


@dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text encoder. Defaults = CLIP-L/14 (SD1.5 text encoder)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    # final output taken from this hidden state (-1 = last, -2 = penultimate)
    hidden_act: str = "quick_gelu"      # CLIP-L uses quick_gelu; bigG uses gelu
    use_final_layer_norm: bool = True


def clip_text_l_config(**kw) -> CLIPTextConfig:
    return CLIPTextConfig(**kw)


def clip_text_bigg_config(**kw) -> CLIPTextConfig:
    """OpenCLIP bigG (SDXL text_encoder_2)."""
    base = dict(hidden_size=1280, intermediate_size=5120, num_layers=32,
                num_heads=20, hidden_act="gelu")
    base.update(kw)
    return CLIPTextConfig(**base)


@dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision tower. Defaults = ViT-H/14 (laion2B), the image encoder the
    reference loads at pipline_StableDiffusion_ConsistentID.py:55-57; its
    penultimate hidden states (257 x 1280) feed the adapters."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    hidden_act: str = "gelu"

    @property
    def num_tokens(self) -> int:  # cls + patches
        return 1 + (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class LlamaConfig:
    """Llama decoder (HF `LlamaConfig` semantics). Defaults = Llama-2-7b, the
    language model inside LLaVA-1.5 which the reference drives for FGID
    captions (data/FGID_caption.py:20, models/LLaVA)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32              # < num_heads => grouped-query attn
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class LlavaConfig:
    """LLaVA-1.5 captioner: CLIP vision tower (penultimate features, CLS
    dropped) -> 2-layer GELU projector -> Llama. Defaults = llava-v1.5-7b
    (ViT-L/14-336 tower), the model data/FGID_caption.py:20 loads."""

    vision: CLIPVisionConfig = CLIPVisionConfig(
        image_size=336, patch_size=14, hidden_size=1024,
        intermediate_size=4096, num_layers=24, num_heads=16,
        hidden_act="quick_gelu")
    text: LlamaConfig = LlamaConfig()
    image_token_id: int = 32000         # HF llava convention: <image> id

    @property
    def num_image_tokens(self) -> int:  # patches only (CLS dropped)
        return (self.vision.image_size // self.vision.patch_size) ** 2


# ---------------------------------------------------------------------------
# Adapter configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AdapterConfig:
    """ConsistentID adapter hyperparameters.

    Values mirror the reference defaults: ProjPlusModel(functions.py:490-512),
    AttentionMLP(functions.py:524-570), FacialEncoder(attention.py:72-76),
    lora rank 128 (train.py:151), num ID tokens 4, scale 1.0.
    """

    cross_attention_dim: int = 768      # 2048 for SDXL FacialEncoder output
    id_embeddings_dim: int = 512        # ArcFace embedding
    clip_embeddings_dim: int = 1280     # ViT-H hidden size
    num_id_tokens: int = 4              # ProjPlus output tokens
    max_num_facials: int = 5            # padded per-region slots
    max_num_objects: int = 2
    # FacePerceiverResampler
    resampler_depth: int = 4
    resampler_dim_head: int = 64
    # AttentionMLP (per-region compressor)
    facial_dim: int = 1024
    facial_depth: int = 8
    facial_heads: int = 16
    facial_dim_head: int = 64
    facial_output_dim: int = 768        # 2048 for SDXL
    # IP attention
    lora_rank: int = 128
    lora_scale: float = 1.0
    ip_scale: float = 1.0
    shortcut: bool = False              # True for SDXL (ref SDXL pipeline :568)
    shortcut_scale: float = 1.0


# ---------------------------------------------------------------------------
# Sampling / pipeline / training configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    # DDIM
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    timestep_spacing: str = "leading"


@dataclass(frozen=True)
class PipelineConfig:
    height: int = 512
    width: int = 512
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    start_merge_step: int = 30          # reference infer.py:48-49
    scheduler: str = "ddim"     # ddim | euler | ddpm | dpmpp_2m | pndm
    max_text_len: int = 77
    # DeepCache-style deep-feature reuse cadence (sampling/sampler.py):
    # 1 = off (every step runs the full UNet); N>1 = refresh the deep
    # blocks every N-th step, run only the shallow level-0 blocks in
    # between. Training-free acceleration with a small quality trade
    # (PAPERS.md family). Static: changing it recompiles.
    cache_interval: int = 1


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    batch_per_device: int = 2
    grad_accum_steps: int = 1
    facial_weight: float = 0.01         # reference train.py:34
    mask_loss_prob: float = 0.5         # reference train.py:35
    localization_layers: int = 5        # 3 for SDXL (train_SDXL.py:47)
    resolution: int = 512
    max_steps: int = 100000
    save_steps: int = 1000
    seed: int = 42
    # v5e A/B, 512px, 8 steps/dispatch, donated state (r3): with donation
    # no-remat fits HBM through per-chip batch 8 — batch 2 none=0.188
    # s/step, batch 4 none=0.356, batch 8 none=0.573 (13.97 ex/s,
    # MFU 0.33; the throughput config). Remat is the escape hatch for
    # configs that OOM (SDXL 1024px); note an XLA pathology at batch 4
    # where BOTH remat policies run 2.3x slower than no-remat (reproduced
    # 3x) — if remat is needed, prefer batch 8. Flash attention in the
    # bwd pass is 29% faster than XLA attention at batch 8 (0.604 vs
    # 0.779 remat-full) while ~3% slower at batch 2 (round-2 note).
    remat_unet: bool = False
    remat_policy: str = "full"  # "full" | "dots"
    # AdamW first-moment storage dtype ("float32" | "bfloat16"): bf16 mu
    # halves one of the two per-param optimizer-moment streams the step
    # reads+writes (r3 roofline bandwidth item). Second moments stay fp32
    # (sqrt of tiny values loses too much in bf16's 8 mantissa bits).
    mu_dtype: str = "float32"
