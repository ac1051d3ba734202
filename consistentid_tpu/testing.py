"""Tiny random-weight model bundles for tests and driver dry-runs.

These configs shrink every tower (UNet / VAE / CLIP text+vision / adapter)
to a few thousand parameters so full pipelines trace and execute in seconds
on a CPU mesh, while preserving every structural feature of the real
models (LoRA, decoupled-IP tokens, facial perceiver depth, CFG pairing).

Mirrors the reference's tiny-config smoke approach at
/root/reference/models/BiSeNet/model.py:275-283 (shape-print smoke blocks),
upgraded to reusable fixtures per SURVEY.md §4.
"""
from consistentid_tpu.core import (AdapterConfig, CLIPTextConfig,
                                   CLIPVisionConfig, UNetConfig, VAEConfig)


def tiny_sdxl_bundle():
    """A complete SDXL ConsistentID bundle at toy scale (random weights)."""
    from consistentid_tpu.pipelines import SDXLBundle

    return SDXLBundle(
        unet_config=UNetConfig(
            block_out_channels=(32, 64, 64),
            layers_per_block=1,
            down_block_has_attn=(False, True, True),
            transformer_layers_per_block=(0, 1, 2),
            mid_transformer_depth=2,
            num_attention_heads=(2, 2, 4),
            cross_attention_dim=96,          # 32 + 64 dual-tower concat
            norm_num_groups=8,
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=8 * 6 + 64,
            lora_rank=4,
            ip_num_tokens=4,
        ),
        adapter_config=AdapterConfig(
            cross_attention_dim=96, id_embeddings_dim=16,
            clip_embeddings_dim=32, facial_dim=64, facial_depth=2,
            facial_heads=2, facial_output_dim=96, lora_rank=4,
            shortcut=True),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8, scaling_factor=0.13025),
        text_config=CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                   num_layers=2, num_heads=2),
        text_config_2=CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                     num_layers=2, num_heads=2,
                                     hidden_act="gelu"),
        vision_config=CLIPVisionConfig(image_size=28, patch_size=14,
                                       hidden_size=32, intermediate_size=64,
                                       num_layers=2, num_heads=2),
    )


def tiny_bundle():
    """A complete SD1.5 ConsistentID bundle at toy scale (random weights)."""
    from consistentid_tpu.pipelines import SD15Bundle

    return SD15Bundle(
        unet_config=UNetConfig(
            block_out_channels=(32, 32, 64, 64),
            layers_per_block=1,
            num_attention_heads=(2, 2, 2, 2),
            cross_attention_dim=64,
            norm_num_groups=8,
            lora_rank=4,
            ip_num_tokens=4,
        ),
        adapter_config=AdapterConfig(
            cross_attention_dim=64,
            id_embeddings_dim=16,
            clip_embeddings_dim=32,
            num_id_tokens=4,
            facial_dim=64,
            facial_depth=2,
            facial_heads=2,
            facial_output_dim=64,
            lora_rank=4,
        ),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        text_config=CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                   num_layers=2, num_heads=2),
        vision_config=CLIPVisionConfig(image_size=28, patch_size=14,
                                       hidden_size=32, intermediate_size=64,
                                       num_layers=2, num_heads=2),
    )


def synthetic_clip_tokenizer(pad_token: str = None):
    """CLIPBPETokenizer over a universal byte-level vocab (full byte
    alphabet + </w> word-end forms, no merges): encodes ANY text, so
    benches and tests drive the production BPE tokenizer code path
    (pipelines/loading.py's default) even where no real vocab.json exists
    (zero-egress environments). Token ids do NOT match the real CLIP vocab
    — use only where ids are opaque (random-weight benches)."""
    from consistentid_tpu.conditioning import CLIPBPETokenizer
    from consistentid_tpu.conditioning.clip_tokenizer import bytes_to_unicode

    syms = list(bytes_to_unicode().values())
    tokens = (syms + [s + "</w>" for s in syms]
              + ["<|startoftext|>", "<|endoftext|>"])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    return CLIPBPETokenizer(vocab, [], pad_token=pad_token)
