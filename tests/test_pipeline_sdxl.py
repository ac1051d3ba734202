"""Tiny-config SDXL ConsistentID pipeline end-to-end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import (AdapterConfig, CLIPTextConfig,
                                   CLIPVisionConfig, PipelineConfig,
                                   UNetConfig, VAEConfig)
from consistentid_tpu.pipelines import ConsistentIDXLPipeline, SDXLBundle
from tests.test_pipeline_e2e import synthetic_face_inputs


def tiny_sdxl_bundle():
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


def test_sdxl_generate_end_to_end():
    bundle = tiny_sdxl_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    pipe = ConsistentIDXLPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       guidance_scale=7.5,
                                       start_merge_step=1))
    face, labels = synthetic_face_inputs()
    faceid = np.random.RandomState(1).randn(1, 16).astype(np.float32)
    img = pipe.generate(
        "portrait of a man with a strong face and blue eyes", face,
        parsing_labels=labels, faceid_embeds=faceid, seed=3)
    assert img.shape == (1, 32, 32, 3)
    assert img.dtype == np.uint8
    img2 = pipe.generate(
        "portrait of a man with a strong face and blue eyes", face,
        parsing_labels=labels, faceid_embeds=faceid, seed=3,
        start_merge_step=2)
    assert not np.array_equal(img, img2)
