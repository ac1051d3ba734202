"""Minimal runnable ConsistentID-TPU demo (random weights, tiny config).

Shows the full API surface without any checkpoint downloads: build a bundle,
init params, run the SD1.5 ConsistentID pipeline on a synthetic face, and run
one training step. With real checkpoints use pipelines.loading instead
(see README "Usage").

    python examples/minimal_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def main():
    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import (AdapterConfig, CLIPTextConfig,
                                       CLIPVisionConfig, PipelineConfig,
                                       SchedulerConfig, TrainConfig,
                                       UNetConfig, VAEConfig)
    from consistentid_tpu.pipelines import ConsistentIDPipeline, SD15Bundle
    from consistentid_tpu.sampling import NoiseSchedule
    from consistentid_tpu.training import (create_train_state,
                                           make_train_step, synthetic_batch)

    bundle = SD15Bundle(
        unet_config=UNetConfig(block_out_channels=(32, 32, 64, 64),
                               layers_per_block=1,
                               num_attention_heads=(2, 2, 2, 2),
                               cross_attention_dim=64, norm_num_groups=8,
                               lora_rank=4, ip_num_tokens=4),
        adapter_config=AdapterConfig(cross_attention_dim=64,
                                     id_embeddings_dim=16,
                                     clip_embeddings_dim=32,
                                     facial_dim=64, facial_depth=2,
                                     facial_heads=2, facial_output_dim=64,
                                     lora_rank=4),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        text_config=CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                   num_layers=2, num_heads=2),
        vision_config=CLIPVisionConfig(image_size=28, patch_size=14,
                                       hidden_size=32, intermediate_size=64,
                                       num_layers=2, num_heads=2),
    )
    params = bundle.init_params(jax.random.PRNGKey(0))

    # --- inference ---
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=64, width=64,
                                       num_inference_steps=4,
                                       start_merge_step=2))
    rng = np.random.RandomState(0)
    face = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    labels = np.zeros((64, 64), np.uint8)
    labels[10:40, 10:50] = 1   # Face
    labels[25:30, 28:34] = 10  # Nose
    img = pipe.generate(
        "portrait of a man with a strong face and a sharp nose", face,
        parsing_labels=labels,
        faceid_embeds=rng.randn(1, 16).astype(np.float32), seed=7)
    print("generated:", img.shape, img.dtype)

    # --- one training step ---
    config = TrainConfig(localization_layers=3)
    schedule = NoiseSchedule.create(SchedulerConfig())
    state = create_train_state(params, config)
    step = make_train_step(bundle, schedule, config)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(batch_size=2, size=32, clip_size=28,
                             id_dim=16).items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    print("train step:", {k: float(v) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
