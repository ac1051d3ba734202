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
from consistentid_tpu.testing import tiny_sdxl_bundle  # noqa: F401 (fixture reuse)
from tests.test_pipeline_e2e import synthetic_face_inputs


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
