"""Tiny-config img2img pipeline: strength semantics + async contract."""
import numpy as np
import pytest
from PIL import Image

import jax

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.pipelines import (ConsistentIDImg2ImgPipeline,
                                        ConsistentIDPipeline)
from consistentid_tpu.testing import tiny_bundle
from tests.test_pipeline_e2e import synthetic_face_inputs


@pytest.fixture(scope="module")
def pipes():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    cfg = PipelineConfig(height=32, width=32, num_inference_steps=4,
                         start_merge_step=1)
    i2i = ConsistentIDImg2ImgPipeline(bundle, params, SimpleTokenizer(),
                                      pipeline_config=cfg)
    t2i = ConsistentIDPipeline(bundle, params, SimpleTokenizer(),
                               pipeline_config=cfg)
    return i2i, t2i


def _kw():
    face, labels = synthetic_face_inputs()
    return face, dict(parsing_labels=labels,
                      faceid_embeds=np.zeros((1, 16), np.float32), seed=3)


def test_full_strength_equals_text_to_image(pipes):
    """strength >= 1 starts from pure noise: bit-identical to the t2i
    pipeline given the same seed (the init image contributes only through
    the ID conditioning, which is the same face here)."""
    i2i, t2i = pipes
    face, kw = _kw()
    a = i2i.generate("a man with a face", face, face, strength=1.0, **kw)
    b = t2i.generate("a man with a face", face, **kw)
    np.testing.assert_array_equal(a, b)


def test_strength_truncation_anchors_to_init(pipes):
    """Lower strength keeps the output closer to the init image's VAE
    roundtrip (fewer denoise steps applied to less-noised init latents)."""
    i2i, _ = pipes
    face, kw = _kw()
    init = Image.fromarray(
        np.random.RandomState(7).randint(0, 255, (64, 64, 3), np.uint8))

    import functools
    import jax.numpy as jnp
    from consistentid_tpu.models import AutoencoderKL
    from consistentid_tpu.utils.image import sd_image_preprocess
    vae_apply = functools.partial(i2i.bundle.vae.apply,
                                  {"params": i2i.params["vae"]})
    x = jnp.asarray(sd_image_preprocess(init, 32, 32))
    roundtrip = np.asarray(vae_apply(
        vae_apply(x, jax.random.PRNGKey(0), method=AutoencoderKL.encode),
        method=AutoencoderKL.decode)).astype(np.float32)

    def dist(strength):
        img = i2i.generate("a man with a face", face, init,
                           strength=strength, return_device=True, **kw)
        return float(np.abs(np.asarray(img, np.float32) - roundtrip).mean())

    d_low, d_high = dist(0.25), dist(1.0)
    assert np.isfinite(d_low) and np.isfinite(d_high)
    assert d_low < d_high


def test_async_matches_sync(pipes):
    """generate_async must produce the same uint8 images as generate —
    the return_device contract (the round-2 ADVICE inpaint-async bug
    class)."""
    i2i, _ = pipes
    face, kw = _kw()
    sync = i2i.generate("a man with a face", face, face, strength=0.5, **kw)
    finish = i2i.generate_async("a man with a face", face, face,
                                strength=0.5, **kw)
    np.testing.assert_array_equal(sync, finish())


def test_rejects_unknown_kwargs_and_batch(pipes):
    i2i, _ = pipes
    face, kw = _kw()
    with pytest.raises(TypeError, match="unknown generate"):
        i2i.generate("p", face, face, mask_image=face, **kw)
    with pytest.raises(NotImplementedError):
        i2i.generate_batch(["p"], [face])
