"""Tiny-config inpaint + ControlNet-inpaint pipelines end-to-end."""
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.models.controlnet import ControlNet
from consistentid_tpu.pipelines import (ConsistentIDControlNetInpaintPipeline,
                                        ConsistentIDInpaintPipeline)
from tests.test_pipeline_e2e import synthetic_face_inputs, tiny_bundle


def _mask_image():
    m = np.zeros((64, 64), np.uint8)
    m[16:48, 16:48] = 255
    return Image.fromarray(m)


@pytest.fixture(scope="module")
def inpaint_pipe():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    return ConsistentIDInpaintPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=4,
                                       start_merge_step=1))


def test_inpaint_full_strength(inpaint_pipe):
    face, labels = synthetic_face_inputs()
    init = face
    img = inpaint_pipe.generate(
        "a man with a face", face, init, _mask_image(), strength=1.0,
        parsing_labels=labels,
        faceid_embeds=np.zeros((1, 16), np.float32), seed=1)
    assert img.shape == (1, 32, 32, 3)


def test_inpaint_recomposition_pins_unmasked_latents(inpaint_pipe):
    """With a zero mask every step blends back the init latents, so the
    output must be prompt-independent (the denoiser's work is discarded);
    with a real mask the prompt must matter."""
    face, labels = synthetic_face_inputs()
    zero_mask = Image.fromarray(np.zeros((64, 64), np.uint8))
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=1,
              strength=0.5)
    a = inpaint_pipe.generate("a man with a face", face, face, zero_mask, **kw)
    b = inpaint_pipe.generate("a blue sky with clouds", face, face,
                              zero_mask, **kw)
    np.testing.assert_array_equal(a, b)
    c = inpaint_pipe.generate("a man with a face", face, face,
                              _mask_image(), **kw)
    d = inpaint_pipe.generate("a blue sky with clouds", face, face,
                              _mask_image(), **kw)
    assert not np.array_equal(c, d)


@pytest.mark.parametrize("scheduler",
                         ["ddim", "euler", "ddpm", "dpmpp_2m", "pndm"])
@pytest.mark.parametrize("strength", [1.0, 0.6])
def test_inpaint_every_scheduler_nondegenerate(inpaint_pipe, scheduler,
                                               strength):
    """Every registered scheduler x inpaint must produce non-degenerate
    output (VERDICT r1: dpmpp_2m plans collapsed to zero latents when
    plan_tail dropped the multistep tables)."""
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=1,
              strength=strength, scheduler=scheduler)
    a = inpaint_pipe.generate("a man with a face", face, face,
                              _mask_image(), **kw)
    assert a.shape == (1, 32, 32, 3)
    # degenerate (zero) latents decode to a near-constant frame
    assert a.std() > 4.0, (scheduler, strength, a.std())
    # prompt must influence the masked region
    b = inpaint_pipe.generate("a blue sky with clouds", face, face,
                              _mask_image(), **kw)
    assert not np.array_equal(a, b), (scheduler, strength)


@pytest.mark.parametrize("scheduler", ["ddim", "euler", "dpmpp_2m", "pndm"])
def test_t2i_every_scheduler_nondegenerate(scheduler):
    import jax as _jax

    from consistentid_tpu.pipelines import ConsistentIDPipeline

    bundle = tiny_bundle()
    params = bundle.init_params(_jax.random.PRNGKey(0))
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1,
                                       scheduler=scheduler))
    face, labels = synthetic_face_inputs()
    img = pipe.generate("a man with a face", face, parsing_labels=labels,
                        faceid_embeds=np.zeros((1, 16), np.float32), seed=1)
    assert img.shape == (1, 32, 32, 3)
    assert img.std() > 4.0, (scheduler, img.std())


def test_controlnet_inpaint_runs():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    # tiny VAE downsamples 2x, so the control pyramid has one stride-2 conv
    cn = ControlNet(bundle.unet_config, cond_embed_channels=(16, 32))
    face, labels = synthetic_face_inputs()
    cn_params = cn.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 4)), jnp.zeros((2,)),
        jnp.zeros((2, 81, 64)), jnp.zeros((2, 32, 32, 3)))["params"]
    params["controlnet"] = cn_params
    pipe = ConsistentIDControlNetInpaintPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1),
        controlnet=cn, controlnet_scale=0.8)
    img = pipe.generate(
        "a man with a face", face, face, _mask_image(), strength=1.0,
        parsing_labels=labels, faceid_embeds=np.zeros((1, 16), np.float32),
        seed=2, control_image=face)
    assert img.shape == (1, 32, 32, 3)

    # zero-init output convs -> identical to no-controlnet at init
    base = ConsistentIDInpaintPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1))
    img2 = base.generate(
        "a man with a face", face, face, _mask_image(), strength=1.0,
        parsing_labels=labels, faceid_embeds=np.zeros((1, 16), np.float32),
        seed=2)
    np.testing.assert_array_equal(img, img2)


def test_inpaint_async_matches_sync(inpaint_pipe):
    """generate_async on inpaint must yield the same uint8 images as
    generate(): ADVICE r2 — the inherited async wrapper used to have its
    return_device flag swallowed by **extra, so _postprocess ran twice and
    uint8 values were re-quantized as [-1,1] floats (near-all-white)."""
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=3,
              strength=0.7)
    sync = inpaint_pipe.generate("a man with a face", face, face,
                                 _mask_image(), **kw)
    finish = inpaint_pipe.generate_async("a man with a face", face, face,
                                         _mask_image(), **kw)
    np.testing.assert_array_equal(sync, finish())


def test_inpaint_rejects_unknown_kwargs(inpaint_pipe):
    face, labels = synthetic_face_inputs()
    with pytest.raises(TypeError, match="unknown generate"):
        inpaint_pipe.generate(
            "a man", face, face, _mask_image(),
            parsing_labels=labels,
            faceid_embeds=np.zeros((1, 16), np.float32),
            not_a_real_kwarg=1)


def test_inpaint_batch_not_supported(inpaint_pipe):
    with pytest.raises(NotImplementedError):
        inpaint_pipe.generate_batch(["a"], [None])
