"""DeepCache-style deep-feature reuse (models/unet.py deep_feature /
sampling/sampler.py cache_interval).

Training-free acceleration from the PAPERS.md family (DeepCache, Ma et al.
2023; "Faster Diffusion" encoder propagation): the UNet's deep blocks (down
levels 1.., mid, up blocks 0..n-2) are refreshed every N-th denoise step and
reused in between, while the shallow level-0 blocks always run with fresh
latents/timestep/context. The reference repo has no acceleration path at
all (plain 50-step diffusers loops).
"""
import dataclasses

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.pipelines import ConsistentIDPipeline
from consistentid_tpu.testing import tiny_bundle


@pytest.fixture(scope="module")
def bundle():
    return tiny_bundle()


@pytest.fixture(scope="module")
def params(bundle):
    return bundle.init_params(jax.random.PRNGKey(0))


def _unet_inputs(bundle, batch=2, hw=8, seed=1):
    rng = jax.random.PRNGKey(seed)
    lat = jax.random.normal(rng, (batch, hw, hw,
                                  bundle.unet_config.sample_channels))
    n_ctx = (bundle.text_config.max_position_embeddings
             + bundle.adapter_config.num_id_tokens)
    ctx = jax.random.normal(
        jax.random.fold_in(rng, 1),
        (batch, n_ctx, bundle.unet_config.cross_attention_dim))
    t = jnp.full((batch,), 500)
    return lat, t, ctx


def test_shallow_path_consistent_with_full(bundle, params):
    """The split invariant: feeding the full forward's own deep feature to
    the shallow path must reproduce the full forward's output exactly —
    the shallow path runs the identical level-0 blocks."""
    unet, p = bundle.infer_unet(params["unet"], 1.0)
    lat, t, ctx = _unet_inputs(bundle)
    out_full, deep = unet.apply({"params": p}, lat, t, ctx, return_deep=True)
    out_shallow = unet.apply({"params": p}, lat, t, ctx, deep_feature=deep)
    np.testing.assert_allclose(np.asarray(out_shallow),
                               np.asarray(out_full), atol=1e-5)


def test_full_forward_unchanged_by_return_deep(bundle, params):
    """return_deep must not perturb the default output (refactor guard)."""
    unet, p = bundle.infer_unet(params["unet"], 1.0)
    lat, t, ctx = _unet_inputs(bundle, seed=2)
    base = unet.apply({"params": p}, lat, t, ctx)
    out, _ = unet.apply({"params": p}, lat, t, ctx, return_deep=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_deep_feature_controlnet_guard(bundle, params):
    unet, p = bundle.infer_unet(params["unet"], 1.0)
    lat, t, ctx = _unet_inputs(bundle)
    deep = jnp.zeros((2, 8, 8, bundle.unet_config.block_out_channels[1]))
    with pytest.raises(AssertionError):
        unet.apply({"params": p}, lat, t, ctx, deep_feature=deep,
                   mid_residual=jnp.zeros_like(lat))


def synthetic_face_inputs():
    rng = np.random.RandomState(0)
    face = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    labels = np.zeros((64, 64), np.uint8)
    labels[10:40, 10:50] = 1
    labels[25:30, 28:34] = 10
    return face, labels


@pytest.fixture(scope="module")
def pipeline(bundle, params):
    return ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=6,
                                       start_merge_step=3))


def test_generate_cached_close_to_full(pipeline):
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=3)
    full = pipeline.generate("a man with a face", face, **kw)
    cached = pipeline.generate("a man with a face", face,
                               cache_interval=2, **kw)
    assert cached.shape == full.shape and cached.dtype == np.uint8
    assert cached.std() > 1.0
    # same scene, small drift (measured ~4/255 at this config)
    diff = np.abs(full.astype(np.int32) - cached.astype(np.int32)).mean()
    assert 0 < diff < 25, diff


@pytest.mark.parametrize("scheduler", ["euler", "dpmpp_2m"])
def test_generate_cached_other_schedulers(pipeline, scheduler):
    face, labels = synthetic_face_inputs()
    img = pipeline.generate(
        "a man with a face", face, parsing_labels=labels,
        faceid_embeds=np.zeros((1, 16), np.float32), seed=5,
        scheduler=scheduler, cache_interval=3)
    assert img.dtype == np.uint8 and np.isfinite(img.astype(np.float32)).all()
    assert img.std() > 1.0


def test_cached_scales_still_traced(pipeline):
    """ip/lora/guidance stay traced under caching: no recompile."""
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=7,
              cache_interval=2)
    pipeline.generate("a man with a face", face, **kw)
    before = pipeline._core_jit._cache_size()
    pipeline.generate("a man with a face", face, ip_scale=0.3,
                      lora_scale=0.5, guidance_scale=2.0, **kw)
    assert pipeline._core_jit._cache_size() == before


def test_cache_composes_with_int8(bundle, params):
    qb = dataclasses.replace(bundle, quant="int8")
    pipe = ConsistentIDPipeline(
        qb, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=4,
                                       start_merge_step=2,
                                       cache_interval=2))
    face, labels = synthetic_face_inputs()
    img = pipe.generate("a man with a face", face, parsing_labels=labels,
                        faceid_embeds=np.zeros((1, 16), np.float32), seed=3)
    assert img.dtype == np.uint8 and img.std() > 1.0


def test_generate_batch_cached(pipeline):
    face, labels = synthetic_face_inputs()
    out = pipeline.generate_batch(
        ["a man with a face", "a woman with a face"], [face, face],
        parsing_labels_list=[labels, labels],
        faceid_embeds_list=[np.zeros((1, 16), np.float32)] * 2,
        seeds=[1, 2], cache_interval=2)
    assert out.shape[0] == 2 and out.dtype == np.uint8
