"""End-to-end SD1.5 ConsistentID pipeline on tiny random-weight configs:
prompt + face image + parsing labels -> image (SURVEY.md §4 plan item 3)."""
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.pipelines import ConsistentIDPipeline
from consistentid_tpu.testing import tiny_bundle


def synthetic_face_inputs():
    rng = np.random.RandomState(0)
    face = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    labels = np.zeros((64, 64), np.uint8)
    labels[10:40, 10:50] = 1    # Face
    labels[15:20, 15:25] = 4    # Left_Eye
    labels[15:20, 35:45] = 5    # Right_Eye
    labels[25:30, 28:34] = 10   # Nose
    labels[33:37, 24:38] = 12   # Upper_Lip
    return face, labels


@pytest.fixture(scope="module")
def pipeline():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    tok = SimpleTokenizer()
    return ConsistentIDPipeline(
        bundle, params, tok,
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1))


def test_prepare_conditioning_shapes(pipeline):
    face, labels = synthetic_face_inputs()
    cond = pipeline.prepare_conditioning(
        "a photo of a man with a strong face, blue eyes and sharp nose",
        face, parsing_labels=labels)
    assert cond["clean_ids"].shape == (1, 77)
    assert cond["text_only_ids"].shape == (1, 77)
    assert cond["facial_idx"].shape == (1, 5)
    # face caption mentions all five keywords; parsing has face/eyes/nose/mouth
    assert cond["facial_idx_mask"].sum() >= 3
    assert cond["region_pixels"].shape == (1, 5, 28, 28, 3)
    assert cond["faceid_embeds"].shape == (1, 512) or \
        cond["faceid_embeds"].shape == (1, 16)


def test_generate_end_to_end(pipeline):
    face, labels = synthetic_face_inputs()
    faceid = np.random.RandomState(1).randn(1, 16).astype(np.float32)
    img = pipeline.generate(
        "portrait photo of a man with a strong face and blue eyes",
        face, parsing_labels=labels, faceid_embeds=faceid, seed=3)
    assert img.shape == (1, 32, 32, 3)
    assert img.dtype == np.uint8
    # different merge steps produce different images (conditioning switch)
    img2 = pipeline.generate(
        "portrait photo of a man with a strong face and blue eyes",
        face, parsing_labels=labels, faceid_embeds=faceid, seed=3,
        start_merge_step=2)
    assert not np.array_equal(img, img2)


def test_generate_deterministic(pipeline):
    face, labels = synthetic_face_inputs()
    faceid = np.zeros((1, 16), np.float32)
    kw = dict(parsing_labels=labels, faceid_embeds=faceid, seed=7)
    a = pipeline.generate("a man with a face", face, **kw)
    b = pipeline.generate("a man with a face", face, **kw)
    np.testing.assert_array_equal(a, b)


def test_scales_are_traced_no_recompile(pipeline):
    """Changing ip_scale / lora_scale / guidance / merge-step must reuse the
    compiled graph (reference set_scale :211-215 is a free runtime knob)."""
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=7)
    pipeline.generate("a man with a face", face, **kw)
    before = pipeline._core_jit._cache_size()
    a = pipeline.generate("a man with a face", face, ip_scale=0.3,
                          lora_scale=0.5, guidance_scale=2.0,
                          start_merge_step=0, **kw)
    b = pipeline.generate("a man with a face", face, ip_scale=0.9,
                          lora_scale=1.0, guidance_scale=7.0,
                          start_merge_step=2, **kw)
    assert pipeline._core_jit._cache_size() == before, "scales recompiled"
    assert not np.array_equal(a, b)


def test_generate_num_images_per_prompt(pipeline):
    face, labels = synthetic_face_inputs()
    faceid = np.zeros((1, 16), np.float32)
    imgs = pipeline.generate("a man with a face", face,
                             parsing_labels=labels, faceid_embeds=faceid,
                             seed=5, num_images_per_prompt=3)
    assert imgs.shape == (3, 32, 32, 3)
    # different latents per image
    assert not np.array_equal(imgs[0], imgs[1])


def test_generate_sharded_over_mesh():
    """Batched generation data-sharded over the 8-device CPU mesh."""
    from consistentid_tpu.parallel import make_mesh

    mesh = make_mesh()
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=2,
                                       start_merge_step=1),
        mesh=mesh)
    face, labels = synthetic_face_inputs()
    imgs = pipe.generate("a man with a face", face, parsing_labels=labels,
                         faceid_embeds=np.zeros((1, 16), np.float32),
                         seed=1, num_images_per_prompt=8)
    assert imgs.shape == (8, 32, 32, 3)
    assert not np.array_equal(imgs[0], imgs[1])


def test_generate_batch_distinct_requests(pipeline):
    """Distinct prompts/faces batched through one compiled graph must match
    the same requests run individually."""
    face, labels = synthetic_face_inputs()
    rng = np.random.RandomState(3)
    face2 = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    fid1 = np.zeros((1, 16), np.float32)
    fid2 = rng.randn(1, 16).astype(np.float32)

    batch = pipeline.generate_batch(
        ["a man with a face", "a woman with blue eyes"],
        [face, face2],
        parsing_labels_list=[labels, labels],
        faceid_embeds_list=[fid1, fid2], seed=11)
    assert batch.shape == (2, 32, 32, 3)
    assert not np.array_equal(batch[0], batch[1])


def test_bf16_pipeline_consistency():
    """bf16 bundle must stay close to the fp32 pipeline on the same weights
    (the dtype policy's numerical sanity check)."""
    import jax.numpy as jnp
    from flax import traverse_util

    from consistentid_tpu.core.dtypes import cast_floating

    b32 = tiny_bundle()
    params32 = b32.init_params(jax.random.PRNGKey(0))
    b16 = tiny_bundle()
    b16.dtype = jnp.bfloat16
    b16.__post_init__()  # rebuild modules with bf16 compute dtype
    params16 = cast_floating(params32, jnp.bfloat16)

    cfgkw = dict(pipeline_config=PipelineConfig(height=32, width=32,
                                                num_inference_steps=2,
                                                start_merge_step=1))
    p32 = ConsistentIDPipeline(b32, params32, SimpleTokenizer(), **cfgkw)
    p16 = ConsistentIDPipeline(b16, params16, SimpleTokenizer(), **cfgkw)
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=2)
    a = p32.generate("a man with a face", face, **kw).astype(np.int32)
    b = p16.generate("a man with a face", face, **kw).astype(np.int32)
    # uint8 images from random weights: require close agreement
    assert np.mean(np.abs(a - b)) < 16, np.mean(np.abs(a - b))


def test_last_cost_analysis_and_mfu(pipeline):
    """XLA cost analysis of the last core executable powers bench MFU."""
    from consistentid_tpu.utils.profiling import device_peak_tflops, mfu

    fresh = pipeline.last_cost_analysis  # bound after at least one generate
    face, labels = synthetic_face_inputs()
    pipeline.generate("a man with a face", face, parsing_labels=labels,
                      faceid_embeds=np.zeros((1, 16), np.float32), seed=0)
    ca = fresh()
    assert ca is not None and float(ca.get("flops", 0)) > 0
    # per-step flops: one CFG UNet pair call, nonzero and below the whole
    # core graph (which additionally carries encode+decode)
    step = pipeline.step_flops()
    assert step and 0 < step < float(ca["flops"])
    # CPU test platform: no peak table entry -> mfu None, never a crash
    assert device_peak_tflops() is None
    assert mfu(float(ca["flops"]), 0.5) is None
    # the TPU table itself
    class _FakeDev:
        platform = "tpu"
        device_kind = "TPU v5 lite"
    assert device_peak_tflops(_FakeDev()) == 197.0
    got = mfu(197e12 * 0.5, 1.0, _FakeDev())
    assert abs(got - 0.5) < 1e-9


def test_generate_async_matches_sync(pipeline):
    """Double-buffered serving path: generate_async must produce exactly the
    sync generate() output, and pipelined submits must stay independent."""
    face, labels = synthetic_face_inputs()
    faceid = np.zeros((1, 16), np.float32)
    kw = dict(parsing_labels=labels, faceid_embeds=faceid)
    sync7 = pipeline.generate("a man with a face", face, seed=7, **kw)
    sync9 = pipeline.generate("a man with a face", face, seed=9, **kw)
    # submit both before collecting either (the serving overlap pattern)
    f7 = pipeline.generate_async("a man with a face", face, seed=7, **kw)
    f9 = pipeline.generate_async("a man with a face", face, seed=9, **kw)
    np.testing.assert_array_equal(f7(), sync7)
    np.testing.assert_array_equal(f9(), sync9)
