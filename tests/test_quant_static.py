"""Static-activation (calibrated) int8 serving path.

Dynamic W8A8's per-call activation-amax prologue is bandwidth-bound and
made int8 a 35% net loss at SDXL 1024px (ROUND_NOTES r4); the static path
replaces it with per-tensor act_scale params produced by Q-Diffusion-style
max calibration through the exact serving graph (Int8 layers sow their
observed amax into the "calib" collection). Tests pin: the layer-level
static/dynamic agreement, the calibration capture + scale derivation, the
param-tree rewrite with act_scales, and the pipeline-level
calibrate_int8 -> int8_static generate chain.
"""
import dataclasses

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.models.layers import Int8Dense
from consistentid_tpu.ops.quant import (act_scales_from_calib,
                                        merge_act_scales,
                                        quantize_params_like,
                                        quantize_symmetric)
from consistentid_tpu.pipelines import ConsistentIDPipeline
from consistentid_tpu.testing import tiny_bundle


def test_static_dense_matches_dynamic_at_single_row():
    """For a single token the dynamic per-token scale IS the per-tensor
    scale, so static quant with act_scale = amax/127 must reproduce the
    dynamic output bit-for-bit."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, 48) * 0.05).astype(np.float32))
    wq, ws = quantize_symmetric(w, axis=(0,))
    base = {"kernel_q": wq, "kernel_scale": ws}

    dyn = Int8Dense(48, use_bias=False)
    y_dyn, calib = dyn.apply({"params": base}, x, mutable=["calib"])
    amax = float(np.abs(np.asarray(x)).max())
    np.testing.assert_allclose(
        float(calib["calib"]["act_amax"][0]), amax, rtol=1e-6)

    stat = Int8Dense(48, use_bias=False, static_act=True)
    y_stat = stat.apply(
        {"params": {**base, "act_scale": jnp.float32(amax / 127.0)}}, x)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_stat))


def test_act_scales_from_calib_and_merge():
    calib = {"layer": {"act_amax": (jnp.float32(2.0), jnp.float32(6.35))}}
    scales = act_scales_from_calib(calib)
    np.testing.assert_allclose(
        float(scales["layer"]["act_scale"]), 6.35 / 127.0, rtol=1e-6)
    other = {"layer": {"act_scale": jnp.float32(0.1)}}
    merged = merge_act_scales([scales, other])
    np.testing.assert_allclose(float(merged["layer"]["act_scale"]), 0.1)


@pytest.fixture(scope="module")
def base_bundle():
    return tiny_bundle()


@pytest.fixture(scope="module")
def params(base_bundle):
    return base_bundle.init_params(jax.random.PRNGKey(0))


def test_static_target_needs_act_scales(base_bundle, params):
    """quantize_params_like on a static target without calibration is an
    error, and building an int8_static bundle without act_scales is too."""
    sb = dataclasses.replace(base_bundle, quant="int8",
                             act_scales=None)
    # static UNet struct has act_scale leaves
    static_unet = type(sb.unet_infer)(
        dataclasses.replace(sb.unet_config, lora_rank=0),
        dtype=sb.dtype, quant="static")
    dummy_latent, dummy_ctx, added = sb._unet_init_args(8)
    struct = jax.eval_shape(
        lambda: static_unet.init(jax.random.PRNGKey(0), dummy_latent,
                                 jnp.array([0]), dummy_ctx,
                                 added_cond=added))["params"]
    folded = sb.infer_unet(params["unet"], 1.0)[1]
    # folded here is already the dynamic-quant tree; rebuild from floats
    float_folded = base_bundle.infer_unet(params["unet"], 1.0)[1]
    with pytest.raises(ValueError, match="act_scales"):
        quantize_params_like(struct, float_folded)
    with pytest.raises(ValueError, match="act_scales"):
        dataclasses.replace(base_bundle, quant="int8_static")


def synthetic_face_inputs():
    rng = np.random.RandomState(0)
    face = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    labels = np.zeros((64, 64), np.uint8)
    labels[10:40, 10:50] = 1
    labels[15:20, 15:25] = 4
    labels[15:20, 35:45] = 5
    labels[25:30, 28:34] = 10
    labels[33:37, 24:38] = 12
    return face, labels


@pytest.fixture(scope="module")
def pipelines(base_bundle, params):
    exact = ConsistentIDPipeline(
        base_bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1))
    face, labels = synthetic_face_inputs()
    static = exact.calibrate_int8(
        "portrait photo of a man with a strong face", face,
        num_calib_steps=3, parsing_labels=labels,
        faceid_embeds=np.zeros((1, 16), np.float32))
    return exact, static, face, labels


def test_calibrate_int8_produces_scales(pipelines):
    _, static, _, _ = pipelines
    assert static.bundle.quant == "int8_static"
    scales = static.bundle.act_scales
    leaves = jax.tree_util.tree_leaves(scales)
    assert len(leaves) > 50            # every Int8 layer calibrated
    assert all(float(v) > 0 for v in leaves)


def test_int8_static_generate_end_to_end(pipelines):
    exact, static, face, labels = pipelines
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.random.RandomState(1).randn(
                  1, 16).astype(np.float32), seed=3)
    prompt = "portrait photo of a man with a strong face and blue eyes"
    img_s = static.generate(prompt, face, **kw)
    assert img_s.shape == (1, 32, 32, 3) and img_s.dtype == np.uint8
    assert img_s.std() > 1.0
    # static-calibrated output tracks both exact bf16 and dynamic int8 --
    # calibration ran on this very image/prompt, so the scales cover the
    # serving activations and the quant error stays in the dynamic-int8
    # ballpark (same bound family as tests/test_deepcache.py)
    img_e = exact.generate(prompt, face, **kw)
    img_d = exact.with_quant("int8").generate(prompt, face, **kw)
    diff_sd = np.abs(img_s.astype(np.float32) - img_d.astype(np.float32))
    diff_se = np.abs(img_s.astype(np.float32) - img_e.astype(np.float32))
    assert 0.0 < diff_se.mean() < 40.0, diff_se.mean()
    assert diff_sd.mean() < 40.0, diff_sd.mean()


def test_with_quant_static_requires_calibration(pipelines):
    exact, static, _, _ = pipelines
    with pytest.raises(ValueError, match="act_scales"):
        exact.with_quant("int8_static")
    # but a calibrated pipeline can round-trip through other modes
    back = static.with_quant("none").with_quant("int8_static")
    assert back.bundle.act_scales is not None
