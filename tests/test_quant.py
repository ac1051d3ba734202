"""Int8 W8A8 serving path (ops/quant.py + quant=True model twins).

The reference has no quantized path (torch fp16 throughout,
pipline_StableDiffusion_ConsistentID.py:36-57); this is the TPU-native
int8-MXU serving mode. Tests pin: the quant primitives' math, the
param-tree rewrite, UNet forward agreement with the float model, and the
e2e pipeline (fold->quantize->denoise chain, traced scales, SDXL twin).
"""
import dataclasses

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.models.layers import Int8Conv, Int8Dense
from consistentid_tpu.ops.quant import (int8_conv, int8_matmul,
                                        quantize_params_like,
                                        quantize_symmetric)
from consistentid_tpu.pipelines import ConsistentIDPipeline
from consistentid_tpu.testing import tiny_bundle


# -- primitives --

def test_quantize_symmetric_exact_values():
    x = jnp.array([[0.0, 1.0, -2.0, 4.0]])
    q, scale = quantize_symmetric(x, axis=(1,))
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(scale), [4.0 / 127.0], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(q), [[0, round(127 / 4), round(-2 * 127 / 4), 127]])


def test_quantize_symmetric_clips_and_handles_zero():
    q, scale = quantize_symmetric(jnp.zeros((3, 4)), axis=(1,))
    assert np.all(np.asarray(q) == 0) and np.all(np.asarray(scale) > 0)
    # extreme outlier still clips into int8 range
    q, _ = quantize_symmetric(jnp.array([[1e9, -1e9, 1.0]]), axis=(1,))
    assert np.asarray(q).max() == 127 and np.asarray(q).min() == -127


def test_int8_matmul_close_to_float():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 33, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, 48) * 0.05).astype(np.float32))
    wq, ws = quantize_symmetric(w, axis=(0,))
    y = np.asarray(int8_matmul(x, wq, ws))
    ref = np.asarray(x) @ np.asarray(w)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_conv_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 32, 24) * 0.05).astype(np.float32))
    wq, ws = quantize_symmetric(w, axis=(0, 1, 2))
    y = np.asarray(int8_conv(x, wq, ws, (1, 1), [(1, 1), (1, 1)]))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn))
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_modules_match_primitives():
    """Int8Conv/Int8Dense apply the primitives + bias at the right dtype."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    wq, ws = quantize_symmetric(w, axis=(0, 1, 2))
    mod = Int8Conv(8, (3, 3), padding=1, dtype=jnp.float32)
    y = mod.apply({"params": {"kernel_q": wq, "kernel_scale": ws,
                              "bias": b}}, x)
    ref = int8_conv(x, wq, ws, (1, 1), [(1, 1), (1, 1)]) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)

    xd = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    wd = jnp.asarray((rng.randn(16, 8) * 0.1).astype(np.float32))
    wdq, wds = quantize_symmetric(wd, axis=(0,))
    yd = Int8Dense(8, use_bias=False, dtype=jnp.float32).apply(
        {"params": {"kernel_q": wdq, "kernel_scale": wds}}, xd)
    np.testing.assert_allclose(np.asarray(yd),
                               np.asarray(int8_matmul(xd, wdq, wds)),
                               rtol=1e-6)


# -- param-tree rewrite --

@pytest.fixture(scope="module")
def bundles():
    base = tiny_bundle()
    return base, dataclasses.replace(base, quant="int8")


@pytest.fixture(scope="module")
def params(bundles):
    return bundles[0].init_params(jax.random.PRNGKey(0))


def test_quantize_params_like_structure(bundles, params):
    base, qb = bundles
    folded = base.infer_unet(params["unet"], 1.0)[1]
    target = qb._quant_param_struct()
    qtree = quantize_params_like(target, folded)

    t_leaves = jax.tree_util.tree_leaves_with_path(target)
    q_flat = dict(jax.tree_util.tree_leaves_with_path(qtree))
    assert len(t_leaves) == len(q_flat)
    n_q = 0
    for path, struct in t_leaves:
        leaf = q_flat[path]
        assert leaf.shape == struct.shape, path
        key = path[-1].key
        if key == "kernel_q":
            assert leaf.dtype == jnp.int8
            n_q += 1
        elif key == "kernel_scale":
            assert np.all(np.asarray(leaf) > 0)
    # every resnet conv (3 blocks at 4 levels down + 5 up + 2 mid ...) and
    # attention/FF projection got quantized — well over 50 in the tiny UNet
    assert n_q > 50
    # conv_in / conv_out / time embeddings stay float
    assert "kernel" in qtree["conv_in"] and "kernel" in qtree["conv_out"]
    assert "kernel" in qtree["time_embedding"]["linear_1"]


def test_quant_unet_forward_close_to_float(bundles, params):
    base, qb = bundles
    rng = jax.random.PRNGKey(1)
    lat = jax.random.normal(rng, (2, 8, 8, base.unet_config.sample_channels))
    n_ctx = (base.text_config.max_position_embeddings
             + base.adapter_config.num_id_tokens)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (2, n_ctx, base.unet_config.cross_attention_dim))
    t = jnp.array([500, 500])

    unet_f, p_f = base.infer_unet(params["unet"], 1.0)
    unet_q, p_q = qb.infer_unet(params["unet"], 1.0)
    yf = np.asarray(unet_f.apply({"params": p_f}, lat, t, ctx),
                    np.float64).ravel()
    yq = np.asarray(unet_q.apply({"params": p_q}, lat, t, ctx),
                    np.float64).ravel()
    cos = yf @ yq / (np.linalg.norm(yf) * np.linalg.norm(yq))
    # random weights are the quantization worst case; real (trained) weights
    # are smoother. Measured 0.9989 at this config.
    assert cos > 0.99, cos


# -- e2e pipeline --

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
def quant_pipeline(bundles, params):
    return ConsistentIDPipeline(
        bundles[1], params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=3,
                                       start_merge_step=1))


def test_generate_quant_end_to_end(quant_pipeline):
    face, labels = synthetic_face_inputs()
    faceid = np.random.RandomState(1).randn(1, 16).astype(np.float32)
    img = quant_pipeline.generate(
        "portrait photo of a man with a strong face and blue eyes",
        face, parsing_labels=labels, faceid_embeds=faceid, seed=3)
    assert img.shape == (1, 32, 32, 3) and img.dtype == np.uint8
    # not degenerate (all-equal) output
    assert img.std() > 1.0


def test_quant_scales_still_traced(quant_pipeline):
    """fold->quantize runs inside the jitted graph: changing lora_scale /
    ip_scale must not recompile."""
    face, labels = synthetic_face_inputs()
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32), seed=7)
    quant_pipeline.generate("a man with a face", face, **kw)
    before = quant_pipeline._core_jit._cache_size()
    quant_pipeline.generate("a man with a face", face, ip_scale=0.3,
                            lora_scale=0.5, **kw)
    assert quant_pipeline._core_jit._cache_size() == before


def test_quant_sdxl_unet_forward():
    from consistentid_tpu.testing import tiny_sdxl_bundle
    base = tiny_sdxl_bundle()
    qb = dataclasses.replace(base, quant="int8")
    params = base.init_params(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(2)
    lat = jax.random.normal(rng, (1, 8, 8, base.unet_config.sample_channels))
    n_ctx = (base.text_config.max_position_embeddings
             + base.adapter_config.num_id_tokens)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, n_ctx, base.unet_config.cross_attention_dim))
    pooled_dim = (base.unet_config.projection_class_embeddings_input_dim
                  - 6 * base.unet_config.addition_time_embed_dim)
    added = {"text_embeds": jnp.ones((1, pooled_dim)) * 0.1,
             "time_ids": jnp.zeros((1, 6))}
    t = jnp.array([500])
    unet_f, p_f = base.infer_unet(params["unet"], 1.0)
    unet_q, p_q = qb.infer_unet(params["unet"], 1.0)
    yf = np.asarray(unet_f.apply({"params": p_f}, lat, t, ctx,
                                 added_cond=added), np.float64).ravel()
    yq = np.asarray(unet_q.apply({"params": p_q}, lat, t, ctx,
                                 added_cond=added), np.float64).ravel()
    cos = yf @ yq / (np.linalg.norm(yf) * np.linalg.norm(yq))
    assert cos > 0.99, cos
