"""CLIP safety checker: threshold logic, converter structure, and pipeline
integration (reference pipline_StableDiffusion_ConsistentID.py:586-594)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.core import CLIPVisionConfig
from consistentid_tpu.io.convert_backbones import safety_checker_from_hf
from consistentid_tpu.models.safety_checker import (SafetyChecker,
                                                    make_safety_checker)

TINY_V = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                          intermediate_size=64, num_layers=2, num_heads=2)


def _tiny_checker():
    return SafetyChecker(vision_config=TINY_V, projection_dim=16,
                         num_concepts=3, num_special=2)


def test_threshold_logic_flags_aligned_concepts():
    """Craft params so one input's image embedding aligns with a concept
    above threshold -> flagged; an orthogonal one passes. Also checks the
    special-care adjustment lowers concept thresholds by 0.01."""
    checker = _tiny_checker()
    rng = jax.random.PRNGKey(0)
    params = checker.init(rng, jnp.zeros((1, 28, 28, 3)))["params"]

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 28, 28, 3))
    # the image embeddings the checker will compare against the banks
    from consistentid_tpu.models.clip import CLIPVisionEncoder

    post, _ = CLIPVisionEncoder(TINY_V).apply(
        {"params": params["vision_model"]}, x)
    emb = np.asarray(post[:, 0] @ params["visual_projection"]["kernel"])
    unit = emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    p = jax.tree_util.tree_map(np.array, params)
    # concept 0 aligned with input 0's embedding, threshold just below 1;
    # remaining concepts point away from input 1's embedding
    p["concept_embeds"][0] = unit[0]
    p["concept_embeds"][1:] = np.roll(unit[1], 1)[None]
    p["concept_embeds_weights"][:] = 0.99
    p["special_care_embeds"][:] = np.roll(unit[0], 3)[None]
    p["special_care_embeds_weights"][:] = 2.0  # never fires

    flags = np.asarray(checker.apply({"params": p}, x))
    assert flags[0] and not flags[1]

    # special-care hit lowers the concept threshold: put input 1's special
    # score above threshold and its best concept score within 0.01 below
    cos1 = float(np.roll(unit[1], 1) @ unit[1])
    p2 = jax.tree_util.tree_map(np.copy, p)
    p2["special_care_embeds"][0] = unit[1]
    p2["special_care_embeds_weights"][0] = 0.5
    p2["concept_embeds_weights"][1:] = cos1 + 0.005  # only passes w/ adjust
    flags2 = np.asarray(checker.apply({"params": p2}, x))
    assert flags2[1], "special-care adjustment did not fire"


def test_converter_structure_roundtrip():
    """Synthetic HF-layout safety_checker dict -> params accepted by the
    flax module with identical outputs to hand-assembled params."""
    checker = _tiny_checker()
    params = checker.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 28, 28, 3)))["params"]

    # export to HF layout
    from consistentid_tpu.io import convert

    sd = {}
    vp = params["vision_model"]
    pre = "vision_model.vision_model."
    sd[pre + "embeddings.patch_embedding.weight"] = np.asarray(
        vp["patch_embedding"]["kernel"]).transpose(3, 2, 0, 1)
    sd[pre + "embeddings.class_embedding"] = np.asarray(
        vp["class_embedding"])
    sd[pre + "embeddings.position_embedding.weight"] = np.asarray(
        vp["position_embedding"])
    for ln in ("pre_layrnorm", "post_layernorm"):
        sd[pre + ln + ".weight"] = np.asarray(vp[ln]["scale"])
        sd[pre + ln + ".bias"] = np.asarray(vp[ln]["bias"])
    for i in range(TINY_V.num_layers):
        lp = vp[f"layers_{i}"]
        hf = pre + f"encoder.layers.{i}"
        for name in ("layer_norm1", "layer_norm2"):
            sd[f"{hf}.{name}.weight"] = np.asarray(lp[name]["scale"])
            sd[f"{hf}.{name}.bias"] = np.asarray(lp[name]["bias"])
        for ours, theirs in (
                ("self_attn/q_proj", "self_attn.q_proj"),
                ("self_attn/k_proj", "self_attn.k_proj"),
                ("self_attn/v_proj", "self_attn.v_proj"),
                ("self_attn/out_proj", "self_attn.out_proj"),
                ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            node = lp
            for part in ours.split("/"):
                node = node[part]
            sd[f"{hf}.{theirs}.weight"] = np.ascontiguousarray(
                np.asarray(node["kernel"]).T)
            sd[f"{hf}.{theirs}.bias"] = np.asarray(node["bias"])
    sd["visual_projection.weight"] = np.ascontiguousarray(
        np.asarray(params["visual_projection"]["kernel"]).T)
    for k in ("concept_embeds", "special_care_embeds",
              "concept_embeds_weights", "special_care_embeds_weights"):
        sd[k] = np.asarray(params[k])

    got = safety_checker_from_hf(sd, TINY_V)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 3))
    want = checker.apply({"params": params}, x)
    out = checker.apply({"params": got}, x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(out))


def test_make_safety_checker_blacks_flagged():
    checker = _tiny_checker()
    params = checker.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 28, 28, 3)))["params"]
    params = jax.tree_util.tree_map(np.array, params)
    # thresholds at -1: everything is flagged
    params["concept_embeds_weights"][:] = -1.0
    check = make_safety_checker(params, vision_config=TINY_V,
                                projection_dim=16)
    imgs = np.full((2, 40, 40, 3), 200, np.uint8)
    out, flags = check(imgs)
    assert flags.all()
    assert (out == 0).all()
    # thresholds at +2: nothing flagged, images untouched
    params["concept_embeds_weights"][:] = 2.0
    check = make_safety_checker(params, vision_config=TINY_V,
                                projection_dim=16)
    out, flags = check(imgs)
    assert not flags.any()
    np.testing.assert_array_equal(out, imgs)


def test_pipeline_integration():
    from PIL import Image

    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines import ConsistentIDPipeline
    from consistentid_tpu.testing import tiny_bundle
    from tests.test_pipeline_e2e import synthetic_face_inputs

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))

    def flag_all(images):
        return np.zeros_like(images), np.ones(len(images), bool)

    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=2,
                                       start_merge_step=1),
        safety_checker=flag_all)
    face, labels = synthetic_face_inputs()
    img = pipe.generate("a man with a face", face, parsing_labels=labels,
                        faceid_embeds=np.zeros((1, 16), np.float32), seed=1)
    assert (img == 0).all()
    assert pipe.last_nsfw_flags.all()
