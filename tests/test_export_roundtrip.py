"""Import/export converters must compose to identity on real-shape trees.

Each case starts from a flax init tree (real shapes, random values), exports
to the reference ecosystem layout (diffusers / transformers / torch naming),
re-imports, and asserts exact leaf equality. A transposed kernel, swapped
axis, or misplaced key in either direction fails loudly — the in-repo
counterpart of loading a real checkpoint (which this zero-egress env can't).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from consistentid_tpu.io import convert, export_backbones as exp
from consistentid_tpu.io.convert_backbones import (clip_text_from_hf,
                                                   clip_vision_from_hf,
                                                   safety_checker_from_hf,
                                                   unet_from_diffusers,
                                                   vae_from_diffusers)
from consistentid_tpu.testing import tiny_bundle
from tests.test_pipeline_sdxl import tiny_sdxl_bundle

ADAPTER_MARKERS = ("_lora", "to_k_ip", "to_v_ip")


def _strip_adapter(tree):
    flat = traverse_util.flatten_dict(tree)
    kept = {k: v for k, v in flat.items()
            if not any(m in part for part in k for m in ADAPTER_MARKERS)}
    return traverse_util.unflatten_dict(kept)


def _assert_trees_equal(want, got):
    fw = traverse_util.flatten_dict(want)
    fg = traverse_util.flatten_dict(got)
    assert set(fw) == set(fg), (
        sorted(set(fw) - set(fg))[:5], sorted(set(fg) - set(fw))[:5])
    for k, v in fw.items():
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(fg[k], np.float32),
            err_msg="/".join(map(str, k)))


@pytest.mark.parametrize("bundle_fn", [tiny_bundle, tiny_sdxl_bundle])
def test_unet_roundtrip(bundle_fn):
    bundle = bundle_fn()
    params = bundle.init_params(jax.random.PRNGKey(0))
    base = _strip_adapter(params["unet"])
    sd = exp.unet_to_diffusers(params["unet"], bundle.unet_config)
    back = unet_from_diffusers(sd, bundle.unet_config)
    _assert_trees_equal(base, back)


def test_vae_roundtrip():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    sd = exp.vae_to_diffusers(params["vae"], bundle.vae_config)
    back = vae_from_diffusers(sd, bundle.vae_config)
    _assert_trees_equal(params["vae"], back)


def test_clip_text_roundtrip():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    sd = exp.clip_text_to_hf(params["text_encoder"], bundle.text_config)
    back = clip_text_from_hf(sd, bundle.text_config)
    _assert_trees_equal(params["text_encoder"], back)


def test_clip_vision_roundtrip():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    sd = exp.clip_vision_to_hf(params["image_encoder"], bundle.vision_config)
    back = clip_vision_from_hf(sd, bundle.vision_config)
    _assert_trees_equal(params["image_encoder"], back)


def test_safety_checker_roundtrip():
    from consistentid_tpu.core import CLIPVisionConfig
    from consistentid_tpu.models.safety_checker import SafetyChecker

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=2)
    model = SafetyChecker(vision_config=cfg, projection_dim=16,
                          num_concepts=3, num_special=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 28, 28, 3)))["params"]
    sd = exp.safety_checker_to_hf(params, cfg)
    back = safety_checker_from_hf(sd, cfg)
    _assert_trees_equal(params, back)


def test_bisenet_roundtrip():
    from consistentid_tpu.models.bisenet import BiSeNet

    model = BiSeNet(n_classes=19, train=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    sd = exp.bisenet_to_torch(variables["params"], variables["batch_stats"])
    back_p, back_s = convert.bisenet_from_torch(sd)
    _assert_trees_equal(variables["params"], back_p)
    _assert_trees_equal(variables["batch_stats"], back_s)


def test_iresnet_roundtrip():
    from consistentid_tpu.models.arcface import IResNet

    layers = (1, 2, 1, 1)
    model = IResNet(layers=layers, embedding_dim=32, input_size=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    sd = exp.iresnet_to_torch(variables["params"], variables["batch_stats"],
                              layers=layers, spatial=2)
    back_p, back_s = convert.iresnet_from_torch(sd, layers=layers, spatial=2)
    _assert_trees_equal(variables["params"], back_p)
    _assert_trees_equal(variables["batch_stats"], back_s)


def test_scrfd_roundtrip_and_config_inference():
    from consistentid_tpu.models.scrfd import SCRFD, SCRFD_VARIANTS

    cfg = SCRFD_VARIANTS["tiny"]
    model = SCRFD(cfg=cfg, train=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    sd = exp.scrfd_to_torch(variables["params"], variables["batch_stats"],
                            cfg)
    # cfg=None exercises scrfd_config_from_state on the exported names+shapes
    back_p, back_s, inferred = convert.scrfd_from_torch(sd, cfg=None)
    for f in ("stem_channels", "stage_blocks", "stage_planes",
              "neck_out_channels", "head_stacked_convs",
              "head_feat_channels", "num_anchors", "use_kps", "norm",
              "strides_share", "cls_reg_share"):
        assert getattr(inferred, f) == getattr(cfg, f), f
    _assert_trees_equal(variables["params"], back_p)
    _assert_trees_equal(variables["batch_stats"], back_s)
