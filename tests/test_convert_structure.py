"""Structural completeness of the diffusers-layout converters: the param
tree they produce must match the flax models' init tree path-for-path
(adapter LoRA/IP params excluded — those come from the ConsistentID
checkpoint). Uses a recording placeholder dict, so no real weights needed."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from consistentid_tpu.io.convert_backbones import (unet_from_diffusers,
                                                   vae_from_diffusers)
from tests.test_pipeline_e2e import tiny_bundle
from tests.test_pipeline_sdxl import tiny_sdxl_bundle


class PlaceholderSD(dict):
    """Returns rank-tagged placeholders; records every key requested."""

    def __init__(self):
        super().__init__()
        self.requested = set()

    def __getitem__(self, key):
        self.requested.add(key)
        if key.endswith(".weight"):
            # conv weights transpose(2,3,1,0); linears .T; norms 1-D — a 4-D
            # ones array survives all three transforms
            return np.ones((1, 1, 1, 1), np.float32)
        return np.ones((1,), np.float32)

    def __contains__(self, key):
        # optional keys (conv_shortcut/time_emb_proj/downsample) get included
        return True


def _paths(tree, drop_markers=("_lora", "to_k_ip", "to_v_ip")):
    flat = traverse_util.flatten_dict(tree)
    return {k for k in flat
            if not any(m in part for part in k for m in drop_markers)}


@pytest.mark.parametrize("bundle_fn", [tiny_bundle, tiny_sdxl_bundle])
def test_unet_converter_structure(bundle_fn):
    bundle = bundle_fn()
    params = bundle.init_params(jax.random.PRNGKey(0))
    sd = PlaceholderSD()
    converted = unet_from_diffusers(sd, bundle.unet_config)
    want = _paths(params["unet"])
    got = {k for k in traverse_util.flatten_dict(converted)}
    missing = want - got
    extra = got - want
    assert not missing, sorted(missing)[:5]
    # the placeholder dict reports every optional key as present, so the only
    # allowed extras are the genuinely optional ones (shortcut/time proj)
    assert all("conv_shortcut" in k or "time_emb_proj" in k for k in extra), \
        sorted(extra)[:5]


def test_vae_converter_structure():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    sd = PlaceholderSD()
    converted = vae_from_diffusers(sd, bundle.vae_config)
    want = _paths(params["vae"])
    got = {k for k in traverse_util.flatten_dict(converted)}
    assert not (want - got), sorted(want - got)[:5]
    extra = got - want  # placeholder reports optional keys as present
    assert all("conv_shortcut" in k for k in extra), sorted(extra)[:5]
