"""True HF-layout parity for the CLIP converters: transformers' CLIP modules
(random init, real HF key naming) vs our flax encoders."""
import numpy as np
import pytest

import jax.numpy as jnp

from consistentid_tpu.core import CLIPTextConfig, CLIPVisionConfig
from consistentid_tpu.io import convert
from consistentid_tpu.io.convert_backbones import (clip_text_from_hf,
                                                   clip_vision_from_hf)
from consistentid_tpu.models import CLIPTextEncoder, CLIPVisionEncoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_clip_text_parity_hf():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=77, eos_token_id=99, bos_token_id=98,
        hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    ids = torch.tensor([[98, 5, 7, 9, 99] + [99] * 72])
    with torch.no_grad():
        out = hf(ids, output_hidden_states=True)
    want_last = out.last_hidden_state.numpy()
    want_penult = out.hidden_states[-2].numpy()
    want_pooled = out.pooler_output.numpy()

    cfg = CLIPTextConfig(vocab_size=120, hidden_size=32,
                         intermediate_size=64, num_layers=3, num_heads=2,
                         hidden_act="quick_gelu")
    model = CLIPTextEncoder(cfg)
    params = clip_text_from_hf(
        convert.torch_state_dict_to_numpy(hf.state_dict()), cfg)
    got_last, got_pooled = model.apply({"params": params},
                                       jnp.asarray(ids.numpy()),
                                       eos_token_id=99)
    np.testing.assert_allclose(np.asarray(got_last), want_last, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled, atol=2e-5)
    got_penult, _ = model.apply({"params": params}, jnp.asarray(ids.numpy()),
                                output_hidden_state_index=-2, eos_token_id=99)
    np.testing.assert_allclose(np.asarray(got_penult), want_penult, atol=2e-5)


def test_clip_vision_parity_hf():
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2, hidden_act="gelu")
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    x = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        out = hf(x, output_hidden_states=True)
    want_penult = out.hidden_states[-2].numpy()

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           intermediate_size=64, num_layers=3, num_heads=2,
                           hidden_act="gelu")
    model = CLIPVisionEncoder(cfg)
    params = clip_vision_from_hf(
        convert.torch_state_dict_to_numpy(hf.state_dict()), cfg)
    _, got_penult = model.apply({"params": params},
                                jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_penult), want_penult, atol=2e-5)
