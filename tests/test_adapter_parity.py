"""Golden-parity tests: our flax adapter modules vs the reference torch
modules (imported read-only from /root/reference) with converted weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.adapter import (AttentionMLP, FacialEncoder,
                                      FacePerceiverResampler, ProjPlusModel)
from consistentid_tpu.io import convert
from tests.reference_import import import_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

torch = pytest.importorskip("torch")

ATOL = 2e-4  # fp32 CPU; perceiver depth-8 stacks accumulate ~1e-5 noise


def _np(sd):
    return convert.torch_state_dict_to_numpy(sd)


def test_proj_plus_model_parity():
    ref_fn = import_reference("functions")
    torch.manual_seed(0)
    ref = ref_fn.ProjPlusModel(cross_attention_dim=64, id_embeddings_dim=32,
                               clip_embeddings_dim=48, num_tokens=4).eval()
    id_embeds = torch.randn(2, 32)
    clip_embeds = torch.randn(2, 9, 48)
    with torch.no_grad():
        want = ref(id_embeds, clip_embeds, shortcut=True, scale=0.7).numpy()

    model = ProjPlusModel(cross_attention_dim=64, id_embeddings_dim=32,
                          clip_embeddings_dim=48, num_tokens=4)
    params = convert.proj_plus_model(_np(ref.state_dict()))
    got = model.apply({"params": params}, jnp.asarray(id_embeds.numpy()),
                      jnp.asarray(clip_embeds.numpy()), shortcut=True,
                      scale=0.7)
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_attention_mlp_parity():
    ref_fn = import_reference("functions")
    torch.manual_seed(1)
    ref = ref_fn.AttentionMLP(dtype=torch.float32, dim=64, depth=3, heads=4,
                              dim_head=16, embedding_dim=48,
                              output_dim=32).eval()
    x = torch.randn(3, 17, 48)
    with torch.no_grad():
        want = ref(x).numpy()

    model = AttentionMLP(dim=64, depth=3, heads=4, dim_head=16,
                         embedding_dim=48, output_dim=32)
    params = convert.attention_mlp(_np(ref.state_dict()), depth=3)
    got = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_face_perceiver_resampler_parity():
    ref_fn = import_reference("functions")
    torch.manual_seed(2)
    ref = ref_fn.FacePerceiverResampler(dim=64, depth=2, dim_head=16, heads=4,
                                        embedding_dim=48, output_dim=40).eval()
    latents = torch.randn(2, 4, 64)
    x = torch.randn(2, 11, 48)
    with torch.no_grad():
        want = ref(latents, x).numpy()

    model = FacePerceiverResampler(dim=64, depth=2, dim_head=16, heads=4,
                                   embedding_dim=48, output_dim=40)
    params = convert.face_perceiver_resampler(_np(ref.state_dict()), "", depth=2)
    got = model.apply({"params": params}, jnp.asarray(latents.numpy()),
                      jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def _facial_fixture(batch=2, seq=20, n_slots=5, valid_counts=(3, 5)):
    """Build boolean marker masks the reference way, plus padded idx arrays."""
    rng = np.random.RandomState(3)
    mask_bool = np.zeros((batch, seq), dtype=bool)
    idx = np.zeros((batch, n_slots), dtype=np.int64)
    idx_mask = np.zeros((batch, n_slots), dtype=bool)
    for b, count in enumerate(valid_counts):
        pos = np.sort(rng.choice(np.arange(1, seq), size=count, replace=False))
        mask_bool[b, pos] = True
        idx[b, :count] = pos
        idx_mask[b, :count] = True
    return mask_bool, idx, idx_mask


def test_facial_encoder_parity():
    ref_att = import_reference("attention")
    torch.manual_seed(4)
    ref = ref_att.FacialEncoder(embedding_dim=48, output_dim=32,
                                embed_dim=32).eval()
    # shrink the 8-deep AttentionMLP for test speed? keep default depth=8 to
    # exercise the real layout used by the checkpoint converter.
    batch, seq, n_slots = 2, 20, 5
    mask_bool, idx, idx_mask = _facial_fixture(batch, seq, n_slots)
    prompt = torch.randn(batch, seq, 32)
    regions = torch.randn(batch, n_slots, 17, 48)

    # the reference consumes only the valid id slots, gated by valid_id_mask
    with torch.no_grad():
        want = ref(prompt.clone(), regions,
                   torch.from_numpy(mask_bool),
                   torch.from_numpy(idx_mask)).numpy()

    model = FacialEncoder(embedding_dim=48, output_dim=32, embed_dim=32)
    params = convert.facial_encoder(_np(ref.state_dict()))
    got = model.apply({"params": params}, jnp.asarray(prompt.numpy()),
                      jnp.asarray(regions.numpy()), jnp.asarray(idx),
                      jnp.asarray(idx_mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_fuse_module_invalid_slots_leave_prompt_untouched():
    """Padded (invalid) slots must be exact no-ops on the prompt embeds."""
    from consistentid_tpu.adapter import FuseModule

    model = FuseModule(embed_dim=16)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.normal(rng, (1, 10, 16))
    ids = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    idx = jnp.array([[4, 0, 0, 0, 0]])
    mask = jnp.array([[True, False, False, False, False]])
    params = model.init(jax.random.PRNGKey(2), prompt, ids, idx, mask)
    out = model.apply(params, prompt, ids, idx, mask)
    changed = np.abs(np.asarray(out - prompt)).max(axis=-1)[0]
    assert changed[4] > 0
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(prompt[0, :4]))
    np.testing.assert_allclose(np.asarray(out[0, 5:]), np.asarray(prompt[0, 5:]))
