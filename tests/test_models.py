"""Shape/invariant tests for the flax backbones on tiny configs (SURVEY.md §4
test plan item 3: tiny-config integration with shape/dtype/finite checks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.core import (CLIPTextConfig, CLIPVisionConfig,
                                   UNetConfig, VAEConfig)
from consistentid_tpu.models import (AutoencoderKL, CLIPTextEncoder,
                                     CLIPVisionEncoder, UNet,
                                     localization_layer_names)


def tiny_unet_config(**kw):
    base = dict(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        num_attention_heads=(2, 2, 2, 2),
        cross_attention_dim=32,
        norm_num_groups=8,
    )
    base.update(kw)
    return UNetConfig(**base)


def tiny_sdxl_config(**kw):
    base = dict(
        block_out_channels=(32, 64, 64),
        layers_per_block=1,
        down_block_has_attn=(False, True, True),
        transformer_layers_per_block=(0, 1, 2),
        mid_transformer_depth=2,
        num_attention_heads=(2, 2, 4),
        cross_attention_dim=64,
        norm_num_groups=8,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 * 6 + 16,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_unet_sd15_shape_and_capture():
    cfg = tiny_unet_config(lora_rank=4, ip_num_tokens=4)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77 + 4, 32))
    capture = localization_layer_names(5)
    params = model.init(rng, x, t, ctx, capture_layers=capture)
    out, inter = model.apply(params, x, t, ctx, capture_layers=capture,
                             mutable=["intermediates"])
    assert out.shape == (2, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()
    flat = jax.tree_util.tree_leaves_with_path(inter["intermediates"])
    paths = [jax.tree_util.keystr(p) for p, _ in flat]
    # 5 capture blocks: down_1, down_2, mid, up_1, up_2; up blocks have
    # layers_per_block+1 = 2 attn layers each here -> 7 captured tensors
    assert len(paths) == 7, paths
    for p in paths:
        assert "attn2" in p
    blocks = {p.split("_attn")[0].lstrip("['") for p in paths}
    assert blocks == {"down_1", "down_2", "mid", "up_1", "up_2"}, blocks
    # captured probs attend over the 77 text tokens only (IP tokens split off)
    for _, probs in flat:
        assert probs[0].shape[-1] == 77


def test_unet_lora_zero_init_is_identity():
    """LoRA up-proj is zero-init, so at init lora_scale must not change out."""
    cfg_plain = tiny_unet_config()
    cfg_lora = tiny_unet_config(lora_rank=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    lora = UNet(cfg_lora)
    params = lora.init(rng, x, t, ctx)
    out1 = lora.apply(params, x, t, ctx, lora_scale=0.0)
    out2 = lora.apply(params, x, t, ctx, lora_scale=123.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_unet_ip_scale_zero_matches_text_only_context():
    cfg = tiny_unet_config(ip_num_tokens=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 81, 32))
    model = UNet(cfg)
    params = model.init(rng, x, t, ctx)
    out_zero = model.apply(params, x, t, ctx, ip_scale=0.0)
    # swapping the ip tokens must not matter at ip_scale 0
    ctx2 = ctx.at[:, 77:].set(jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32)))
    out_zero2 = model.apply(params, x, t, ctx2, ip_scale=0.0)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_zero2),
                               atol=1e-6)


def test_unet_sdxl_layout():
    cfg = tiny_sdxl_config()
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 64))
    added = {"text_embeds": jnp.ones((1, 16)),
             "time_ids": jnp.ones((1, 6))}
    params = model.init(rng, x, t, ctx, added_cond=added)
    out = model.apply(params, x, t, ctx, added_cond=added)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=8)
    model = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    params = model.init(rng, x)  # __call__ = decode(encode(x)): inits all
    z = model.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 16, 16, 4)
    img = model.apply(params, z, method=AutoencoderKL.decode)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_clip_text_shapes_and_pooling():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=2)
    model = CLIPTextEncoder(cfg)
    ids = jnp.array([[5, 7, 9, 99] + [0] * 73])  # eos id 99 at pos 3
    params = model.init(jax.random.PRNGKey(0), ids)
    out, pooled = model.apply(params, ids, eos_token_id=99)
    assert out.shape == (1, 77, 32)
    assert pooled.shape == (1, 32)
    out2, _ = model.apply(params, ids, output_hidden_state_index=-2,
                          eos_token_id=99)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_clip_text_causality():
    """Changing a later token must not affect earlier hidden states."""
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=2)
    model = CLIPTextEncoder(cfg)
    ids1 = jnp.array([[5, 7, 9, 11, 99] + [0] * 72])
    ids2 = jnp.array([[5, 7, 9, 50, 99] + [0] * 72])
    params = model.init(jax.random.PRNGKey(0), ids1)
    o1, _ = model.apply(params, ids1, eos_token_id=99)
    o2, _ = model.apply(params, ids2, eos_token_id=99)
    np.testing.assert_allclose(np.asarray(o1[:, :3]), np.asarray(o2[:, :3]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(o1[:, 3]), np.asarray(o2[:, 3]))


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=2)
    model = CLIPVisionEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    post, penult = model.apply(params, x)
    assert post.shape == (2, 5, 32)      # 1 cls + 4 patches
    assert penult.shape == (2, 5, 32)
    assert not np.allclose(np.asarray(post), np.asarray(penult))


def test_unet_remat_matches_and_differentiates():
    """remat=True must produce identical outputs and support jax.grad with
    intermediates capture intact on non-remated (captured) blocks."""
    cfg = tiny_unet_config(lora_rank=4, ip_num_tokens=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 81, 32))
    capture = localization_layer_names(3)

    plain = UNet(cfg)
    remat = UNet(cfg, remat=True)
    params = plain.init(rng, x, t, ctx, capture_layers=capture)

    o1, i1 = plain.apply(params, x, t, ctx, capture_layers=capture,
                         mutable=["intermediates"])
    o2, i2 = remat.apply(params, x, t, ctx, capture_layers=capture,
                         mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    n1 = len(jax.tree_util.tree_leaves(i1["intermediates"]))
    n2 = len(jax.tree_util.tree_leaves(i2["intermediates"]))
    assert n1 == n2 > 0

    def loss(p):
        out = remat.apply(p, x, t, ctx)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(
        float(jax.tree_util.tree_leaves(g)[0].sum()))


def test_lora_fold_matches_live_branch():
    """Inference LoRA folding (models/lora.py): a lora_rank=0 UNet on folded
    params must match the live-LoRA UNet at the same scale, and the folded
    tree must be exactly the tree the plain UNet expects."""
    import dataclasses

    from consistentid_tpu.models.lora import fold_lora_params

    cfg = tiny_unet_config(lora_rank=4, ip_num_tokens=4)
    live = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 81, 32))
    params = live.init(rng, x, t, ctx)["params"]
    # randomize every leaf: the semantic init zeroes the LoRA up-projection,
    # which would make the fold trivially a no-op
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = treedef.unflatten(
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)])

    scale = 0.7
    out_live = live.apply({"params": params}, x, t, ctx,
                          lora_scale=scale, ip_scale=0.5)

    plain = UNet(dataclasses.replace(cfg, lora_rank=0))
    folded = fold_lora_params(params, scale)
    plain_struct = jax.eval_shape(
        lambda: plain.init(rng, x, t, ctx))["params"]
    assert (jax.tree_util.tree_structure(folded)
            == jax.tree_util.tree_structure(plain_struct))
    out_fold = plain.apply({"params": folded}, x, t, ctx, ip_scale=0.5)
    np.testing.assert_allclose(np.asarray(out_live), np.asarray(out_fold),
                               rtol=1e-4, atol=1e-5)

    # scale is foldable while traced (the pipelines fold inside jit)
    out_jit = jax.jit(
        lambda p, s: plain.apply({"params": fold_lora_params(p, s)},
                                 x, t, ctx, ip_scale=0.5))(params,
                                                           jnp.float32(scale))
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_jit),
                               rtol=1e-4, atol=1e-5)


def test_upsample2x_nearest_matches_resize():
    """Broadcast+reshape 2x upsample must equal jax.image.resize nearest
    (torch F.interpolate semantics the converters assume)."""
    from consistentid_tpu.models.layers import upsample2x_nearest

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3))
    got = upsample2x_nearest(x)
    want = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_fast_group_norm_matches_flax():
    """ops/group_norm.GroupNorm (TPU-shaped two-stage reduction, optional
    fused SiLU) must match flax nn.GroupNorm numerically and in param
    layout — the converters and checkpoints depend on both."""
    import flax.linen as nn

    from consistentid_tpu.ops.group_norm import GroupNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32)) * 3 + 1
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    mine = GroupNorm(num_groups=8, epsilon=1e-5)
    params = ref.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                mine.init(jax.random.PRNGKey(1), x)))
    params = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape), params)

    want = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(mine.apply(params, x)),
                               np.asarray(want), rtol=2e-5, atol=2e-5)
    got_silu = GroupNorm(num_groups=8, epsilon=1e-5, act="silu").apply(
        params, x)
    np.testing.assert_allclose(
        np.asarray(got_silu),
        np.asarray(want * jax.nn.sigmoid(want)), rtol=2e-5, atol=2e-5)
    # (B, L, C) inputs (Transformer2D linear-projection path)
    x2 = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 32))
    np.testing.assert_allclose(
        np.asarray(mine.apply(params, x2)),
        np.asarray(ref.apply(params, x2)), rtol=2e-5, atol=2e-5)


def test_unet_fused_gn_matches_default():
    """fused_gn=True (restructured GroupNorm+SiLU, ops/group_norm.py) must
    be a pure execution-strategy switch: same param tree, same outputs,
    finite grads — the training-graph A/B lever (VERDICT r3 item 8)."""
    cfg = tiny_unet_config(lora_rank=4, ip_num_tokens=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 4))
    t = jnp.array([7, 3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 81, 32))

    plain = UNet(cfg)
    fused = UNet(cfg, fused_gn=True)
    params = plain.init(rng, x, t, ctx)
    p2 = fused.init(jax.random.PRNGKey(9), x, t, ctx)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)

    o1 = plain.apply(params, x, t, ctx)
    o2 = fused.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-5, rtol=2e-5)

    g = jax.grad(lambda p: jnp.sum(fused.apply(p, x, t, ctx) ** 2))(params)
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))
