"""Tensor-parallel UNet sharding on the 8-device CPU mesh: TP-sharded
forward must match the replicated forward bit-for-tolerance."""
import numpy as np

import jax
import jax.numpy as jnp
from flax import traverse_util

from consistentid_tpu.models import UNet
from consistentid_tpu.parallel import make_mesh
from consistentid_tpu.parallel.tensor_parallel import (
    apply_tensor_parallel, unet_param_shardings)
from tests.test_models import tiny_unet_config


def test_tp_shardings_cover_transformer_kernels():
    cfg = tiny_unet_config(lora_rank=0, ip_num_tokens=0,
                           num_attention_heads=(2, 2, 2, 2))
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(1), x, jnp.array([1]),
                        jnp.zeros((1, 77, 32)))["params"]
    mesh = make_mesh(model=2)
    shardings = unet_param_shardings(params, mesh)
    flat = traverse_util.flatten_dict(shardings)
    sharded = [k for k, s in flat.items()
               if s.spec != jax.sharding.PartitionSpec()]
    assert any("to_q" in k for k in sharded)
    assert any("to_out" in k for k in sharded)
    assert any(k[-2] == "proj" and "ff" in k for k in sharded)
    # convs stay replicated
    assert not any("conv" in part for k in sharded for part in k)


def test_tp_forward_matches_replicated():
    # heads and hidden dims divisible by the model axis (2 here)
    cfg = tiny_unet_config(lora_rank=0, ip_num_tokens=0)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 4))
    t = jnp.array([5, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 32))
    params = model.init(rng, x, t, ctx)["params"]

    want = model.apply({"params": params}, x, t, ctx)

    mesh = make_mesh(data=4, model=2)
    bundle = apply_tensor_parallel({"unet": params}, mesh)

    @jax.jit
    def fwd(p, x, t, ctx):
        return model.apply({"params": p["unet"]}, x, t, ctx)

    got = fwd(bundle, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_pipeline_generate_tp_matches_single_device():
    """End-to-end pipeline TP: a mesh with model=2 makes the pipeline shard
    its UNet kernels at construction (consistentid_sd15.py __init__); the
    full generate (encode -> CFG denoise scan -> decode) must match the
    mesh-less run within collective-reordering tolerance. This is the
    serve --tp path (apps/serve.py)."""
    from PIL import Image

    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines import ConsistentIDPipeline
    from consistentid_tpu.testing import tiny_bundle

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    cfg = PipelineConfig(height=32, width=32, num_inference_steps=2,
                         start_merge_step=1)
    labels = np.zeros((64, 64), np.uint8)
    labels[16:48, 16:48] = 1
    labels[20:28, 20:30] = 4
    face = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (64, 64, 3), np.uint8))
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 16), np.float32),
              seed=3, num_images_per_prompt=2)

    ref_pipe = ConsistentIDPipeline(bundle, params, SimpleTokenizer(),
                                    pipeline_config=cfg)
    want = ref_pipe.generate("a man with a face", face, **kw)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    tp_pipe = ConsistentIDPipeline(bundle, params, SimpleTokenizer(),
                                   pipeline_config=cfg, mesh=mesh)
    assert tp_pipe._dp_size == 2
    got = tp_pipe.generate("a man with a face", face, **kw)
    # uint8 outputs: collective reordering may flip a borderline rounding;
    # allow off-by-one on a small fraction of pixels
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.05


def test_llama_tp_decode_matches_replicated():
    """TP-sharded LLaVA captioner decode == replicated decode: the Llama
    projections are column/row-sharded over the model axis
    (tensor_parallel.apply_llava_tensor_parallel) and XLA partitions the
    whole prefill + while-loop decode graph; greedy ids and full-forward
    logits must agree with the unsharded run (all-reduce reassociation
    tolerance on logits, exact on the argmax path for non-degenerate
    weights). This is the fgid caption --tp path."""
    from consistentid_tpu.core.config import (CLIPVisionConfig, LlamaConfig,
                                              LlavaConfig)
    from consistentid_tpu.models.llama import LlamaForCausalLM, \
        greedy_generate
    from consistentid_tpu.models.llava import random_llava_params
    from consistentid_tpu.parallel.tensor_parallel import (
        apply_llava_tensor_parallel, llama_param_shardings)

    text = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       max_position_embeddings=64)
    cfg = LlavaConfig(
        vision=CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=24,
                                intermediate_size=48, num_layers=2,
                                num_heads=2, hidden_act="quick_gelu"),
        text=text, image_token_id=63)
    params = random_llava_params(jax.random.PRNGKey(0), cfg)
    model = LlamaForCausalLM(text)
    prompts = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 3, 60)

    want_logits, _ = model.apply({"params": params["llama"]}, prompts)
    want_ids = greedy_generate(model, {"params": params["llama"]}, prompts,
                               max_new_tokens=6, eos_token_id=2)

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    shard = llama_param_shardings(params["llama"], mesh)
    flat = traverse_util.flatten_dict(shard)
    sharded = [k for k, s in flat.items()
               if s.spec != jax.sharding.PartitionSpec()]
    assert any("q_proj" in k for k in sharded)
    assert any("down_proj" in k for k in sharded)
    assert not any("embed_tokens" in k for k in sharded)

    tp_params = apply_llava_tensor_parallel(params, mesh)
    got_logits, _ = jax.jit(
        lambda p, ids: model.apply({"params": p}, ids))(
        tp_params["llama"], prompts)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               atol=2e-4, rtol=1e-4)
    got_ids = greedy_generate(model, {"params": tp_params["llama"]},
                              prompts, max_new_tokens=6, eos_token_id=2)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))


def test_llava_captioner_tp_matches_single_device():
    """End-to-end: LlavaCaptioner(mesh=model-axis mesh) produces the same
    captions as the unsharded captioner (jitted splice + prefill + decode
    all GSPMD-partitioned)."""
    from PIL import Image

    from consistentid_tpu.conditioning.captioner import LlavaCaptioner
    from consistentid_tpu.core.config import (CLIPVisionConfig, LlamaConfig,
                                              LlavaConfig)
    from consistentid_tpu.models.llava import random_llava_params
    from tests.test_llava_captioner import FakeLlamaTokenizer

    cfg = LlavaConfig(
        vision=CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=24,
                                intermediate_size=48, num_layers=2,
                                num_heads=2, hidden_act="quick_gelu"),
        text=LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=4, num_kv_heads=2,
                         max_position_embeddings=512),
        image_token_id=63)
    params = random_llava_params(jax.random.PRNGKey(0), cfg)
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (30, 30, 3), np.uint8))

    ref = LlavaCaptioner(params, FakeLlamaTokenizer(), config=cfg,
                         max_new_tokens=6, dtype=jnp.float32)
    want = ref.generate(img, "describe the face")

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    tp = LlavaCaptioner(params, FakeLlamaTokenizer(), config=cfg,
                        max_new_tokens=6, dtype=jnp.float32, mesh=mesh)
    assert tp.generate(img, "describe the face") == want
