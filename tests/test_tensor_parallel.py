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
