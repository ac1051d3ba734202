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
