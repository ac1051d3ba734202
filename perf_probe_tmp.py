import time
import jax, jax.numpy as jnp, numpy as np
from consistentid_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from consistentid_tpu.core import AdapterConfig, PipelineConfig, sd15_unet_config
from consistentid_tpu.pipelines import ConsistentIDPipeline, SD15Bundle
from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.models.vae import AutoencoderKL

bundle = SD15Bundle(
    unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
    adapter_config=AdapterConfig(), dtype=jnp.bfloat16)
params = bundle.fast_random_params(jax.random.PRNGKey(0))

def timed(fn, *args, iters=6):
    # force sync by pulling one element to host (block_until_ready is a
    # no-op through the tunnel)
    float(jnp.sum(fn(*args)))  # warmup + compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)

B = 4
x = jax.random.normal(jax.random.PRNGKey(1), (2*B, 64, 64, 4), jnp.float32)
t = jnp.full((2*B,), 500.0, jnp.float32)
ctx = jax.random.normal(jax.random.PRNGKey(2), (2*B, 81, 768), jnp.bfloat16)

@jax.jit
def pair(params, x, t, ctx):
    return bundle.unet.apply({"params": params["unet"]}, x, t, ctx)

@jax.jit
def pair_sum(params, x, t, ctx):
    return jnp.sum(pair(params, x, t, ctx))

# sync baseline: an empty-ish op to measure per-call tunnel overhead
@jax.jit
def tiny_op(x):
    return jnp.sum(x * 2.0)
rt = timed(tiny_op, x)
print("roundtrip overhead:", round(rt*1000, 2), "ms")

s = timed(pair, params, x, t, ctx)
print("unet pair step (batch 8):", round(s*1000, 2), "ms (incl roundtrip)")

lat = jax.random.normal(jax.random.PRNGKey(3), (B, 64, 64, 4), jnp.float32)
@jax.jit
def dec(params, z):
    return bundle.vae.apply({"params": params["vae"]}, z, method=AutoencoderKL.decode)
d = timed(dec, params, lat)
print("vae decode (batch 4):", round(d*1000, 2), "ms (incl roundtrip)")

net_step = s - rt
print("denoise estimate: 50 *", round(net_step*1000,2), "ms =", round(50*net_step, 3), "s")
