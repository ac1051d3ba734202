"""One-off probe: split the *device* time of the SD1.5 512px batch-4 graph
into denoise-loop / VAE-decode / text+vision-encode components.

Through the remote-TPU tunnel, per-op profiling is unreliable; instead each
component is timed as a chained lax.scan inside one jit (device time
dominates). Cross-check: sum should approximate profile_overhead.py's
device_exec_s. Not driver-tracked.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from consistentid_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from consistentid_tpu.core import (AdapterConfig, PipelineConfig,
                                   sd15_unet_config)
from consistentid_tpu.pipelines import ConsistentIDPipeline, SD15Bundle
from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.models import AutoencoderKL
from PIL import Image


def _force(out):
    """Fetch one scalar from the output: through the remote-execution
    tunnel, block_until_ready alone is not a reliable execution barrier
    (observed: a 3 s chain 'completing' in 12 ms); a host fetch is."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def timed(fn, *args, n=3, vary=None):
    """vary: index of a float-array arg to perturb per iter — identical
    calls can be memoized by the remote-execution tunnel, so every timed
    call must be unique."""
    _force(fn(*args))
    t0 = time.perf_counter()
    for i in range(n):
        a = list(args)
        if vary is not None:
            a[vary] = args[vary] + (i + 1) * 1e-6
        _force(fn(*a))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--only-folded", action="store_true",
                   help="time just the folded denoise chain (kernel A/Bs)")
    args = p.parse_args()

    bundle = SD15Bundle(
        unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
        adapter_config=AdapterConfig(), dtype=jnp.bfloat16)
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=512, width=512,
                                       num_inference_steps=args.steps,
                                       start_merge_step=30))
    face = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (512, 512, 3), np.uint8))
    labels = np.zeros((512, 512), np.uint8)
    labels[100:400, 100:400] = 1
    labels[250:300, 230:290] = 10
    cond = pipe.prepare_conditioning(
        "portrait photo of a man with a strong face", face,
        parsing_labels=labels,
        faceid_embeds=np.random.RandomState(1).randn(1, 512).astype(
            np.float32))
    cond = pipe._device_cond(cond)
    jax.block_until_ready(list(cond.values()))

    B = args.batch
    x = jnp.zeros((B, 64, 64, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.float32)
    ctx = jnp.zeros((2 * B, 81, 768), jnp.bfloat16)

    if args.only_folded:
        @jax.jit
        def chain(params, x, t, ctx):
            unet, unet_params = bundle.infer_unet(params["unet"],
                                                  jnp.float32(1.0))

            def pair(c, _):
                xx = jnp.concatenate([c, c], axis=0).astype(jnp.bfloat16)
                tt = jnp.concatenate([t, t], axis=0)
                eps = unet.apply({"params": unet_params}, xx, tt, ctx)
                e_u, e_c = jnp.split(eps.astype(jnp.float32), 2, axis=0)
                return c + 0.001 * (e_u + 7.5 * (e_c - e_u)), None

            out, _ = jax.lax.scan(pair, x, None, length=args.steps)
            return out

        tl = timed(chain, pipe.params, x, t, ctx, vary=1)
        print({"denoise_loop_folded_s": round(tl, 4),
               "per_step_folded_ms": round(tl / args.steps * 1e3, 3)})
        return

    # 1) encode stage alone (vary a cond field per iter)
    def enc_fn(params, face_pixels):
        c = dict(cond)
        c["face_pixels"] = face_pixels
        return pipe.encode_embeddings(params, c)

    enc = jax.jit(enc_fn)
    t_enc = timed(enc, pipe.params, cond["face_pixels"], vary=1)

    # 2) chained CFG UNet pair (the scan body), x50
    @jax.jit
    def denoise_chain(params, x, t, ctx):
        def pair(c, _):
            xx = jnp.concatenate([c, c], axis=0).astype(jnp.bfloat16)
            tt = jnp.concatenate([t, t], axis=0)
            eps = bundle.unet.apply({"params": params["unet"]}, xx, tt, ctx)
            e_u, e_c = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return c + 0.001 * (e_u + 7.5 * (e_c - e_u)), None
        out, _ = jax.lax.scan(pair, x, None, length=args.steps)
        return out

    t_loop = timed(denoise_chain, pipe.params, x, t, ctx, vary=1)

    # 2b) same chain with LoRA folded out of the scan body (models/lora.py)
    @jax.jit
    def denoise_chain_folded(params, x, t, ctx):
        unet, unet_params = bundle.infer_unet(params["unet"],
                                              jnp.float32(1.0))

        def pair(c, _):
            xx = jnp.concatenate([c, c], axis=0).astype(jnp.bfloat16)
            tt = jnp.concatenate([t, t], axis=0)
            eps = unet.apply({"params": unet_params}, xx, tt, ctx)
            e_u, e_c = jnp.split(eps.astype(jnp.float32), 2, axis=0)
            return c + 0.001 * (e_u + 7.5 * (e_c - e_u)), None

        out, _ = jax.lax.scan(pair, x, None, length=args.steps)
        return out

    t_loop_folded = timed(denoise_chain_folded, pipe.params, x, t, ctx,
                          vary=1)

    # 3) VAE decode alone
    @jax.jit
    def decode(params, z):
        return bundle.vae.apply({"params": params["vae"]},
                                z.astype(jnp.bfloat16),
                                method=AutoencoderKL.decode)

    t_dec = timed(decode, pipe.params, x, vary=1)

    step_flops = pipe.step_flops() or 0.0
    per_step = t_loop / args.steps
    print({
        "encode_s": round(t_enc, 4),
        "denoise_loop_s": round(t_loop, 4),
        "denoise_loop_folded_s": round(t_loop_folded, 4),
        "per_step_ms": round(per_step * 1e3, 3),
        "per_step_folded_ms": round(t_loop_folded / args.steps * 1e3, 3),
        "step_mfu": round(step_flops / per_step / 394e12, 4)
        if step_flops else None,
        "vae_decode_s": round(t_dec, 4),
        "sum_s": round(t_enc + t_loop + t_dec, 4),
    })


if __name__ == "__main__":
    main()
