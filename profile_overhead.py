"""One-off probe: split generate() wall time into host-prepare / device
(dispatch+execute) / output-transfer+postprocess at the bench config.
Not driver-tracked; useful with `python profile_overhead.py [--steps N]`.
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
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
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
    labels[150:200, 150:250] = 4
    labels[250:300, 230:290] = 10
    faceid = np.random.RandomState(1).randn(1, 512).astype(np.float32)
    prompt = "portrait photo of a man with a strong face"

    # warm / compile
    img = pipe.generate(prompt, face, seed=0, parsing_labels=labels,
                        faceid_embeds=faceid,
                        num_images_per_prompt=args.batch)

    t_prep = t_upload = t_exec = t_fetch = t_post = 0.0
    for i in range(args.iters):
        t0 = time.perf_counter()
        cond = pipe.prepare_conditioning(prompt, face, parsing_labels=labels,
                                         faceid_embeds=faceid)
        t1 = time.perf_counter()
        cond = pipe._device_cond(cond)
        jax.block_until_ready(list(cond.values()))
        t2 = time.perf_counter()
        sf = bundle.vae_scale_factor
        rng = jax.random.PRNGKey(i + 1)
        latents = jax.random.normal(
            rng, (args.batch, 512 // sf, 512 // sf, 4), jnp.float32)
        images = pipe._core_jit(
            pipe.params, cond, latents, jnp.float32(5.0), jnp.int32(30),
            args.steps, "ddim", jnp.float32(1.0), jnp.float32(1.0),
            jax.random.fold_in(rng, 1))
        jax.block_until_ready(images)
        t3 = time.perf_counter()
        from consistentid_tpu.pipelines.consistentid_sd15 import \
            _to_uint8_device
        u8 = _to_uint8_device(images)
        jax.block_until_ready(u8)
        t4 = time.perf_counter()
        out = np.asarray(u8)
        t5 = time.perf_counter()
        t_prep += t1 - t0
        t_upload += t2 - t1
        t_exec += t3 - t2
        t_fetch += t4 - t3
        t_post += t5 - t4
    n = args.iters
    print({"host_prepare_s": round(t_prep / n, 4),
           "upload_s": round(t_upload / n, 4),
           "device_exec_s": round(t_exec / n, 4),
           "device_uint8_s": round(t_fetch / n, 4),
           "fetch_u8_s": round(t_post / n, 4),
           "total_s": round((t_prep + t_upload + t_exec + t_fetch + t_post)
                            / n, 4)})


if __name__ == "__main__":
    main()
