import time, sys
import numpy as np, jax, jax.numpy as jnp
from consistentid_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from consistentid_tpu.core import AdapterConfig, PipelineConfig, sd15_unet_config
from consistentid_tpu.pipelines import ConsistentIDPipeline, SD15Bundle
from consistentid_tpu.testing import synthetic_clip_tokenizer
from PIL import Image

quant = sys.argv[1] if len(sys.argv) > 1 else "none"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
bundle = SD15Bundle(
    unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
    adapter_config=AdapterConfig(), dtype=jnp.bfloat16, quant=quant)
params = bundle.fast_random_params(jax.random.PRNGKey(0))
pipe = ConsistentIDPipeline(bundle, params, synthetic_clip_tokenizer(),
    pipeline_config=PipelineConfig(height=512, width=512,
                                   num_inference_steps=50, start_merge_step=30))
face = Image.fromarray(np.random.RandomState(0).randint(0,255,(512,512,3),np.uint8))
labels = np.zeros((512,512), np.uint8); labels[100:400,100:400]=1; labels[250:300,230:290]=10
kw = dict(parsing_labels=labels, faceid_embeds=np.zeros((1,512),np.float32),
          num_images_per_prompt=batch)
prompt = "portrait photo of a man with a strong face"

def run(n, seed):
    t0 = time.perf_counter()
    pipe.generate(prompt, face, seed=seed, num_inference_steps=n, **kw)
    return time.perf_counter() - t0

run(10, 0); run(30, 0)  # compile
ta = min(run(10, i+1) for i in range(3))
tb = min(run(30, i+1) for i in range(3))
print(f"quant={quant} batch={batch} step_time={(tb-ta)/20*1000:.2f} ms  (10-step {ta:.3f}s, 30-step {tb:.3f}s)")
