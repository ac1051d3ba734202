"""One-off probe: device trace of the SD1.5 512px batch-4 inference graph;
prints top XLA ops by device self time (xplane parsed offline). Not
driver-tracked."""
import collections
import glob
import os
import re
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
    import sys
    quant = sys.argv[1] if len(sys.argv) > 1 else "none"
    bundle = SD15Bundle(
        unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
        adapter_config=AdapterConfig(), dtype=jnp.bfloat16, quant=quant)
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=512, width=512,
                                       num_inference_steps=50,
                                       start_merge_step=30))
    face = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (512, 512, 3), np.uint8))
    labels = np.zeros((512, 512), np.uint8)
    labels[100:400, 100:400] = 1
    labels[250:300, 230:290] = 10
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.random.RandomState(1).randn(1, 512).astype(
                  np.float32),
              num_images_per_prompt=4)
    prompt = "portrait photo of a man with a strong face"
    img = pipe.generate(prompt, face, seed=0, **kw)  # warm/compile
    assert np.isfinite(img.astype(np.float32)).all()

    log_dir = "/tmp/infer_trace"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        pipe.generate(prompt, face, seed=1, **kw)

    xp = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xp)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xp[0], "rb").read())
    for plane in space.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_names = dict(plane.event_metadata)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            totals = collections.Counter()
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                totals[re.split(r"[.\d]", name)[0]] += ev.duration_ps
            tot = sum(totals.values())
            print(f"== XLA Ops device total {tot/1e9:.1f} ms")
            for k, ps in totals.most_common(22):
                print(f"  {ps/1e9:9.2f} ms {100*ps/tot:5.1f}%  {k}")


if __name__ == "__main__":
    main()
