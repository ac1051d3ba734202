"""Worker process for tests/test_multiprocess_dcn.py.

Runs one JAX process of a 2-process × 4-CPU-device cluster (the CPU
simulation of multi-host DCN: gloo cross-process collectives instead of
DCN, same jax.distributed + global-mesh + shard_map code path as a real
multi-slice TPU launch — apps/train.py:87). Executes the shard_map DP
train step and the dp-sharded generate_batch and writes the results to a
JSON file the parent test compares against a single-process 8-device run.

Usage: python multiproc_worker.py <proc_id> <nprocs> <port> <out.json>
"""
import json
import os
import sys

proc_id, nprocs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           f"{8 // nprocs}")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

# the session's sitecustomize preimports jax with JAX_PLATFORMS=axon, so
# the env edit alone doesn't stick (same gotcha as tests/conftest.py) —
# force the platform through jax.config before any backend use
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consistentid_tpu.parallel import (initialize_multihost, make_mesh,
                                       shard_batch)

initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=nprocs, process_id=proc_id)

import numpy as np

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import (PipelineConfig, SchedulerConfig,
                                   TrainConfig)
from consistentid_tpu.pipelines import ConsistentIDPipeline
from consistentid_tpu.sampling import NoiseSchedule
from consistentid_tpu.testing import tiny_bundle
from consistentid_tpu.training import (create_train_state, make_train_step,
                                       synthetic_batch,
                                       warm_start_ip_projections)

mesh = make_mesh()
assert mesh.devices.size == 8

bundle = tiny_bundle()
params = bundle.init_params(jax.random.PRNGKey(0))
params["unet"] = warm_start_ip_projections(params["unet"])
config = TrainConfig(localization_layers=3)
schedule = NoiseSchedule.create(SchedulerConfig())

state = create_train_state(params, config)
step = make_train_step(bundle, schedule, config, mesh=mesh)
# every process builds the same global batch (same seed) and device_put
# slices out its addressable shards — the exact apps/train.py data path
batch = shard_batch(mesh, {k: np.asarray(v) for k, v in synthetic_batch(
    batch_size=8, size=32, clip_size=28, id_dim=16).items()})

result = {"proc": proc_id, "losses": []}
for i in range(2):
    state, metrics = step(state, batch, jax.random.PRNGKey(1 + i))
    result["losses"].append({k: float(np.asarray(v))
                             for k, v in metrics.items()})

# dp-generate: the serving data-parallel path (sharded generate_batch)
pipe = ConsistentIDPipeline(
    bundle, params, SimpleTokenizer(),
    pipeline_config=PipelineConfig(height=32, width=32,
                                   num_inference_steps=2,
                                   start_merge_step=1),
    mesh=mesh)
rng = np.random.RandomState(0)
from PIL import Image

faces = [Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
         for _ in range(8)]
labels = np.zeros((64, 64), np.uint8)
labels[10:50, 10:54] = 1
labels[16:22, 14:26] = 4
imgs = pipe.generate_batch(
    ["portrait photo of a person"] * 8, faces,
    parsing_labels_list=[labels] * 8,
    faceid_embeds_list=[np.zeros((1, 16), np.float32)] * 8, seed=5,
    return_device=True)
# the output batch dim is sharded over processes: fetch only this
# process's addressable rows (a full np.asarray would need remote shards)
result["generate_rows"] = {}
for shard in imgs.addressable_shards:
    rows = np.asarray(shard.data).astype(np.float64)
    start = shard.index[0].start or 0
    for off in range(rows.shape[0]):
        result["generate_rows"][str(start + off)] = float(rows[off].sum())

with open(out_path, "w") as f:
    json.dump(result, f)
print("worker", proc_id, "done")
