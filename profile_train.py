"""One-off probe: capture a device trace of the full-size SD1.5 train step
and print the top ops by self time. Parses the xplane protobuf directly
(tensorboard_plugin_profile is in the image). Not driver-tracked.
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from consistentid_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

from consistentid_tpu.core import (AdapterConfig, SchedulerConfig,
                                   TrainConfig, sd15_unet_config)
from consistentid_tpu.pipelines import SD15Bundle
from consistentid_tpu.sampling import NoiseSchedule
from consistentid_tpu.training import (create_train_state, make_train_step,
                                       synthetic_batch,
                                       warm_start_ip_projections)


def main():
    # argv: [remat] [batch] [steps_per_call]
    remat = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spc = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    bundle = SD15Bundle(
        unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
        adapter_config=AdapterConfig(),
        dtype=jnp.bfloat16, remat=remat != "none",
        remat_policy="dots" if remat == "dots" else "full")
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    params["unet"] = warm_start_ip_projections(params["unet"])
    config = TrainConfig()
    schedule = NoiseSchedule.create(SchedulerConfig())
    state = create_train_state(params, config)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=batch_size, size=512, clip_size=224, id_dim=512).items()}
    if spc > 1:
        from consistentid_tpu.training import make_multi_train_step
        multi = make_multi_train_step(bundle, schedule, config, n_steps=spc,
                                      mesh=None, donate=True)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (spc, *x.shape)), batch)

        def step(state, b, key):
            st, m = multi(state, stacked, key)
            return st, {"loss": m["loss"][-1]}
    else:
        step = make_train_step(bundle, schedule, config, mesh=None,
                               donate=True)

    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, rng)
    print("warm loss", float(metrics["loss"]))

    log_dir = "/tmp/train_trace"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        for i in range(2):
            state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        print("traced loss", float(metrics["loss"]))

    xplanes = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for xp_path in xplanes:
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(xp_path, "rb").read())
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            print("== plane:", plane.name)
            ev_names = dict(plane.event_metadata)
            totals = {}
            for line in plane.lines:
                for ev in line.events:
                    md = ev_names.get(ev.metadata_id)
                    name = md.name if md else str(ev.metadata_id)
                    totals[name] = totals.get(name, 0) + ev.duration_ps
            top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
            tot = sum(totals.values())
            for name, ps in top:
                print(f"  {ps/1e9:9.3f} ms  {100*ps/max(tot,1):5.1f}%  "
                      f"{name[:110]}")


if __name__ == "__main__":
    main()
