"""HTTP serving with cross-request microbatching (tiny pipeline)."""
import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from consistentid_tpu.apps.serve import serve
from consistentid_tpu.conditioning import SimpleTokenizer
from consistentid_tpu.core import PipelineConfig
from consistentid_tpu.pipelines import ConsistentIDPipeline
from tests.test_pipeline_e2e import synthetic_face_inputs, tiny_bundle


@pytest.fixture(scope="module")
def server():
    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    _, labels = synthetic_face_inputs()
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=2,
                                       start_merge_step=1),
        face_parser=lambda img: labels,
        face_embedder=lambda img: np.zeros((1, 16), np.float32))
    srv, batcher = serve(pipe, port=18731, max_batch=4, window_ms=200.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, batcher
    srv.shutdown()
    batcher.stop()


def _post(payload):
    req = urllib.request.Request(
        "http://127.0.0.1:18731/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(
            "http://127.0.0.1:18731/healthz", timeout=30) as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"


def test_generate_and_microbatching(server):
    face, _ = synthetic_face_inputs()
    buf = io.BytesIO()
    face.save(buf, "PNG")
    payload = {"prompt": "a man with a face",
               "image_b64": base64.b64encode(buf.getvalue()).decode()}

    results = [None, None]

    def call(i):
        results[i] = _post({**payload, "prompt": f"a man with a face {i}"})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for out in results:
        img = Image.open(io.BytesIO(base64.b64decode(out["image_b64"])))
        assert img.size == (32, 32)
    # both landed in one microbatch (200ms window, concurrent submit)
    assert results[0]["batch_size"] == 2 or results[1]["batch_size"] == 2


def test_bad_request(server):
    req = urllib.request.Request(
        "http://127.0.0.1:18731/generate", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
