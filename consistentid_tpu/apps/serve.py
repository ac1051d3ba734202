"""Production serving: HTTP inference server with cross-request microbatching.

The reference's serving story is a gradio demo that reloads the entire
pipeline per request (app.py:24-37). Here: one pipeline, one compiled graph,
a microbatching queue — concurrent requests within a collection window are
stacked and run through generate_batch as a single TPU execution, so serving
throughput rides the batch dimension instead of queueing latency.

API:
  GET  /healthz               -> {"status": "ok", "requests": N}
  POST /generate              JSON {prompt, image_b64, negative_prompt?,
                                    seed?} -> {image_b64, batch_size}

    python -m consistentid_tpu.apps.serve --base ... --port 8000
"""
from __future__ import annotations

import base64
import io
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np
from PIL import Image


@dataclass
class _Pending:
    prompt: str
    image: Image.Image
    negative: str
    seed: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    batch_size: int = 0
    error: Optional[str] = None


class MicroBatcher:
    """Collects requests for up to `window_ms` (or `max_batch`), then runs
    them as one generate_batch call on a dedicated worker thread."""

    def __init__(self, pipeline, max_batch: int = 4, window_ms: float = 30.0):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.window_ms = window_ms
        self._queue: List[_Pending] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self.requests_served = 0
        self.batches_run = 0
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, req: _Pending) -> _Pending:
        with self._lock:
            self._queue.append(req)
        self._wake.set()
        return req

    def _drain(self) -> List[_Pending]:
        with self._lock:
            batch = self._queue[: self.max_batch]
            self._queue = self._queue[self.max_batch:]
        return batch

    def _worker(self):
        while not self._stop:
            self._wake.wait(timeout=0.1)
            if self._stop:
                return
            # collection window: let concurrent requests pile up
            time.sleep(self.window_ms / 1000.0)
            self._wake.clear()
            batch = self._drain()
            if not batch:
                continue
            try:
                images = self.pipeline.generate_batch(
                    [r.prompt for r in batch],
                    [r.image for r in batch],
                    negative_prompts=[r.negative for r in batch],
                    seed=batch[0].seed)
                for i, r in enumerate(batch):
                    r.result = images[i]
                    r.batch_size = len(batch)
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    r.error = str(e)
            self.batches_run += 1
            self.requests_served += len(batch)
            for r in batch:
                r.event.set()

    def stop(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=2)


def make_handler(batcher: MicroBatcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "requests": batcher.requests_served,
                                 "batches": batcher.batches_run})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n))
                image = Image.open(io.BytesIO(
                    base64.b64decode(payload["image_b64"])))
                req = _Pending(
                    prompt=payload["prompt"], image=image,
                    negative=payload.get("negative_prompt", ""),
                    seed=int(payload.get("seed", 0)))
            except Exception as e:  # noqa: BLE001
                return self._json(400, {"error": f"bad request: {e}"})
            batcher.submit(req)
            req.event.wait()
            if req.error:
                return self._json(500, {"error": req.error})
            buf = io.BytesIO()
            Image.fromarray(req.result).save(buf, "PNG")
            self._json(200, {
                "image_b64": base64.b64encode(buf.getvalue()).decode(),
                "batch_size": req.batch_size,
            })

    return Handler


def serve(pipeline, port: int = 8000, max_batch: int = 4,
          window_ms: float = 30.0):
    batcher = MicroBatcher(pipeline, max_batch, window_ms)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(batcher))
    return server, batcher


def main(argv=None):
    from .infer import build_parser

    p = build_parser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--window-ms", type=float, default=30.0)
    args, _ = p.parse_known_args(argv)

    from ..core.cache import enable_compilation_cache
    from ..core.config import PipelineConfig
    from ..pipelines.loading import load_sd15_consistentid

    enable_compilation_cache()
    pipe = load_sd15_consistentid(
        args.base, consistentid_path=args.consistentid,
        image_encoder_path=args.image_encoder, bisenet_path=args.bisenet,
        arcface_path=args.arcface,
        pipeline_config=PipelineConfig(
            height=args.height, width=args.width,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            start_merge_step=args.start_merge_step))
    server, _ = serve(pipe, args.port, args.max_batch, args.window_ms)
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
