"""Production serving: HTTP inference server with cross-request microbatching.

The reference's serving story is a gradio demo that reloads the entire
pipeline per request (app.py:24-37). Here: one pipeline, one compiled graph
per batch bucket, a microbatching queue — concurrent requests within a
collection window are stacked, padded to a fixed bucket size {1, 2, 4, ...},
and run through generate_batch as a single TPU execution, so serving
throughput rides the batch dimension and NO batch size ever triggers a fresh
XLA compile after startup warmup. Batches are double-buffered: while the
device runs batch i, batch i+1 is drained + host-prepared + enqueued and
batch i's output transfer overlaps it (generate_batch_async), so the device
never idles between batches.

Security model: this server has NO authentication and trusts its callers.
It binds to 127.0.0.1 by default — put a real ingress (auth, TLS, rate
limits) in front before exposing it, and only then use --host 0.0.0.0.
Requests are capped (--max-body bytes; decoded images capped at
--max-image-px per side) so an untrusted peer can't exhaust host memory
with a decompression bomb.

API:
  GET  /healthz               -> {"status": "ok", "requests": N}
  POST /generate              JSON {prompt, image_b64, negative_prompt?,
                                    seed?} -> {image_b64, batch_size}
    seed is honored PER REQUEST: each request's latents derive from its own
    seed, so the output is reproducible regardless of microbatch co-members.

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

MAX_BODY_BYTES = 16 * 1024 * 1024
MAX_IMAGE_PX = 4096


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


def _buckets(max_batch: int) -> List[int]:
    out = [1]
    while out[-1] * 2 <= max_batch:
        out.append(out[-1] * 2)
    if out[-1] != max_batch:
        out.append(max_batch)
    return out


class MicroBatcher:
    """Collects requests for up to `window_ms` (or `max_batch`), pads the
    drained batch to the nearest bucket size, and runs it as one
    generate_batch call on a dedicated worker thread.

    When the pipeline carries a device mesh (pipeline.mesh), every bucket is
    a multiple of the mesh size so generate_batch's data-parallel sharding
    always engages: a bucket batch is split over the mesh's `data` axis and
    the whole encode+denoise+decode graph runs SPMD across the chips —
    serving throughput scales with the slice, one HTTP frontend."""

    def __init__(self, pipeline, max_batch: int = 4, window_ms: float = 30.0):
        self.pipeline = pipeline
        mesh = getattr(pipeline, "mesh", None)
        if mesh is not None:
            # bucket multiples track the DATA axis only — a model (tensor-
            # parallel) axis replicates the batch, it doesn't shard it
            from ..parallel import data_axis_size
            self.mesh_size = data_axis_size(mesh)
        else:
            self.mesh_size = 1
        if self.mesh_size > 1:
            # buckets {D, 2D, 4D, ...}: never run a graph the mesh can't
            # shard (max_batch is rounded up to at least one full mesh row)
            max_batch = max(max_batch, self.mesh_size)
            max_batch = -(-max_batch // self.mesh_size) * self.mesh_size
            self.buckets = [b * self.mesh_size
                            for b in _buckets(max_batch // self.mesh_size)]
        else:
            self.buckets = _buckets(max_batch)
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

    def warmup(self, image_size: int = None):
        """Compile every bucket's graph up front so no live request ever
        waits on XLA (first compiles take tens of seconds through a remote
        tunnel). Idempotent; uses the persistent compile cache.

        image_size defaults to the pipeline's configured height so the
        warmed graphs match the serving config without the caller having
        to thread the dimension through."""
        if image_size is None:
            image_size = self.pipeline.config.height
        dummy = Image.fromarray(
            np.full((image_size, image_size, 3), 127, np.uint8))
        for b in self.buckets:
            self.pipeline.generate_batch(
                ["warmup"] * b, [dummy] * b, negative_prompts=[""] * b,
                seeds=list(range(b)))

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

    def _bucket_size(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _submit_batch(self, batch):
        """Enqueue one padded batch on the device; returns a zero-arg
        resolver that fetches results and wakes the waiting requests."""
        n = len(batch)
        size = self._bucket_size(n)
        padded = batch + [batch[-1]] * (size - n)
        try:
            finish = self.pipeline.generate_batch_async(
                [r.prompt for r in padded],
                [r.image for r in padded],
                negative_prompts=[r.negative for r in padded],
                seeds=[r.seed for r in padded])
        except Exception as e:  # noqa: BLE001
            finish, err = None, str(e)

        def resolve():
            try:
                if finish is None:
                    raise RuntimeError(err)
                images = finish()
                for i, r in enumerate(batch):
                    r.result = images[i]
                    r.batch_size = n
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    r.error = str(e)
            self.batches_run += 1
            self.requests_served += n
            for r in batch:
                r.event.set()

        return resolve

    def _worker(self):
        # one batch in flight + one being prepared: while the device runs
        # batch i, batch i+1 is drained, host-prepared, and enqueued, and
        # only then is batch i fetched — the device never idles between
        # batches on host prepare or output transfer
        pending = None
        while not self._stop:
            if pending is None:
                self._wake.wait(timeout=0.1)
            if self._stop:
                break
            # collection window: let concurrent requests pile up
            time.sleep(self.window_ms / 1000.0)
            self._wake.clear()
            batch = self._drain()
            nxt = self._submit_batch(batch) if batch else None
            if pending is not None:
                pending()
            pending = nxt
        if pending is not None:
            pending()

    def stop(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=2)


def _load_image(b64: str, max_px: int = MAX_IMAGE_PX) -> Image.Image:
    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    w, h = img.size  # size comes from the header, before full decode
    if w > max_px or h > max_px:
        raise ValueError(f"image {w}x{h} exceeds {max_px}px limit")
    img.load()
    return img


def make_handler(batcher: MicroBatcher, max_body: int = MAX_BODY_BYTES,
                 max_image_px: int = MAX_IMAGE_PX):
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
                if n > max_body:
                    return self._json(413, {
                        "error": f"body {n} exceeds {max_body} bytes"})
                payload = json.loads(self.rfile.read(n))
                image = _load_image(payload["image_b64"], max_image_px)
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
          window_ms: float = 30.0, host: str = "127.0.0.1",
          warmup: bool = False, max_body: int = MAX_BODY_BYTES,
          max_image_px: int = MAX_IMAGE_PX):
    batcher = MicroBatcher(pipeline, max_batch, window_ms)
    if warmup:
        batcher.warmup()
    server = ThreadingHTTPServer(
        (host, port), make_handler(batcher, max_body, max_image_px))
    return server, batcher


def main(argv=None):
    from .infer import build_parser

    p = build_parser()
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; 0.0.0.0 only behind a real ingress "
                        "(this server has no auth)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--window-ms", type=float, default=30.0)
    p.add_argument("--max-body", type=int, default=MAX_BODY_BYTES)
    p.add_argument("--max-image-px", type=int, default=MAX_IMAGE_PX)
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling all batch buckets at startup")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel serving over N devices (1 = single "
                        "device, 0 = all visible devices): batch buckets "
                        "become multiples of N and each bucket is sharded "
                        "over a jax Mesh data axis")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel UNet over N devices per replica "
                        "(attention/FF kernels split over the mesh model "
                        "axis, XLA SPMD collectives ride ICI). Composes "
                        "with --dp: dp*tp devices total. Latency lever for "
                        "big shapes (SDXL 1024px); --dp is the throughput "
                        "lever")
    p.add_argument("--calib-image", action="append", default=None,
                   help="--quant int8_static: representative identity "
                        "image for startup activation-scale calibration "
                        "(pipeline.calibrate_int8). Repeatable — scales "
                        "are max-merged over all given images (multi-"
                        "sample calibration is robust to per-image "
                        "activation outliers). Required for int8_static "
                        "unless --act-scales is given")
    p.add_argument("--calib-prompt",
                   default="a photo of a person, portrait, high quality",
                   help="--quant int8_static: calibration prompt")
    p.add_argument("--act-scales", default=None,
                   help="--quant int8_static: load calibrated activation "
                        "scales from this .npz artifact instead of "
                        "calibrating at startup (io.quant_scales)")
    p.add_argument("--save-act-scales", default=None,
                   help="--quant int8_static: after startup calibration, "
                        "persist the scales to this .npz so restarts / "
                        "other replicas serve via --act-scales without "
                        "re-calibrating")
    args, _ = p.parse_known_args(argv)
    if (args.quant == "int8_static" and not args.calib_image
            and not args.act_scales):
        p.error("--quant int8_static requires --calib-image (activation "
                "scales are calibrated at startup) or --act-scales (a "
                "saved calibration artifact)")

    from ..core.cache import enable_compilation_cache
    from ..core.config import PipelineConfig
    from ..pipelines.loading import load_sd15_consistentid

    enable_compilation_cache()
    mesh = None
    if args.dp != 1 or args.tp != 1:
        import jax

        from ..parallel import make_mesh
        if args.dp == 0:
            devs = jax.devices()
            if args.tp > 1 and len(devs) % args.tp:
                devs = devs[: len(devs) - len(devs) % args.tp]
        else:
            devs = jax.devices()[: args.dp * args.tp]
        if len(devs) > 1:
            mesh = make_mesh(devs, model=args.tp)
    load_quant = "none" if args.quant == "int8_static" else args.quant
    pipe = load_sd15_consistentid(
        args.base, consistentid_path=args.consistentid,
        image_encoder_path=args.image_encoder, bisenet_path=args.bisenet,
        arcface_path=args.arcface, quant=load_quant, mesh=mesh,
        pipeline_config=PipelineConfig(
            height=args.height, width=args.width,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            start_merge_step=args.start_merge_step,
            cache_interval=args.cache_interval))
    if args.quant == "int8_static":
        if args.act_scales:
            from ..io.quant_scales import load_act_scales
            print(f"loading int8 activation scales from {args.act_scales}")
            pipe = pipe.with_quant("int8_static",
                                   act_scales=load_act_scales(args.act_scales))
        else:
            print("calibrating int8 activation scales on "
                  f"{', '.join(args.calib_image)}")
            pipe = pipe.calibrate_int8(samples=[
                (args.calib_prompt, Image.open(im))
                for im in args.calib_image])
            if args.save_act_scales:
                from ..io.quant_scales import save_act_scales
                save_act_scales(args.save_act_scales,
                                pipe.bundle.act_scales)
                print(f"saved act scales -> {args.save_act_scales}")
    server, batcher = serve(pipe, args.port, args.max_batch, args.window_ms,
                            host=args.host, max_body=args.max_body,
                            max_image_px=args.max_image_px)
    if not args.no_warmup:
        print(f"warming up buckets {batcher.buckets} ...")
        batcher.warmup(image_size=args.height)
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
