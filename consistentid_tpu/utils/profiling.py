"""Tracing / profiling / metrics observability.

Strict upgrade over the reference's wall-clock prints (train.py:212-282,
SURVEY.md §5 "Tracing/profiling: none beyond prints"):
  - `trace(...)`: jax.profiler trace context (view in XProf/TensorBoard)
  - `annotate(...)`: named TraceAnnotation for device timeline spans
  - `StepTimer`: rolling per-step wall-clock with data-load split
  - `MetricsLogger`: JSONL metrics sink, process-0 gated (the reference's
    is_main_process print gating), optional TensorBoard via flax.metrics.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span on the profiler timeline (NVTX-range analogue)."""
    return jax.profiler.TraceAnnotation(name)


# Peak dense bf16/fp16 TFLOP/s per chip, by jax device_kind substring
# (public spec-sheet numbers; first match wins, checked in order).
_PEAK_TFLOPS = (
    ("v6", 918.0),        # Trillium / v6e
    ("v5p", 459.0),
    ("v5", 197.0),        # v5e reports device_kind "TPU v5 lite"/"TPU v5e"
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def device_peak_tflops(device=None) -> Optional[float]:
    """Peak bf16 TFLOP/s of one chip, or None when unknown (e.g. CPU).

    The MFU denominator: mfu = achieved_flops / sec / (peak * 1e12)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind and device.platform != "tpu":
        return None
    for key, tflops in _PEAK_TFLOPS:
        if key in kind:
            return tflops
    return None


def mfu(flops_per_call: float, seconds_per_call: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization of one chip for a timed executable."""
    peak = device_peak_tflops(device)
    if not peak or seconds_per_call <= 0 or not flops_per_call:
        return None
    return flops_per_call / seconds_per_call / (peak * 1e12)


class StepTimer:
    """Per-step timing with a separate data-loading bucket."""

    def __init__(self, window: int = 50):
        self.step_times = deque(maxlen=window)
        self.data_times = deque(maxlen=window)
        self._t = time.perf_counter()

    def data_loaded(self):
        now = time.perf_counter()
        self.data_times.append(now - self._t)
        self._t = now

    def step_done(self):
        now = time.perf_counter()
        self.step_times.append(now - self._t)
        self._t = now

    def summary(self) -> Dict[str, float]:
        avg = lambda d: sum(d) / len(d) if d else 0.0
        return {"step_time_s": avg(self.step_times),
                "data_time_s": avg(self.data_times)}


class MetricsLogger:
    """JSONL metrics stream + console line + optional TensorBoard scalars,
    gated to process 0 (the reference plumbs report_to=tensorboard but never
    writes scalars, utils.py:309-313 / SURVEY.md §5)."""

    def __init__(self, log_dir: Optional[str] = None, echo: bool = True,
                 tensorboard: bool = True):
        self.is_main = jax.process_index() == 0
        self.echo = echo
        self._f = None
        self._tb = None
        if log_dir and self.is_main:
            os.makedirs(log_dir, exist_ok=True)
            self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from flax.metrics.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(
                        os.path.join(log_dir, "tensorboard"))
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: Dict):
        if not self.is_main:
            return
        rec = {"step": int(step),
               **{k: float(v) for k, v in metrics.items()}}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.scalar(k, v, step=rec["step"])
        if self.echo:
            parts = " ".join(f"{k}={v:.5g}" for k, v in rec.items()
                             if k != "step")
            print(f"step {rec['step']}: {parts}")

    def close(self):
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
