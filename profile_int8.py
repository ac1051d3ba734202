"""One-off probe: is int8 MXU throughput reachable from XLA on this chip?

Times a scanned conv stack and a scanned matmul stack at SD1.5-like shapes in
bf16 vs int8 (dynamic symmetric activation quant + per-channel weight quant,
accumulate int32, dequant fp32). Whole-graph methodology (vary input per
iteration, fetch a scalar) per the tunnel rules in ROUND_NOTES. Not
driver-tracked.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from consistentid_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def timed(fn, x):
    out = fn(x)          # compile
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(x + jnp.float32(i) * 1e-6)
        s = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    return dt


def quant_sym(x, axis):
    """Symmetric int8 quantization along all-but-`axis` (per-channel)."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def conv_probe(dtype_tag):
    B, H, W, C = 4, 32, 32, 640
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.02
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    if dtype_tag == "bf16":
        wc = w.astype(jnp.bfloat16)

        def body(h, _):
            y = jax.lax.conv_general_dilated(
                h.astype(jnp.bfloat16), wc, (1, 1), "SAME",
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return (y * (1.0 / jnp.sqrt(jnp.float32(C) * 9.0))).astype(
                jnp.float32), None
    else:
        wq, wscale = quant_sym(w, axis=(0, 1, 2))   # per-out-channel

        def body(h, _):
            hq, hscale = quant_sym(h, axis=(1, 2, 3))  # per-image
            y = jax.lax.conv_general_dilated(
                hq, wq, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * hscale * wscale.reshape(1, 1, 1, C)
            return y * (1.0 / jnp.sqrt(jnp.float32(C) * 9.0)), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(y)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.float32)
    dt = timed(run, x)
    flops = 2 * STEPS * B * H * W * C * C * 9
    print(f"conv {dtype_tag:5s}: {dt*1e3:8.2f} ms  "
          f"{flops/dt/1e12:6.1f} TOP/s")
    return dt


def matmul_probe(dtype_tag):
    M, K, N = 4 * 4096, 640, 640
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02

    if dtype_tag == "bf16":
        wc = w.astype(jnp.bfloat16)

        def body(h, _):
            y = jnp.dot(h.astype(jnp.bfloat16), wc,
                        preferred_element_type=jnp.float32)
            return (y * (1.0 / jnp.sqrt(jnp.float32(K)))).astype(
                jnp.float32), None
    else:
        wq, wscale = quant_sym(w, axis=(0,))

        def body(h, _):
            hq, hscale = quant_sym(h, axis=(1,))
            y = jax.lax.dot_general(
                hq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * hscale * wscale.reshape(1, N)
            return y * (1.0 / jnp.sqrt(jnp.float32(K))), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.sum(y)

    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    dt = timed(run, x)
    flops = 2 * STEPS * M * K * N
    print(f"mm   {dtype_tag:5s}: {dt*1e3:8.2f} ms  "
          f"{flops/dt/1e12:6.1f} TOP/s")
    return dt


def main():
    print("devices:", jax.devices())
    tb = conv_probe("bf16")
    ti = conv_probe("int8")
    print(f"conv int8 speedup: {tb/ti:.2f}x")
    tb = matmul_probe("bf16")
    ti = matmul_probe("int8")
    print(f"mm   int8 speedup: {tb/ti:.2f}x")


if __name__ == "__main__":
    main()
