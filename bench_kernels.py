"""Kernel microbenchmarks: Pallas flash attention vs XLA attention, and the
fused BN+act kernel, at the shapes the SD1.5/SDXL UNets actually run.

NOTE: through a remote-TPU tunnel, per-op timings are unreliable (async
dispatch hides device time); this tool chains N dependent iterations inside
one jit so device time dominates, and cross-checks against the end-to-end
A/B (CONSISTENTID_DISABLE_FLASH=1 python bench.py), which is the number that
counts. Not run by the driver — bench.py is the tracked benchmark.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def chain_time(fn, args, n=50):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            return fn(c, k, v), None
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out

    q, k, v = args
    jax.block_until_ready(run(q, k, v))
    # perturb q for the timed call: the remote-execution tunnel memoizes
    # repeated identical executions, which would report dispatch time only
    t0 = time.perf_counter()
    jax.block_until_ready(run(q + 1e-3, k, v))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--batch-scale", type=int, default=1,
                   help="multiply the CFG-pair batch (4 = serving batch 4)")
    args = p.parse_args()

    from consistentid_tpu.ops import flash_attention, reference_attention

    # (batch*CFG, heads, seq, head_dim) at SD1.5 512px / SDXL 1024px levels
    shapes = [
        ("sd15-l0-self", (2, 8, 4096, 4096, 40)),
        ("sd15-l1-self", (2, 8, 1024, 1024, 80)),
        ("sd15-cross", (2, 8, 4096, 81, 40)),
        ("sdxl-l1-self", (2, 10, 4096, 4096, 64)),
        ("sdxl-l2-self", (2, 20, 1024, 1024, 64)),
    ]
    results = {}
    for name, (b, h, sq, sk, d) in shapes:
        b *= args.batch_scale
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k0, (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(k1, (b, h, sk, d), jnp.bfloat16)
        v = jax.random.normal(k2, (b, h, sk, d), jnp.bfloat16)
        if sq != sk:
            # chained-q trick needs out shape == q shape; time separately
            f = jax.jit(flash_attention)
            r = jax.jit(reference_attention)
            jax.block_until_ready(f(q, k, v))
            jax.block_until_ready(r(q, k, v))
            # perturb q per iter: the tunnel memoizes identical executions
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = f(q + (i + 1) * 1e-4, k, v)
                jax.block_until_ready(out)
            tf = (time.perf_counter() - t0) / args.iters
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = r(q + (i + 1) * 1e-4, k, v)
                jax.block_until_ready(out)
            tr = (time.perf_counter() - t0) / args.iters
        else:
            tf = chain_time(flash_attention, (q, k, v), args.iters)
            tr = chain_time(reference_attention, (q, k, v), args.iters)
        results[name] = {"flash_ms": round(tf * 1e3, 4),
                         "xla_ms": round(tr * 1e3, 4)}
        print(name, results[name])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
