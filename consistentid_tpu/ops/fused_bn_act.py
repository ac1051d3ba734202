"""Fused BatchNorm + activation, Pallas TPU kernel + cross-chip sync variant.

TPU-native equivalent of the reference's InPlaceABN CUDA extension
(models/BiSeNet/modules/src/inplace_abn_cuda.cu: mean_var_kernel,
forward_kernel; dispatch inplace_abn.cpp:7-56) and its distributed
InPlaceABNSync all-reduce of batch moments
(models/BiSeNet/modules/functions.py:163-184):

  - `fused_bn_act` is a two-pass Pallas kernel over NHWC tensors: pass 1
    accumulates per-channel sum / sum-of-squares tiles (the counterpart of
    the CUDA warp-shuffle tree reduction, inplace_abn.h:54-88), pass 2
    normalizes + applies the affine transform and activation in one VMEM
    round-trip — the "in-place" property of the reference translates to
    never materializing the normalized-but-unactivated tensor in HBM.
  - `sync_batch_norm_act` wraps it with jax.lax.psum of the local moments
    over a mesh axis: cross-chip SyncBN riding ICI, no NCCL analogue needed.

For training-time autodiff use flax nn.BatchNorm(axis_name=...) (same math,
XLA-fused); this kernel is the inference/serving fast path and the explicit
native-component parity item.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _moments_kernel(x_ref, sum_ref, sq_ref, *, rows: int):
    """Accumulate per-channel sum / sum-of-squares over row blocks.

    x_ref: (1, block_rows, C); outputs (1, C) accumulated across the grid's
    row dimension (TPU grid iterations over one core run sequentially, so
    read-modify-write accumulation across steps is safe)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    block_rows = x_ref.shape[1]
    row0 = i * block_rows
    x = x_ref[0].astype(jnp.float32)
    if rows % block_rows != 0:
        ridx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(ridx + row0 < rows, x, 0.0)
    sum_ref[0, :] += jnp.sum(x, axis=0)
    sq_ref[0, :] += jnp.sum(x * x, axis=0)


def _normalize_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, o_ref,
                      *, activation: str, slope: float):
    x = x_ref[0].astype(jnp.float32)
    y = (x - mean_ref[0, :]) * inv_ref[0, :] * scale_ref[0, :] + bias_ref[0, :]
    if activation == "leaky_relu":
        y = jnp.where(y >= 0, y, y * slope)
    elif activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif activation == "silu":
        y = y * jax.nn.sigmoid(y)
    elif activation != "identity":
        raise ValueError(activation)
    o_ref[0] = y.astype(o_ref.dtype)


def batch_moments(x: jax.Array, *, block_rows: int = 512,
                  interpret: bool = False):
    """Per-channel (mean, var) of an NHWC tensor via the Pallas reduction."""
    b, h, w, c = x.shape
    rows = b * h * w
    c_p = _round_up(c, 128)
    xf = jnp.pad(x.reshape(rows, c), ((0, 0), (0, c_p - c)))
    rows_p = _round_up(rows, block_rows)
    xf = jnp.pad(xf, ((0, rows_p - rows), (0, 0)))[None]

    sums, sqs = pl.pallas_call(
        functools.partial(_moments_kernel, rows=rows),
        grid=(1, rows_p // block_rows),
        in_specs=[pl.BlockSpec((1, block_rows, c_p),
                               lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, c_p), lambda g, i: (g, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c_p), lambda g, i: (g, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, c_p), jnp.float32),
                   jax.ShapeDtypeStruct((1, c_p), jnp.float32)),
        interpret=interpret,
    )(xf)
    mean = sums[0, :c] / rows
    var = sqs[0, :c] / rows - mean * mean
    return mean, var


def apply_bn_act(x: jax.Array, mean: jax.Array, var: jax.Array,
                 scale: jax.Array, bias: jax.Array, *, eps: float = 1e-5,
                 activation: str = "leaky_relu", slope: float = 0.01,
                 block_rows: int = 512, interpret: bool = False) -> jax.Array:
    """Normalize + affine + activation in one fused pass."""
    b, h, w, c = x.shape
    rows = b * h * w
    c_p = _round_up(c, 128)
    rows_p = _round_up(rows, block_rows)
    xf = jnp.pad(x.reshape(rows, c), ((0, rows_p - rows), (0, c_p - c)))[None]

    def pad_c(v):
        return jnp.pad(v.astype(jnp.float32), (0, c_p - c))[None]

    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    out = pl.pallas_call(
        functools.partial(_normalize_kernel, activation=activation,
                          slope=slope),
        grid=(1, rows_p // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, c_p), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_p), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_p), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_p), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_p), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c_p), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, rows_p, c_p), x.dtype),
        interpret=interpret,
    )(xf, pad_c(mean), pad_c(inv), pad_c(scale), pad_c(bias))
    return out[0, :rows, :c].reshape(b, h, w, c)


def fused_bn_act(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                 eps: float = 1e-5, activation: str = "leaky_relu",
                 slope: float = 0.01, interpret: bool = False):
    """Single-device fused train-mode BN+act (InPlaceABN equivalent).
    Returns (y, mean, var) — moments are needed for running-stat updates."""
    mean, var = batch_moments(x, interpret=interpret)
    y = apply_bn_act(x, mean, var, scale, bias, eps=eps,
                     activation=activation, slope=slope, interpret=interpret)
    return y, mean, var


def sync_batch_norm_act(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                        axis_name: str, eps: float = 1e-5,
                        activation: str = "leaky_relu", slope: float = 0.01,
                        interpret: bool = False):
    """Cross-chip SyncBN: psum of local moments over `axis_name` (the
    reference's dist.all_reduce of mean/var, modules/functions.py:163-184),
    then the fused normalize+activation kernel on each shard."""
    mean, var = batch_moments(x, interpret=interpret)
    n = jax.lax.psum(jnp.ones((), jnp.float32), axis_name)
    g_mean = jax.lax.psum(mean, axis_name) / n
    # var of the union = E[x^2] - E[x]^2 across shards
    g_sq = jax.lax.psum(var + mean * mean, axis_name) / n
    g_var = g_sq - g_mean * g_mean
    y = apply_bn_act(x, g_mean, g_var, scale, bias, eps=eps,
                     activation=activation, slope=slope, interpret=interpret)
    return y, g_mean, g_var
