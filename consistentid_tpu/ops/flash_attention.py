"""Pallas TPU flash attention (blockwise online-softmax).

This is the TPU-native replacement for the reference's xformers
memory_efficient_attention / F.scaled_dot_product_attention fast paths
(reference attention.py:152-158,259,272). The UNet self-attention at 512px
runs Sq = Sk = 4096 with head_dim 40; at SDXL resolutions Sk reaches ~17k —
materializing (Sq, Sk) probs in fp32 blows past VMEM, so we do the standard
streaming-softmax accumulation over key blocks.

Layout notes (TPU):
  - head_dim is NOT padded in HBM: an (block, d) row-slice is one contiguous
    DMA and Mosaic pads the rows to the 128-lane tile inside VMEM only.
    (Padding d in HBM — the first design — materialized 3.2x-sized q/k/v/o
    copies for SD1.5's d=40; profiled at 33% of the UNet step.)
  - grid = (batch*heads, q_blocks); full K/V for one head live in VMEM
    (worst case 4096 x 256 x 2B x 2 = 4 MB, fits the ~16 MB budget).
  - softmax statistics are fp32; the q @ k and p @ v matmuls accumulate fp32
    on the MXU via preferred_element_type.
  - the fp32 casts before the dots are deliberate (measured): with d=40/80
    these matmuls are narrow, so the kernel is VPU/exp-bound, not MXU-bound.
    Switching the MXU inputs to bf16 (and casting p back to bf16 for p @ v)
    was A/B-tested e2e on v5e and came out ~2% SLOWER (57.2 -> 55.8
    img/min/chip): the extra (block_q, block_k)-sized p cast on the VPU
    costs more than the fp32->bf16 MXU pass savings at these shapes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _check_kv_vmem_budget(sk_p: int, d: int, dtype,
                          budget_bytes: int = 100 * 1024 * 1024) -> None:
    """Actionable error instead of a Mosaic allocation failure.

    The kernel keeps one head's FULL (padded) K and V in VMEM,
    double-buffered, and Mosaic pads the minor dim to the 128-lane tile —
    so a degenerate shape like seq 65k at d=16 fp32 wants
    65536*128*4B*2*2 = 128 MB of VMEM and dies deep inside Mosaic."""
    lane_d = _round_up(d, 128)
    need = 2 * 2 * sk_p * lane_d * jnp.dtype(dtype).itemsize
    if need > budget_bytes:
        raise ValueError(
            f"flash_attention: K/V for one head needs ~{need >> 20} MiB of "
            f"VMEM (seq {sk_p} x lane-padded head_dim {lane_d}, "
            f"{jnp.dtype(dtype).name}, double-buffered), over the "
            f"{budget_bytes >> 20} MiB budget. Reduce sequence length, use "
            "bf16 inputs, or fall back to XLA attention "
            "(dot_product_attention(..., use_flash=False)).")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float,
                  kv_len: int):
    """One (head, q-block) program: stream K/V blocks with online softmax.

    q_ref: (1, block_q, d)  k_ref/v_ref: (1, padded_kv, d)  o_ref: (1, block_q, d)
    kv_len is the true (unpadded) key length — static at trace time.
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale          # (bq, d)
    block_q, d = q.shape
    padded_kv = k_ref.shape[1]
    num_kb = padded_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, bk)
        if padded_kv != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)        # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                            # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)                   # (bq, 1)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, d)
        acc = acc * alpha + pv
        return acc, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_diff(q, k, v, sm_scale, block_q, block_k):
    return _flash_forward(q, k, v, sm_scale, block_q=block_q,
                          block_k=block_k)


def _flash_diff_fwd(q, k, v, sm_scale, block_q, block_k):
    out, lse = _flash_forward_lse(q, k, v, sm_scale, block_q=block_q,
                                  block_k=block_k)
    return out, (q, k, v, out, lse)


def _flash_diff_bwd(sm_scale, block_q, block_k, res, g):
    """Blockwise Pallas backward (standard flash-attention bwd): one kernel
    sweep over q blocks for dQ, one over k blocks for dK/dV, recomputing
    probabilities from the saved logsumexp — (Sq, Sk) probs never touch HBM
    (the guide's §7 pattern)."""
    q, k, v, out, lse = res
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dq, dk, dv = _flash_backward(q, k, v, g, lse, delta, sm_scale)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    *,
    block_q: int = 256,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable entry point (custom VJP: flash fwd, recompute bwd).

    block_k=None auto-sizes to the whole (padded) key length, capped at 4096:
    one K/V pass per q block means no online-softmax rescale rounds and the
    biggest MXU passes (A/B on v5e: 24% faster than block_k=512 at SD1.5's
    level-0 self-attention, 8x4096x4096xd40)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if block_k is None:
        block_k = min(_round_up(k.shape[2], 128), 4096)
    if interpret:
        return _flash_forward(q, k, v, sm_scale, block_q=block_q,
                              block_k=block_k, interpret=interpret)
    return _flash_diff(q, k, v, sm_scale, block_q, block_k)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_k", "interpret"))
def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    *,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention, shapes (B, H, S, D) -> (B, H, Sq, D).

    No mask support: ConsistentID attention is always full/bidirectional with
    static shapes (text context is padded to 77+num_ip tokens *before* the
    kernel; key padding added here for tile alignment is masked internally).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    # head_dim is NOT padded in HBM: Mosaic pads the 40/80-lane rows to the
    # 128-lane tile inside VMEM, and an (block, d) row-slice stays one
    # contiguous DMA. Padding here (the old scheme) materialized 3.2x-sized
    # q/k/v/o copies in HBM for SD1.5's d=40 — pure bandwidth waste
    # (profiled: level-0 attention was 33% of the UNet step).
    d_p = d

    if not interpret:
        _check_kv_vmem_budget(sk_p, d_p, q.dtype)

    qf = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
    qf = qf.reshape(b * h, sq_p, d_p)
    kf = kf.reshape(b * h, sk_p, d_p)
    vf = vf.reshape(b * h, sk_p, d_p)

    grid = (b * h, sq_p // block_q)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, sm_scale=sm_scale, kv_len=sk)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * sk_p * d_p,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_p * sk_p,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(b, h, sq_p, d_p)[:, :, :sq, :d]


# -- differentiable path: forward with logsumexp + blockwise backward ---------

def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                          block_k: int, sm_scale: float, kv_len: int):
    """Forward that also emits per-row logsumexp for the backward."""
    q = q_ref[0].astype(jnp.float32) * sm_scale
    block_q, d = q.shape
    padded_kv = k_ref.shape[1]
    num_kb = padded_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if padded_kv != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return acc, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))      # (bq, 1)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, block_k: int, sm_scale: float,
                         kv_len: int):
    """dQ for one q block: stream K/V, recompute p from lse."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (bq, 1)
    delta = delta_ref[0]      # (bq, 1)
    block_q, d = q.shape
    padded_kv = k_ref.shape[1]
    num_kb = padded_kv // block_k

    def body(i, dq):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if padded_kv != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + i * block_k < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)                                  # (bq, bk)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bq, bk)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb,
                           body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, block_q: int, sm_scale: float,
                          kv_len: int, padded_kv: int):
    """dK/dV for one k block: stream Q/dO blocks. Zero-padded q rows carry
    zero dO and delta, so they contribute nothing without extra masks."""
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    block_k, d = k_blk.shape
    padded_q = q_ref.shape[1]
    num_qb = padded_q // block_q
    kb = pl.program_id(1)

    def body(j, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(j * block_q, block_q), :]      # (bq, 1)
        delta = delta_ref[0, pl.ds(j * block_q, block_q), :]  # (bq, 1)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # (bq, bk)
        if padded_kv != kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col + kb * block_k < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bk, d)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bq, bk)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bk, d)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, num_qb, body, (jnp.zeros((block_k, d), jnp.float32),
                          jnp.zeros((block_k, d), jnp.float32)))
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_attn(q, k, v, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq = min(block_q, _round_up(sq, 128))
    bk = min(block_k, _round_up(sk, 128))
    # d unpadded: Mosaic pads rows to the 128-lane tile inside VMEM only
    sq_p, sk_p, d_p = _round_up(sq, bq), _round_up(sk, bk), d
    pad3 = lambda t, s_p: jnp.pad(
        t, ((0, 0), (0, 0), (0, s_p - t.shape[2]), (0, d_p - d))).reshape(
        b * h, s_p, d_p)
    return pad3(q, sq_p), pad3(k, sk_p), pad3(v, sk_p), bq, bk, sq_p, sk_p, d_p


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "block_q", "block_k",
                                    "interpret"))
def _flash_forward_lse(q, k, v, sm_scale, *, block_q: int = 256,
                       block_k: int = 512, interpret: bool = False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf, kf, vf, bq, bk, sq_p, sk_p, d_p = _pad_attn(q, k, v, block_q, block_k)
    if not interpret:
        _check_kv_vmem_budget(sk_p, d_p, q.dtype)
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_lse_kernel, block_k=bk,
                          sm_scale=sm_scale, kv_len=sk),
        grid=(b * h, sq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
                   jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(qf, kf, vf)
    return (out.reshape(b, h, sq_p, d_p)[:, :, :sq, :d],
            lse.reshape(b, h, sq_p)[:, :, :sq])  # caller sees (b, h, sq)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "block_q", "block_k",
                                    "interpret"))
def _flash_backward(q, k, v, do, lse, delta, sm_scale, *, block_q: int = 256,
                    block_k: int = 512, interpret: bool = False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf, kf, vf, bq, bk, sq_p, sk_p, d_p = _pad_attn(q, k, v, block_q, block_k)
    if not interpret:
        # dQ streams full K/V; dK/dV streams full Q/dO — both sides bound
        _check_kv_vmem_budget(max(sk_p, sq_p), d_p, q.dtype)
    dof = jnp.pad(do, ((0, 0), (0, 0), (0, sq_p - sq),
                       (0, d_p - d))).reshape(b * h, sq_p, d_p)
    lsef = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq))).reshape(
        b * h, sq_p, 1)
    deltaf = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq))).reshape(
        b * h, sq_p, 1)
    common = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=bk,
                          sm_scale=sm_scale, kv_len=sk),
        grid=(b * h, sq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d_p), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), jnp.float32),
        **common,
    )(qf, kf, vf, dof, lsef, deltaf)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=bq,
                          sm_scale=sm_scale, kv_len=sk, padded_kv=sk_p),
        grid=(b * h, sk_p // bk),
        in_specs=[
            pl.BlockSpec((1, bk, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, d_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, 1), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, 1), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_p), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, sk_p, d_p), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, sk_p, d_p), jnp.float32)),
        **common,
    )(kf, vf, qf, dof, lsef, deltaf)

    unpad_q = lambda t: t.reshape(b, h, sq_p, d_p)[:, :, :sq, :d]
    unpad_k = lambda t: t.reshape(b, h, sk_p, d_p)[:, :, :sk, :d]
    return unpad_q(dq), unpad_k(dk), unpad_k(dv)
