"""Int8 W8A8 dynamic quantization for the denoise path (TPU MXU int8).

TPU v5e's MXU runs int8xint8->int32 at 2x the bf16 rate (394 vs 197 TOPS
peak); measured on this chip via profile_int8.py, an SD1.5-shaped conv stack
sustains ~176 TOP/s in int8 *including* the dynamic-quant overhead vs the
~100-120 TFLOP/s the bf16 UNet convs achieve — a ~1.4-1.5x kernel-level win.

Scheme (the standard W8A8 dynamic recipe, cf. SmoothQuant/Q-Diffusion):
- weights: symmetric per-output-channel int8, quantized from the (LoRA-
  folded) bf16 kernels ONCE per generate() call inside the jitted graph —
  the 50-step denoise scan amortizes it and `lora_scale` stays traced;
- activations: symmetric dynamic per-example (convs) / per-token (matmuls)
  int8 computed on the fly; scales stay fp32;
- accumulation: int32 on the MXU, dequantized to fp32, bias added, cast to
  the compute dtype.

The reference has no quantized path at all (torch fp16 via diffusers,
pipline_StableDiffusion_ConsistentID.py:36-57); this is a TPU-native
serving differentiator, opt-in via `quant="int8"` on the bundle/loaders.
First/last convs, norms, time embeddings and the decoupled-IP projections
stay in bf16 (the usual quality-sensitive exclusions).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quantize_symmetric(x: jax.Array, axis, keepdims: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization: q = round(x/scale) clipped to [-127,127],
    scale = amax/127 reduced over `axis` (everything-but-channel for
    per-channel weights; everything-but-batch/token for activations)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    if not keepdims:
        scale = jnp.squeeze(scale, axis=axis)
    return q, scale


def quantize_conv_kernel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """HWIO conv kernel -> (int8 HWIO, (O,) fp32 per-out-channel scale)."""
    return quantize_symmetric(w, axis=(0, 1, 2))


def quantize_dense_kernel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(I, O) dense kernel -> (int8 (I, O), (O,) fp32 scale)."""
    return quantize_symmetric(w, axis=(0,))


def quantize_with_scale(x: jax.Array, scale) -> jax.Array:
    """Quantize with a FIXED (calibrated) scale: q = round(x/scale) clipped.
    The static twin of `quantize_symmetric` — no amax reduction, which is
    the bandwidth-bound prologue that made dynamic int8 a net loss at SDXL
    1024px (ROUND_NOTES r4 accelerator table)."""
    xf = x.astype(jnp.float32)
    return jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)


def int8_conv_quantized(xq: jax.Array, xscale, kernel_q: jax.Array,
                        kernel_scale: jax.Array, strides, padding
                        ) -> jax.Array:
    """Conv of already-quantized activations: int8 x int8 -> int32 on the
    MXU, dequantized by xscale * per-out-channel kernel_scale."""
    dn = lax.conv_dimension_numbers(xq.shape, kernel_q.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        xq, kernel_q, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    # (B,1,1,1) * (Cout,) broadcasts to (B, H', W', Cout)
    return y.astype(jnp.float32) * (xscale * kernel_scale)


def int8_matmul_quantized(xq: jax.Array, xscale, kernel_q: jax.Array,
                          kernel_scale: jax.Array) -> jax.Array:
    y = lax.dot_general(
        xq, kernel_q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xscale * kernel_scale)


def int8_conv(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
              strides, padding) -> jax.Array:
    """NHWC conv with dynamic per-example activation quant.

    x: (B, H, W, Cin) float; kernel_q: (kh, kw, Cin, Cout) int8;
    kernel_scale: (Cout,) fp32. Returns fp32 (B, H', W', Cout).
    """
    xq, xscale = quantize_symmetric(x, axis=(1, 2, 3), keepdims=True)
    return int8_conv_quantized(xq, xscale, kernel_q, kernel_scale,
                               strides, padding)


def int8_matmul(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array
                ) -> jax.Array:
    """x (..., Cin) @ kernel_q (Cin, Cout) with dynamic per-token activation
    quant (amax over the contraction axis). Returns fp32 (..., Cout)."""
    xq, xscale = quantize_symmetric(x, axis=(x.ndim - 1,), keepdims=True)
    return int8_matmul_quantized(xq, xscale, kernel_q, kernel_scale)


def quantize_params_like(target: Any, params: Dict,
                         act_scales: Any = None) -> Dict:
    """Rewrite a float param tree into the layout a quant=True model expects.

    `target` is the nested-dict param structure (ShapeDtypeStruct leaves,
    from jax.eval_shape over the quant model's init); `params` is the
    source float tree (same module names, `kernel` where the target has
    `kernel_q`/`kernel_scale`). Leaves present in both are passed through;
    `kernel_q`+`kernel_scale` pairs are produced from the source `kernel`
    with per-out-channel symmetric quantization (HWIO convs reduce over
    (0,1,2); (I,O) denses over (0,)). jnp math - safe to call inside jit.

    A static-activation target (layers built with quant="static") also has
    per-layer `act_scale` leaves; these are taken from `act_scales`, a
    nested dict with the same module paths (from `act_scales_from_calib`).
    Missing calibration for any static layer is an error — serving an
    uncalibrated scale silently would corrupt outputs.
    """
    out = {}
    for key, tval in target.items():
        if isinstance(tval, dict):
            out[key] = quantize_params_like(
                tval, params[key],
                None if act_scales is None else act_scales.get(key))
        elif key == "kernel_scale":
            continue  # emitted together with kernel_q
        elif key == "act_scale":
            if act_scales is None or "act_scale" not in act_scales:
                raise ValueError(
                    "static-activation quant target needs calibrated "
                    "act_scales (pipeline.calibrate_int8)")
            out["act_scale"] = jnp.asarray(act_scales["act_scale"],
                                           jnp.float32)
        elif key == "kernel_q":
            w = params["kernel"]
            if w.ndim == 4:
                q, s = quantize_conv_kernel(w)
            elif w.ndim == 2:
                q, s = quantize_dense_kernel(w)
            else:
                raise ValueError(f"unsupported kernel rank {w.ndim}")
            out["kernel_q"], out["kernel_scale"] = q, s
        else:
            out[key] = params[key]
    return out


def act_scales_from_calib(calib: Dict, margin: float = 1.0) -> Dict:
    """Sown calibration collection -> act_scale tree for
    `quantize_params_like`.

    `calib` is the "calib" variables collection from dynamic-int8 applies
    (each Int8 layer sows `act_amax` as a tuple of per-apply scalars).
    The scale is max-over-applies * margin / 127 — plain max calibration,
    the Q-Diffusion-style default; margin > 1 adds headroom for inputs
    outside the calibration set."""
    out = {}
    for key, val in calib.items():
        if key == "act_amax":
            amax = jnp.max(jnp.stack([jnp.asarray(v) for v in val]))
            out["act_scale"] = jnp.maximum(amax * margin, _EPS) / 127.0
        elif isinstance(val, dict):
            out[key] = act_scales_from_calib(val, margin)
    return out


def merge_act_scales(trees) -> Dict:
    """Max-merge act_scale trees from several calibration applies/batches."""
    merged = {}
    for tree in trees:
        for key, val in tree.items():
            if key == "act_scale":
                merged["act_scale"] = (
                    val if "act_scale" not in merged
                    else jnp.maximum(merged["act_scale"], val))
            else:
                merged[key] = merge_act_scales(
                    [merged[key], val] if key in merged else [val])
    return merged
