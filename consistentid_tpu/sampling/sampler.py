"""jit-compiled CFG denoise loop with delayed ("merge-step") conditioning.

Replaces the reference's per-step Python loops
(pipline_StableDiffusion_ConsistentID.py:536-579,
pipline_StableDiffusionXL_ConsistentID.py:608-665) with one lax.scan:
  - per-step scheduler constants come from a SamplerPlan table,
  - the text-only vs facial-augmented conditioning switch at start_merge_step
    is a jnp.where on the step index, so merge_step and guidance_scale are
    traced scalars — one compiled graph serves any setting.

Each conditioning branch carries its own positive AND negative embeddings
(+ optional SDXL pooled embeds) because the SDXL variant switches all of them
per branch (reference SDXL :619-628); SD1.5 passes the same null to both.
CFG pairing matches the reference: batch = [negative, current], then
eps = eps_uncond + g * (eps_cond - eps_uncond).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedulers import SamplerPlan


@jax.tree_util.register_dataclass
@dataclass
class CondBranch:
    """One conditioning branch (text-only or facial-augmented).

    Registered as a pytree so it can cross jit/eval_shape boundaries
    (the SDXL step_flops path returns one from a traced function)."""

    context: jax.Array                 # (B, L, D) positive embeddings
    null: jax.Array                    # (B, L, D) negative embeddings
    pooled: Optional[jax.Array] = None       # (B, Dp) SDXL pooled positive
    pooled_null: Optional[jax.Array] = None  # (B, Dp) SDXL pooled negative


def denoise(
    unet_fn: Callable,               # (latents, t, context, added, i) -> eps
    latents: jax.Array,              # (B, h, w, C) initial latents
    text_branch: CondBranch,         # used while i <= start_merge_step
    facial_branch: CondBranch,       # used afterwards
    plan: SamplerPlan,
    guidance_scale: jax.Array,
    start_merge_step: jax.Array,
    rng: Optional[jax.Array] = None,
    time_ids: Optional[jax.Array] = None,   # (B, 6) SDXL micro-conditioning
    inpaint_mask: Optional[jax.Array] = None,     # (B, h, w, 1) latent-res
    inpaint_targets: Optional[jax.Array] = None,  # (T, B, h, w, C)
    cache_interval: int = 1,
    unet_cached_fn: Optional[Callable] = None,
) -> jax.Array:
    """Run the full sampler; returns final latents (scaled latent space).

    cache_interval > 1 enables DeepCache-style deep-feature reuse
    (training-free acceleration, PAPERS.md family; models/unet.py
    deep_feature docstring): every `cache_interval`-th step runs the full
    UNet via `unet_fn`, which must then return (eps, deep_feature); the
    steps in between run `unet_cached_fn(latents, t, context, added, i,
    deep)` — only the shallow level-0 blocks — splicing the cached deep
    feature in. One lax.cond per step, both branches compiled once; the
    cadence table is baked into the scan inputs so the interval is a
    static compile-time choice.
    """
    steps = plan.stacked()                     # (T, 5)
    step_idx = jnp.arange(plan.num_steps)
    latents = latents * plan.init_scale
    use_cache = cache_interval > 1
    if use_cache:
        assert unet_cached_fn is not None, \
            "cache_interval > 1 needs a shallow-path unet_cached_fn"
        full_flags = (step_idx % cache_interval) == 0  # step 0 always full

    ctx_stack = jnp.stack([text_branch.context, facial_branch.context])
    null_stack = jnp.stack([text_branch.null, facial_branch.null])
    has_pooled = text_branch.pooled is not None
    if has_pooled:
        pooled_stack = jnp.stack([text_branch.pooled, facial_branch.pooled])
        pooled_null_stack = jnp.stack(
            [text_branch.pooled_null, facial_branch.pooled_null])
        time_ids2 = jnp.concatenate([time_ids, time_ids], axis=0)

    needs_noise = bool((plan.coef_n != 0).any())
    if needs_noise:
        assert rng is not None, "ancestral sampler needs an rng"
        noise_keys = jax.random.split(rng, plan.num_steps)
    else:
        noise_keys = jnp.zeros((plan.num_steps, 2), jnp.uint32)

    def select(i, stack):
        w = (i <= start_merge_step).astype(stack.dtype)
        return w * stack[0] + (1.0 - w) * stack[1]

    is_dpmpp = plan.kind == "dpmpp_2m"
    is_pndm = plan.kind == "pndm"

    def body(carry, scan_in):
        if use_cache:
            x, prev_x0, cur_sample, e_hist, deep = carry
            i, consts, key, full_flag = scan_in
        else:
            x, prev_x0, cur_sample, e_hist = carry
            i, consts, key = scan_in
        t, c_in = consts[0], consts[1]
        context = jnp.concatenate(
            [select(i, null_stack), select(i, ctx_stack)], axis=0)
        added = None
        if has_pooled:
            added = {
                "text_embeds": jnp.concatenate(
                    [select(i, pooled_null_stack), select(i, pooled_stack)],
                    axis=0),
                "time_ids": time_ids2,
            }
        latent_in = jnp.concatenate([x, x], axis=0) * c_in.astype(x.dtype)
        t_batch = jnp.broadcast_to(t, (latent_in.shape[0],))
        if use_cache:
            # full step refreshes the deep feature; cached step reuses it
            # and runs only the shallow blocks (closure capture of the
            # step's latents/context is lifted into both branches)
            eps, deep = jax.lax.cond(
                full_flag,
                lambda d: unet_fn(latent_in, t_batch, context, added, i),
                lambda d: (unet_cached_fn(latent_in, t_batch, context,
                                          added, i, d), d),
                deep)
        else:
            eps = unet_fn(latent_in, t_batch, context, added, i)
        eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
        eps = eps_uncond + guidance_scale.astype(eps.dtype) * (
            eps_cond - eps_uncond)
        if is_dpmpp:
            c_alpha, c_sigma, ratio, gamma, rr = (
                consts[5], consts[6], consts[7], consts[8], consts[9])
            x0 = (x - c_sigma.astype(x.dtype) * eps) / c_alpha.astype(x.dtype)
            d = jnp.where(i == 0, x0,
                          (1.0 + rr).astype(x.dtype) * x0
                          - rr.astype(x.dtype) * prev_x0)
            x_next = ratio.astype(x.dtype) * x - gamma.astype(x.dtype) * d
            prev_x0 = x0
        elif is_pndm:
            # PLMS: Adams-Bashforth combination of the eps history; the
            # counter-1 eval re-applies the warmup transfer from the held
            # cur_sample (diffusers step_plms semantics)
            coef_x, coef_e = consts[2], consts[3]
            w = consts[5:9].astype(x.dtype)
            use_cur = consts[9]
            eps_used = (w[0] * eps + w[1] * e_hist[0]
                        + w[2] * e_hist[1] + w[3] * e_hist[2])
            base = jnp.where(use_cur > 0.5, cur_sample, x)
            x_next = (coef_x.astype(x.dtype) * base
                      + coef_e.astype(x.dtype) * eps_used)
            cur_sample = jnp.where(i == 0, x, cur_sample)
            push = (use_cur <= 0.5)  # history not updated at counter 1
            pushed = jnp.stack([eps, e_hist[0], e_hist[1]])
            e_hist = jnp.where(push, pushed, e_hist)
        else:
            coef_x, coef_e, coef_n = consts[2], consts[3], consts[4]
            x_next = (coef_x.astype(x.dtype) * x
                      + coef_e.astype(x.dtype) * eps)
            if needs_noise:
                z = jax.random.normal(key, x.shape, x.dtype)
                x_next = x_next + coef_n.astype(x.dtype) * z
        if inpaint_mask is not None:
            # 4-channel UNet inpainting: blend the (re-noised) init latents
            # back outside the mask after each step (reference
            # StableDIffusionInpaint_ConsistentID.py:340-352)
            target = inpaint_targets[i]
            x_next = ((1.0 - inpaint_mask).astype(x.dtype) *
                      target.astype(x.dtype)
                      + inpaint_mask.astype(x.dtype) * x_next)
        if use_cache:
            return (x_next, prev_x0, cur_sample, e_hist, deep), None
        return (x_next, prev_x0, cur_sample, e_hist), None

    init = (latents, jnp.zeros_like(latents), jnp.zeros_like(latents),
            jnp.zeros((3, *latents.shape), latents.dtype))
    if use_cache:
        # carry slot for the deep feature; its shape comes from tracing the
        # full step once (no FLOPs). flags[0] is True, so the zeros init is
        # never consumed.
        ctx0 = jnp.concatenate([null_stack[0], ctx_stack[0]], axis=0)
        added0 = None
        if has_pooled:
            added0 = {"text_embeds": jnp.concatenate(
                [pooled_null_stack[0], pooled_stack[0]], axis=0),
                "time_ids": time_ids2}
        deep_struct = jax.eval_shape(
            lambda x, c: unet_fn(
                jnp.concatenate([x, x], axis=0),
                jnp.zeros((2 * x.shape[0],), steps.dtype), c, added0, 0)[1],
            latents, ctx0)
        init = init + (jnp.zeros(deep_struct.shape, deep_struct.dtype),)
        (final, *_), _ = jax.lax.scan(
            body, init, (step_idx, steps, noise_keys, full_flags))
        return final
    (final, _, _, _), _ = jax.lax.scan(
        body, init, (step_idx, steps, noise_keys))
    return final
