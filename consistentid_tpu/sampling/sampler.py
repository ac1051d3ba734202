"""jit-compiled CFG denoise loop with delayed ("merge-step") conditioning.

Replaces the reference's per-step Python loop
(pipline_StableDiffusion_ConsistentID.py:536-579) with one lax.scan:
  - per-step scheduler constants come from a SamplerPlan table,
  - the text-only vs facial-augmented embedding switch at start_merge_step
    (:542-549) is a jnp.where on the step index, so merge_step and
    guidance_scale are traced scalars — one compiled graph serves any setting.
CFG pairing matches the reference: eps = eps_uncond + g*(eps_cond - eps_uncond)
with batch-doubled (negative, current) contexts (:537-564).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .schedulers import SamplerPlan


def denoise(
    unet_fn: Callable,               # (latents, t, context, added_cond) -> eps
    latents: jax.Array,              # (B, h, w, C) N(0,1) noise
    null_embeds: jax.Array,          # (B, L, D) negative/uncond
    augmented_embeds: jax.Array,     # (B, L, D) facial-augmented + faceid
    text_embeds: jax.Array,          # (B, L, D) text-only + faceid
    plan: SamplerPlan,
    guidance_scale: jax.Array,
    start_merge_step: jax.Array,
    rng: Optional[jax.Array] = None,
    added_cond: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """Run the full sampler; returns final latents (scaled latent space)."""
    steps = plan.stacked()                     # (T, 5)
    step_idx = jnp.arange(plan.num_steps)
    latents = latents * plan.init_scale

    cond_stack = jnp.stack([text_embeds, augmented_embeds])  # (2, B, L, D)
    if added_cond is not None:
        # batch-doubled micro-conditioning (uncond half first, like embeds)
        added2 = {k: jnp.concatenate([v, v], axis=0)
                  for k, v in added_cond.items()}
    else:
        added2 = None

    needs_noise = bool((plan.coef_n != 0).any())
    if needs_noise:
        assert rng is not None, "ancestral sampler needs an rng"
        noise_keys = jax.random.split(rng, plan.num_steps)
    else:
        noise_keys = jnp.zeros((plan.num_steps, 2), jnp.uint32)

    def body(x, scan_in):
        i, (t, c_in, coef_x, coef_e, coef_n), key = scan_in
        use_text = (i <= start_merge_step).astype(cond_stack.dtype)
        current = (use_text * cond_stack[0]
                   + (1.0 - use_text) * cond_stack[1])
        context = jnp.concatenate([null_embeds, current], axis=0)
        latent_in = jnp.concatenate([x, x], axis=0) * c_in.astype(x.dtype)
        t_batch = jnp.broadcast_to(t, (latent_in.shape[0],))
        eps = unet_fn(latent_in, t_batch, context, added2)
        eps_uncond, eps_cond = jnp.split(eps, 2, axis=0)
        eps = eps_uncond + guidance_scale.astype(eps.dtype) * (
            eps_cond - eps_uncond)
        x_next = (coef_x.astype(x.dtype) * x + coef_e.astype(x.dtype) * eps)
        if needs_noise:
            z = jax.random.normal(key, x.shape, x.dtype)
            x_next = x_next + coef_n.astype(x.dtype) * z
        return x_next, None

    final, _ = jax.lax.scan(body, latents, (step_idx, steps, noise_keys))
    return final
