"""Diffusion noise schedules and sampler step plans.

TPU-first design: instead of a stateful scheduler object stepped from Python
(the reference's diffusers scheduler.step at
pipline_StableDiffusion_ConsistentID.py:569-571), every supported sampler
(DDIM eta=0, Euler discrete, ancestral DDPM) is expressed as an *affine step
plan* — per-step coefficient tables with
    x_{i+1} = coef_x[i] * x_i + coef_e[i] * eps_i + coef_n[i] * z_i,
    unet input = c_in[i] * x_i at table timestep[i]
— so the whole denoise loop is a single jit-compiled lax.scan over stacked
scalars with no per-step Python (SURVEY.md §7.1).

Schedule math matches the diffusers configs SD ships with
(scaled_linear betas 0.00085..0.012, 1000 steps, leading spacing,
steps_offset 1, set_alpha_to_one False).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SchedulerConfig


@dataclass(frozen=True)
class NoiseSchedule:
    """Training-time forward process tables (fp32 numpy -> jnp on use)."""

    alphas_cumprod: np.ndarray  # (num_train_timesteps,)
    config: SchedulerConfig

    @staticmethod
    def create(config: SchedulerConfig) -> "NoiseSchedule":
        n = config.num_train_timesteps
        if config.beta_schedule == "scaled_linear":
            betas = np.linspace(config.beta_start ** 0.5,
                                config.beta_end ** 0.5, n,
                                dtype=np.float64) ** 2
        elif config.beta_schedule == "linear":
            betas = np.linspace(config.beta_start, config.beta_end, n,
                                dtype=np.float64)
        else:
            raise ValueError(config.beta_schedule)
        acp = np.cumprod(1.0 - betas).astype(np.float32)
        return NoiseSchedule(alphas_cumprod=acp, config=config)

    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  t: jax.Array) -> jax.Array:
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
        acp = jnp.asarray(self.alphas_cumprod)[t].astype(x0.dtype)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (jnp.sqrt(acp).reshape(shape) * x0
                + jnp.sqrt(1.0 - acp).reshape(shape) * noise)

    def velocity(self, x0, noise, t):
        acp = jnp.asarray(self.alphas_cumprod)[t].astype(x0.dtype)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (jnp.sqrt(acp).reshape(shape) * noise
                - jnp.sqrt(1.0 - acp).reshape(shape) * x0)


@dataclass(frozen=True)
class SamplerPlan:
    """Per-step affine coefficients for the scan-based denoise loop."""

    timesteps: np.ndarray   # (T,) float32, unet conditioning timesteps
    c_in: np.ndarray        # (T,) model-input scale
    coef_x: np.ndarray      # (T,)
    coef_e: np.ndarray      # (T,)
    coef_n: np.ndarray      # (T,) ancestral-noise scale (0 for ODE samplers)
    init_scale: float       # initial latent multiplier

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    def stacked(self):
        """(T, 5) array: [t, c_in, coef_x, coef_e, coef_n] for lax.scan."""
        return jnp.stack([
            jnp.asarray(self.timesteps, jnp.float32),
            jnp.asarray(self.c_in, jnp.float32),
            jnp.asarray(self.coef_x, jnp.float32),
            jnp.asarray(self.coef_e, jnp.float32),
            jnp.asarray(self.coef_n, jnp.float32),
        ], axis=1)


def _leading_timesteps(config: SchedulerConfig, num_steps: int) -> np.ndarray:
    ratio = config.num_train_timesteps // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
    return ts + config.steps_offset


def ddim_plan(schedule: NoiseSchedule, num_steps: int) -> SamplerPlan:
    """DDIM eta=0 (the reference SD1.5 default scheduler path)."""
    cfg = schedule.config
    acp = schedule.alphas_cumprod.astype(np.float64)
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(acp[0])
    ts = _leading_timesteps(cfg, num_steps)
    prev_ts = ts - cfg.num_train_timesteps // num_steps
    a_t = acp[ts]
    a_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)],
                      final_alpha)
    coef_x = np.sqrt(a_prev / a_t)
    coef_e = np.sqrt(1.0 - a_prev) - np.sqrt(a_prev * (1.0 - a_t) / a_t)
    return SamplerPlan(
        timesteps=ts.astype(np.float32),
        c_in=np.ones(num_steps, np.float32),
        coef_x=coef_x.astype(np.float32),
        coef_e=coef_e.astype(np.float32),
        coef_n=np.zeros(num_steps, np.float32),
        init_scale=1.0,
    )


def euler_plan(schedule: NoiseSchedule, num_steps: int) -> SamplerPlan:
    """Euler discrete (the reference infer.py:33 swaps this in)."""
    cfg = schedule.config
    acp = schedule.alphas_cumprod.astype(np.float64)
    sigmas_full = np.sqrt((1.0 - acp) / acp)
    ts = _leading_timesteps(cfg, num_steps).astype(np.float64)
    sigmas = np.interp(ts, np.arange(cfg.num_train_timesteps), sigmas_full)
    sigmas_next = np.concatenate([sigmas[1:], [0.0]])
    return SamplerPlan(
        timesteps=ts.astype(np.float32),
        c_in=(1.0 / np.sqrt(sigmas ** 2 + 1.0)).astype(np.float32),
        coef_x=np.ones(num_steps, np.float32),
        coef_e=(sigmas_next - sigmas).astype(np.float32),
        coef_n=np.zeros(num_steps, np.float32),
        # leading spacing: init sigma is sqrt(sigma_max^2 + 1)
        init_scale=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
    )


def ddpm_plan(schedule: NoiseSchedule, num_steps: int) -> SamplerPlan:
    """Ancestral DDPM sampling (variance type fixed_small)."""
    cfg = schedule.config
    acp = schedule.alphas_cumprod.astype(np.float64)
    ts = _leading_timesteps(cfg, num_steps)
    prev_ts = ts - cfg.num_train_timesteps // num_steps
    a_t = acp[ts]
    a_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], 1.0)
    alpha_step = a_t / a_prev
    beta_step = 1.0 - alpha_step
    coef_x = 1.0 / np.sqrt(alpha_step)
    coef_e = -beta_step / (np.sqrt(1.0 - a_t) * np.sqrt(alpha_step))
    var = beta_step * (1.0 - a_prev) / (1.0 - a_t)
    coef_n = np.sqrt(np.maximum(var, 0.0))
    coef_n[-1] = 0.0
    return SamplerPlan(
        timesteps=ts.astype(np.float32),
        c_in=np.ones(num_steps, np.float32),
        coef_x=coef_x.astype(np.float32),
        coef_e=coef_e.astype(np.float32),
        coef_n=coef_n.astype(np.float32),
        init_scale=1.0,
    )


PLAN_BUILDERS = {"ddim": ddim_plan, "euler": euler_plan, "ddpm": ddpm_plan}


def make_plan(schedule: NoiseSchedule, name: str, num_steps: int) -> SamplerPlan:
    return PLAN_BUILDERS[name](schedule, num_steps)
