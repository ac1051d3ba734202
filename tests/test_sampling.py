"""Analytic invariants for the scheduler step plans and the scan denoiser."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.core import SchedulerConfig
from consistentid_tpu.sampling import (CondBranch, NoiseSchedule, ddim_plan,
                                       ddpm_plan, denoise, euler_plan)


@pytest.fixture(scope="module")
def schedule():
    return NoiseSchedule.create(SchedulerConfig())


def test_ddim_exact_eps_recovers_forward_marginal(schedule):
    """With the true eps, a DDIM step maps q(x_t|x0,eps) to q(x_prev|x0,eps)
    exactly: x_prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps."""
    plan = ddim_plan(schedule, 50)
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 8, 8, 4).astype(np.float32)
    eps = rng.randn(2, 8, 8, 4).astype(np.float32)
    acp = schedule.alphas_cumprod.astype(np.float64)
    for i in [0, 10, 49]:
        t = int(plan.timesteps[i])
        a_t = acp[t]
        x_t = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
        x_prev = plan.coef_x[i] * x_t + plan.coef_e[i] * eps
        prev_t = t - 1000 // 50
        a_prev = acp[prev_t] if prev_t >= 0 else acp[0]
        want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(x_prev, want, atol=1e-4)


def test_euler_exact_eps_tracks_sigma_line(schedule):
    """Euler in sigma-space: x = x0 + sigma*eps moves to x0 + sigma_next*eps."""
    plan = euler_plan(schedule, 30)
    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 4, 4, 4).astype(np.float64)
    eps = rng.randn(1, 4, 4, 4).astype(np.float64)
    acp = schedule.alphas_cumprod.astype(np.float64)
    sig = lambda t: np.sqrt((1 - acp[int(t)]) / acp[int(t)])
    for i in [0, 15, 29]:
        s = -plan.coef_e[i:].sum()  # remaining distance to sigma=0
        sigma_i = sig(plan.timesteps[i])
        x = x0 + sigma_i * eps
        x_next = plan.coef_x[i] * x + plan.coef_e[i] * eps
        sigma_next = sigma_i + plan.coef_e[i]
        np.testing.assert_allclose(x_next, x0 + sigma_next * eps, atol=1e-5)
    # last step lands on sigma = 0 -> x0
    i = 29
    x = x0 + sig(plan.timesteps[i]) * eps
    np.testing.assert_allclose(plan.coef_x[i] * x + plan.coef_e[i] * eps, x0,
                               atol=1e-5)


def test_euler_c_in_matches_init_scale(schedule):
    """First-step model input must be x_T * init_scale * c_in = x_T / ~1."""
    plan = euler_plan(schedule, 30)
    # init_scale * c_in[0] == sigma-normalized input ~= 1/sqrt(1+1/sigma^2)...
    # exact identity: init_scale = sqrt(sigma0^2+1), c_in = 1/sqrt(sigma0^2+1)
    assert abs(plan.init_scale * plan.c_in[0] - 1.0) < 1e-5


def test_ddpm_terminal_step_is_deterministic(schedule):
    plan = ddpm_plan(schedule, 20)
    assert plan.coef_n[-1] == 0.0
    assert (plan.coef_n[:-1] > 0).all()


def test_denoise_merge_step_switch(schedule):
    """unet_fn echoes mean(context); merge_step decides which embeds fire."""
    plan = ddim_plan(schedule, 4)

    records = []

    def unet_fn(latents, t, context, added, step_i):
        # eps depends only on the context mean -> observable switch
        m = jnp.mean(context, axis=(1, 2), keepdims=True)[..., None]
        return jnp.zeros_like(latents) + m.reshape(-1, 1, 1, 1)

    b, h, w, c = 1, 4, 4, 4
    latents = jnp.zeros((b, h, w, c))
    null_e = jnp.zeros((b, 5, 8))
    aug_e = jnp.ones((b, 5, 8)) * 2.0
    text_e = jnp.ones((b, 5, 8)) * -2.0

    tb = CondBranch(context=text_e, null=null_e)
    fb = CondBranch(context=aug_e, null=null_e)
    out_all_text = denoise(unet_fn, latents, tb, fb, plan,
                           jnp.float32(1.0), jnp.int32(10))
    out_all_aug = denoise(unet_fn, latents, tb, fb, plan,
                          jnp.float32(1.0), jnp.int32(-1))
    assert not np.allclose(np.asarray(out_all_text), np.asarray(out_all_aug))
    # symmetric contexts -> symmetric trajectories
    np.testing.assert_allclose(np.asarray(out_all_text),
                               -np.asarray(out_all_aug), atol=1e-5)


def test_denoise_with_tiny_unet(schedule):
    from consistentid_tpu.models import UNet
    from tests.test_models import tiny_unet_config

    cfg = tiny_unet_config(ip_num_tokens=4)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 81, 32))
    params = model.init(rng, latents, jnp.array([0]), ctx)

    def unet_fn(x, t, context, added, step_i):
        return model.apply(params, x, t, context)

    plan = ddim_plan(schedule, 3)
    br = CondBranch(context=ctx, null=ctx)
    out = jax.jit(
        lambda l: denoise(unet_fn, l, br, br, plan,
                          jnp.float32(5.0), jnp.int32(1)))(latents)
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dpmpp_2m_exact_on_constant_x0(schedule):
    """DPM-Solver integrates the probability-flow ODE exactly when the
    data prediction is constant along the trajectory: with an oracle eps for
    fixed (x0, eps), every step must land on alpha_next*x0 + sigma_next*eps,
    and the final step on x0 itself."""
    from consistentid_tpu.sampling import make_plan

    plan = make_plan(schedule, "dpmpp_2m", 12)
    rng = np.random.RandomState(0)
    x0 = rng.randn(1, 4, 4, 4).astype(np.float64)
    eps = rng.randn(1, 4, 4, 4).astype(np.float64)
    acp = schedule.alphas_cumprod.astype(np.float64)

    alphas = np.sqrt(acp[plan.timesteps.astype(int)])
    sigmas = np.sqrt(1 - acp[plan.timesteps.astype(int)])
    x = alphas[0] * x0 + sigmas[0] * eps
    prev_x0 = np.zeros_like(x)
    for i in range(plan.num_steps):
        x0_pred = (x - plan.c_sigma[i] * eps) / plan.c_alpha[i]
        np.testing.assert_allclose(x0_pred, x0, atol=1e-4)
        d = x0_pred if i == 0 else (1 + plan.rr[i]) * x0_pred \
            - plan.rr[i] * prev_x0
        x = plan.ratio[i] * x - plan.gamma[i] * d
        prev_x0 = x0_pred
        if i < plan.num_steps - 1:
            want = alphas[i + 1] * x0 + sigmas[i + 1] * eps
            np.testing.assert_allclose(x, want, atol=1e-3)
    np.testing.assert_allclose(x, x0, atol=1e-3)


@pytest.mark.parametrize("name", ["ddim", "euler", "dpmpp_2m", "pndm"])
@pytest.mark.parametrize("strength", [1.0, 0.6, 0.25])
def test_plan_tail_oracle_eps_recovers_x0(schedule, name, strength):
    """img2img truncation invariant: starting from the plan's own noising of
    x0 at the first kept step and feeding the TRUE eps, every ODE sampler
    must integrate back to exactly x0 — catches both the dpmpp_2m table
    truncation bug and init-noising in the wrong latent space (VP vs sigma).
    Runs through `denoise` itself so the scan/carry path is covered."""
    import dataclasses

    from consistentid_tpu.sampling import make_plan
    from consistentid_tpu.sampling.schedulers import plan_tail

    plan = plan_tail(make_plan(schedule, name, 20), strength)
    want_kind = {"dpmpp_2m": "dpmpp_2m", "pndm": "pndm"}.get(name, "affine")
    assert plan.kind == want_kind
    plan = dataclasses.replace(plan, init_scale=1.0)

    rng = np.random.RandomState(2)
    x0 = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    latents = jnp.asarray(plan.noise_x[0] * x0 + plan.noise_e[0] * eps)

    def unet_fn(x, t, context, added, step_i):
        return jnp.concatenate([jnp.asarray(eps)] * 2, axis=0)

    br = CondBranch(context=jnp.zeros((1, 5, 8)), null=jnp.zeros((1, 5, 8)))
    out = denoise(unet_fn, latents, br, br, plan, jnp.float32(1.0),
                  jnp.int32(0))
    # ddim/pndm with set_alpha_to_one=False terminate at acp[0] (not exactly
    # 1), leaving a ~sqrt(1-acp[0])·|eps| ≈ 0.03 residual; the bugs this
    # guards against (zero collapse, wrong-space init) give O(0.5-1) errors.
    atol = 0.1 if name in ("ddim", "pndm") else 5e-3
    np.testing.assert_allclose(np.asarray(out), x0, atol=atol)


def test_plan_tail_preserves_tables(schedule):
    """Every per-step table is suffix-sliced; dpmpp rr restarts at 0."""
    from consistentid_tpu.sampling import make_plan
    from consistentid_tpu.sampling.schedulers import plan_tail

    for name in ["ddim", "euler", "ddpm", "dpmpp_2m", "pndm"]:
        full = make_plan(schedule, name, 20)
        t0 = full.num_steps - int(full.num_steps * 0.5)
        tail = plan_tail(full, 0.5)
        assert tail.num_steps == full.num_steps - t0
        assert tail.kind == full.kind
        np.testing.assert_array_equal(tail.timesteps, full.timesteps[t0:])
        np.testing.assert_array_equal(tail.c_in, full.c_in[t0:])
        np.testing.assert_array_equal(tail.noise_e, full.noise_e[t0:])
        if name == "dpmpp_2m":
            assert tail.rr[0] == 0.0
            np.testing.assert_array_equal(tail.ratio, full.ratio[t0:])
            np.testing.assert_array_equal(tail.gamma, full.gamma[t0:])
            np.testing.assert_array_equal(tail.rr[1:], full.rr[t0 + 1:])
        if name == "pndm":
            # history restart: warmup weights, no cur_sample reuse
            np.testing.assert_array_equal(tail.plms_w[0], [1, 0, 0, 0])
            assert (tail.use_cur == 0).all()
            np.testing.assert_array_equal(tail.plms_w[4:],
                                          full.plms_w[t0 + 4:])
        assert plan_tail(full, 1.0) is full


def test_denoise_dpmpp_with_tiny_unet(schedule):
    from consistentid_tpu.models import UNet
    from consistentid_tpu.sampling import make_plan
    from tests.test_models import tiny_unet_config

    cfg = tiny_unet_config(ip_num_tokens=4)
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 81, 32))
    params = model.init(rng, latents, jnp.array([0]), ctx)

    def unet_fn(x, t, context, added, step_i):
        return model.apply(params, x, t, context)

    plan = make_plan(schedule, "dpmpp_2m", 4)
    br = CondBranch(context=ctx, null=ctx)
    out = denoise(unet_fn, latents, br, br, plan, jnp.float32(5.0),
                  jnp.int32(1))
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


def test_plan_tail_keeps_at_least_one_step(schedule):
    """A strength small enough that int(T * strength) == 0 must keep one
    step (diffusers get_timesteps keeps a non-empty tail) instead of
    producing an empty plan that IndexErrors inside the jit trace
    (ADVICE r3: apps/infer.py --strength validation)."""
    from consistentid_tpu.sampling import make_plan
    from consistentid_tpu.sampling.schedulers import plan_tail

    for name in ("ddim", "euler", "ddpm", "dpmpp_2m", "pndm"):
        full = make_plan(schedule, name, 10)
        tail = plan_tail(full, 0.01)
        assert tail.num_steps == 1, (name, tail.num_steps)
        # and the kept step is the LAST step of the full plan
        np.testing.assert_allclose(tail.timesteps[-1], full.timesteps[-1])
