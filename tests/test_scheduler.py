"""DDIM schedule tests against hand-computed values."""

import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.models.scheduler import DDIMSchedule


def test_timesteps_layout():
    s = DDIMSchedule.create(num_inference_steps=50)
    assert s.timesteps.shape == (50,)
    assert s.timesteps[0] == 980 and s.timesteps[-1] == 0
    assert s.timestep_at(-1) == 0  # reference noise_level=-1 -> least noisy


def test_alphas_cumprod_values():
    s = DDIMSchedule.create()
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(s.alphas_cumprod, acp, rtol=1e-5)


def test_add_noise_formula():
    s = DDIMSchedule.create()
    x = jnp.ones((2, 4, 4, 1))
    n = jnp.full((2, 4, 4, 1), 2.0)
    t = 500
    out = np.asarray(s.add_noise(x, n, t))
    a = s.alphas_cumprod[t]
    expected = np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 2.0
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_ddim_step_recovers_x0_at_last_step():
    """At the final step (t=0 -> prev uses acp[0]): output ~ x0 scaled."""
    s = DDIMSchedule.create()
    x0 = jnp.ones((1, 2, 2, 1)) * 0.5
    eps = jnp.ones((1, 2, 2, 1)) * 0.1
    t = int(s.timesteps[-1])
    a = s.alphas_cumprod[t]
    xt = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
    out = np.asarray(s.ddim_step(eps, jnp.asarray(xt), len(s.timesteps) - 1))
    # prev alpha = acp[0] (set_alpha_to_one=False)
    a_prev = s.alphas_cumprod[0]
    expected = np.sqrt(a_prev) * 0.5 + np.sqrt(1 - a_prev) * 0.1
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_ddim_full_chain_consistency():
    """Denoising a clean latent with eps=0 predictions returns x0 exactly."""
    s = DDIMSchedule.create(num_inference_steps=10)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 1)).astype(np.float32))
    lat = s.add_noise(x, jnp.zeros_like(x), int(s.timesteps[0]))
    for i in range(10):
        lat = s.ddim_step(jnp.zeros_like(lat), lat, i)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x) * np.sqrt(s.alphas_cumprod[0]), rtol=1e-4)
