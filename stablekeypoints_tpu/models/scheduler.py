"""DDIM noise schedule (scaled-linear betas, SD training schedule).

Semantics of the reference's DDIMScheduler use (optimize_token.py:25-34:
beta 0.00085 -> 0.012, scaled_linear, 50 inference steps, set_alpha_to_one
False; add_noise in find_pred_noise, ptp_utils.py:221-223; full DDIM
sampling only in the generation script, ptp_utils.py:420-461). Pure
functions of precomputed constant tables — no stateful scheduler object.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["DDIMSchedule"]


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Constant tables for a scaled-linear DDIM schedule."""

    alphas_cumprod: np.ndarray  # [num_train_timesteps]
    timesteps: np.ndarray  # [num_inference_steps], descending
    num_train_timesteps: int = 1000

    @staticmethod
    def create(
        num_inference_steps: int = 50,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        num_train_timesteps: int = 1000,
        steps_offset: int = 0,
    ) -> "DDIMSchedule":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        step_ratio = num_train_timesteps // num_inference_steps
        timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        timesteps = (timesteps + steps_offset).astype(np.int32)
        return DDIMSchedule(alphas_cumprod, timesteps, num_train_timesteps)

    def timestep_at(self, noise_level: int) -> int:
        """timesteps[noise_level]; the reference default -1 = least noisy."""
        return int(self.timesteps[noise_level])

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        """sqrt(acp_t) * sample + sqrt(1 - acp_t) * noise."""
        acp = jnp.asarray(self.alphas_cumprod)[jnp.asarray(t)]
        sqrt_acp = jnp.sqrt(acp).astype(sample.dtype)
        sqrt_one_minus = jnp.sqrt(1.0 - acp).astype(sample.dtype)
        return sqrt_acp * sample + sqrt_one_minus * noise

    def ddim_step(
        self, eps: jnp.ndarray, latents: jnp.ndarray, step_index: int
    ) -> jnp.ndarray:
        """One deterministic DDIM update x_t -> x_{t-dt} (eta = 0).

        step_index indexes `timesteps`; `set_alpha_to_one=False` semantics:
        the final step uses alphas_cumprod[0] as the previous alpha.
        """
        t = int(self.timesteps[step_index])
        step_ratio = self.num_train_timesteps // len(self.timesteps)
        prev_t = t - step_ratio
        acp = jnp.asarray(self.alphas_cumprod)
        alpha_t = acp[t]
        alpha_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], acp[0])
        x0 = (latents - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
        return jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps
