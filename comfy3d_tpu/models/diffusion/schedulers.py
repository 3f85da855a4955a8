"""Diffusion samplers: DDIM and Euler-ancestral, epsilon/v-prediction.

The scheduler layer behind the reference's pipelines
(`nodes.py:163-172` DIFFUSERS_SCHEDULER_DICT — EulerAncestralDiscrete,
DDIM, ...; Zero123Plus runs v-prediction with trailing timestep spacing).
Pure-jnp state-free formulation: each step is (latents, t_index) → latents
so the whole sampling loop jits as one lax.fori_loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"       # or "v_prediction"
    timestep_spacing: str = "leading"      # or "trailing"


def make_alphas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    return np.cumprod(1.0 - betas)


def make_timesteps(cfg: SchedulerConfig, num_steps: int) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "trailing":
        ts = np.round(np.arange(n, 0, -n / num_steps)).astype(np.int64) - 1
    else:
        step = n // num_steps
        ts = (np.arange(0, num_steps) * step).round()[::-1].astype(
            np.int64)
    return ts


def _predict_x0_eps(model_out, sample, alpha_t, cfg: SchedulerConfig):
    """→ (x0, eps) from the model output under the prediction type."""
    sqrt_a = jnp.sqrt(alpha_t)
    sqrt_1ma = jnp.sqrt(1.0 - alpha_t)
    if cfg.prediction_type == "epsilon":
        eps = model_out
        x0 = (sample - sqrt_1ma * eps) / sqrt_a
    elif cfg.prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_out
        eps = sqrt_a * model_out + sqrt_1ma * sample
    else:
        raise ValueError(cfg.prediction_type)
    return x0, eps


class DDIM:
    """Deterministic DDIM (eta=0)."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(),
                 num_steps: int = 50):
        self.cfg = cfg
        self.timesteps = jnp.asarray(make_timesteps(cfg, num_steps))
        alphas = make_alphas(cfg)
        self.alphas = jnp.asarray(alphas, jnp.float32)
        self.num_steps = num_steps

    def scale_model_input(self, sample, i):
        return sample

    def step(self, model_out, i, sample):
        t = self.timesteps[i]
        alpha_t = self.alphas[t]
        prev_t = jnp.where(i + 1 < self.num_steps,
                           self.timesteps[jnp.minimum(i + 1,
                                                      self.num_steps - 1)],
                           -1)
        alpha_prev = jnp.where(prev_t >= 0,
                               self.alphas[jnp.maximum(prev_t, 0)], 1.0)
        x0, eps = _predict_x0_eps(model_out, sample, alpha_t, self.cfg)
        return jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1 - alpha_prev) * eps

    def add_noise(self, x0, noise, i):
        a = self.alphas[self.timesteps[i]]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise

    @property
    def init_sigma(self):
        return 1.0


class EulerAncestral:
    """Euler-ancestral in sigma space (diffusers
    EulerAncestralDiscreteScheduler semantics): karras=False sigmas from
    the alpha schedule; model input scaled by 1/sqrt(sigma²+1)."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(),
                 num_steps: int = 50):
        self.cfg = cfg
        ts = make_timesteps(cfg, num_steps)
        alphas = make_alphas(cfg)
        sig_all = np.sqrt((1 - alphas) / alphas)
        sigmas = sig_all[ts]
        self.timesteps = jnp.asarray(ts)
        self.sigmas = jnp.asarray(
            np.concatenate([sigmas, [0.0]]), jnp.float32)
        self.num_steps = num_steps

    @property
    def init_sigma(self):
        return jnp.sqrt(self.sigmas[0] ** 2 + 1.0)

    def scale_model_input(self, sample, i):
        return sample / jnp.sqrt(self.sigmas[i] ** 2 + 1.0)

    def step(self, model_out, i, sample, key=None):
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        # x0 prediction in sigma space
        if self.cfg.prediction_type == "epsilon":
            x0 = sample - sigma * model_out
        elif self.cfg.prediction_type == "v_prediction":
            x0 = sample / (sigma ** 2 + 1) \
                - (sigma / jnp.sqrt(sigma ** 2 + 1)) * model_out
        else:
            raise ValueError(self.cfg.prediction_type)
        sigma_up = jnp.sqrt(jnp.maximum(
            sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
            / jnp.maximum(sigma ** 2, 1e-12), 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - sigma_up ** 2,
                                          0.0))
        d = (sample - x0) / jnp.maximum(sigma, 1e-12)
        prev = sample + d * (sigma_down - sigma)
        if key is not None:
            prev = prev + sigma_up * jax.random.normal(key, sample.shape)
        return prev

    def add_noise(self, x0, noise, i):
        return x0 + self.sigmas[i] * noise
