"""Diffusion samplers, epsilon/v-prediction, jit-friendly.

The scheduler layer behind the reference's pipelines — the full
`DIFFUSERS_SCHEDULER_DICT` zoo (`nodes.py:163-172`): EulerAncestral,
Euler, DDIM, DDIMParallel, LCM, KDPM2, KDPM2Ancestral. Zero123Plus runs
v-prediction with trailing timestep spacing.

Pure-jnp state-free formulation: each step is (latents, t_index) →
latents so the whole sampling loop jits as one lax.fori_loop. Schedulers
that need cross-step memory (the 2nd-order KDPM2 pair keeps the
first-substep sample) thread it through an explicit `aux` pytree:

    sched = make_scheduler(name, cfg, num_steps)
    aux   = sched.init_aux(latents)
    for i in range(sched.loop_steps):          # lax.fori_loop in practice
        x_in = sched.scale_model_input(latents, i)
        out  = model(x_in, sched.timesteps[i])
        latents, aux = sched.step_aux(out, i, latents, aux, key=...)

First-order schedulers keep their legacy `step(out, i, sample, key)` →
latents form (used throughout the model zoo); `step_aux` wraps it.
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
    # >0: MV-Adapter ShiftSNRScheduler (scheduling_shift_snr.py:34-54,
    # shift_mode="interpolated"): snr(t) → snr(t)·scale^{-t/(N-1)}
    # (log-space interpolation between snr and snr/scale)
    snr_shift_scale: float = 0.0


def make_alphas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    abar = np.cumprod(1.0 - betas)
    if cfg.snr_shift_scale and cfg.snr_shift_scale > 0:
        snr = abar / (1.0 - abar)
        w = np.arange(cfg.num_train_timesteps) \
            / (cfg.num_train_timesteps - 1)
        snr = snr * cfg.snr_shift_scale ** (-w)
        abar = snr / (1.0 + snr)
    return abar


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


class _FirstOrderMixin:
    """`loop_steps`/`init_aux`/`step_aux` for schedulers without
    cross-step memory (aux is a dummy scalar so pytree structure is
    stable under lax.fori_loop)."""

    @property
    def loop_steps(self) -> int:
        return self.num_steps

    def init_aux(self, latents):
        return jnp.zeros((), jnp.float32)

    def step_aux(self, model_out, i, sample, aux, key=None):
        try:
            prev = self.step(model_out, i, sample, key=key)
        except TypeError:            # deterministic steppers take no key
            prev = self.step(model_out, i, sample)
        return prev, aux


class DDIM(_FirstOrderMixin):
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


class EulerAncestral(_FirstOrderMixin):
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


class DDPM(DDIM):
    """Ancestral DDPM (diffusers DDPMScheduler, variance_type
    fixed_small): posterior mean over the selected timestep pairs plus
    beta-tilde noise. MV-Adapter's sampler (prepare_pipeline wraps it
    in ShiftSNR — the shift lives in `make_alphas`)."""

    def step(self, model_out, i, sample, key=None):
        t = self.timesteps[i]
        alpha_t = self.alphas[t]
        prev_t = jnp.where(i + 1 < self.num_steps,
                           self.timesteps[jnp.minimum(
                               i + 1, self.num_steps - 1)], -1)
        alpha_prev = jnp.where(prev_t >= 0,
                               self.alphas[jnp.maximum(prev_t, 0)], 1.0)
        cur_alpha = alpha_t / alpha_prev
        cur_beta = 1.0 - cur_alpha
        x0, _ = _predict_x0_eps(model_out, sample, alpha_t, self.cfg)
        c_x0 = jnp.sqrt(alpha_prev) * cur_beta / (1.0 - alpha_t)
        c_xt = jnp.sqrt(cur_alpha) * (1.0 - alpha_prev) \
            / (1.0 - alpha_t)
        prev = c_x0 * x0 + c_xt * sample
        if key is not None:
            var = jnp.clip((1.0 - alpha_prev) / (1.0 - alpha_t)
                           * cur_beta, 1e-20, None)
            noise = jax.random.normal(key, sample.shape)
            prev = prev + jnp.where(prev_t >= 0, jnp.sqrt(var), 0.0) \
                * noise
        return prev


class DDIMParallel(DDIM):
    """diffusers `DDIMParallelScheduler` degenerates to plain DDIM for
    sequential (non-batched-timestep) sampling; the batched entry point
    is `batch_step` for ParaDiGMS-style parallel denoise."""

    def batch_step(self, model_outs, idxs, samples):
        """model_outs [K, ...]; idxs [K] step indices; samples [K, ...]
        → per-index prev samples (eta=0, no noise)."""
        def one(out, i, x):
            return self.step(out, i, x)
        return jax.vmap(one)(model_outs, idxs, samples)


class Euler(_FirstOrderMixin):
    """diffusers `EulerDiscreteScheduler` (non-ancestral, karras=False):
    deterministic Euler step in sigma space."""

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

    def _x0(self, model_out, sample, sigma):
        if self.cfg.prediction_type == "epsilon":
            return sample - sigma * model_out
        if self.cfg.prediction_type == "v_prediction":
            return sample / (sigma ** 2 + 1) \
                - (sigma / jnp.sqrt(sigma ** 2 + 1)) * model_out
        raise ValueError(self.cfg.prediction_type)

    def step(self, model_out, i, sample, key=None):
        sigma = self.sigmas[i]
        x0 = self._x0(model_out, sample, sigma)
        d = (sample - x0) / jnp.maximum(sigma, 1e-12)
        return sample + d * (self.sigmas[i + 1] - sigma)

    def add_noise(self, x0, noise, i):
        return x0 + self.sigmas[i] * noise


class LCM(_FirstOrderMixin):
    """Latent-consistency sampling (diffusers `LCMScheduler`): the model
    is a consistency function; each step blends its x0 prediction with
    the sample through the boundary-condition scalings
    c_skip/c_out (sigma_data=0.5, timestep_scaling=10), then re-noises
    to the next timestep."""

    sigma_data: float = 0.5
    timestep_scaling: float = 10.0

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(),
                 num_steps: int = 4):
        self.cfg = cfg
        self.timesteps = jnp.asarray(make_timesteps(cfg, num_steps))
        self.alphas = jnp.asarray(make_alphas(cfg), jnp.float32)
        self.num_steps = num_steps

    @property
    def init_sigma(self):
        return 1.0

    def scale_model_input(self, sample, i):
        return sample

    def step(self, model_out, i, sample, key=None):
        t = self.timesteps[i]
        alpha_t = self.alphas[t]
        x0, _ = _predict_x0_eps(model_out, sample, alpha_t, self.cfg)
        st = self.timestep_scaling * t.astype(jnp.float32)
        c_skip = self.sigma_data ** 2 / (st ** 2 + self.sigma_data ** 2)
        c_out = st / jnp.sqrt(st ** 2 + self.sigma_data ** 2)
        denoised = c_out * x0 + c_skip * sample
        is_last = i + 1 >= self.num_steps
        t_next = self.timesteps[jnp.minimum(i + 1, self.num_steps - 1)]
        alpha_next = self.alphas[t_next]
        noise = (jax.random.normal(key, sample.shape)
                 if key is not None else jnp.zeros_like(sample))
        renoised = jnp.sqrt(alpha_next) * denoised \
            + jnp.sqrt(1.0 - alpha_next) * noise
        return jnp.where(is_last, denoised, renoised)

    def add_noise(self, x0, noise, i):
        a = self.alphas[self.timesteps[i]]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise


class KDPM2:
    """2nd-order DPM (k-diffusion "sample_dpm_2", diffusers
    `KDPM2DiscreteScheduler`): each outer step evaluates the model at
    sigma_i and at the log-space midpoint sigma_interpol. Runs over an
    interleaved index space of `loop_steps = 2·N − 1` model evaluations;
    `aux` carries the first-substep sample."""

    ancestral = False

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(),
                 num_steps: int = 50):
        self.cfg = cfg
        ts = make_timesteps(cfg, num_steps)
        alphas = make_alphas(cfg)
        sig_all = np.sqrt((1 - alphas) / alphas)
        sig = sig_all[ts].astype(np.float64)          # descending
        self.num_steps = num_steps

        if self.ancestral:
            # ancestral split of each interval, then midpoint to
            # sigma_down (k-diffusion sample_dpm_2_ancestral)
            nxt = np.concatenate([sig[1:], [0.0]])
            up = np.sqrt(np.maximum(
                nxt ** 2 * (sig ** 2 - nxt ** 2)
                / np.maximum(sig ** 2, 1e-20), 0.0))
            down = np.sqrt(np.maximum(nxt ** 2 - up ** 2, 0.0))
            with np.errstate(divide="ignore"):
                interp = np.exp(0.5 * (np.log(np.maximum(sig, 1e-20))
                                       + np.log(np.maximum(down, 1e-20))))
            interp = np.where(down <= 0, 0.0, interp)
            self._sig_up = up
            self._sig_down = down
        else:
            nxt = np.concatenate([sig[1:], [0.0]])
            with np.errstate(divide="ignore"):
                interp = np.exp(0.5 * (np.log(np.maximum(sig, 1e-20))
                                       + np.log(np.maximum(nxt, 1e-20))))
            interp = np.where(nxt <= 0, 0.0, interp)
            self._sig_down = nxt

        # interleaved eval points: sig_0, interp_0, sig_1, interp_1, ...
        # (the final interval, ending at sigma=0, takes a plain Euler
        # step from sig_{N-1}, so its interp point is unused)
        self._sig = sig
        self._interp = interp
        eval_sig = np.empty(2 * num_steps - 1)
        eval_sig[0::2] = sig
        eval_sig[1::2] = interp[:-1]
        self.eval_sigmas = jnp.asarray(eval_sig, jnp.float32)

        # timestep at each eval point: nearest train t for each sigma
        def t_of_sigma(s):
            return np.abs(sig_all[None, :] - s[:, None]).argmin(axis=1)
        ts_eval = np.empty(2 * num_steps - 1, np.int64)
        ts_eval[0::2] = ts
        ts_eval[1::2] = t_of_sigma(interp[:-1])
        self.timesteps = jnp.asarray(ts_eval)

        self.sigmas = jnp.asarray(sig, jnp.float32)
        self.sigmas_interp = jnp.asarray(interp, jnp.float32)
        self.sigmas_down = jnp.asarray(self._sig_down, jnp.float32)
        if self.ancestral:
            self.sigmas_up = jnp.asarray(self._sig_up, jnp.float32)

    @property
    def loop_steps(self) -> int:
        return 2 * self.num_steps - 1

    @property
    def init_sigma(self):
        return jnp.sqrt(self.eval_sigmas[0] ** 2 + 1.0)

    def init_aux(self, latents):
        return jnp.zeros_like(latents)

    def scale_model_input(self, sample, i):
        return sample / jnp.sqrt(self.eval_sigmas[i] ** 2 + 1.0)

    def _x0(self, model_out, sample, sigma):
        if self.cfg.prediction_type == "epsilon":
            return sample - sigma * model_out
        if self.cfg.prediction_type == "v_prediction":
            return sample / (sigma ** 2 + 1) \
                - (sigma / jnp.sqrt(sigma ** 2 + 1)) * model_out
        raise ValueError(self.cfg.prediction_type)

    def step_aux(self, model_out, i, sample, aux, key=None):
        outer = i // 2
        first = (i % 2) == 0
        sigma = self.sigmas[outer]
        sigma_mid = self.sigmas_interp[outer]
        sigma_end = self.sigmas_down[outer]
        last_interval = outer == self.num_steps - 1

        x0 = self._x0(model_out, sample, self.eval_sigmas[i])

        # -- first substep: hold the sample, move to the midpoint ------
        d1 = (sample - x0) / jnp.maximum(sigma, 1e-12)
        to_mid = sample + d1 * (sigma_mid - sigma)
        # final interval: single Euler step straight to sigma_end
        to_end_euler = sample + d1 * (sigma_end - sigma)
        first_prev = jnp.where(last_interval, to_end_euler, to_mid)
        first_aux = sample

        # -- second substep: midpoint slope applied from held sample ---
        d2 = (sample - x0) / jnp.maximum(sigma_mid, 1e-12)
        second_prev = aux + d2 * (sigma_end - sigma)
        if self.ancestral:
            noise = (jax.random.normal(key, sample.shape)
                     if key is not None else jnp.zeros_like(sample))
            second_prev = second_prev + self.sigmas_up[outer] * noise
            first_prev = jnp.where(
                last_interval,
                first_prev + self.sigmas_up[outer] * noise, first_prev)

        prev = jnp.where(first, first_prev, second_prev)
        new_aux = jnp.where(first, first_aux, jnp.zeros_like(sample))
        return prev, new_aux

    def add_noise(self, x0, noise, i):
        return x0 + self.eval_sigmas[i] * noise


class KDPM2Ancestral(KDPM2):
    """diffusers `KDPM2AncestralDiscreteScheduler` / k-diffusion
    sample_dpm_2_ancestral: KDPM2 whose intervals end at the ancestral
    sigma_down with sigma_up noise injection."""

    ancestral = True


# --------------------------------------------------------------------- #
# Registry — the reference's DIFFUSERS_SCHEDULER_DICT surface
# (`/root/reference/nodes.py:163-172`; trailing commas in the reference's
# key strings are stripped, and the stray Wonder3D pipeline entry is
# dropped — it is not a scheduler)
# --------------------------------------------------------------------- #

SCHEDULERS = {
    "EulerAncestralDiscreteScheduler": EulerAncestral,
    "EulerDiscreteScheduler": Euler,
    "DDIMScheduler": DDIM,
    "DDPMScheduler": DDPM,
    "DDIMParallelScheduler": DDIMParallel,
    "LCMScheduler": LCM,
    "KDPM2AncestralDiscreteScheduler": KDPM2Ancestral,
    "KDPM2DiscreteScheduler": KDPM2,
}


def make_scheduler(name, cfg: SchedulerConfig = SchedulerConfig(),
                   num_steps: int = 50):
    """Scheduler by reference-registry name (trailing-comma keys from
    the reference dict are tolerated). Unknown / None → EulerAncestral,
    the zoo-wide default."""
    if not name:
        return EulerAncestral(cfg, num_steps)
    cls = SCHEDULERS.get(str(name).rstrip(",").strip())
    if cls is None:
        return EulerAncestral(cfg, num_steps)
    return cls(cfg, num_steps)


def sample_loop(sched, denoise_fn, latents, key=None):
    """Full denoise loop under lax.scan with the aux protocol.

    `denoise_fn(x_scaled, i, t)` → model output (guidance folded in by
    the caller's closure). Stochastic schedulers draw per-step noise from
    `fold_in(key, i)`. The caller scales the initial latents by
    `sched.init_sigma`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, i):
        lat, aux = carry
        x_in = sched.scale_model_input(lat, i)
        out = denoise_fn(x_in, i, sched.timesteps[i])
        lat, aux = sched.step_aux(out, i, lat, aux,
                                  key=jax.random.fold_in(key, i))
        return (lat, aux), None

    (lat, _), _ = jax.lax.scan(
        step, (latents, sched.init_aux(latents)),
        jnp.arange(sched.loop_steps))
    return lat
