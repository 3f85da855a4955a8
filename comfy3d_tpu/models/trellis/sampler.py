"""TRELLIS flow Euler sampler with CFG + guidance interval (functional).

Counterpart of `trellis/pipelines/samplers/flow_euler.py:12-200` and
`guidance_interval_mixin.py`. The whole loop is jit-friendly: the t
schedule is host-precomputed, the step is a lax.scan body, and the
guidance-interval branch is a lax.select (cheap relative to the model)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def flow_t_schedule(steps: int, rescale_t: float = 1.0) -> np.ndarray:
    """[steps + 1] t values from 1 → 0 (flow_euler.py:107-109)."""
    t = np.linspace(1.0, 0.0, steps + 1)
    return (rescale_t * t / (1 + (rescale_t - 1) * t)).astype(np.float32)


def sample_flow_euler(model_fn, noise, cond, neg_cond, steps: int,
                      cfg_strength: float = 3.0,
                      cfg_interval=(0.0, 1.0), rescale_t: float = 1.0):
    """model_fn(x, t1000 [B], cond) → v. Returns the final sample.

    CFG with interval: inside [lo, hi] the prediction is
    (1+s)·pred − s·neg_pred, outside it is the plain conditional
    prediction (guidance_interval_mixin.py:9-15)."""
    t_seq = jnp.asarray(flow_t_schedule(steps, rescale_t))
    lo, hi = cfg_interval

    def step(x, i):
        t = t_seq[i]
        t_prev = t_seq[i + 1]
        tvec = jnp.broadcast_to(1000.0 * t, (x.shape[0],))
        pred = model_fn(x, tvec, cond)
        neg = model_fn(x, tvec, neg_cond)
        in_interval = (t >= lo) & (t <= hi)
        v = jnp.where(in_interval,
                      (1 + cfg_strength) * pred - cfg_strength * neg,
                      pred)
        return x - (t - t_prev) * v, None

    x, _ = jax.lax.scan(step, noise, jnp.arange(steps))
    return x
