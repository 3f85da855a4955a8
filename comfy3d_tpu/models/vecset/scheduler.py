"""Flow-matching Euler scheduler (functional).

Counterpart of the reference `FlowMatchEulerDiscreteScheduler`
(`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/schedulers.py:56-321`) as
used by `Hunyuan3DDiTFlowMatchingPipeline.__call__`
(`pipelines.py:690-766`): sigmas come from linspace(0, 1, N) through the
static shift map σ' = s·σ / (1 + (s-1)·σ) with a final 1.0 appended, the
model sees t = σ directly, and the Euler step is
x ← x + (σ_{i+1} − σ_i)·v. Noise sits at σ=0 in this convention.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flow_match_sigmas(num_steps: int, shift: float = 1.0) -> np.ndarray:
    """[num_steps + 1] sigmas (σ_0=0 … σ_N=1)."""
    s = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    s = shift * s / (1.0 + (shift - 1.0) * s)
    return np.concatenate([s, [1.0]]).astype(np.float32)


def flow_match_step(x, velocity, sigma, sigma_next):
    return x + (sigma_next - sigma) * velocity


def add_noise(sample, noise, sigma):
    """σ·noise + (1-σ)·sample (schedulers.py:146-171)."""
    return sigma * noise + (1.0 - sigma) * sample
