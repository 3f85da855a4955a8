"""SSIM / MS-SSIM image losses in pure JAX.

Replaces `pytorch_msssim` as used by the 3DGS trainer loss
(`MVs_Algorithms/GaussianSplatting/main_3DGS.py:184-201`, weight
`lambda_ssim`). Gaussian-window separable convolutions compile to fused
depthwise convs on the VPU. Images are NHWC float in [0,1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(g / g.sum(), jnp.float32)


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' Gaussian blur, NHWC, per-channel."""
    k = win.shape[0]
    c = img.shape[-1]
    wr = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    wc = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, wr.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(img, wr, (1, 1), "VALID",
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    return jax.lax.conv_general_dilated(out, wc, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


@partial(jax.jit, static_argnames=("win_size", "sigma", "full"))
def ssim(x: jnp.ndarray, y: jnp.ndarray, win_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0,
         full: bool = False):
    """Mean SSIM over NHWC batches (and the contrast term when full)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    win = _gaussian_kernel(win_size, sigma)

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sig_x = _blur(x * x, win) - mu_xx
    sig_y = _blur(y * y, win) - mu_yy
    sig_xy = _blur(x * y, win) - mu_xy

    cs = (2 * sig_xy + c2) / (sig_x + sig_y + c2)
    s = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    if full:
        return s.mean(), cs.mean()
    return s.mean()


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@partial(jax.jit, static_argnames=("win_size", "sigma", "levels"))
def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, win_size: int = 11,
            sigma: float = 1.5, data_range: float = 1.0,
            levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. weights), NHWC."""
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum()
    vals = []
    for lvl in range(levels):
        # window must fit the (downsampled) image; keep it odd
        fit = min(win_size, x.shape[1], x.shape[2])
        fit = fit if fit % 2 == 1 else fit - 1
        s, cs = ssim(x, y, win_size=fit, sigma=sigma,
                     data_range=data_range, full=True)
        vals.append(jnp.where(lvl == levels - 1, s, cs))
        if lvl < levels - 1:
            x = _downsample2(x)
            y = _downsample2(y)
    vals = jnp.stack(vals)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** weights)


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = img.shape
    h2, w2 = h // 2, w // 2
    return img[:, :h2 * 2, :w2 * 2].reshape(n, h2, 2, w2, 2, c).mean((2, 4))


def psnr(x: jnp.ndarray, y: jnp.ndarray,
         data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
