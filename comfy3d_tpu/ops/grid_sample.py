"""Differentiable grid sampling (2D + 3D).

The TPU-native replacement for Hunyuan3D-V1's in-tree double-backward
CUDA grid_sample
(`Hunyuan3D_V1/svrm/ldm/modules/rendering_neus/third_party/ops/
grid_sample.cu`, 668 LoC — a hand-written second-order-differentiable
`F.grid_sample(align_corners=False, padding_mode='zeros')`). Written
as plain gather/lerp jax, every order of derivative comes from AD —
no custom VJP needed — and XLA lowers the gathers onto the TPU's
vector unit.

`grid_sample_2d` lives in `models.triposr.model` (kept there for its
existing importers, re-exported here); `grid_sample_3d` is the
volumetric variant (the reference's `sample_from_3dgrid` /
`F.grid_sample` on 5D inputs, renderer.py:78-91).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.triposr.model import grid_sample_2d  # noqa: F401

__all__ = ["grid_sample_2d", "grid_sample_3d"]


def grid_sample_3d(volume, uvw):
    """Trilinear sample with torch
    `grid_sample(align_corners=False, padding_mode='zeros')` semantics.

    volume [D, H, W, C]; uvw [..., 3] in [-1, 1] where uvw[..., 0]=x
    indexes W, uvw[..., 1]=y indexes H, uvw[..., 2]=z indexes D (the
    torch 5D grid convention). Differentiable to any order.
    """
    d, h, w = volume.shape[0], volume.shape[1], volume.shape[2]
    x = (uvw[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (uvw[..., 1] + 1.0) * (h / 2.0) - 0.5
    z = (uvw[..., 2] + 1.0) * (d / 2.0) - 0.5
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0

    def fetch(xi, yi, zi):
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        zc = jnp.clip(zi.astype(jnp.int32), 0, d - 1)
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
               & (zi >= 0) & (zi <= d - 1)).astype(volume.dtype)
        return volume[zc, yc, xc] * inb[..., None]

    fx = fx[..., None]
    fy = fy[..., None]
    fz = fz[..., None]
    out = 0.0
    for dz, wz in ((0, 1 - fz), (1, fz)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                out = out + wx * wy * wz * fetch(x0 + dx, y0 + dy,
                                                z0 + dz)
    return out
