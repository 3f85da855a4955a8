"""Instant-NGP NeRF fitting (multi-view images → radiance field → mesh).

Counterpart of `InstantNGP` (`MVs_Algorithms/NeRF/Instant_NGP.py:19-205`):
hash-grid encoder + density/color MLPs, occupancy-grid-masked volume
rendering, Adam fit with TV regularization, then density-grid →
marching-tets mesh extraction (the reference marches rays with nerfacc and
extracts with grid sampling + marching cubes).

TPU design: rays are trained in large flat batches (one jit for
encode+MLP+march), the occupancy grid is an EMA buffer updated in-jit, and
densities for extraction are queried on a sharded chunk axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, get_rays
from ..ops import hashgrid, raymarch


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    iterations: int = 512
    ray_batch: int = 4096
    num_steps: int = 128
    lr: float = 1e-2
    lambda_tv: float = 1e-7
    lambda_entropy: float = 1e-3
    bound: float = 1.0
    occ_res: int = 64
    occ_update_every: int = 16
    occ_threshold: float = 0.01
    grid: hashgrid.HashGridConfig = hashgrid.HashGridConfig()
    hidden: int = 64
    geo_feat_dim: int = 15


def init_params(key, cfg: NGPConfig):
    ks = jax.random.split(key, 5)
    table = hashgrid.init_params(ks[0], cfg.grid)
    d_in = cfg.grid.output_dim

    def dense(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * (1.0 / np.sqrt(i)),
                "b": jnp.zeros((o,))}

    return {
        "table": table,
        # density MLP: enc → hidden → (1 sigma + geo_feat)
        "sig1": dense(ks[1], d_in, cfg.hidden),
        "sig2": dense(ks[2], cfg.hidden, 1 + cfg.geo_feat_dim),
        # color MLP: (geo_feat + dir_enc) → hidden → 3
        "col1": dense(ks[3], cfg.geo_feat_dim + 16, cfg.hidden),
        "col2": dense(ks[4], cfg.hidden, 3),
    }


def _dir_encoding(dirs: jnp.ndarray) -> jnp.ndarray:
    """SH-flavored direction features (degree-3 basis → 16 dims)."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    feats = [jnp.ones_like(x), x, y, z, x * y, y * z, x * z,
             x * x - y * y, 3 * z * z - 1,
             x * (x * x - 3 * y * y), y * (3 * x * x - y * y),
             z * (x * x - y * y), x * y * z,
             x * (5 * z * z - 1), y * (5 * z * z - 1),
             z * (5 * z * z - 3)]
    return jnp.stack(feats, -1)


def make_field(params, cfg: NGPConfig):
    def mlp(h, l1, l2):
        h = jnp.maximum(h @ l1["w"] + l1["b"], 0.0)
        return h @ l2["w"] + l2["b"]

    def density(xyz):
        u = (xyz / cfg.bound) * 0.5 + 0.5
        enc = hashgrid.encode(params["table"], u, cfg.grid)
        out = mlp(enc, params["sig1"], params["sig2"])
        sigma = jnp.exp(jnp.clip(out[:, 0], -10.0, 10.0))
        return sigma, out[:, 1:]

    def field(xyz, dirs):
        sigma, geo = density(xyz)
        h = jnp.concatenate([geo, _dir_encoding(dirs)], -1)
        rgb = jax.nn.sigmoid(mlp(h, params["col1"], params["col2"]))
        return sigma, rgb

    return field, density


def fit(cameras: Camera, images, masks, cfg: NGPConfig = NGPConfig(),
        seed: int = 0, progress: Optional[Callable] = None):
    """Fit the field; returns (params, occ_values).

    images [V,H,W,3], masks [V,H,W] — rays composite against a white
    background where mask=0 (matching the reference's masked supervision).
    """
    import optax

    images = jnp.asarray(images, jnp.float32)
    masks = jnp.asarray(masks, jnp.float32)
    v, h, w = images.shape[:3]
    origins, dirs = get_rays(cameras)
    flat_o = origins.reshape(-1, 3)
    flat_d = dirs.reshape(-1, 3)
    flat_rgb = (images * masks[..., None]
                + (1.0 - masks[..., None])).reshape(-1, 3)
    flat_m = masks.reshape(-1)
    nrays = flat_o.shape[0]

    params = init_params(jax.random.PRNGKey(seed), cfg)
    occ_values = jnp.zeros((cfg.occ_res,) * 3)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    def loss_fn(params, idx, occ_grid, key):
        field, _ = make_field(params, cfg)
        out = raymarch.march(field, flat_o[idx], flat_d[idx],
                             occ_grid=occ_grid, bound=cfg.bound,
                             num_steps=cfg.num_steps, key=key)
        rgb = out["rgb"] + (1.0 - out["alpha"][:, None])  # white bg
        loss = ((rgb - flat_rgb[idx]) ** 2).mean()
        loss = loss + cfg.lambda_entropy * (
            (out["alpha"] - flat_m[idx]) ** 2).mean()
        if cfg.lambda_tv > 0:
            loss = loss + cfg.lambda_tv * hashgrid.total_variation_loss(
                params["table"], key, cfg.grid)
        return loss

    @jax.jit
    def step(params, opt_state, occ, key):
        k_idx, k_march, k_occ = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (cfg.ray_batch,), 0, nrays)
        occ_grid = occ > cfg.occ_threshold
        loss, g = jax.value_and_grad(loss_fn)(params, idx, occ_grid, k_march)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def occ_step(params, occ, key):
        _, density = make_field(params, cfg)
        return raymarch.update_occupancy(
            occ, lambda x: density(x)[0].reshape(occ.shape),
            cfg.occ_res, bound=cfg.bound, key=key)

    key = jax.random.PRNGKey(seed + 1)
    for it in range(cfg.iterations):
        key, k1, k2 = jax.random.split(key, 3)
        params, opt_state, loss = step(params, opt_state, occ_values, k1)
        if it < 64 or it % cfg.occ_update_every == 0:
            occ_values = occ_step(params, occ_values, k2)
        if progress is not None and it % 50 == 0:
            progress(it, {"loss": float(loss)})
    return params, occ_values


def render_views(params, cameras: Camera, cfg: NGPConfig,
                 occ_values=None, chunk_rays: int = 65536):
    """Render full images from a fitted field."""
    field, _ = make_field(params, cfg)
    origins, dirs = get_rays(cameras)
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    occ_grid = (occ_values > cfg.occ_threshold) if occ_values is not None \
        else None
    outs = {"rgb": [], "alpha": [], "depth": []}
    for i in range(0, o.shape[0], chunk_rays):
        out = raymarch.march(field, o[i:i + chunk_rays], d[i:i + chunk_rays],
                             occ_grid=occ_grid, bound=cfg.bound,
                             num_steps=cfg.num_steps)
        for k in outs:
            outs[k].append(out[k])
    return {k: jnp.concatenate(vs).reshape(shape + vs[0].shape[1:])
            for k, vs in outs.items()}


def density_grid(params, cfg: NGPConfig, res: int = 128,
                 chunk: int = 262144) -> jnp.ndarray:
    """Sample σ on a res³ grid for surface extraction (the reference's
    chunked `extract_fields` role, `mesh_utils.py:495-505`)."""
    _, density = make_field(params, cfg)
    lin = jnp.linspace(-cfg.bound, cfg.bound, res)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    vals = []
    for i in range(0, pts.shape[0], chunk):
        vals.append(density(pts[i:i + chunk])[0])
    return jnp.concatenate(vals).reshape(res, res, res)
