"""CRM — Convolutional Reconstruction Model.

Counterpart of `Gen_3D_Modules/CRM/model/crm/model.py:23-160`: six
orbit views of RGB + canonical-coordinate maps (CCMs) are rolled out
into a 256×768 triplane strip, refined by a conv UNet
(`model/archs/unet.py` UNet2DModel wrapper), queried by TetTexNet and
decoded by sdf/rgb/weight MLPs into a FlexiCubes-class mesh (our
marching-tets engine extracts; the 21 predicted cube weights ride along
for parity work, as in InstantMesh).

The upstream 6-view pixel+CCM diffusion (`imagedream` vendored LDM) is
the MVDream family — `models.mvdream.MVDreamPipeline` with 6 views
covers that stage; this module is the reconstructor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import tetra
from ..triposr.model import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class CRMConfig:
    view_size: int = 256
    plane_resolution: int = 256
    c_dim: int = 32
    channels: Tuple[int, ...] = (64, 128, 128, 256, 256)
    attn_from: int = 3               # blocks ≥ this index get attention
    mlp_hidden: int = 512
    tet_grid_size: int = 80
    scale: float = 1.05

    @classmethod
    def tiny(cls) -> "CRMConfig":
        return cls(view_size=32, plane_resolution=32, c_dim=8,
                   channels=(8, 16), attn_from=1, mlp_hidden=16,
                   tet_grid_size=12)


class _AttnBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hid = nn.GroupNorm(min(32, c), epsilon=1e-6, name="norm")(x)
        hid = hid.reshape(b, h * w, c)
        q = nn.Dense(c, name="q")(hid)
        k = nn.Dense(c, name="k")(hid)
        v = nn.Dense(c, name="v")(hid)
        out = jax.nn.dot_product_attention(q[:, :, None], k[:, :, None],
                                           v[:, :, None])[:, :, 0]
        out = nn.Dense(c, name="proj")(out)
        return x + out.reshape(b, h, w, c)


class _Res(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(min(32, x.shape[-1]), epsilon=1e-6,
                         name="norm1")(x)
        h = nn.Conv(self.channels, (3, 3), padding=1,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(min(32, self.channels), epsilon=1e-6,
                         name="norm2")(h)
        h = nn.Conv(self.channels, (3, 3), padding=1,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), name="shortcut")(x)
        return x + h


class TriplaneUNet(nn.Module):
    """UNetPP role: refine the rolled-out triplane strip."""
    cfg: CRMConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        skips = []
        h = nn.Conv(c.channels[0], (3, 3), padding=1, name="conv_in")(x)
        for i, ch in enumerate(c.channels):
            h = _Res(ch, name=f"down_{i}_res")(h)
            if i >= c.attn_from:
                h = _AttnBlock(ch, name=f"down_{i}_attn")(h)
            skips.append(h)
            if i < len(c.channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            name=f"down_{i}_pool")(h)
        h = _Res(c.channels[-1], name="mid_res")(h)
        for i in reversed(range(len(c.channels))):
            if i < len(c.channels) - 1:
                b, hh, ww, ch_ = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, ch_),
                                     "nearest")
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _Res(c.channels[i], name=f"up_{i}_res")(h)
            if i >= c.attn_from:
                h = _AttnBlock(c.channels[i], name=f"up_{i}_attn")(h)
        return nn.Conv(c.c_dim, (3, 3), padding=1, name="conv_out")(h)


class CRMModel(nn.Module):
    cfg: CRMConfig = CRMConfig()

    def setup(self):
        c = self.cfg
        self.unet2 = TriplaneUNet(c, name="unet2")
        h = c.mlp_hidden
        self.sdf_0 = nn.Dense(h, name="sdf_0")
        self.sdf_1 = nn.Dense(4, name="sdf_1")     # sdf + deform(3)
        self.rgb_0 = nn.Dense(h, name="rgb_0")
        self.rgb_1 = nn.Dense(3, name="rgb_1")
        self.weight_0 = nn.Dense(h, name="weight_0")
        self.weight_1 = nn.Dense(21, name="weight_1")

    def __call__(self, views):
        """views [B, 6, S, S, 6] (rgb+ccm per view) → triplane strip
        [B, P, 3P, c_dim] (rollout: 2 rows × 3 views → 3 planes à la
        CRM's 256×768 layout)."""
        c = self.cfg
        b, v, s, _, ch = views.shape
        strip = views.transpose(0, 2, 1, 3, 4).reshape(b, s, v * s, ch)
        strip = jax.image.resize(
            strip, (b, c.plane_resolution, 3 * c.plane_resolution, ch),
            "bilinear")
        return self.unet2(strip)

    def query(self, planes, pts):
        """planes [P, 3P, C] strip; pts [N, 3] → (sdf, deform, rgb,
        weights)."""
        c = self.cfg
        p = c.plane_resolution
        tri = planes.reshape(p, 3, p, c.c_dim).transpose(1, 0, 2, 3)
        u = pts / c.scale
        f_xy = grid_sample_2d(tri[0], u[:, (0, 1)])
        f_xz = grid_sample_2d(tri[1], u[:, (0, 2)])
        f_yz = grid_sample_2d(tri[2], u[:, (1, 2)])
        feat = jnp.concatenate([f_xy, f_xz, f_yz], -1)
        sd = self.sdf_1(nn.silu(self.sdf_0(feat)))
        rgb = jax.nn.sigmoid(self.rgb_1(nn.silu(self.rgb_0(feat))))
        w = self.weight_1(nn.silu(self.weight_0(feat))) * 0.1
        return sd[:, 0], jnp.tanh(sd[:, 1:]) / c.tet_grid_size, rgb, w

    def init_all(self, views, pts):
        planes = self(views)
        return self.query(planes[0], pts)


class CRMReconPipeline:
    def __init__(self, params, cfg: CRMConfig = CRMConfig()):
        self.cfg = cfg
        self.model = CRMModel(cfg)
        self.params = params
        self._forward = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def init_random(cls, key=None, cfg: Optional[CRMConfig] = None
                    ) -> "CRMReconPipeline":
        cfg = cfg or CRMConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        s = cfg.view_size
        params = CRMModel(cfg).init(
            key, jnp.zeros((1, 6, s, s, 6)), jnp.zeros((5, 3)),
            method=CRMModel.init_all)["params"]
        return cls(params, cfg)

    def __call__(self, images, ccms, with_color: bool = True):
        """images, ccms [6, S, S, 3] in [0,1] → Mesh."""
        c = self.cfg
        views = jnp.concatenate([jnp.asarray(images, jnp.float32),
                                 jnp.asarray(ccms, jnp.float32)],
                                axis=-1)[None]
        planes = self._forward(self.params, views)[0]
        res = c.tet_grid_size + 1
        lin = np.linspace(-c.scale, c.scale, res, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        query = jax.jit(lambda pl, q: self.model.apply(
            {"params": self.params}, pl, q, method=CRMModel.query))
        chunk = 262144
        sdfs, deforms = [], []
        for i in range(0, len(pts), chunk):
            sd, df, _, _ = query(planes, jnp.asarray(pts[i:i + chunk]))
            sdfs.append(np.asarray(sd))
            deforms.append(np.asarray(df))
        grid = np.concatenate(sdfs).reshape(res, res, res)
        mesh = tetra.extract_isosurface(grid, iso=0.0,
                                        bounds=(-c.scale, c.scale))
        if with_color and mesh.num_vertices:
            cols = []
            mv = jnp.asarray(mesh.v, jnp.float32)
            for i in range(0, mv.shape[0], chunk):
                _, _, rgb, _ = query(planes, mv[i:i + chunk])
                cols.append(np.asarray(rgb))
            mesh.vc = np.clip(np.concatenate(cols), 0, 1)
        return mesh.auto_normal()
