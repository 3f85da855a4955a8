"""Hunyuan3D-V1 SVRM: multi-view images → NeuS triplane → mesh.

Counterpart of `Gen_3D_Modules/Hunyuan3D_V1/svrm/ldm/models/
svrm.py:110-184` + `Configs/Hunyuan3D_V1_svrm_config.yaml`: camera-
conditioned DINOv2 tokens from each view → 64² learned triplane tokens
through a 16-layer cross-attention transformer → two 2× upsamples to
256² 120-channel planes → SDF + color queries (NeuS synthesizer role) →
marching cubes at sdf 0. The views→mesh node path (`Views2Mesh`,
`infer/views_to_mesh.py:37`).

The in-tree CUDA ops this replaces: the double-backward grid_sample
(`third_party/ops/grid_sample.cu`) is `grid_sample_2d` (jax AD gives
higher-order grads for free), bias_act is a plain XLA fusion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import tetra
from ..common import Transformer1D
from ..dinov2 import Dinov2, Dinov2Config, IMAGENET_MEAN, IMAGENET_STD
from ..triposr.model import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class SVRMConfig:
    cond_size: int = 504             # multiple of 14
    pos_emb_size: int = 64
    pos_emb_dim: int = 1024
    cam_cond_dim: int = 20
    heads: int = 16
    head_dim: int = 64
    depth: int = 16
    context_dim: int = 768
    triplane_dim: int = 120
    upsample_time: int = 2
    mlp_hidden: int = 64
    radius: float = 0.6
    cond: Dinov2Config = Dinov2Config(hidden=768, layers=12, heads=12)

    @classmethod
    def tiny(cls) -> "SVRMConfig":
        return cls(cond_size=28, pos_emb_size=8, pos_emb_dim=32,
                   heads=2, head_dim=16, depth=1, context_dim=32,
                   triplane_dim=8, upsample_time=1, mlp_hidden=16,
                   cond=Dinov2Config(hidden=32, layers=1, heads=2,
                                     patch=14, pretrain_image_size=28))


class SVRMModel(nn.Module):
    cfg: SVRMConfig = SVRMConfig()

    def setup(self):
        c = self.cfg
        self.img_encoder = Dinov2(c.cond, name="img_encoder")
        self.cam_embed = nn.Dense(c.context_dim, name="cam_embed")
        self.img_proj = nn.Dense(c.context_dim, name="img_proj")
        self.triplane_tokens = self.param(
            "triplane_tokens", nn.initializers.normal(0.02),
            (3, c.pos_emb_size, c.pos_emb_size, c.pos_emb_dim))
        self.backbone = Transformer1D(
            in_channels=c.pos_emb_dim, num_layers=c.depth,
            heads=c.heads, dim_head=c.head_dim,
            cross_attention_dim=c.context_dim, name="backbone")
        ups = []
        for i in range(c.upsample_time):
            out_ch = (c.triplane_dim if i == c.upsample_time - 1
                      else c.pos_emb_dim)
            ups.append(nn.ConvTranspose(out_ch, (2, 2), strides=(2, 2),
                                        name=f"upsample_{i}"))
        self.upsamplers = ups
        h = c.mlp_hidden
        self.sdf_0 = nn.Dense(h, name="sdf_0")
        self.sdf_1 = nn.Dense(1, name="sdf_1")
        self.rgb_0 = nn.Dense(h, name="rgb_0")
        self.rgb_1 = nn.Dense(3, name="rgb_1")

    def __call__(self, views, cams):
        """views [V, S, S, 3] in [0,1]; cams [V, cam_cond_dim] →
        triplanes [3, H, W, triplane_dim]."""
        c = self.cfg
        v = views.shape[0]
        img = (views - IMAGENET_MEAN) / IMAGENET_STD
        tokens = self.img_proj(self.img_encoder(img))   # [V, L, ctx]
        cam_tok = self.cam_embed(cams)[:, None, :]
        tokens = jnp.concatenate([cam_tok, tokens], axis=1)
        tokens = tokens.reshape(1, -1, c.context_dim)   # concat views

        planes = self.triplane_tokens[None]
        seq = planes.reshape(1, 3 * c.pos_emb_size ** 2, c.pos_emb_dim)
        seq = seq.transpose(0, 2, 1)
        seq = self.backbone(seq, context=tokens)
        planes = seq.transpose(0, 2, 1).reshape(
            3, c.pos_emb_size, c.pos_emb_size, c.pos_emb_dim)
        for up in self.upsamplers:
            planes = nn.silu(up(planes)) if up is not self.upsamplers[-1] \
                else up(planes)
        return planes

    def query(self, planes, pts):
        """planes [3, H, W, C]; pts [N, 3] → (sdf [N], rgb [N, 3])."""
        c = self.cfg
        u = pts / c.radius
        f_xy = grid_sample_2d(planes[0], u[:, (0, 1)])
        f_xz = grid_sample_2d(planes[1], u[:, (0, 2)])
        f_yz = grid_sample_2d(planes[2], u[:, (1, 2)])
        feat = jnp.concatenate([f_xy, f_xz, f_yz], -1)
        sdf = self.sdf_1(nn.silu(self.sdf_0(feat)))[:, 0]
        rgb = jax.nn.sigmoid(self.rgb_1(nn.silu(self.rgb_0(feat))))
        return sdf, rgb

    def init_all(self, views, cams, pts):
        planes = self(views, cams)
        return self.query(planes, pts)


class SVRMPipeline:
    def __init__(self, params, cfg: SVRMConfig = SVRMConfig()):
        self.cfg = cfg
        self.model = SVRMModel(cfg)
        self.params = params
        self._forward = jax.jit(lambda p, v, c: self.model.apply(
            {"params": p}, v, c))

    @classmethod
    def init_random(cls, key=None, cfg: Optional[SVRMConfig] = None
                    ) -> "SVRMPipeline":
        cfg = cfg or SVRMConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        s = cfg.cond_size
        params = SVRMModel(cfg).init(
            key, jnp.zeros((2, s, s, 3)),
            jnp.zeros((2, cfg.cam_cond_dim)), jnp.zeros((5, 3)),
            method=SVRMModel.init_all)["params"]
        return cls(params, cfg)

    def default_cams(self, n_views: int) -> np.ndarray:
        """[V, 20] camera condition rows (azimuth orbit, svrm
        convention: flattened extrinsics + intrinsics summary)."""
        cams = np.zeros((n_views, self.cfg.cam_cond_dim), np.float32)
        az = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
        cams[:, 0] = np.sin(az)
        cams[:, 1] = np.cos(az)
        cams[:, 2] = 1.5
        return cams

    def views_to_mesh(self, views, cams=None, mesh_size: int = 384,
                      with_color: bool = True, chunk: int = 262144,
                      target_faces: Optional[int] = None):
        """views [V, S, S, 3] → Mesh (generate_mesh, svrm.py:128-183).
        Decimation (target_faces) runs BEFORE the color query so vertex
        colors land on the final vertices."""
        c = self.cfg
        views = jnp.asarray(views, jnp.float32)
        s = c.cond_size
        if views.shape[1] != s:
            views = jax.image.resize(
                views, (views.shape[0], s, s, 3), "bilinear")
        if cams is None:
            cams = self.default_cams(views.shape[0])
        planes = self._forward(self.params, views,
                               jnp.asarray(cams, jnp.float32))
        query = jax.jit(lambda pts: self.model.apply(
            {"params": self.params}, planes, pts,
            method=SVRMModel.query))
        lin = np.linspace(-c.radius, c.radius, mesh_size,
                          dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        sdfs = []
        for i in range(0, len(pts), chunk):
            sdfs.append(np.asarray(query(
                jnp.asarray(pts[i:i + chunk]))[0]))
        grid = np.concatenate(sdfs).reshape(mesh_size, mesh_size,
                                            mesh_size)
        # mcubes on (0 - sdf): inside where sdf < 0
        mesh = tetra.extract_isosurface(-grid, iso=0.0,
                                        bounds=(-c.radius, c.radius))
        if target_faces is not None and len(mesh.f) > target_faces:
            from ... import native
            from ...core.mesh import Mesh
            v, f = native.decimate_mesh(mesh.v, mesh.f,
                                        int(target_faces))
            mesh = Mesh(v=v, f=f)
        if with_color and mesh.num_vertices:
            cols = []
            mv = jnp.asarray(mesh.v, jnp.float32)
            for i in range(0, mv.shape[0], chunk):
                cols.append(np.asarray(query(mv[i:i + chunk])[1]))
            mesh.vc = np.clip(np.concatenate(cols), 0, 1)
        return mesh.auto_normal()
