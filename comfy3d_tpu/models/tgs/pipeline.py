"""TriplaneGaussian (TGS): single image → 3D Gaussians, feed-forward.

Counterpart of `Gen_3D_Modules/TriplaneGaussian/
triplane_gaussian_transformers.py` + `Configs/TriplaneGaussian_config.
yaml`: camera-MLP-modulated DINOv2 tokens condition (1) a point-cloud
generator (learned point tokens → Transformer1D → xyz, then snowflake-
style ×2×4 upsampling) and (2) a point-conditioned triplane transformer
whose planes decode per-point gaussians (GSLayer contract: xyz offset,
σ opacity, normalized rotation, exp scaling, SH-3 colors).

Simplifications vs the reference, documented for the parity backlog: the
DINOv2 camera modulation rides an additive token (single-layer zero-init
adaLN in the reference), and the snowflake SPD upsampler's
skip-transformer is a pooled-feature offset MLP per stage.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.gaussian import GaussianSplat
from ..common import Transformer1D
from ..dinov2 import Dinov2, Dinov2Config, IMAGENET_MEAN, IMAGENET_STD
from ..triposr.model import TriplaneUpsample, grid_sample_2d


@dataclasses.dataclass(frozen=True)
class TGSConfig:
    cond_size: int = 252
    plane_size: int = 32
    plane_channels: int = 512
    triplane_out: int = 80
    num_points: int = 2048
    up_factors: Tuple[int, ...] = (2, 4)
    backbone_layers: int = 10
    heads: int = 8
    head_dim: int = 64
    cross_dim: int = 768
    sh_degree: int = 3
    radius: float = 0.6
    gs_hidden: int = 128
    init_scaling: float = -5.0
    clip_scaling: float = 0.2
    cond: Dinov2Config = Dinov2Config(hidden=768, layers=12, heads=12)

    @classmethod
    def tiny(cls) -> "TGSConfig":
        return cls(cond_size=28, plane_size=8, plane_channels=32,
                   triplane_out=16, num_points=64, up_factors=(2,),
                   backbone_layers=1, heads=2, head_dim=16, cross_dim=32,
                   sh_degree=0, gs_hidden=16,
                   cond=Dinov2Config(hidden=32, layers=1, heads=2,
                                     patch=14, pretrain_image_size=28))


class PointGenerator(nn.Module):
    """SimplePointGenerator role (pointclouds/simplepoint.py): learned
    point tokens → Transformer1D over image tokens → xyz + snowflake-
    style upsampling."""
    cfg: TGSConfig

    @nn.compact
    def __call__(self, image_tokens):
        c = self.cfg
        b = image_tokens.shape[0]
        tokens = self.param("point_tokens",
                            nn.initializers.normal(0.02),
                            (1, c.num_points, c.plane_channels))
        seq = jnp.broadcast_to(
            tokens, (b, c.num_points, c.plane_channels))
        seq = seq.transpose(0, 2, 1)            # [B, C, N] 1D contract
        seq = Transformer1D(
            in_channels=c.plane_channels, num_layers=c.backbone_layers,
            heads=c.heads, dim_head=c.head_dim,
            cross_attention_dim=c.cross_dim, name="backbone")(
            seq, context=image_tokens)
        pts = nn.Dense(3, name="point_out")(seq.transpose(0, 2, 1))
        pts = jnp.tanh(pts) * c.radius          # bounded (radius box)

        # snowflake SPD role: per-stage duplicate + learned offsets
        # conditioned on the pooled image feature
        pooled = image_tokens.mean(axis=1)       # [B, C]
        for si, f in enumerate(c.up_factors):
            n = pts.shape[1]
            feat = nn.Dense(c.gs_hidden, name=f"spd_{si}_cond")(pooled)
            h = nn.Dense(c.gs_hidden, name=f"spd_{si}_in")(pts)
            h = nn.silu(h + feat[:, None, :])
            off = nn.Dense(3 * f, name=f"spd_{si}_out")(h)
            off = off.reshape(b, n * f, 3)
            pts = jnp.repeat(pts, f, axis=1) + 0.05 * jnp.tanh(off)
        return pts


class LocalPoolPointnet(nn.Module):
    """pointclouds/pointnet.py role: scatter point features onto the 3
    planes with mean pooling + conv smoothing."""
    cfg: TGSConfig

    @nn.compact
    def __call__(self, points, feats):
        """points [B, N, 3]; feats [B, N, F] → planes
        [B, 3, P, P, C]."""
        c = self.cfg
        b, n, _ = points.shape
        h = nn.Dense(c.plane_channels, name="fc_in")(
            jnp.concatenate([points, feats], -1))
        u = jnp.clip((points / c.radius * 0.5 + 0.5)
                     * c.plane_size, 0, c.plane_size - 1 - 1e-4)
        planes = []
        pairs = ((0, 1), (0, 2), (1, 2))
        for pi, (a, bb) in enumerate(pairs):
            ix = u[..., a].astype(jnp.int32)
            iy = u[..., bb].astype(jnp.int32)
            lin = iy * c.plane_size + ix                   # [B, N]
            grid = jnp.zeros((b, c.plane_size ** 2, c.plane_channels))
            cnt = jnp.zeros((b, c.plane_size ** 2, 1))
            grid = jax.vmap(lambda g, l, hh: g.at[l].add(hh))(
                grid, lin, h)
            cnt = jax.vmap(lambda g, l: g.at[l].add(1.0))(
                cnt, lin, )
            grid = grid / jnp.maximum(cnt, 1.0)
            grid = grid.reshape(b, c.plane_size, c.plane_size,
                                c.plane_channels)
            grid = nn.Conv(c.plane_channels, (3, 3), padding=1,
                           name=f"conv_{pi}")(grid)
            planes.append(grid)
        return jnp.stack(planes, axis=1)


class GSDecoder(nn.Module):
    """GSLayer role (renderer.py:107-160): triplane features at each
    point → gaussian parameters."""
    cfg: TGSConfig

    @nn.compact
    def __call__(self, feat):
        c = self.cfg
        h = feat
        for i in range(2):
            h = nn.silu(nn.Dense(c.gs_hidden, name=f"mlp_{i}")(h))
        n_sh = (c.sh_degree + 1) ** 2
        xyz_off = nn.Dense(3, kernel_init=nn.initializers.zeros,
                           name="head_xyz")(h)
        opacity = nn.Dense(1, name="head_opacity")(h)[..., 0]
        scaling = nn.Dense(3, name="head_scaling")(h) + c.init_scaling
        rotation = nn.Dense(4, name="head_rotation")(h)
        rotation = rotation + jnp.asarray([1.0, 0, 0, 0])
        shs = nn.Dense(3 * n_sh, name="head_shs")(h)
        return {"xyz_offset": 0.02 * jnp.tanh(xyz_off),
                "opacity_raw": opacity,
                "scale_raw": jnp.minimum(scaling,
                                         np.log(c.clip_scaling)),
                "rot_raw": rotation,
                "sh": shs.reshape(*shs.shape[:-1], n_sh, 3)}


class TGSModel(nn.Module):
    cfg: TGSConfig = TGSConfig()

    def setup(self):
        c = self.cfg
        self.image_tokenizer = Dinov2(c.cond, name="image_tokenizer")
        self.camera_embedder_0 = nn.Dense(c.cross_dim,
                                          name="camera_embedder_0")
        self.camera_embedder_1 = nn.Dense(c.cross_dim,
                                          name="camera_embedder_1")
        self.img_proj = nn.Dense(c.cross_dim, name="img_proj")
        self.pointcloud_generator = PointGenerator(
            c, name="pointcloud_generator")
        self.point_encoder = LocalPoolPointnet(c, name="point_encoder")
        self.triplane_tokens = self.param(
            "triplane_tokens", nn.initializers.normal(0.02),
            (3, c.plane_size, c.plane_size, c.plane_channels))
        self.backbone = Transformer1D(
            in_channels=c.plane_channels, num_layers=c.backbone_layers,
            heads=c.heads, dim_head=c.head_dim,
            cross_attention_dim=c.cross_dim, name="backbone")
        self.post_processor = TriplaneUpsample(c.triplane_out,
                                               name="post_processor")
        self.gs_decoder = GSDecoder(c, name="gs_decoder")

    def __call__(self, image, camera):
        """image [B, S, S, 3] in [0,1]; camera [B, 25] →
        (points [B, N, 3], gaussian head dict)."""
        c = self.cfg
        b = image.shape[0]
        img = (image - IMAGENET_MEAN) / IMAGENET_STD
        tokens = self.image_tokenizer(img)
        tokens = self.img_proj(tokens)
        cam = self.camera_embedder_1(
            nn.silu(self.camera_embedder_0(camera)))
        tokens = jnp.concatenate([cam[:, None, :], tokens], axis=1)

        points = self.pointcloud_generator(tokens)

        pooled = jnp.broadcast_to(tokens.mean(axis=1)[:, None, :],
                                  (b, points.shape[1], c.cross_dim))
        planes0 = self.point_encoder(points, pooled)

        planes = jnp.broadcast_to(
            self.triplane_tokens[None],
            (b, 3, c.plane_size, c.plane_size, c.plane_channels))
        planes = planes + planes0
        seq = planes.reshape(b, 3 * c.plane_size ** 2,
                             c.plane_channels).transpose(0, 2, 1)
        seq = self.backbone(seq, context=tokens)
        planes = seq.transpose(0, 2, 1).reshape(
            b, 3, c.plane_size, c.plane_size, c.plane_channels)
        planes = self.post_processor(planes)

        def sample_one(pl, pts):
            p = pts / c.radius
            f_xy = grid_sample_2d(pl[0], p[:, (0, 1)])
            f_xz = grid_sample_2d(pl[1], p[:, (0, 2)])
            f_yz = grid_sample_2d(pl[2], p[:, (1, 2)])
            return jnp.concatenate([f_xy, f_xz, f_yz], -1)

        feats = jax.vmap(sample_one)(planes, points)
        return points, self.gs_decoder(feats)


class TGSPipeline:
    def __init__(self, params, cfg: TGSConfig = TGSConfig()):
        self.cfg = cfg
        self.model = TGSModel(cfg)
        self.params = params
        self._forward = jax.jit(lambda p, i, cam: self.model.apply(
            {"params": p}, i, cam))

    @classmethod
    def init_random(cls, key=None, cfg: Optional[TGSConfig] = None
                    ) -> "TGSPipeline":
        cfg = cfg or TGSConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        s = cfg.cond_size
        params = TGSModel(cfg).init(
            key, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 25)))["params"]
        return cls(params, cfg)

    def default_camera(self) -> np.ndarray:
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 1.9
        intr = np.array([0.7, 0.7, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0],
                        np.float32)
        return np.concatenate([c2w.reshape(-1), intr])[None]

    def __call__(self, image, camera=None) -> GaussianSplat:
        cfg = self.cfg
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = cfg.cond_size
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        cam = jnp.asarray(camera if camera is not None
                          else self.default_camera(), jnp.float32)
        points, gs = self._forward(self.params, image, cam)
        xyz = np.asarray(points[0] + gs["xyz_offset"][0])
        n = xyz.shape[0]
        return GaussianSplat(
            xyz=jnp.asarray(xyz),
            sh=jnp.asarray(gs["sh"][0]),
            opacity_raw=jnp.asarray(gs["opacity_raw"][0]),
            scale_raw=jnp.asarray(gs["scale_raw"][0]),
            rot_raw=jnp.asarray(gs["rot_raw"][0]),
            alive=jnp.ones((n,), bool))
