"""SF3D pipeline: single image → textured mesh with UV atlas.

Counterpart of `Gen_3D_Modules/StableFast3D/sf3d/system.py:225-420`
(`run_image` → `generate_mesh`): camera-modulated DINOv2 tokens +
learned triplane tokens → two-stream interleave transformer →
pixel-shuffle upsample (96→384 planes, 40ch) → density field → marching
tets at `isosurface_resolution` → vertex offsets → box UV unwrap
(`box_uv_unwrap.py` role via ops.texture.box_unwrap) → albedo bake.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import tetra
from ..dinov2 import Dinov2, Dinov2Config, IMAGENET_MEAN, IMAGENET_STD
from ..triposr.model import grid_sample_2d
from .model import (BackboneConfig, MaterialMLP, PixelShuffleUpsample,
                    TwoStreamInterleaveTransformer)

import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class SF3DConfig:
    cond_image_size: int = 512
    isosurface_resolution: int = 160
    isosurface_threshold: float = 10.0
    radius: float = 0.87
    plane_size: int = 96
    token_channels: int = 1024
    triplane_channels: int = 40
    modulation_dim: int = 768        # camera adaLN cond (config.yaml)
    backbone: BackboneConfig = BackboneConfig()
    cond: Dinov2Config = Dinov2Config(hidden=1024, layers=24, heads=16,
                                      modulation_dim=768)
    camera_cond_dim: int = 25        # c2w (16) + normalized intrinsics (9)

    @classmethod
    def tiny(cls) -> "SF3DConfig":
        return cls(
            cond_image_size=28, isosurface_resolution=24, plane_size=8,
            token_channels=32, triplane_channels=8, modulation_dim=16,
            backbone=BackboneConfig(heads=2, head_dim=16,
                                    raw_triplane_channels=32,
                                    triplane_channels=32,
                                    raw_image_channels=32,
                                    num_latents=16, num_blocks=1,
                                    num_basic_blocks=1,
                                    norm_num_groups=8),
            cond=Dinov2Config(hidden=32, layers=1, heads=2, patch=14,
                              pretrain_image_size=28,
                              modulation_dim=16))


def _grid_sample_ac(plane, uv):
    """torch grid_sample(align_corners=True, bilinear, zero pad).
    plane [H, W, C]; uv [..., 2], uv[...,0]=x indexes W."""
    h, w = plane.shape[0], plane.shape[1]
    x = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0

    def fetch(xi, yi):
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
               & (yi <= h - 1)).astype(plane.dtype)
        return plane[yi_c, xi_c] * inb[..., None]

    fx, fy = fx[..., None], fy[..., None]
    return ((1 - fx) * (1 - fy) * fetch(x0, y0)
            + fx * (1 - fy) * fetch(x0 + 1, y0)
            + (1 - fx) * fy * fetch(x0, y0 + 1)
            + fx * fy * fetch(x0 + 1, y0 + 1))


class SF3DModel(nn.Module):
    cfg: SF3DConfig = SF3DConfig()

    def setup(self):
        c = self.cfg
        self.image_tokenizer = Dinov2(c.cond, name="image_tokenizer")
        self.camera_embedder = nn.Dense(c.modulation_dim,
                                        name="camera_embedder")
        self.triplane_tokens = self.param(
            "triplane_tokens", nn.initializers.normal(1.0),
            (3, c.plane_size, c.plane_size, c.token_channels))
        self.backbone = TwoStreamInterleaveTransformer(c.backbone,
                                                       name="backbone")
        self.post_processor = PixelShuffleUpsample(
            in_channels=c.token_channels,
            out_channels=c.triplane_channels, name="post_processor")
        self.decoder = MaterialMLP(in_channels=3 * c.triplane_channels,
                                   name="decoder")

    def __call__(self, image, camera):
        """image [B, S, S, 3] in [0,1]; camera [B, 25] → triplanes
        [B, 3, 4P, 4P, C]."""
        c = self.cfg
        b = image.shape[0]
        img = (image - IMAGENET_MEAN) / IMAGENET_STD
        # camera conditioning modulates every DINOv2 layer adaLN-style,
        # exactly like the reference (`system.py:get_scene_codes` →
        # `image_tokenizer(..., modulation_cond=camera_embeds)`)
        cam = self.camera_embedder(camera)
        tokens = self.image_tokenizer(img, cam)

        planes = jnp.broadcast_to(
            self.triplane_tokens[None],
            (b, 3, c.plane_size, c.plane_size, c.token_channels))
        seq = planes.reshape(b, 3 * c.plane_size ** 2, c.token_channels)
        seq = self.backbone(seq, tokens)
        planes = seq.reshape(b, 3, c.plane_size, c.plane_size,
                             c.token_channels)
        return self.post_processor(planes)

    def query(self, triplanes, positions, include=None):
        """triplanes [3, H, W, C]; positions [N, 3] → head dict.
        `system.py:query_triplane`: align_corners=True bilinear over
        (x,y)/(x,z)/(y,z) index pairs."""
        c = self.cfg
        p = positions / c.radius
        f_xy = _grid_sample_ac(triplanes[0], p[:, (0, 1)])
        f_xz = _grid_sample_ac(triplanes[1], p[:, (0, 2)])
        f_yz = _grid_sample_ac(triplanes[2], p[:, (1, 2)])
        feat = jnp.concatenate([f_xy, f_xz, f_yz], -1)
        return self.decoder(feat, include=include)

    def init_all(self, image, camera, positions):
        planes = self(image, camera)
        return self.query(planes[0], positions)


class SF3DPipeline:
    def __init__(self, params, cfg: SF3DConfig = SF3DConfig()):
        self.cfg = cfg
        self.model = SF3DModel(cfg)
        self.params = params
        self._forward = jax.jit(lambda p, i, cam: self.model.apply(
            {"params": p}, i, cam))
        # optional PBR estimators (populated by convert.from_pretrained)
        self.image_estimator_params = None
        self.clip_params = None
        self.global_estimator_params = None

    @classmethod
    def from_pretrained(cls, path, cfg=None):
        from . import convert as _c
        return _c.from_pretrained(path, cfg)

    def set_estimators(self, image_est, clip, global_est):
        self.image_estimator_params = image_est
        self.clip_params = clip
        self.global_estimator_params = global_est

    def estimate_materials(self, image):
        """image [S, S, 3] in [0,1] → {"roughness", "metallic"} scalars
        via open_clip features + Beta heads (`system.py:run_image` →
        `image_estimator(batch["rgb_cond"])`). Returns reference
        defaults (0.5/0.0) when the estimator isn't loaded."""
        if self.image_estimator_params is None or self.clip_params is None:
            return {"roughness": 0.5, "metallic": 0.0}
        from ..clip import CLIPVisionConfig, CLIPVisionEncoder
        from .model import ClipHeadEstimator
        mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
        std = jnp.array([0.26862954, 0.26130258, 0.27577711])
        img = jnp.asarray(image, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        img = jax.image.resize(img, (img.shape[0], 224, 224, 3),
                               "bilinear")
        img = (img - mean) / std
        vit = CLIPVisionEncoder(CLIPVisionConfig(
            hidden=768, layers=12, heads=12, mlp_dim=3072, patch=32,
            projection_dim=512, act="gelu"))
        _, feats = vit.apply({"params": self.clip_params}, img)
        out = ClipHeadEstimator().apply(
            {"params": self.image_estimator_params}, feats)
        return {k: float(np.asarray(v)[0]) for k, v in out.items()}

    @classmethod
    def init_random(cls, key=None, cfg: Optional[SF3DConfig] = None
                    ) -> "SF3DPipeline":
        cfg = cfg or SF3DConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        s = cfg.cond_image_size
        params = SF3DModel(cfg).init(
            key, jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, cfg.camera_cond_dim)), jnp.zeros((5, 3)),
            method=SF3DModel.init_all)["params"]
        return cls(params, cfg)

    def default_camera(self) -> np.ndarray:
        """system.py default FOV/distance camera conditioning vector."""
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 1.6
        f = 0.5 / np.tan(np.deg2rad(40.0) * 0.5)
        intr = np.array([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1]], np.float32)
        return np.concatenate([c2w.reshape(-1), intr.reshape(-1)])[None]

    def forward_planes(self, image, camera=None):
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = self.cfg.cond_image_size
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        cam = jnp.asarray(camera if camera is not None
                          else self.default_camera(), jnp.float32)
        return self._forward(self.params, image, cam)

    def generate_mesh(self, planes, resolution: Optional[int] = None,
                      threshold: Optional[float] = None,
                      texture_size: int = 1024, bake_texture: bool = True,
                      chunk: int = 262144, remesh: str = "none"):
        """density grid → marching tets → [isotropic remesh] → vertex
        offset → box unwrap → albedo bake (system.py:272-420; remesh
        `sf3d/models/mesh.py:170` triangle_remesh = gpytoolbox
        remesh_botsch at the mean edge length, before UV unwrap)."""
        c = self.cfg
        res = resolution or c.isosurface_resolution
        iso = (threshold if threshold is not None
               else c.isosurface_threshold)

        query = jax.jit(lambda pts, inc: self.model.apply(
            {"params": self.params}, planes, pts,
            method=SF3DModel.query, include=inc),
            static_argnums=(1,))
        lin = np.linspace(-c.radius, c.radius, res, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        dens = []
        for i in range(0, len(pts), chunk):
            dens.append(np.asarray(query(
                jnp.asarray(pts[i:i + chunk]), ("density",))["density"]))
        grid = np.concatenate(dens)[:, 0].reshape(res, res, res)
        mesh = tetra.extract_isosurface(
            grid, iso=iso, bounds=(-c.radius, c.radius))
        if not mesh.num_vertices:
            return mesh
        if remesh and remesh.lower() == "triangle":
            from ... import native
            ev = np.asarray(mesh.v)
            ef = np.asarray(mesh.f)
            edge = np.linalg.norm(ev[ef[:, 1]] - ev[ef[:, 0]], axis=1)
            rv, rf = native.isotropic_remesh(
                ev, ef, target_len=float(edge.mean()), iterations=10)
            if len(rf):
                mesh.v, mesh.f = rv, rf
        out = query(jnp.asarray(mesh.v, jnp.float32),
                    ("vertex_offset", "features"))
        mesh.v = np.asarray(mesh.v) + np.asarray(out["vertex_offset"]) \
            * (2 * c.radius / res)
        mesh.vc = np.clip(np.asarray(out["features"]), 0, 1)
        mesh = mesh.auto_normal()
        if bake_texture:
            from ...ops import texture as T
            vt, ft = T.box_unwrap(np.asarray(mesh.v),
                                  np.asarray(mesh.f))
            mesh.vt, mesh.ft = vt, ft
            albedo = T.bake_vertex_colors(
                jnp.asarray(mesh.v), jnp.asarray(mesh.f),
                jnp.asarray(mesh.vt), jnp.asarray(mesh.ft),
                jnp.asarray(mesh.vc), texture_size=texture_size)
            mesh.albedo = np.asarray(albedo)
        return mesh

    def run_image(self, image, **kw):
        planes = self.forward_planes(image)
        mesh = self.generate_mesh(planes[0], **kw)
        if mesh.albedo is not None:
            mats = self.estimate_materials(image)
            mr = np.zeros_like(mesh.albedo)
            mr[..., 1] = mats["roughness"]      # G = roughness (glTF)
            mr[..., 2] = mats["metallic"]       # B = metallic
            mesh.metallic_roughness = mr
        return mesh
