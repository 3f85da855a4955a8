"""CharacterGen Stage-3D MultiviewLRM — checkpoint-faithful flax model.

Counterpart of `CharacterGen/Stage_3D/lrm/systems/multiview_lrm.py:95-135`
(`MultiviewLRM.forward`) with the module set fixed by
`Configs/CharacterGen_configs/Stage_3D_infer.yaml`:

* `camera_embedder` — `LinearCameraEmbedder` (models/camera.py:10-33):
  one Linear on the flattened 4×4 `c2w_cond` (16 → 768).
* `image_tokenizer` — `DINOV2SingleImageTokenizer`
  (models/tokenizers/image.py:40-190): HF-layout DINOv2-base with
  per-layer camera ModLN (`Modulation` single_layer+zero_init,
  models/transformers/attention.py:571-591); tokens = last_hidden_state
  (cls + patches) per view.
* `tokenizer` — `TriplaneLearnablePositionalEmbedding`
  (models/tokenizers/triplane.py:12-49): learned [3, 512, 32, 32]
  embeddings flattened to the token axis.
* `backbone` — `Transformer1D` (models/transformers/transformer_1d.py,
  the same threestudio layout as TripoSR's): 12 layers, 16×64 heads,
  cross-attn over all views' DINO tokens.
* `post_processor` — `TriplaneUpsampleNetwork` (models/networks.py:13-37):
  one ConvTranspose2d k2 s2, 512 → 80 channels.
* `decoder` — `MultiHeadMLP` (models/networks.py:144-243): shared
  silu MLP (240 → 64, 8 shared layers) + per-head MLPs
  (`sdf` [1 hidden → 1], `features` [1 hidden → 3]); the checkpoint's
  `density` head is ignored (`weights_ignore_modules`, yaml).
* query/isosurface — `TriplaneDMTetRenderer.query_triplane`
  (models/renderers/triplane_dmtet.py:52-98): positions scaled by
  radius 0.6 → F.grid_sample(align_corners=False) on the (x,y)/(x,z)/
  (y,z) planes, concat-reduced; sdf = -(raw + sdf_bias(-2)) ("negative"
  activation); color = sigmoid(features) (NoMaterial.export,
  materials/no_material.py:40-60). The DMTet isosurface step maps to
  our dense marching tets (`ops.tetra`).
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
class CGLRMConfig:
    cond_size: int = 504              # data.cond_width/height (yaml)
    cam_dim: int = 16                 # flattened c2w_cond
    cam_embed_dim: int = 768
    plane_size: int = 32
    num_channels: int = 512
    backbone_layers: int = 12
    backbone_heads: int = 16
    backbone_head_dim: int = 64
    context_dim: int = 768
    triplane_dim: int = 80
    n_neurons: int = 64
    n_hidden_shared: int = 8
    head_hidden: int = 1              # n_hidden_layers per head
    radius: float = 0.6
    sdf_bias: float = -2.0
    dino: Dinov2Config = Dinov2Config(
        hidden=768, layers=12, heads=12, modulation_dim=768)

    @classmethod
    def tiny(cls) -> "CGLRMConfig":
        # sdf_bias 0 (not the production -2): random/fabricated tiny
        # weights emit near-zero raw sdf, and the -2 shift would push
        # the whole grid outside → empty test meshes
        return cls(cond_size=28, cam_embed_dim=24, plane_size=4,
                   num_channels=16, backbone_layers=1,
                   backbone_heads=2, backbone_head_dim=8,
                   context_dim=24, triplane_dim=8, n_neurons=8,
                   n_hidden_shared=2, sdf_bias=0.0,
                   dino=Dinov2Config(hidden=24, layers=1, heads=2,
                                     patch=14, pretrain_image_size=28,
                                     modulation_dim=24))


class CharacterGenLRM(nn.Module):
    cfg: CGLRMConfig = CGLRMConfig()

    def setup(self):
        c = self.cfg
        self.image_tokenizer = Dinov2(c.dino, name="image_tokenizer")
        self.camera_embedder = nn.Dense(c.cam_embed_dim,
                                        name="camera_embedder")
        # torch stores [3, C, P, P]; we keep [3, P, P, C]
        self.triplane_tokens = self.param(
            "triplane_tokens",
            nn.initializers.normal(1.0 / np.sqrt(c.num_channels)),
            (3, c.plane_size, c.plane_size, c.num_channels))
        self.backbone = Transformer1D(
            in_channels=c.num_channels, num_layers=c.backbone_layers,
            heads=c.backbone_heads, dim_head=c.backbone_head_dim,
            cross_attention_dim=c.context_dim,
            norm_num_groups=min(32, c.num_channels), name="backbone")
        self.post_processor = nn.ConvTranspose(
            c.triplane_dim, (2, 2), strides=(2, 2),
            name="post_processor")
        shared = []
        for i in range(c.n_hidden_shared):
            shared.append(nn.Dense(c.n_neurons, name=f"shared_{i}"))
        self.shared_layers = shared
        heads = {}
        for name, out in (("sdf", 1), ("features", 3)):
            layers = [nn.Dense(c.n_neurons, name=f"head_{name}_{i}")
                      for i in range(c.head_hidden)]
            layers.append(nn.Dense(out, name=f"head_{name}_out"))
            heads[name] = layers
        self.head_sdf = heads["sdf"]
        self.head_features = heads["features"]

    def __call__(self, views, cams):
        """views [V, S, S, 3] in [0,1]; cams [V, 16] (flattened c2w)
        → triplanes [3, 2P, 2P, triplane_dim]."""
        c = self.cfg
        img = (views - IMAGENET_MEAN) / IMAGENET_STD
        cam_emb = self.camera_embedder(cams)             # [V, 768]
        tokens = self.image_tokenizer(img, mod_cond=cam_emb)
        tokens = tokens.reshape(1, -1, c.dino.hidden)    # concat views

        seq = self.triplane_tokens.reshape(
            1, 3 * c.plane_size ** 2, c.num_channels)
        seq = seq.transpose(0, 2, 1)                     # [1, C, T]
        seq = self.backbone(seq, context=tokens)
        planes = seq.transpose(0, 2, 1).reshape(
            3, c.plane_size, c.plane_size, c.num_channels)
        return self.post_processor(planes)

    def _decode(self, feat):
        for lyr in self.shared_layers:
            feat = nn.silu(lyr(feat))
        h = feat
        for lyr in self.head_sdf[:-1]:
            h = nn.silu(lyr(h))
        sdf_raw = self.head_sdf[-1](h)[..., 0]
        h = feat
        for lyr in self.head_features[:-1]:
            h = nn.silu(lyr(h))
        rgb = jax.nn.sigmoid(self.head_features[-1](h))
        # sdf_activation "negative" over the shifted raw sdf
        # (triplane_dmtet.py:91-121): inside where result < 0
        sdf = -(sdf_raw + self.cfg.sdf_bias)
        return sdf, rgb

    def query(self, planes, pts):
        """planes [3, H, W, C]; pts [N, 3] → (sdf [N], rgb [N, 3])."""
        c = self.cfg
        u = pts / c.radius
        f_xy = grid_sample_2d(planes[0], u[:, (0, 1)])
        f_xz = grid_sample_2d(planes[1], u[:, (0, 2)])
        f_yz = grid_sample_2d(planes[2], u[:, (1, 2)])
        feat = jnp.concatenate([f_xy, f_xz, f_yz], -1)
        return self._decode(feat)

    def init_all(self, views, cams, pts):
        planes = self(views, cams)
        return self.query(planes, pts)


class CharacterGenLRMPipeline:
    """`Inference3D_API` role (character_inference.py:192-238): 4 views
    + canonical c2w table → scene planes → marching-tets mesh."""

    def __init__(self, params, cfg: CGLRMConfig = CGLRMConfig()):
        self.cfg = cfg
        self.model = CharacterGenLRM(cfg)
        self.params = params
        self._forward = jax.jit(lambda p, v, c: self.model.apply(
            {"params": p}, v, c))

    @classmethod
    def init_random(cls, key=None, cfg: Optional[CGLRMConfig] = None
                    ) -> "CharacterGenLRMPipeline":
        cfg = cfg or CGLRMConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        # tiny spatial probe — DINOv2 pos embeddings interpolate, so
        # param shapes are independent of the input resolution
        s = min(cfg.cond_size, 28)
        params = CharacterGenLRM(cfg).init(
            key, jnp.zeros((2, s, s, 3)), jnp.zeros((2, cfg.cam_dim)),
            jnp.zeros((5, 3)), method=CharacterGenLRM.init_all)["params"]
        return cls(params, cfg)

    def default_cams(self, n_views: int = 4,
                     radius: float = 1.5) -> np.ndarray:
        """[V, 16] flattened c2w rows — the EXACT canonical pose table
        the reference conditions on (Stage_3D/material/meta.json
        `locations[*].transform_matrix`, read at
        character_inference.py:259-261): axis-aligned cameras on the
        ±y/±x axes at radius 1.5, y-up-as-third-row convention."""
        s = radius / 1.5
        table = np.array([
            [[1, 0, 0, 0], [0, 0, 1, 1.5 * s], [0, 1, 0, 0],
             [0, 0, 0, 1]],
            [[-1, 0, 0, 0], [0, 0, -1, -1.5 * s], [0, 1, 0, 0],
             [0, 0, 0, 1]],
            [[0, 0, 1, 1.5 * s], [-1, 0, 0, 0], [0, 1, 0, 0],
             [0, 0, 0, 1]],
            [[0, 0, -1, -1.5 * s], [1, 0, 0, 0], [0, 1, 0, 0],
             [0, 0, 0, 1]],
        ], np.float32)
        rows = [table[i % 4].reshape(-1) for i in range(n_views)]
        return np.stack(rows).astype(np.float32)

    def inference(self, mv_images, mesh_size: int = 256,
                  with_color: bool = True, chunk: int = 262144):
        """mv_images [4, H, W, 3] in [0,1] → Mesh."""
        c = self.cfg
        views = jnp.asarray(mv_images, jnp.float32)
        s = c.cond_size
        if views.shape[1] != s or views.shape[2] != s:
            views = jax.image.resize(
                views, (views.shape[0], s, s, 3), "bilinear")
        cams = jnp.asarray(self.default_cams(views.shape[0]))
        planes = self._forward(self.params, views, cams)
        query = jax.jit(lambda pts: self.model.apply(
            {"params": self.params}, planes, pts,
            method=CharacterGenLRM.query))
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
        # inside where sdf < 0 → extract at iso 0 on -sdf
        mesh = tetra.extract_isosurface(-grid, iso=0.0,
                                        bounds=(-c.radius, c.radius))
        if with_color and mesh.num_vertices:
            cols = []
            mv = jnp.asarray(mesh.v, jnp.float32)
            for i in range(0, mv.shape[0], chunk):
                cols.append(np.asarray(query(mv[i:i + chunk])[1]))
            mesh.vc = np.clip(np.concatenate(cols), 0, 1)
        return mesh.auto_normal()
