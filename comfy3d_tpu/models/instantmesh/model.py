"""InstantMesh: 6 posed views → triplane LRM → SDF mesh + texture, flax.

Architecture re-derived from the reference
(`Gen_3D_Modules/InstantMesh/models/lrm_mesh.py:30-340`, config
`Configs/InstantMesh_configs/instant_mesh_large.yaml`):

  DINO ViT-B/16 with per-layer adaLN camera modulation
    (encoder/dino.py:300-345: zero-init SiLU→Linear producing
    shift/scale for pre-MSA and pre-MLP layernorms; camera embedding =
    Linear(16→768)→SiLU→Linear from [12 c2w + 4 intrinsics])
  → TriplaneTransformer (decoder/transformer.py:66-118: learned pos
    embed [3·32², 1024], 16 × (cross-attn → self-attn → GELU MLP),
    final LN, ConvTranspose 2× to [3, 64, 64, 80])
  → OSGDecoder heads (renderer/synthesizer_mesh.py:15-90): sdf(1),
    deformation(3), rgb(3 sigmoid-clamped), cube-weight(21·0.1) MLPs
    over concatenated 3-plane features.

Geometry extraction here runs on this framework's differentiable
marching-tets engine (`ops.tetra`) over the grid_res lattice with the
predicted SDF + tanh-bounded deformation (lrm_mesh.py:102-124 semantics);
the 21 FlexiCubes weights are still predicted (checkpoint parity) but the
tet extractor does not need them.

World convention note: InstantMesh uses a z-up world (camera_util.py:36);
conversion helpers in `pipeline.py` map from this framework's y-up poses.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import Attention, imagenet_normalize
from ..triposr.model import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class InstantMeshConfig:
    encoder_feat_dim: int = 768
    transformer_dim: int = 1024
    transformer_layers: int = 16
    transformer_heads: int = 16
    triplane_low_res: int = 32
    triplane_high_res: int = 64
    triplane_dim: int = 80
    grid_res: int = 128
    grid_scale: float = 2.1
    deformation_multiplier: float = 4.0
    decoder_hidden: int = 64
    decoder_layers: int = 4
    # ViT
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    patch: int = 16
    vit_pretrain_grid: int = 14


class ViTBlockAdaLN(nn.Module):
    """HF-ViT block + DiT-style adaLN camera modulation
    (encoder/dino.py:305-360). Param names mirror common.ViTBlock so the
    ViT converter rules apply, with an extra `adaln` head."""
    hidden: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, adaln_input):
        mod = nn.Dense(4 * self.hidden, name="adaln",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(
            nn.silu(adaln_input))                        # [B, 4H]
        shift_msa, scale_msa, shift_mlp, scale_mlp = jnp.split(mod, 4, -1)

        def modulate(h, shift, scale):
            return h * (1 + scale[:, None, :]) + shift[:, None, :]

        from ..common import ViTSelfAttention
        h = nn.LayerNorm(epsilon=1e-12, name="ln1")(x)
        h = modulate(h, shift_msa, scale_msa)
        x = x + ViTSelfAttention(self.hidden, self.heads, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-12, name="ln2")(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(self.mlp_dim, name="mlp_in")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.hidden, name="mlp_out")(h)
        return x


class DinoAdaLN(nn.Module):
    """DINO ViT with camera-modulated blocks + the camera embedder
    (dino_wrapper.py:29-57)."""
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch: int = 16
    pretrain_grid: int = 14

    @nn.compact
    def __call__(self, images, cameras):
        """images [B, H, W, 3] in [0,1]; cameras [B, 16]."""
        b, h, w, _ = images.shape
        gh, gw = h // self.patch, w // self.patch
        emb = nn.Dense(self.hidden, name="cam_embed_0")(cameras)
        emb = nn.Dense(self.hidden, name="cam_embed_1")(nn.silu(emb))

        x = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="patch_embed")(imagenet_normalize(images))
        x = x.reshape(b, gh * gw, self.hidden)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pretrain_grid ** 2 + 1, self.hidden))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            grid = pos_patch.reshape(1, self.pretrain_grid,
                                     self.pretrain_grid, self.hidden)
            grid = jax.image.resize(grid, (1, gh, gw, self.hidden),
                                    method="bicubic")
            pos_patch = grid.reshape(1, gh * gw, self.hidden)
        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls, (b, 1, self.hidden)) + pos_cls
        x = jnp.concatenate([cls_tok, x], axis=1)
        for i in range(self.layers):
            x = ViTBlockAdaLN(self.hidden, self.heads, self.mlp_dim,
                              name=f"block_{i}")(x, emb)
        return nn.LayerNorm(epsilon=1e-12, name="ln_final")(x)


class LRMBlock(nn.Module):
    """cross-attn → self-attn → MLP (decoder/transformer.py:20-63)."""
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, cond):
        # reference `BasicTransformerBlock` (decoder/transformer.py:20-63):
        # torch LayerNorm defaults (eps 1e-5, affine WITH bias); MHA built
        # with attn_bias=False → no qkv/out-proj biases
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.dim // self.heads,
                          qkv_bias=False, out_bias=False,
                          name="cross_attn")(h, context=cond)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = x + Attention(self.dim, self.heads, self.dim // self.heads,
                          qkv_bias=False, out_bias=False,
                          name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = nn.Dense(self.dim * 4, name="mlp_in")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.dim, name="mlp_out")(h)
        return x


class TriplaneTransformer(nn.Module):
    cfg: InstantMeshConfig

    @nn.compact
    def __call__(self, image_feats):
        c = self.cfg
        b = image_feats.shape[0]
        lr = c.triplane_low_res
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(1.0 / c.transformer_dim ** 0.5),
            (1, 3 * lr ** 2, c.transformer_dim))
        x = jnp.broadcast_to(pos, (b, 3 * lr ** 2, c.transformer_dim))
        for i in range(c.transformer_layers):
            x = LRMBlock(c.transformer_dim, c.transformer_heads,
                         name=f"layer_{i}")(x, image_feats)
        x = nn.LayerNorm(name="norm")(x)
        x = x.reshape(b * 3, lr, lr, c.transformer_dim)
        x = nn.ConvTranspose(c.triplane_dim, (2, 2), strides=(2, 2),
                             name="deconv")(x)
        return x.reshape(b, 3, 2 * lr, 2 * lr, c.triplane_dim)


class OSGDecoder(nn.Module):
    """sdf / deformation / color / cube-weight heads
    (synthesizer_mesh.py:15-90)."""
    n_features: int
    hidden: int = 64
    layers: int = 4

    @nn.compact
    def __call__(self, feats, mode: str):
        """feats: [M, 3*C] (or [M, 8*3*C] for weights)."""
        def head(out_dim, prefix):
            h = feats
            for i in range(self.layers - 1):
                h = nn.relu(nn.Dense(self.hidden,
                                     name=f"{prefix}_{i}")(h))
            return nn.Dense(out_dim, name=f"{prefix}_out")(h)

        if mode == "sdf":
            return head(1, "sdf")
        if mode == "deformation":
            return head(3, "deform")
        if mode == "rgb":
            rgb = head(3, "rgb")
            return jax.nn.sigmoid(rgb) * (1 + 2 * 0.001) - 0.001
        if mode == "weight":
            return head(21, "weight") * 0.1
        raise ValueError(mode)


class InstantMesh(nn.Module):
    cfg: InstantMeshConfig = InstantMeshConfig()

    def setup(self):
        c = self.cfg
        self.encoder = DinoAdaLN(hidden=c.encoder_feat_dim,
                                 layers=c.vit_layers, heads=c.vit_heads,
                                 mlp_dim=c.vit_mlp, patch=c.patch,
                                 pretrain_grid=c.vit_pretrain_grid,
                                 name="encoder")
        self.transformer = TriplaneTransformer(c, name="transformer")
        self.decoder = OSGDecoder(c.triplane_dim, c.decoder_hidden,
                                  c.decoder_layers, name="decoder")

    def __call__(self, images, cameras):
        """images [B, N, H, W, 3]; cameras [B, N, 16] →
        triplanes [B, 3, 64, 64, C] (forward_planes, lrm_mesh.py:88)."""
        b, n, h, w, _ = images.shape
        feats = self.encoder(images.reshape(b * n, h, w, 3),
                             cameras.reshape(b * n, 16))
        feats = feats.reshape(b, -1, feats.shape[-1])   # concat views
        return self.transformer(feats)

    def sample_triplane(self, planes, pts):
        """planes [3, H, W, C]; pts [M, 3] in world (grid_scale box) →
        [M, 3C]. Plane projections follow the reference's triplane
        convention (renderer/utils: xy, xz, zy index pairs)."""
        u = pts / (self.cfg.grid_scale * 0.5)
        f_xy = grid_sample_2d(planes[0], u[:, (0, 1)])
        f_xz = grid_sample_2d(planes[1], u[:, (0, 2)])
        f_zy = grid_sample_2d(planes[2], u[:, (2, 1)])
        return jnp.concatenate([f_xy, f_xz, f_zy], -1)

    def query_geometry(self, planes, pts):
        """→ (sdf [M], deformation [M, 3] bounded to grid cells)."""
        c = self.cfg
        feats = self.sample_triplane(planes, pts)
        sdf = self.decoder(feats, "sdf")[:, 0]
        deform = self.decoder(feats, "deformation")
        deform = jnp.tanh(deform) / (c.grid_res * c.deformation_multiplier)
        deform = deform * c.grid_scale
        return sdf, deform

    def query_color(self, planes, pts):
        feats = self.sample_triplane(planes, pts)
        return self.decoder(feats, "rgb")
