"""TriplaneGaussian (TGS) — checkpoint-faithful flax modules.

Mirrors the reference module tree so `model_lvis_rel.ckpt` converts
1:1 (`Gen_3D_Modules/TriplaneGaussian/triplane_gaussian_transformers.py`
+ `Configs/TriplaneGaussian_config.yaml`):

  camera_embedder        networks.MLP 25->768 (1 hidden, silu)
  image_tokenizer        dinov2-base, per-layer single-layer zero-init
                         adaLN camera modulation (tokenizers/image.py:59)
                         — TRAINABLE, weights in the checkpoint
  tokenizer              triplane.TriplaneLearnablePositionalEmbedding
  backbone               transformers.Transformer1D (10L, 8x64, cross 768)
  post_processor         networks.TriplaneUpsampleNetwork (convT k2 s2)
  pointcloud_generator   simplepoint.SimplePointGenerator:
                           its own camera MLP + FROZEN stock dinov2
                           (modulations trainable), 2048 learned point
                           tokens -> Transformer1D -> PointOutLayer,
                           then snowflake SPD_pp x(2,4) upsampling
  point_encoder          pointnet.LocalPoolPointnet (776 -> triplane)
  renderer               GS3DRenderer: triplane query (concat) + 773-dim
                         projected image features -> MLP -> GSLayer heads

TPU-first deviations (documented, parity-tested where exact):
* `points_projection` replaces the pytorch3d point rasterizer with a
  z-buffer scatter (nearest point per pixel wins, same
  points_per_pixel=1 contract; radius ~1px at 252² makes the
  footprint identical in practice).
* BatchNorm layers (snowflake) run in eval mode as affine transforms
  of the converted running stats.
* kNN grouping (SkipTransformer) is a dense argsort — N<=4096 points.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..common import Transformer1D
from ..dinov2 import Dinov2, Dinov2Config
from ..triposr.model import grid_sample_2d


# ------------------------------------------------------------------ #
# config
# ------------------------------------------------------------------ #
@dataclasses.dataclass(frozen=True)
class TGSConfig:
    cond_size: int = 252                 # multiple of patch 14
    cond_fovy_deg: float = 40.0
    cond_camera_distance: float = 1.6
    plane_size: int = 32
    plane_channels: int = 512
    triplane_out: int = 80
    num_points: int = 2048
    up_factors: Tuple[int, ...] = (2, 4)
    backbone_layers: int = 10
    heads: int = 8
    head_dim: int = 64
    cross_dim: int = 768                 # DINO hidden
    cam_dim: int = 25                    # 9 intrinsic_normed + 16 c2w
    sh_degree: int = 3
    radius: float = 0.6                  # renderer box
    gs_hidden: int = 128                 # gs_out.in_channels
    proj_dim: int = 773                  # rgb3 + dino768 + mask1 + dt1
    spd_feat: int = 128                  # snowflake dim_feat
    spd_knn: int = 16
    clip_scaling: float = 0.2
    cond: Dinov2Config = Dinov2Config(
        hidden=768, layers=12, heads=12, patch=14,
        pretrain_image_size=518, modulation_dim=768)

    @classmethod
    def tiny(cls) -> "TGSConfig":
        return cls(cond_size=28, plane_size=8, plane_channels=64,
                   triplane_out=16, num_points=16, up_factors=(2,),
                   backbone_layers=1, heads=2, head_dim=16,
                   cross_dim=32, spd_feat=16, spd_knn=4, gs_hidden=16,
                   proj_dim=37,          # 3 + 32 + 1 + 1
                   cond=Dinov2Config(hidden=32, layers=1, heads=2,
                                     patch=14, pretrain_image_size=28,
                                     modulation_dim=32))

    @property
    def mlp_in(self) -> int:             # renderer MLP input width
        return 3 * self.triplane_out + self.proj_dim


# ------------------------------------------------------------------ #
# shared small modules (torch-layout-compatible names)
# ------------------------------------------------------------------ #
class MLPNet(nn.Module):
    """networks.MLP: Linear/act stack; torch Sequential indices 0,2,4…
    become layers_{i} so the converter is positional."""
    dim_out: int
    n_neurons: int
    n_hidden_layers: int

    @nn.compact
    def __call__(self, x):
        idx = 0
        for _ in range(self.n_hidden_layers):
            x = nn.silu(nn.Dense(self.n_neurons,
                                 name=f"layers_{idx}")(x))
            idx += 2
        return nn.Dense(self.dim_out, name=f"layers_{idx}")(x)


class BNEval(nn.Module):
    """BatchNorm in eval mode: affine over converted running stats."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        mean = self.param("mean", nn.initializers.zeros,
                          (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class MLPConv(nn.Module):
    """snowflake utils.MLP_CONV (1x1 Conv1d stack) on [B, N, C] rows.
    Names conv_{torch sequential index}."""
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dims[:-1]):
            x = nn.relu(nn.Dense(d, name=f"conv_{2 * j}")(x))
        return nn.Dense(self.dims[-1],
                        name=f"conv_{2 * (len(self.dims) - 1)}")(x)


class MLPRes(nn.Module):
    """snowflake utils.MLP_Res."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        sc = nn.Dense(self.out, name="conv_shortcut")(x)
        h = nn.Dense(self.out, name="conv_2")(
            nn.relu(nn.Dense(self.hidden, name="conv_1")(x)))
        return h + sc


class ResnetBlockFC(nn.Module):
    """networks.ResnetBlockFC: pre-ReLU fc_0/fc_1 + optional shortcut."""
    size_out: int
    size_h: int

    @nn.compact
    def __call__(self, x):
        net = nn.Dense(self.size_h, name="fc_0")(nn.relu(x))
        dx = nn.Dense(self.size_out, name="fc_1")(nn.relu(net))
        if x.shape[-1] == self.size_out:
            xs = x
        else:
            xs = nn.Dense(self.size_out, use_bias=False,
                          name="shortcut")(x)
        return xs + dx


# ------------------------------------------------------------------ #
# snowflake SPD_pp upsampler
# ------------------------------------------------------------------ #
class SkipTransformer(nn.Module):
    """snowflake/skip_transformer.py: kNN point-transformer block."""
    in_channel: int
    dim: int
    n_knn: int

    @nn.compact
    def __call__(self, pos, key_f, query_f):
        """pos [B,N,3]; key_f/query_f [B,N,C] → [B,N,C]."""
        value = MLPRes(self.in_channel, self.in_channel, name="mlp_v")(
            jnp.concatenate([key_f, query_f], -1))
        identity = value
        key = nn.Dense(self.dim, name="conv_key")(key_f)
        query = nn.Dense(self.dim, name="conv_query")(query_f)
        value = nn.Dense(self.dim, name="conv_value")(value)

        # dense kNN (utils.query_knn: argsort of squared distances,
        # include_self) — N ≤ 4096 keeps the [B,N,N] matrix small
        d2 = jnp.sum((pos[:, :, None, :] - pos[:, None, :, :]) ** 2, -1)
        idx = jnp.argsort(d2, axis=-1)[:, :, :self.n_knn]   # [B,N,K]

        def group(feat, idx):                    # [B,N,C],[B,N,K]
            return jax.vmap(lambda f, i: f[i])(feat, idx)

        key_g = group(key, idx)                  # [B,N,K,D]
        qk_rel = query[:, :, None, :] - key_g
        pos_rel = pos[:, :, None, :] - group(pos, idx)       # [B,N,K,3]
        h = nn.Dense(64, name="pos_mlp_0")(pos_rel)
        h = nn.relu(BNEval(64, name="pos_mlp_1")(h))
        pos_emb = nn.Dense(self.dim, name="pos_mlp_3")(h)

        a = nn.Dense(self.dim * 4, name="attn_mlp_0")(qk_rel + pos_emb)
        a = nn.relu(BNEval(self.dim * 4, name="attn_mlp_1")(a))
        attn = jax.nn.softmax(
            nn.Dense(self.dim, name="attn_mlp_3")(a), axis=2)
        v = value[:, :, None, :] + pos_emb
        agg = jnp.sum(attn * v, axis=2)          # [B,N,D]
        return nn.Dense(self.in_channel, name="conv_end")(agg) + identity


class SPDpp(nn.Module):
    """snowflake/SPD_pp.py: one Snowflake Point Deconvolution stage."""
    up_factor: int
    stage: int                  # i (bounding divisor radius**i; radius=1)
    dim_feat: int
    n_knn: int

    @nn.compact
    def __call__(self, pcd, feat_cond, k_prev):
        """pcd [B,N,3]; feat_cond [B,N,F]; k_prev [B,N,128] or None →
        (pcd_child [B,N*f,3], k_curr [B,N*f,128])."""
        f = self.up_factor
        feat_1 = MLPConv((64, 128), name="mlp_1")(pcd)
        gmax = jnp.max(feat_1, axis=1, keepdims=True)
        feat_1 = jnp.concatenate(
            [feat_1, jnp.broadcast_to(gmax, feat_1.shape), feat_cond],
            -1)
        q = MLPConv((256, 128), name="mlp_2")(feat_1)
        h = SkipTransformer(128, 64, self.n_knn,
                            name="skip_transformer")(
            pcd, k_prev if k_prev is not None else q, q)
        feat_child = MLPConv((64, 32), name="mlp_ps")(h)
        # ConvTranspose1d(32,128,f,f,bias=False): each input point emits
        # f children through its own [32,128] slice of the kernel
        ps_w = self.param("ps_kernel", nn.initializers.lecun_normal(),
                          (f, 32, 128))
        child = jnp.einsum("bnc,fcd->bnfd", feat_child, ps_w)
        child = child.reshape(pcd.shape[0], -1, 128)     # [B,N*f,128]
        h_up = jnp.repeat(h, f, axis=1)
        k_curr = MLPRes(128, 128, name="mlp_delta_feature")(
            jnp.concatenate([child, h_up], -1))
        delta = MLPConv((64, 3), name="mlp_delta")(nn.relu(k_curr))
        delta = jnp.tanh(delta)              # bounding, radius**i = 1
        return jnp.repeat(pcd, f, axis=1) + delta, k_curr


class SnowflakeDecoder(nn.Module):
    """snowflake/model_spdpp.py Decoder, token_type='image_token'."""
    cfg: TGSConfig

    @nn.compact
    def __call__(self, points, image_tokens, project_fn):
        """points [B,N,3]; image_tokens [B,1+T,C]; project_fn(points,
        feat_hw, flip) → per-point features (closure over cameras).

        Replays the reference's in-place c2w flip quirk
        (model_spdpp.py:121 mutates batch['c2w_cond'] per stage, so
        stage 0 sees the unflipped matrix and stage 1 the flipped one).
        """
        c = self.cfg
        feat = MLPConv((c.spd_feat * 2, c.spd_feat),
                       name="mlp_feat_cond")(image_tokens)
        k_prev = None
        pcd = points
        for i, f in enumerate(c.up_factors):
            cond = project_fn(pcd, feat, flip=(i % 2 == 1))
            pcd, k_prev = SPDpp(f, i, c.spd_feat, c.spd_knn,
                                name=f"uppers_{i}")(pcd, cond, k_prev)
        return pcd


# ------------------------------------------------------------------ #
# point generator / encoder
# ------------------------------------------------------------------ #
class PointGenerator(nn.Module):
    """simplepoint.SimplePointGenerator (its dinov2 backbone is frozen
    in the reference — stock weights, trainable modulations)."""
    cfg: TGSConfig

    def setup(self):
        c = self.cfg
        self.camera_embedder = MLPNet(c.cross_dim, c.cross_dim, 1,
                                      name="camera_embedder")
        self.image_tokenizer = Dinov2(c.cond, name="image_tokenizer")
        self.pcl_embeddings = self.param(
            "pcl_embeddings", nn.initializers.normal(1.0),
            (c.num_points, c.plane_channels))
        self.backbone = Transformer1D(
            in_channels=c.plane_channels, num_layers=c.backbone_layers,
            heads=c.heads, dim_head=c.head_dim,
            cross_attention_dim=c.cross_dim, name="backbone")
        self.point_out = nn.Dense(3, kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros,
                                  name="post_processor")
        self.upsampler = SnowflakeDecoder(c, name="pointcloud_upsampling")

    def __call__(self, images_norm, cam_feats_own, project_fn):
        """images_norm [B,H,W,3] imagenet-normalized; cam_feats_own from
        this module's own camera embedder input (raw 25-dim)."""
        c = self.cfg
        b = images_norm.shape[0]
        cam = self.camera_embedder(cam_feats_own)
        tokens = self.image_tokenizer(images_norm, mod_cond=cam)
        seq = jnp.broadcast_to(self.pcl_embeddings[None],
                               (b,) + self.pcl_embeddings.shape)
        seq = self.backbone(seq.transpose(0, 2, 1), context=tokens)
        pts = self.point_out(seq.transpose(0, 2, 1))     # [B,N,3]
        return self.upsampler(pts, tokens, project_fn), tokens


class LocalPoolPointnet(nn.Module):
    """pointclouds/pointnet.py: resnet blocks + plane scatter pooling."""
    cfg: TGSConfig
    hidden: int = 128
    n_blocks: int = 5

    def plane_index(self, p, axes):
        """[B,N] flat plane-cell index, torch coordinate2index: ix + P*iy."""
        c = self.cfg
        pos = jnp.clip(p[..., :3], -c.radius + 1e-6, c.radius - 1e-6)
        u = (pos / c.radius + 1.0) * 0.5             # (0,1)
        xy = (u[..., axes] * c.plane_size).astype(jnp.int32)
        return xy[..., 0] + c.plane_size * xy[..., 1]

    @nn.compact
    def __call__(self, p):
        """p [B,N,776] (xyz ++ projected features) → [B,3,P,P,C]."""
        c = self.cfg
        b, n, _ = p.shape
        p2 = c.plane_size ** 2
        idx = [self.plane_index(p, a)
               for a in ((0, 1), (0, 2), (1, 2))]

        def pool_max(feat):
            """scatter-max into plane cells, gather back, sum planes
            (torch_scatter.scatter_max: empty cells → 0)."""
            out = 0.0
            for ix in idx:
                cell = jax.vmap(
                    lambda f, i: jnp.full((p2, f.shape[-1]), -jnp.inf)
                    .at[i].max(f))(feat, ix)
                cell = jnp.where(jnp.isfinite(cell), cell, 0.0)
                out = out + jax.vmap(lambda g, i: g[i])(cell, ix)
            return out

        net = nn.Dense(2 * self.hidden, name="fc_pos")(p)
        net = ResnetBlockFC(self.hidden, self.hidden, name="blocks_0")(
            net)
        for bi in range(1, self.n_blocks):
            net = jnp.concatenate([net, pool_max(net)], -1)
            net = ResnetBlockFC(self.hidden, self.hidden,
                                name=f"blocks_{bi}")(net)
        feat = nn.Dense(c.plane_channels, name="fc_c")(net)

        planes = []
        for ix in idx:
            s = jax.vmap(lambda f, i: jnp.zeros((p2, f.shape[-1]))
                         .at[i].add(f))(feat, ix)
            cnt = jax.vmap(lambda i: jnp.zeros((p2,)).at[i].add(1.0))(ix)
            s = s / jnp.maximum(cnt, 1.0)[..., None]     # scatter_mean
            planes.append(s.reshape(b, c.plane_size, c.plane_size,
                                    c.plane_channels))
        return jnp.stack(planes, 1)                      # [B,3,P,P,C]


# ------------------------------------------------------------------ #
# GS heads
# ------------------------------------------------------------------ #
class GSLayer(nn.Module):
    """renderer.GSLayer: per-key zero-init linear heads, reference
    activation semantics (restrict_offset, trunc_exp+clip, …)."""
    cfg: TGSConfig

    @nn.compact
    def __call__(self, x, pts):
        c = self.cfg
        n_sh = (c.sh_degree + 1) ** 2
        heads = {}
        bias_init = {                       # reference zero/const inits
            "scaling": nn.initializers.constant(-5.0),
            "rotation": lambda k, s, d=jnp.float32: jnp.asarray(
                [1.0, 0, 0, 0], d),
            "opacity": nn.initializers.constant(
                float(np.log(0.1 / 0.9))),
        }
        for key, ch in (("xyz", 3), ("scaling", 3), ("rotation", 4),
                        ("opacity", 1), ("shs", 3 * n_sh)):
            heads[key] = nn.Dense(
                ch, kernel_init=nn.initializers.zeros,
                bias_init=bias_init.get(key, nn.initializers.zeros),
                name=f"out_{key}")(x)
        max_step = 1.2 / 32
        xyz = (jax.nn.sigmoid(heads["xyz"]) - 0.5) * max_step + pts
        scaling = jnp.clip(jnp.exp(heads["scaling"]), 0, c.clip_scaling)
        rot = heads["rotation"]
        rot = rot / jnp.maximum(
            jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        opacity = jax.nn.sigmoid(heads["opacity"][..., 0])
        shs = heads["shs"].reshape(*x.shape[:-1], n_sh, 3)
        return {"xyz": xyz, "scaling": scaling, "rotation": rot,
                "opacity": opacity, "shs": shs}


# ------------------------------------------------------------------ #
# projection helpers (pure functions)
# ------------------------------------------------------------------ #
def points_projection(points, c2w, intrinsic, feat_hw):
    """Nearest-point-per-pixel feature lookup (pytorch3d
    PointsRasterizer role, points_per_pixel=1, radius≈1px).

    points [B,N,3] world; c2w [B,4,4]; intrinsic [B,3,3] (pixels);
    feat_hw [B,H,W,C] → [B,N,C]; occluded / off-screen points get 0.
    """
    b, n, _ = points.shape
    h, w = feat_hw.shape[1:3]
    w2c = jnp.linalg.inv(c2w)
    cam = jnp.einsum("bij,bnj->bni", w2c[:, :3, :3], points) \
        + w2c[:, None, :3, 3]
    z = cam[..., 2]
    uv = jnp.einsum("bij,bnj->bni", intrinsic, cam)
    uv = uv[..., :2] / jnp.maximum(uv[..., 2:3], 1e-8)
    px = jnp.round(uv[..., 0] - 0.5).astype(jnp.int32)
    py = jnp.round(uv[..., 1] - 0.5).astype(jnp.int32)
    inb = ((px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 1e-6))
    pix = jnp.where(inb, py * w + px, h * w)         # oob bucket

    def zbuf_one(pixi, zi, feat):
        best = jnp.full((h * w + 1,), jnp.inf).at[pixi].min(zi)
        win = best[pixi] >= zi - 1e-9        # this point is nearest
        return jnp.where(win[:, None],
                         feat.reshape(h * w, -1)[
                             jnp.minimum(pixi, h * w - 1)], 0.0)

    out = jax.vmap(zbuf_one)(pix, z, feat_hw)
    return jnp.where(inb[..., None], out, 0.0)


def distance_transform(mask_np: np.ndarray) -> np.ndarray:
    """cv2.distanceTransform role (utils/ops.py:270): L2 EDT of the
    background, /(S/2), clipped to [0,1]. Host-side (input prep)."""
    from scipy import ndimage
    s = mask_np.shape[-1]
    out = []
    for m in mask_np.reshape((-1,) + mask_np.shape[-2:]):
        d = ndimage.distance_transform_edt(1 - (m > 0.5).astype(np.uint8))
        out.append(np.clip(d / (s / 2.0), 0.0, 1.0))
    return np.stack(out).reshape(mask_np.shape).astype(np.float32)


# ------------------------------------------------------------------ #
# top level
# ------------------------------------------------------------------ #
class TGSModel(nn.Module):
    cfg: TGSConfig = TGSConfig()

    def setup(self):
        c = self.cfg
        self.camera_embedder = MLPNet(c.cross_dim, c.cross_dim, 1,
                                      name="camera_embedder")
        self.image_tokenizer = Dinov2(c.cond, name="image_tokenizer")
        self.tokenizer_embeddings = self.param(
            "tokenizer_embeddings",
            nn.initializers.normal(1.0 / np.sqrt(c.plane_channels)),
            (3, c.plane_size, c.plane_size, c.plane_channels))
        self.backbone = Transformer1D(
            in_channels=c.plane_channels, num_layers=c.backbone_layers,
            heads=c.heads, dim_head=c.head_dim,
            cross_attention_dim=c.cross_dim, name="backbone")
        self.post_processor_conv = nn.ConvTranspose(
            c.triplane_out, (2, 2), strides=(2, 2),
            name="post_processor")
        self.pointcloud_generator = PointGenerator(
            c, name="pointcloud_generator")
        self.point_encoder = LocalPoolPointnet(c, name="point_encoder")
        self.mlp_net = MLPNet(c.gs_hidden, c.gs_hidden, 2,
                              name="mlp_net")
        self.gs_net = GSLayer(c, name="gs_net")

    def _tokens_to_feature_map(self, tokens, size):
        """[B,1+T,C] dino tokens → [B,S,S,C] bilinear feature image
        (image_feature.py:31-34 / model_spdpp.py:113-118)."""
        c = self.cfg
        b = tokens.shape[0]
        g = size // 14
        f = tokens[:, 1:1 + g * g].reshape(b, g, g, -1)
        return jax.image.resize(f, (b, size, size, f.shape[-1]),
                                "bilinear")

    def __call__(self, image, mask, c2w, intrinsic, intrinsic_normed,
                 dt_mask):
        """image [B,S,S,3] in [0,1] (white-composited); mask [B,S,S,1];
        c2w [B,4,4] UNflipped OpenCV pose; intrinsic [B,3,3] pixel
        intrinsics at S; intrinsic_normed [B,3,3]; dt_mask [B,S,S,1]
        precomputed distance transform → (points, gs dict).

        Camera-feats asymmetry, replayed from the reference: the point
        generator embeds the FLIPPED pose (simplepoint.py:70
        flip_c2w_cond) while the top-level tokenizer embeds the raw one
        (triplane_gaussian_transformers.py:100-103 reads batch's
        untouched c2w_cond); both orders are intrinsic ++ extrinsic.
        """
        c = self.cfg
        b, s = image.shape[0], image.shape[1]
        from ..dinov2 import IMAGENET_MEAN, IMAGENET_STD
        img_norm = (image - IMAGENET_MEAN) / IMAGENET_STD

        c2w_flip = c2w.at[:, :3, 1:3].multiply(-1.0)
        intr9 = intrinsic_normed.reshape(b, 9)
        cam25_top = jnp.concatenate([intr9, c2w.reshape(b, 16)], -1)
        cam25_gen = jnp.concatenate([intr9, c2w_flip.reshape(b, 16)],
                                    -1)

        def project_fn(pts, feat_tokens, flip):
            """snowflake per-stage projection closure: tokens → feature
            map → z-buffer point features. [B,N,F_spd]."""
            fm = self._tokens_to_feature_map(feat_tokens, s)
            cw = c2w_flip if flip else c2w
            return points_projection(pts, cw, intrinsic, fm)

        # 1. point cloud (generator has its own camera MLP + dinov2)
        points, _gen_tokens = self.pointcloud_generator(
            img_norm, cam25_gen, project_fn)

        # 2. camera-modulated image tokens (trainable dinov2)
        cam_feats = self.camera_embedder(cam25_top)
        tokens = self.image_tokenizer(img_norm, mod_cond=cam_feats)

        # 3. per-pixel 773-dim feature image (rgb ++ dino ++ mask ++ dt)
        fmap = self._tokens_to_feature_map(tokens, s)
        feat_img = jnp.concatenate(
            [image, fmap, mask, dt_mask], -1)        # [B,S,S,773]

        # 4. project features onto the point cloud
        proj = points_projection(points, c2w, intrinsic, feat_img)

        # 5. point encoder → triplane token conditioning
        pe = self.point_encoder(
            jnp.concatenate([points, proj], -1))     # [B,3,P,P,C]
        planes = self.tokenizer_embeddings[None] + pe
        seq = planes.reshape(b, 3 * c.plane_size ** 2,
                             c.plane_channels).transpose(0, 2, 1)
        seq = self.backbone(seq, context=tokens)
        planes = seq.transpose(0, 2, 1).reshape(
            b, 3, c.plane_size, c.plane_size, c.plane_channels)

        # 6. upsample + query at points (renderer.query_triplane concat)
        up = self.post_processor_conv(
            planes.reshape(b * 3, c.plane_size, c.plane_size,
                           c.plane_channels))
        up = up.reshape(b, 3, 2 * c.plane_size, 2 * c.plane_size,
                        c.triplane_out)

        def sample_one(pl, pts):
            p = pts / c.radius
            f_xy = grid_sample_2d(pl[0], p[:, (0, 1)])
            f_xz = grid_sample_2d(pl[1], p[:, (0, 2)])
            f_yz = grid_sample_2d(pl[2], p[:, (1, 2)])
            return jnp.concatenate([f_xy, f_xz, f_yz], -1)

        tri_feat = jax.vmap(sample_one)(up, points)
        h = self.mlp_net(jnp.concatenate([tri_feat, proj], -1))
        return points, self.gs_net(h, points)
