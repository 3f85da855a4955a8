"""CRM — Convolutional Reconstruction Model.

Counterpart of `Gen_3D_Modules/CRM/model/crm/model.py:23-160` +
`model/crm/sampler.py:116-186`: six orbit views of RGB + canonical
coordinate maps (CCMs) are rolled out into a 256×768 two-row triplane
strip (`util/utils.py:157-193` get_tri, blender layout), lightly noised
at t=20 with the SD-2.1 DDIM schedule (sampler.py:145-152), refined by a
diffusers `UNet2DModel` (model/archs/unet.py UNetPP, in_channels=32 with
a learned 20-channel plane), queried by TetTexNet (sum over the three
planes — specs_objaverse_total.json fea_concat=false) and decoded by
sdf/rgb/weight MLPs with the sphere pre-train offset
(model.py:66,93: sdf + radius − ‖x‖) into a FlexiCubes-class mesh (our
marching-tets engine extracts; the 21 predicted cube weights ride along
for parity).

The upstream 6-view pixel+CCM diffusion (`imagedream` vendored LDM) is
the MVDream family — `models.mvdream.MVDreamPipeline` with 6 views
covers that stage; this module is the reconstructor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import tetra
from .unet2d import UNet2DModel, UNet2DModelConfig


@dataclasses.dataclass(frozen=True)
class CRMConfig:
    view_size: int = 256
    plane_resolution: int = 256
    c_dim: int = 32
    mlp_hidden: int = 512
    tet_grid_size: int = 80
    # specs_objaverse_total.json Input.scale / Pretrain.radius
    scale: float = 0.95
    sphere_radius: float = 0.5
    noise_t: int = 20
    unet: UNet2DModelConfig = UNet2DModelConfig.crm()

    @classmethod
    def tiny(cls) -> "CRMConfig":
        return cls(view_size=32, plane_resolution=32, c_dim=8,
                   mlp_hidden=16, tet_grid_size=12,
                   unet=UNet2DModelConfig.tiny())


def grid_sample_border_ac(plane, uv):
    """torch grid_sample(align_corners=True, padding_mode='border') —
    TetTexNet's sampling (shape_texture_net.py:58)."""
    h, w = plane.shape[0], plane.shape[1]
    x = jnp.clip((uv[..., 0] + 1.0) * 0.5 * (w - 1), 0, w - 1)
    y = jnp.clip((uv[..., 1] + 1.0) * 0.5 * (h - 1), 0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def fetch(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return plane[yi, xi]

    t00 = fetch(x0, y0)
    t10 = fetch(x0 + 1, y0)
    t01 = fetch(x0, y0 + 1)
    t11 = fetch(x0 + 1, y0 + 1)
    return ((1 - fx) * (1 - fy) * t00 + fx * (1 - fy) * t10
            + (1 - fx) * fy * t01 + fx * fy * t11)


def _rot90(img, k):
    """torch.rot90(dims=[1,2]) on [H, W, C] (CCW in array coords)."""
    return np.rot90(img, k=k, axes=(0, 1))


def rollout_strip(views: np.ndarray, fix: bool = False) -> np.ndarray:
    """`get_tri(..., blender=True, scale=1)` (util/utils.py:157-193) on
    re-ordered views (`sampler.py:124-130` get_imgs puts the 6th strip
    tile first). views [6, H, W, 3] → [2H→channel-stacked] strip
    [H, 3W, 6]: two 3-tile rows concatenated along the channel axis."""
    v = [np.asarray(views[i], np.float32) for i in (5, 0, 1, 2, 3, 4)]
    t0 = _rot90(v[2], 2)
    t1 = v[4][::-1, ::-1]                       # flip(2).flip(1)
    t2 = _rot90(_rot90(v[0], 3)[:, ::-1], 2)
    t3 = _rot90(_rot90(v[5], 2)[:, ::-1], 2)
    t4 = _rot90(v[1], 2)[:, ::-1]               # flip(1).flip(1).flip(2)
    t5 = _rot90(v[3], 1)[::-1, ::-1]
    if fix:      # zero the off-plane CCM channels (utils.py:175-189)
        t0, t3 = t0.copy(), t3.copy()
        t1, t4 = t1.copy(), t4.copy()
        t2, t5 = t2.copy(), t5.copy()
        t0[..., 1] = t0[..., 2] = 0
        t3[..., 1] = t3[..., 2] = 0
        t1[..., 0] = t1[..., 1] = 0
        t4[..., 0] = t4[..., 1] = 0
        t2[..., 0] = t2[..., 2] = 0
        t5[..., 0] = t5[..., 2] = 0
    row1 = np.concatenate([t0, t1, t2], axis=1)     # [H, 3W, 3]
    row2 = np.concatenate([t3, t4, t5], axis=1)
    return np.concatenate([row1, row2], axis=-1)    # [H, 3W, 6]


def ddim_add_noise(x, noise, t: int, num_train_timesteps: int = 1000,
                   beta_start: float = 0.00085, beta_end: float = 0.012):
    """stabilityai/stable-diffusion-2-1-base DDIMScheduler.add_noise
    (scaled_linear betas) — the light perturbation at t=20
    (sampler.py:145-149)."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    acp = float(np.cumprod(1.0 - betas)[t])
    return np.sqrt(acp) * x + np.sqrt(1.0 - acp) * noise


class CRMModel(nn.Module):
    cfg: CRMConfig = CRMConfig()

    def setup(self):
        c = self.cfg
        self.unet2 = UNet2DModel(c.unet, name="unet2")
        if c.unet.in_channels > 12:
            self.learned_plane = self.param(
                "learned_plane", nn.initializers.zeros,
                (c.plane_resolution, 3 * c.plane_resolution,
                 c.unet.in_channels - 12))
        h = c.mlp_hidden
        self.sdf_0 = nn.Dense(h, name="sdf_0")
        self.sdf_1 = nn.Dense(h, name="sdf_1")
        self.sdf_2 = nn.Dense(4, name="sdf_2")     # sdf + deform(3)
        self.rgb_0 = nn.Dense(h, name="rgb_0")
        self.rgb_1 = nn.Dense(h, name="rgb_1")
        self.rgb_2 = nn.Dense(3, name="rgb_2")
        self.weight_0 = nn.Dense(h, name="weight_0")
        self.weight_1 = nn.Dense(21, name="weight_1")

    def __call__(self, strip, t):
        """strip [B, P, 3P, 12] rolled-out rgb+ccm → refined triplane
        [B, P, 3P, c_dim]."""
        c = self.cfg
        if c.unet.in_channels > 12:
            lp = jnp.broadcast_to(
                self.learned_plane,
                (strip.shape[0],) + self.learned_plane.shape)
            strip = jnp.concatenate([strip, lp], axis=-1)
        return self.unet2(strip, t)

    def query_feat(self, planes, pts):
        """TetTexNet (shape_texture_net.py:14-36): strip [P, 3P, C],
        pts [N, 3] in [-scale, scale] → summed plane features [N, C]
        (fea_concat=false)."""
        c = self.cfg
        p = c.plane_resolution
        xy, yz, zx = (planes[:, :p], planes[:, p:2 * p],
                      planes[:, 2 * p:])
        f = grid_sample_border_ac(xy, pts[:, (0, 1)])
        f += grid_sample_border_ac(yz, pts[:, (1, 2)])
        f += grid_sample_border_ac(zx, pts[:, (2, 0)])
        return f

    def query(self, planes, pts):
        """→ (sdf, deform, rgb, cube-weight-logits·0.1). SDF carries the
        sphere pre-train offset (model.py:66,93) and deform the
        flexicubes scaling (util/renderer.py:23-25)."""
        c = self.cfg
        feat = self.query_feat(planes, pts)
        sd = self.sdf_2(nn.relu(self.sdf_1(nn.relu(self.sdf_0(feat)))))
        rgb = self.rgb_2(nn.relu(self.rgb_1(nn.relu(self.rgb_0(feat)))))
        sdf = (sd[:, 0] + c.sphere_radius
               - jnp.linalg.norm(pts, axis=-1))
        deform = (jnp.tanh(sd[:, 1:]) / c.tet_grid_size
                  * (c.scale / 0.95) * 0.5)
        # weightMlp input: the 8 cube-corner features concatenated
        # (model.py:80-83); per-point here, gathered by the caller
        return sdf, deform, rgb, None

    def cube_weights(self, corner_feats):
        """corner_feats [M, 8·C] → [M, 21] flexicubes weights ·0.1."""
        return self.weight_1(nn.silu(self.weight_0(corner_feats))) * 0.1

    def init_all(self, strip, pts):
        planes = self(strip, jnp.zeros((strip.shape[0],)))
        out = self.query(planes[0], pts)
        w = self.cube_weights(jnp.tile(self.query_feat(planes[0], pts),
                                       (1, 8)))
        return out, w


class CRMReconPipeline:
    def __init__(self, params, cfg: CRMConfig = CRMConfig()):
        self.cfg = cfg
        self.model = CRMModel(cfg)
        self.params = params
        self._forward = jax.jit(
            lambda p, x, t: self.model.apply({"params": p}, x, t))

    @classmethod
    def init_random(cls, key=None, cfg: Optional[CRMConfig] = None
                    ) -> "CRMReconPipeline":
        cfg = cfg or CRMConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        p = cfg.plane_resolution
        params = CRMModel(cfg).init(
            key, jnp.zeros((1, p, 3 * p, 12)), jnp.zeros((5, 3)),
            method=CRMModel.init_all)["params"]
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, ckpt_path: str,
                        cfg: Optional[CRMConfig] = None
                        ) -> "CRMReconPipeline":
        """Load the public `CRM.pth` (reference nodes.py:2341-2380 →
        ConvolutionalReconstructionModel(specs) + load_state_dict)."""
        from .convert import convert_crm
        from .. import convert as C
        cfg = cfg or CRMConfig()
        sd = {k: C.to_numpy(v)
              for k, v in C.load_state_dict(ckpt_path).items()}
        return cls(convert_crm(sd), cfg)

    def __call__(self, images, ccms, with_color: bool = True, seed=123):
        """images, ccms [6, S, S, 3] in [0,1] → Mesh."""
        c = self.cfg
        imgs = np.asarray(images, np.float32)
        xyz = np.asarray(ccms, np.float32)[..., ::-1]  # BGR→RGB (:119)
        if imgs.shape[1] != c.view_size:
            imgs = np.asarray(jax.image.resize(
                jnp.asarray(imgs), (6, c.view_size, c.view_size, 3),
                "bilinear"))
            xyz = np.asarray(jax.image.resize(
                jnp.asarray(xyz), (6, c.view_size, c.view_size, 3),
                "bilinear"))
        strip = np.concatenate([rollout_strip(imgs),
                                rollout_strip(xyz, fix=True)], axis=-1)
        if strip.shape[0] != c.plane_resolution:
            strip = np.asarray(jax.image.resize(
                jnp.asarray(strip),
                (c.plane_resolution, 3 * c.plane_resolution, 12),
                "bilinear"))
        noise = (np.random.default_rng(seed)
                 .standard_normal(strip.shape).astype(np.float32)
                 * 0.5 + 0.5)
        strip = ddim_add_noise(strip, noise, c.noise_t)
        planes = self._forward(self.params, strip[None].astype(
            np.float32), jnp.full((1,), c.noise_t, jnp.float32))[0]

        res = c.tet_grid_size + 1
        # reference construct_voxel_grid spans [-0.5, 0.5] scaled by
        # grid_scale=2.0 → ±1.0; Input.scale only scales the deform
        # magnitude (util/renderer.py), not the grid extent
        lin = np.linspace(-1.0, 1.0, res, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        query = jax.jit(lambda pl, q: self.model.apply(
            {"params": self.params}, pl, q, method=CRMModel.query))
        chunk = 262144
        sdfs = []
        for i in range(0, len(pts), chunk):
            sd, _df, _, _ = query(planes, jnp.asarray(pts[i:i + chunk]))
            sdfs.append(np.asarray(sd))
        grid = np.concatenate(sdfs).reshape(res, res, res)
        mesh = tetra.extract_isosurface(grid, iso=0.0,
                                        bounds=(-1.0, 1.0))
        if with_color and mesh.num_vertices:
            cols = []
            mv = jnp.asarray(mesh.v, jnp.float32)
            for i in range(0, mv.shape[0], chunk):
                _, _, rgb, _ = query(planes, mv[i:i + chunk])
                cols.append(np.asarray(rgb))
            # rgbMlp predicts in [-1, 1] (model.py:101-103)
            mesh.vc = np.clip(np.concatenate(cols) * 0.5 + 0.5, 0, 1)
        return mesh.auto_normal()
