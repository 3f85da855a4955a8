"""PartCrafter: image → N part meshes in ONE denoise.

Counterpart of `Gen_3D_Modules/PartCrafter/partcrafter_src/`
(`pipelines/pipeline_partcrafter.py:95`, transformer
`models/transformers/partcrafter_transformer.py:131,326`): the TripoSG
DiT block family with a part axis — learned part embeddings, per-part
local self-attention, and global cross-part attention at selected
blocks; the VAE is the TripoSG latent-set VAE (PartCrafter's
autoencoder_kl_triposg.py is the same module layout).

TPU design: the part axis is just the batch axis of one static program —
local blocks batch over parts, global blocks fold parts into the token
axis; the whole multi-part denoise is one lax.scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..dinov2 import Dinov2, Dinov2Config, IMAGENET_MEAN, IMAGENET_STD
from ..triposg.dit import DiTBlock, TripoSGDiTConfig, _sinusoidal
from ..triposg.vae import TripoSGVAE, TripoSGVAEConfig
from ..vecset.vae import decode_volume_auto, grid_to_mesh


@dataclasses.dataclass(frozen=True)
class PartCrafterDiTConfig:
    base: TripoSGDiTConfig = TripoSGDiTConfig(width=1024, num_layers=9,
                                              heads=16)
    max_num_parts: int = 32
    global_attn_block_ids: Tuple[int, ...] = (2, 4, 6)


class PartCrafterDiT(nn.Module):
    cfg: PartCrafterDiTConfig = PartCrafterDiTConfig()

    @nn.compact
    def __call__(self, x, t, context, part_ids):
        """x [B, P, N, C] per-part latents (B = CFG streams); t [B];
        context [B, M, D]; part_ids [P] int → velocity [B, P, N, C].
        Local blocks batch over (B·P); global blocks fold the part axis
        into tokens WITHIN each stream (cond/uncond never mix)."""
        c = self.cfg.base
        b, p, n, _ = x.shape
        part_emb = self.param("part_embedding",
                              nn.initializers.normal(0.02),
                              (self.cfg.max_num_parts, c.width))
        temb = _sinusoidal(t, c.width)
        # TimestepEmbedding(inner, inner*4, out_dim=inner) — partcrafter
        # _transformer.py:400-402
        temb = nn.Dense(c.width * 4, name="time_proj_linear_1")(temb)
        temb = nn.Dense(c.width, name="time_proj_linear_2")(
            nn.gelu(temb, approximate=False))
        h = nn.Dense(c.width, name="proj_in")(x)
        temb_tok = jnp.broadcast_to(temb[:, None, None, :],
                                    (b, p, 1, c.width))
        h = jnp.concatenate([temb_tok, h], axis=2)    # [B, P, N+1, W]
        # part embedding is added to ALL tokens including the time token
        # (partcrafter_transformer.py:671-686). Deviation from the
        # reference's int-CFG path: we embed parts 0..P-1 in EVERY CFG
        # stream (the training-time semantics of the tensor path) rather
        # than arange(2P) across streams.
        h = h + part_emb[part_ids][None, :, None, :]
        n1 = n + 1
        ctx_local = jnp.repeat(context, p, axis=0)    # [B·P, M, D]
        skips = []
        mid = c.num_layers // 2
        for i in range(c.num_layers):
            blk = DiTBlock(c, skip=i > mid, name=f"blocks_{i}")
            skip_x = skips.pop() if i > mid else None
            if i in self.cfg.global_attn_block_ids:
                hg = h.reshape(b, p * n1, c.width)
                sx = (skip_x.reshape(b, p * n1, c.width)
                      if skip_x is not None else None)
                hg = blk(hg, context, skip_x=sx)
                h = hg.reshape(b, p, n1, c.width)
            else:
                hl = h.reshape(b * p, n1, c.width)
                sx = (skip_x.reshape(b * p, n1, c.width)
                      if skip_x is not None else None)
                hl = blk(hl, ctx_local, skip_x=sx)
                h = hl.reshape(b, p, n1, c.width)
            if i < mid:
                skips.append(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_out")(h)
        return nn.Dense(c.in_channels, name="proj_out")(h[:, :, -n:])


@dataclasses.dataclass(frozen=True)
class PartCrafterConfig:
    dit: PartCrafterDiTConfig = PartCrafterDiTConfig()
    vae: TripoSGVAEConfig = TripoSGVAEConfig(num_latents=512)
    cond: Dinov2Config = Dinov2Config(hidden=1024, layers=24, heads=16)
    image_size: int = 518
    num_steps: int = 50
    guidance_scale: float = 7.0
    shift: float = 1.0

    @classmethod
    def tiny(cls) -> "PartCrafterConfig":
        return cls(
            dit=PartCrafterDiTConfig(
                base=TripoSGDiTConfig(width=32, in_channels=8,
                                      num_layers=5, heads=2,
                                      cross_attention_dim=32),
                max_num_parts=8, global_attn_block_ids=(1, 3)),
            vae=TripoSGVAEConfig(latent_channels=8, num_latents=16,
                                 heads=2, width_encoder=16,
                                 width_decoder=32, num_layers_encoder=1,
                                 num_layers_decoder=1),
            cond=Dinov2Config(hidden=32, layers=1, heads=2, patch=14,
                              pretrain_image_size=28),
            image_size=28, num_steps=3)


class PartCrafterPipeline:
    def __init__(self, params, cfg: PartCrafterConfig):
        self.cfg = cfg
        self.dit = PartCrafterDiT(cfg.dit)
        self.vae = TripoSGVAE(cfg.vae)
        self.cond_model = Dinov2(cfg.cond)
        self.params = params

    @classmethod
    def init_random(cls, key=None,
                    cfg: Optional[PartCrafterConfig] = None
                    ) -> "PartCrafterPipeline":
        cfg = cfg or PartCrafterConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        s = cfg.image_size
        nl, ed = cfg.vae.num_latents, cfg.vae.latent_channels
        params = {
            "cond": Dinov2(cfg.cond).init(
                k1, jnp.zeros((1, s, s, 3)))["params"],
            "dit": PartCrafterDiT(cfg.dit).init(
                k2, jnp.zeros((1, 2, nl, ed)), jnp.zeros((1,)),
                jnp.zeros((1, 5, cfg.dit.base.cross_attention_dim)),
                jnp.zeros((2,), jnp.int32))["params"],
            "vae": TripoSGVAE(cfg.vae).init(
                k3, jnp.zeros((1, nl, ed)), jnp.zeros((1, 7, 3)),
                method=TripoSGVAE.init_all)["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, **cfg_overrides
                        ) -> "PartCrafterPipeline":
        from .convert import load_partcrafter_dir
        return load_partcrafter_dir(cls, path, **cfg_overrides)

    def encode_cond(self, image):
        c = self.cfg
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = c.image_size
        if image.shape[1] != s:
            image = jax.image.resize(image,
                                     (image.shape[0], s, s, 3),
                                     "bilinear")
        image = (image - IMAGENET_MEAN) / IMAGENET_STD
        return self.cond_model.apply({"params": self.params["cond"]},
                                     image)

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def _sample(self, dit_params, cond, noise, num_parts: int,
                num_steps: int, guidance_scale):
        c = self.cfg
        s = np.linspace(1.0, 0.0, num_steps + 1)
        s = c.shift * s / (1.0 + (c.shift - 1.0) * s)
        sigmas = jnp.asarray(s, jnp.float32)
        part_ids = jnp.arange(num_parts, dtype=jnp.int32)
        ctx2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

        def step(x, i):
            x2 = jnp.stack([x, x], axis=0)          # [2, P, N, E]
            t = jnp.broadcast_to(1000.0 * sigmas[i], (2,))
            v = self.dit.apply({"params": dit_params}, x2, t, ctx2,
                               part_ids)
            v = v[1] + guidance_scale * (v[0] - v[1])
            return x + (sigmas[i + 1] - sigmas[i]) * v, None

        x, _ = jax.lax.scan(step, noise, jnp.arange(num_steps))
        return x

    def __call__(self, image, num_parts: int = 4, seed: int = 0,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 octree_resolution: int = 128,
                 num_chunks: int = 65536) -> List:
        """→ list of `num_parts` part meshes."""
        c = self.cfg
        cond = self.encode_cond(image)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (num_parts, c.vae.num_latents, c.vae.latent_channels))
        gs = (guidance_scale if guidance_scale is not None
              else c.guidance_scale)
        latents = self._sample(self.params["dit"], cond, noise,
                               num_parts, num_steps or c.num_steps,
                               jnp.float32(gs))
        latents = latents / c.vae.scale_factor
        decoded = self.vae.apply({"params": self.params["vae"]}, latents)

        def q(params, dec, pts):
            return self.vae.apply({"params": params}, dec, pts,
                                  method=TripoSGVAE.query)

        grids = decode_volume_auto(q, self.params["vae"], decoded,
                              mesh=getattr(self, "mesh", None),
                              octree_resolution=octree_resolution,
                              num_chunks=num_chunks)
        return [grid_to_mesh(g) for g in np.asarray(grids, np.float32)]


def merge_parts(meshes: List) -> "object":
    """Concatenate part meshes into one (`get_colored_mesh_composition`
    role, partcrafter utils)."""
    from ...core.mesh import Mesh
    vs, fs, vcs = [], [], []
    off = 0
    palette = np.array([[0.8, 0.3, 0.3], [0.3, 0.8, 0.3],
                        [0.3, 0.3, 0.8], [0.8, 0.8, 0.3],
                        [0.8, 0.3, 0.8], [0.3, 0.8, 0.8]], np.float32)
    for i, m in enumerate(meshes):
        if not m.num_vertices:
            continue
        vs.append(np.asarray(m.v))
        fs.append(np.asarray(m.f) + off)
        vcs.append(np.tile(palette[i % len(palette)],
                           (m.num_vertices, 1)))
        off += m.num_vertices
    if not vs:
        return Mesh(v=np.zeros((0, 3), np.float32),
                    f=np.zeros((0, 3), np.int32))
    out = Mesh(v=np.concatenate(vs), f=np.concatenate(fs))
    out.vc = np.concatenate(vcs)
    return out
