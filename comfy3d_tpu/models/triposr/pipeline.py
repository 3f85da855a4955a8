"""TripoSR pipeline: preprocess → scene codes → mesh / renders.

The product-facing counterpart of reference `TSR`
(`Gen_3D_Modules/TripoSR/system.py:52-209`: `from_pretrained`, `forward`,
`render`, `extract_mesh`) behind this framework's common Pipeline protocol.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.camera import Camera, get_rays
from ...ops import raymarch, tetra, volume
from .. import convert
from .model import TripoSR, TripoSRConfig


class TripoSRPipeline:
    def __init__(self, params, cfg: TripoSRConfig = TripoSRConfig()):
        self.cfg = cfg
        self.model = TripoSR(cfg)
        self.params = params
        self._forward = jax.jit(
            lambda p, imgs: self.model.apply({"params": p}, imgs))

        # identity-stable query fns (ops.volume threads them as STATIC
        # jit args; a fresh lambda per extract_mesh call would retrace
        # the whole decode each time — measured seconds per call
        # through the remote-compile tunnel)
        def _sigma(ctx, pts):
            p, tp = ctx
            return self.model.apply({"params": p}, tp, pts,
                                    method=TripoSR.query)[0]

        def _rgb(ctx, pts):
            p, tp = ctx
            return self.model.apply({"params": p}, tp, pts,
                                    method=TripoSR.query)[1]

        self._sigma_query = _sigma
        self._rgb_query = _rgb

    # -------------------------------------------------------------- #
    @classmethod
    def init_random(cls, key=None, cfg: TripoSRConfig = TripoSRConfig()
                    ) -> "TripoSRPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        s = cfg.cond_image_size
        params = TripoSR(cfg).init(
            key, jnp.zeros((1, s, s, 3)), jnp.zeros((4, 3)),
            method=TripoSR.init_all)["params"]
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, ckpt_path: str,
                        cfg: TripoSRConfig = TripoSRConfig()
                        ) -> "TripoSRPipeline":
        """Load the public TripoSR torch checkpoint (model.ckpt)."""
        sd = convert.load_state_dict(ckpt_path)
        pipe = cls.init_random(cfg=cfg)
        params = jax.tree.map(np.asarray, pipe.params)
        params = _convert_triposr(sd, params)
        pipe.params = jax.tree.map(jnp.asarray, params)
        return pipe

    # -------------------------------------------------------------- #
    def scene_codes(self, images) -> jnp.ndarray:
        """images [B, H, W, 3] in [0,1] (preprocessed, square) →
        triplanes [B, 3, 64, 64, C]."""
        images = jnp.asarray(images, jnp.float32)
        if images.ndim == 3:
            images = images[None]
        s = self.cfg.cond_image_size
        if images.shape[1] != s or images.shape[2] != s:
            images = jax.image.resize(
                images, (images.shape[0], s, s, 3), "bilinear")
        return self._forward(self.params, images)

    def field_fn(self, triplanes):
        def field(xyz, dirs):
            return self.model.apply({"params": self.params}, triplanes, xyz,
                                    method=TripoSR.query)
        return field

    def render(self, triplanes, cameras: Camera, num_steps: int = 128,
               chunk_rays: int = 65536):
        """Orbit renders of one scene code (reference `render`,
        system.py:112-159)."""
        field = self.field_fn(triplanes)
        origins, dirs = get_rays(cameras)
        shape = origins.shape[:-1]
        o = origins.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        outs = {"rgb": [], "alpha": [], "depth": []}
        for i in range(0, o.shape[0], chunk_rays):
            out = raymarch.march(field, o[i:i + chunk_rays],
                                 d[i:i + chunk_rays],
                                 bound=self.cfg.radius,
                                 num_steps=num_steps)
            for k in outs:
                outs[k].append(out[k])
        return {k: jnp.concatenate(v).reshape(shape + v[0].shape[1:])
                for k, v in outs.items()}

    def extract_mesh(self, triplanes, resolution: int = 256,
                     threshold: float = 25.0, max_tris: int = 2_000_000,
                     with_color: bool = True, on_overflow: str = "retry"):
        """Density grid → marching-tets mesh (+ vertex colors), the
        reference `extract_mesh` (system.py:160-207; PyMCubes there).

        The grid decode is ONE device dispatch, coarse-to-fine when the
        resolution chain allows (ops.volume; the role of the reference's
        hierarchical volume decoders, volume_decoders.py:185-280) —
        resolutions like 256 are bumped by one vertex so the 2× chain
        exists; the iso surface is unaffected."""
        from ...core.mesh import Mesh
        r = int(resolution)
        if volume.hier_plan(r) is None and volume.hier_plan(r + 1):
            r += 1
        ctx = (self.params, triplanes)
        grid = volume.decode_grid(self._sigma_query, ctx, r,
                                  self.cfg.radius, iso=threshold)
        v_dev, f_dev, nv, nf = tetra.extract_isosurface_device(
            grid, iso=threshold,
            bounds=(-self.cfg.radius, self.cfg.radius),
            max_tris=max_tris, on_overflow=on_overflow)
        cols = None
        if with_color:
            # query colors on the still-on-device vertex buffer and
            # ship uint8 — the tunnel moves ~7 MB/s, so bytes matter
            cols = volume.query_chunked(self._rgb_query, ctx, v_dev,
                                        chunk=262144)
            cols = jnp.clip(jnp.round(cols * 255.0), 0, 255) \
                .astype(jnp.uint8)
        nv_i, nf_i = int(nv), int(nf)
        mesh = Mesh(v=np.asarray(v_dev[:nv_i]),
                    f=np.asarray(f_dev[:nf_i]))
        if cols is not None and nv_i:
            mesh.vc = np.asarray(cols[:nv_i], np.float32) / 255.0
        return mesh.auto_normal()


def _convert_triposr(sd, params):
    """Map the TripoSR torch state dict onto the flax tree."""
    # 1. ViT tokenizer
    vit = convert.convert_with_rules(
        sd, convert.vit_rules("image_tokenizer.model."), strict=False)
    if vit:
        params["vit"] = _merge(params["vit"], vit)
    # 2. triplane tokens [3, C, P, P] → [3, P, P, C]
    if "tokenizer.embeddings" in sd:
        emb = convert.to_numpy(sd["tokenizer.embeddings"])
        params["triplane_tokens"] = np.transpose(emb, (0, 2, 3, 1))
    # 3. backbone
    bb = convert.convert_with_rules(
        sd, convert.transformer1d_rules("backbone.", ""), strict=False)
    if bb:
        params["backbone"] = _merge(params["backbone"], bb)
    # 4. upsampler
    if "post_processor.upsample.weight" in sd:
        params["post"]["upsample"]["kernel"] = convert.t_conv_transpose(
            convert.to_numpy(sd["post_processor.upsample.weight"]))
        params["post"]["upsample"]["bias"] = convert.to_numpy(
            sd["post_processor.upsample.bias"])
    # 5. decoder MLP: layers.{0,2,4,...} Linear → layer_i, last → layer_out
    n_layers = 0
    while f"decoder.layers.{2 * n_layers}.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        w = convert.t_linear(convert.to_numpy(
            sd[f"decoder.layers.{2 * i}.weight"]))
        b = convert.to_numpy(sd[f"decoder.layers.{2 * i}.bias"])
        name = "layer_out" if i == n_layers - 1 else f"layer_{i}"
        params["decoder"][name] = {"kernel": w, "bias": b}
    return params


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            dst[k] = _merge(dst.get(k, {}), v)
        else:
            dst[k] = v
    return dst
