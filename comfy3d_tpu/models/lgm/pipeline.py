"""LGM pipeline: 4 multiview images → GaussianSplat.

Counterpart of the reference node path (`nodes.py:1785-1871`:
Load_Large_Multiview_Gaussian_Model + Large_Multiview_Gaussian_Model →
`forward_gaussians`). Outputs this framework's GaussianSplat container
(raw-parameter storage) so the result plugs into gs_render, the 3DGS
trainer, and the GS→mesh converter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.gaussian import GaussianSplat
from ...core import sh as sh_utils
from .model import LGMConfig, LGMUNet, decode_gaussians, plucker_rays


class LGMPipeline:
    def __init__(self, params, cfg: LGMConfig = LGMConfig()):
        self.cfg = cfg
        self.model = LGMUNet(cfg)
        self.params = params
        self._forward = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def from_pretrained(cls, ckpt_path: str,
                        cfg: LGMConfig = LGMConfig()) -> "LGMPipeline":
        """Load the public LGM checkpoint (`model_fp16.safetensors`,
        reference nodes.py:1807-1815 load path) via the rename rules in
        convert.py."""
        from .. import convert as C
        from .convert import convert_lgm
        sd = C.load_state_dict(ckpt_path)
        params = convert_lgm(sd)
        return cls(params, cfg)

    @classmethod
    def init_random(cls, key=None, cfg: LGMConfig = LGMConfig()
                    ) -> "LGMPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        model = LGMUNet(cfg)
        params = model.init(
            key, jnp.zeros((cfg.num_views, cfg.input_size, cfg.input_size,
                            cfg.in_channels)))["params"]
        return cls(params, cfg)

    def forward_gaussians(self, images, elevations=None, azimuths=None
                          ) -> GaussianSplat:
        """images [V, H, W, 3] in [0,1] (V=4 default MVDream orbit) →
        GaussianSplat with V·splat_size² gaussians."""
        c = self.cfg
        images = jnp.asarray(images, jnp.float32)
        v = images.shape[0]
        if images.shape[1] != c.input_size:
            images = jax.image.resize(
                images, (v, c.input_size, c.input_size, 3), "bilinear")
        if elevations is None:
            elevations = [0.0] * v
        if azimuths is None:
            azimuths = [i * (360.0 / v) for i in range(v)]
        rays = plucker_rays(c, elevations, azimuths)
        x = jnp.concatenate([images, rays], axis=-1)       # [V, S, S, 9]
        raw = self._forward(self.params, x)
        raw = raw.reshape(-1, c.out_channels)
        g = decode_gaussians(raw)

        n = g["xyz"].shape[0]
        sh0 = sh_utils.rgb_to_sh(g["rgb"])[:, None, :]     # [N, 1, 3]
        op = jnp.clip(g["opacity"], 1e-4, 1 - 1e-4)
        return GaussianSplat(
            xyz=g["xyz"],
            sh=sh0,
            opacity_raw=jnp.log(op / (1 - op)),
            scale_raw=jnp.log(jnp.maximum(g["scale"], 1e-8)),
            rot_raw=g["rotation"],
            alive=jnp.ones((n,), bool))
