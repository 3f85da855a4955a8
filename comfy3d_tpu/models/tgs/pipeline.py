"""TriplaneGaussian (TGS): single image → 3D Gaussians, feed-forward.

User-facing wrapper over the checkpoint-faithful `model.TGSModel`
(see model.py for the reference layer map). Input prep mirrors the
reference `CustomImageOrbitDataset` cond path (data.py:140-161):
252² white-composited image, fovy 40°, relative pose
c2w = [[0,0,1,d],[1,0,0,0],[0,1,0,0],[0,0,0,1]], plus the cv2
distance transform of the background mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.gaussian import GaussianSplat
from .model import TGSConfig, TGSModel, distance_transform


class TGSPipeline:
    def __init__(self, params, cfg: TGSConfig = TGSConfig()):
        self.cfg = cfg
        self.model = TGSModel(cfg)
        self.params = params
        self._forward = jax.jit(
            lambda p, *args: self.model.apply({"params": p}, *args))

    @classmethod
    def init_random(cls, key=None, cfg: Optional[TGSConfig] = None
                    ) -> "TGSPipeline":
        cfg = cfg or TGSConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        s = cfg.cond_size
        params = TGSModel(cfg).init(
            key, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 1)),
            jnp.eye(4)[None], jnp.eye(3)[None], jnp.eye(3)[None],
            jnp.zeros((1, s, s, 1)))["params"]
        return cls(params, cfg)

    # -------------------------------------------------------------- #
    def cond_cameras(self, cam_dist: Optional[float] = None):
        """(c2w [1,4,4], intrinsic [1,3,3] px, intrinsic_normed) for the
        relative-pose cond view (data.py:153-161)."""
        c = self.cfg
        d = c.cond_camera_distance if cam_dist is None else cam_dist
        c2w = np.array([[0, 0, 1, d],
                        [1, 0, 0, 0],
                        [0, 1, 0, 0],
                        [0, 0, 0, 1]], np.float32)
        s = c.cond_size
        f = 0.5 * s / np.tan(0.5 * np.deg2rad(c.cond_fovy_deg))
        intr = np.array([[f, 0, s / 2.0],
                         [0, f, s / 2.0],
                         [0, 0, 1]], np.float32)
        intr_n = intr.copy()
        intr_n[:2] /= s
        return c2w[None], intr[None], intr_n[None]

    def __call__(self, image, mask=None, cam_dist: Optional[float] = None
                 ) -> GaussianSplat:
        """image [S,S,3] or [B,S,S,3] in [0,1] (white-composited);
        mask same spatial shape (alpha); → GaussianSplat."""
        c = self.cfg
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = c.cond_size
        if image.shape[1] != s:
            image = jax.image.resize(
                image, (image.shape[0], s, s, 3), "bilinear")
        if mask is None:
            mask_np = np.ones(image.shape[:3], np.float32)
        else:
            mask_np = np.asarray(jnp.asarray(mask), np.float32)
            if mask_np.ndim == 2:
                mask_np = mask_np[None]
            if mask_np.shape[1] != s:
                mask_np = np.asarray(jax.image.resize(
                    jnp.asarray(mask_np),
                    (mask_np.shape[0], s, s), "bilinear"))
        dt = distance_transform(mask_np)
        c2w, intr, intr_n = self.cond_cameras(cam_dist)
        b = image.shape[0]
        tile = lambda a: jnp.asarray(np.repeat(a, b, axis=0))
        points, gs = self._forward(
            self.params, image,
            jnp.asarray(mask_np[..., None] > 0.5, jnp.float32),
            tile(c2w), tile(intr), tile(intr_n),
            jnp.asarray(dt[..., None]))
        xyz = gs["xyz"][0]
        n = xyz.shape[0]
        eps = 1e-6
        return GaussianSplat(
            xyz=xyz,
            sh=gs["shs"][0],
            opacity_raw=jnp.log(
                jnp.clip(gs["opacity"][0], eps, 1 - eps)
                / (1 - jnp.clip(gs["opacity"][0], eps, 1 - eps))),
            scale_raw=jnp.log(jnp.maximum(gs["scaling"][0], 1e-10)),
            rot_raw=gs["rotation"][0],
            alive=jnp.ones((n,), bool))

    def default_camera(self) -> np.ndarray:
        """Kept for node compat: 25-dim [c2w(16) ++ intr_norm(9)]."""
        c2w, _, intr_n = self.cond_cameras()
        return np.concatenate([c2w.reshape(1, 16),
                               intr_n.reshape(1, 9)], -1)
