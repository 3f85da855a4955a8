"""Hunyuan3D-V1 multiview diffusion (std/lite) as grid pipelines.

Counterpart of `Gen_3D_Modules/Hunyuan3D_V1/mvd/
hunyuan3d_mvd_std_pipeline.py:187` (SDXL-class) and
`hunyuan3d_mvd_lite_pipeline.py` (SD2-class): both are
reference-attention grid diffusers — the condition image's VAE latent
is re-noised per step, run through the UNet in "write" mode, and read
back as extra self-attention K/V while a 3×2 grid latent denoises
(`RefOnlyNoisedUNet`, std pipeline:109-186) with ramping-coefficient
global image embeddings (std pipeline:373). That is exactly the
mechanism of our Zero123Plus-style pipeline, so the V1 variants are
thin configs over it; the V1 grid layout (3 rows × 2 cols, consumed by
`infer/views_to_mesh.py:76-78`) matches the substrate's native canvas.
"""

from __future__ import annotations

import dataclasses

import jax

from ..zero123plus.pipeline import Zero123PlusConfig, Zero123PlusPipeline


def _std_config() -> Zero123PlusConfig:
    # SDXL-class: wider cross-attention context
    from ..diffusion.unet import UNetConfig
    return Zero123PlusConfig(
        height=960, width=640,
        unet=UNetConfig(cross_attention_dim=1024),
        prompt_dim=1024)


def _lite_config() -> Zero123PlusConfig:
    from ..diffusion.unet import UNetConfig
    return Zero123PlusConfig(
        height=960, width=640,
        unet=UNetConfig(cross_attention_dim=768,
                        attention_head_dim=-8),
        prompt_dim=768)


class Hunyuan3DV1MVDPipeline(Zero123PlusPipeline):
    """image → 3×2 grid of 6 views (+ the preprocessed condition
    image, matching the reference pipeline's `.images` pair)."""

    variant: str = "std"

    @classmethod
    def init_random(cls, key=None, cfg=None, variant: str = "std"
                    ) -> "Hunyuan3DV1MVDPipeline":
        cfg = cfg or (_lite_config() if variant == "lite"
                      else _std_config())
        key = key if key is not None else jax.random.PRNGKey(0)
        pipe = super().init_random(key=key, cfg=cfg)
        obj = cls(pipe.params, cfg)
        obj.variant = variant
        return obj

    @classmethod
    def from_pretrained(cls, path: str, variant: str = "std",
                        **cfg_overrides) -> "Hunyuan3DV1MVDPipeline":
        """Load the Tencent-Hunyuan/Hunyuan3D-1 MVD layout: the repo
        nests two diffusers pipelines (`mvd_std/`, `mvd_lite/`) built
        on the same reference-attention grid mechanism the substrate
        implements; `path` may be the repo root or a pipeline dir."""
        import os
        sub = os.path.join(path, f"mvd_{variant}")
        if os.path.isdir(sub):
            path = sub
        kw = dict(height=960, width=640)
        kw.update(cfg_overrides)
        pipe = super().from_pretrained(path, **kw)   # binds cls → V1
        pipe.variant = variant
        return pipe
