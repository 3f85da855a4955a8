"""Unique3D checkpoints (Wuvin/Unique3D) → flax loaders.

The HF repo nests two diffusers pipelines: `image2mvimage/` (SD1.5-class
UNet with in=8 cat-condition, a view-label class embedding
`num_class_embeds: 8`, and joint multiview self-attention whose
processors reuse attn1 weights — unifield_processor.py:335-347 adds no
parameters) and `image2normal/` (img2img with reference attention; the
write pass weights live in the separate base UNet, which this
re-design replaces with self-reference on the same UNet). Both carry a
`vae/` and a CLIPVisionModelWithProjection `image_encoder/`."""

from __future__ import annotations

import os

import numpy as np


def _load_common(path: str):
    from ..diffusion.convert import load_unet_dir, load_vae_dir
    from ..loader import load_dir_state_dict

    unet_dir = os.path.join(path, "unet")
    unet_cfg, unet_params, raw = load_unet_dir(unet_dir)
    vae_cfg, vae_params, _ = load_vae_dir(os.path.join(path, "vae"))
    params = {"unet": unet_params, "vae": vae_params}
    sd = load_dir_state_dict(unet_dir)
    if "class_embedding.weight" in sd:
        params["cls"] = {"embedding": np.asarray(
            sd["class_embedding.weight"], np.float32)}
    return unet_cfg, vae_cfg, raw, params


def _attach_vision(pipe, path: str):
    ie = os.path.join(path, "image_encoder")
    if os.path.isdir(ie) and any(
            f.startswith(("model", "pytorch_model"))
            for f in os.listdir(ie)):
        from ..clip import make_vision_conditioner
        from ..diffusion.convert import load_clip_vision_dir
        vcfg, vparams, _ = load_clip_vision_dir(ie)
        pipe.set_vision_encoder(make_vision_conditioner(vparams, vcfg))
    return pipe


def load_image2mv_dir(cls, path: str, **cfg_overrides):
    import dataclasses
    from .pipeline import Unique3DMVConfig

    unet_cfg, vae_cfg, raw, params = _load_common(path)
    unet_cfg = dataclasses.replace(unet_cfg, mv_views=4)
    kw = dict(unet=unet_cfg, vae=vae_cfg,
              image_size=raw.get("sample_size", 32) * 8,
              num_cls=raw.get("num_class_embeds", 8),
              prompt_dim=unet_cfg.cross_attention_dim)
    kw.update(cfg_overrides)
    pipe = cls(params, Unique3DMVConfig(**kw))
    return _attach_vision(pipe, path)


def load_image2normal_dir(cls, path: str, **cfg_overrides):
    from .pipeline import Unique3DNormalConfig

    unet_cfg, vae_cfg, raw, params = _load_common(path)
    params.pop("cls", None)            # normal pipe has no view labels
    kw = dict(unet=unet_cfg, vae=vae_cfg,
              image_size=raw.get("sample_size", 64) * 8,
              prompt_dim=unet_cfg.cross_attention_dim)
    kw.update(cfg_overrides)
    pipe = cls(params, Unique3DNormalConfig(**kw))
    return _attach_vision(pipe, path)
