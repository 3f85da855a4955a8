"""Era3D checkpoint (pengHTYX/MacLab-Era3D-512-6view) → flax loader.

Beyond the diffusers-layout UNet (handled by
`models.diffusion.convert.unet_rules`, which knows Era3D's extra
attn_mv/norm_mv row-wise attention), the UNet state dict carries the
unCLIP projection class embedding, the pose camera embedding, and the
elevation/focal ResidualLiner regressors
(`Era3D/mvdiffusion/models/unet_mv2d_condition.py:455,654,659-686`);
the pipeline additionally needs the StableUnCLIPImageNormalizer
statistics and the per-view fixed prompt embeddings."""

from __future__ import annotations

import os
import re

import numpy as np

from ..convert import convert_with_rules, t_linear


def _mlp_rules(prefix):
    def rules(key, val):
        if not key.startswith(prefix + "."):
            return None
        rest = key[len(prefix) + 1:]
        tgt = {"linear_1.weight": ("linear_1/kernel", t_linear),
               "linear_1.bias": ("linear_1/bias", None),
               "linear_2.weight": ("linear_2/kernel", t_linear),
               "linear_2.bias": ("linear_2/bias", None)}.get(rest)
        if tgt is None:
            return None
        path, fn = tgt
        return path, (fn(val) if fn else val)
    return rules


def _regressor_rules(prefix):
    def rules(key, val):
        if not key.startswith(prefix + "."):
            return None
        rest = key[len(prefix) + 1:]
        simple = {"linear_in.0.weight": ("linear_in_0/kernel", t_linear),
                  "linear_in.0.bias": ("linear_in_0/bias", None),
                  "linear_out.weight": ("linear_out/kernel", t_linear),
                  "linear_out.bias": ("linear_out/bias", None)}
        if rest in simple:
            path, fn = simple[rest]
            return path, (fn(val) if fn else val)
        m = re.match(r"blocks\.(\d+)\.(linear[12])\.(weight|bias)", rest)
        if m:
            n, lin, kind = m.groups()
            if kind == "weight":
                return f"blocks_{n}_{lin}/kernel", t_linear(val)
            return f"blocks_{n}_{lin}/bias", val
        return None
    return rules


def _load_torch_pt(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    return np.asarray(obj.float().numpy(), np.float32)


def load_era3d_dir(cls, path: str, **cfg_overrides):
    from ..diffusion.convert import (load_clip_vision_dir,
                                     load_unet_dir, load_vae_dir)
    from ..loader import load_dir_state_dict, read_json_config
    from .pipeline import Era3DConfig

    unet_dir = os.path.join(path, "unet")
    raw = read_json_config(os.path.join(unet_dir, "config.json"))
    unet_cfg, unet_params, _ = load_unet_dir(unet_dir)
    vae_cfg, vae_params, _ = load_vae_dir(os.path.join(path, "vae"))
    kw = dict(unet=unet_cfg, vae=vae_cfg,
              num_views=raw.get("num_views", 6),
              prompt_dim=unet_cfg.cross_attention_dim,
              image_size=raw.get("sample_size", 64) * 8,
              regress_blocks=raw.get("num_regress_blocks", 3)
              if raw.get("regress_elevation", False) else 0)
    # infer the unCLIP embedding width from the normalizer config and
    # the prompt token count from the fixed embeddings, so real
    # checkpoints load with zero overrides
    nz_cfg = os.path.join(path, "image_normalizer", "config.json")
    if os.path.exists(nz_cfg):
        kw["clip_embed_dim"] = read_json_config(nz_cfg).get(
            "embedding_dim", 1024)
    embeds = _find_prompt_embeds(path)
    if embeds is not None:
        kw["prompt_tokens"] = embeds.shape[1]
    kw.update(cfg_overrides)
    cfg = Era3DConfig(**kw)

    sd = load_dir_state_dict(unet_dir)
    params = {
        "unet": unet_params, "vae": vae_params,
        "class_mlp": convert_with_rules(
            sd, _mlp_rules("class_embedding"), strict=False),
        "camera_mlp": convert_with_rules(
            sd, _mlp_rules("camera_embedding"), strict=False),
    }
    if cfg.regress_blocks > 0:
        params["elevation_reg"] = convert_with_rules(
            sd, _regressor_rules("elevation_regressor"), strict=False)
        params["focal_reg"] = convert_with_rules(
            sd, _regressor_rules("focal_regressor"), strict=False)
    pipe = cls(params, cfg)

    # unCLIP image normalizer statistics
    nz = os.path.join(path, "image_normalizer")
    if os.path.isdir(nz):
        try:
            stats = load_dir_state_dict(nz)
            if "mean" in stats:
                pipe.normalizer_mean = np.asarray(
                    stats["mean"], np.float32).reshape(-1)
            if "std" in stats:
                pipe.normalizer_std = np.asarray(
                    stats["std"], np.float32).reshape(-1)
        except FileNotFoundError:
            pass

    # image-noising scheduler table
    ns = os.path.join(path, "image_noising_scheduler",
                      "scheduler_config.json")
    if os.path.exists(ns):
        nraw = read_json_config(ns)
        from .pipeline import ddpm_alphas_cumprod
        pipe.noising_alphas = ddpm_alphas_cumprod(
            nraw.get("num_train_timesteps", 1000),
            nraw.get("beta_schedule", "squaredcos_cap_v2"),
            nraw.get("beta_start", 0.0001), nraw.get("beta_end", 0.02))

    ie = os.path.join(path, "image_encoder")
    if os.path.isdir(ie) and any(
            f.startswith(("model", "pytorch_model"))
            for f in os.listdir(ie)):
        from ..clip import make_vision_conditioner
        vcfg, vparams, _ = load_clip_vision_dir(ie)
        pipe.set_vision_encoder(make_vision_conditioner(vparams, vcfg))

    # per-view fixed prompt embeddings (normal then color domain)
    if embeds is not None:
        pipe.set_prompt_embeds(embeds)
    return pipe


def _find_prompt_embeds(path):
    for sub in ("fixed_prompt_embeds_6view",
                os.path.join("mvdiffusion", "data",
                             "fixed_prompt_embeds_6view")):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            try:
                n = _load_torch_pt(os.path.join(d, "normal_embeds.pt"))
                c = _load_torch_pt(os.path.join(d, "clr_embeds.pt"))
                return np.concatenate([n, c], axis=0)
            except Exception as e:  # noqa: BLE001
                print(f"[era3d.convert] prompt embeds unreadable: {e}")
                return None
    return None
