"""MV-Adapter checkpoint → flax converter.

The published adapters (`huanngzh/mv-adapter`
`mvadapter_{ig2mv,tg2mv}_sdxl.safetensors`, loaded by the reference at
`mvadapter_node_utils.py:85-86/527-528` via
`CustomAdapterMixin.load_custom_adapter` →
`_load_custom_adapter`, pipeline_mvadapter_i2mv_sdxl.py:938-940) are a
SINGLE safetensors holding:

* the decoupled attention-processor weights, keyed under the base SDXL
  UNet paths (`down_blocks.*.attentions.*.transformer_blocks.*`
  `.attn1.processor.to_{q,k,v}_mv` / `to_out_mv.0` and `_ref`
  variants) — loaded non-strict over the base UNet;
* the `T2IAdapter(full_adapter_xl)` condition encoder
  (`adapter.conv_in.*`, `adapter.body.*`).

The base UNet/VAE come from a local SDXL diffusers directory
(`prepare_pipeline(base_model=...)`).
"""

from __future__ import annotations

import os

import numpy as np

from ..convert import convert_with_rules
from ..diffusion.convert import (unet_config_from_json, unet_rules,
                                 vae_config_from_json, vae_rules)
from .adapter import T2IAdapterXLConfig, t2i_adapter_xl_rules


def split_adapter_state_dict(sd):
    """adapter safetensors → (unet-keyed processor dict, cond-encoder
    dict)."""
    unet_sd, cond_sd = {}, {}
    for k, v in sd.items():
        if k.startswith("adapter."):
            cond_sd[k] = v
        else:
            unet_sd[k] = v
    return unet_sd, cond_sd


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            dst[k] = _merge(dst.get(k, {}), v)
        else:
            dst[k] = v
    return dst


def load_mvadapter_pipeline(kind: str, base_dir: str,
                            adapter_file: str, num_views: int = 6):
    """kind ∈ {"ig2mv", "tg2mv"}; base_dir = local SDXL diffusers
    snapshot; adapter_file = mvadapter_*_sdxl.safetensors path."""
    import dataclasses

    from ..convert import load_state_dict
    from ..loader import (load_dir_state_dict, on_cpu,
                          read_json_config, validate_tree)
    from .pipeline import (MVAdapterConfig, MVAdapterIG2MVPipeline,
                           MVAdapterTG2MVPipeline)

    use_ref = kind == "ig2mv"
    unet_dir = os.path.join(base_dir, "unet")
    raw = read_json_config(os.path.join(unet_dir, "config.json"))
    ucfg = unet_config_from_json(raw, mv_views=num_views,
                                 mv_decoupled=True, mv_use_ref=use_ref)
    base_sd = load_dir_state_dict(unet_dir)
    unet_params = convert_with_rules(base_sd, unet_rules(),
                                     strict=False)

    ad_sd = load_state_dict(adapter_file)
    proc_sd, cond_sd = split_adapter_state_dict(ad_sd)
    proc = convert_with_rules(proc_sd, unet_rules(), strict=False)
    _merge(unet_params, proc)
    cond = convert_with_rules(cond_sd, t2i_adapter_xl_rules(),
                              strict=False)

    from .adapter import adapter_config_from_state_dict
    kw = dict(unet=ucfg, num_views=num_views, use_ref=use_ref,
              prompt_dim=ucfg.cross_attention_dim,
              adapter=adapter_config_from_state_dict(cond_sd))
    if ucfg.addition_embed_type == "text_time":
        kw["pooled_dim"] = ucfg.addition_proj_dim \
            - 6 * ucfg.addition_time_embed_dim
    vae_dir = os.path.join(base_dir, "vae")
    if os.path.isdir(vae_dir):
        vraw = read_json_config(os.path.join(vae_dir, "config.json"))
        kw["vae"] = vae_config_from_json(vraw)
        kw["vae_scaling"] = vraw.get("scaling_factor", 0.13025)
    cfg = dataclasses.replace(MVAdapterConfig(), **kw)

    cls = MVAdapterIG2MVPipeline if use_ref else MVAdapterTG2MVPipeline
    with on_cpu():
        pipe = cls.init_random(cfg=cfg)
    validate_tree(unet_params, pipe.params["unet"],
                  name=f"mvadapter.{kind}.unet")
    pipe.params["unet"] = unet_params
    validate_tree(cond, pipe.params["cond_encoder"],
                  name=f"mvadapter.{kind}.cond_encoder")
    pipe.params["cond_encoder"] = cond
    if os.path.isdir(vae_dir):
        pipe.params["vae"] = convert_with_rules(
            load_dir_state_dict(vae_dir), vae_rules(), strict=False)
    return pipe
