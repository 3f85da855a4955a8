"""Hunyuan3D paint (texgen) checkpoint → flax converter.

Maps the `UNet2p5DConditionModel` state dict — the layout shipped in
`tencent/Hunyuan3D-2` `hunyuan3d-paint-v2-0(-turbo)/unet/` and, with PBR
extras, `tencent/Hunyuan3D-2.1` `hunyuan3d-paintpbr-v2-1/unet/` — onto
the `Hunyuan3DPaintPipeline` param groups.

Checkpoint structure (reference `Hunyuan3D_V2/hy3dgen/texgen/
hunyuanpaint/unet/modules.py:404-456` `UNet2p5DConditionModel.__init__`):

* ``unet.*`` — the gen-stream UNet: standard diffusers keys, except
  every cross-attn transformer block is wrapped by
  ``Basic2p5DTransformerBlock`` so its diffusers sublayers nest under
  an extra ``.transformer.`` segment, with sibling ``attn_multiview``
  and ``attn_refview`` attentions (modules.py:46-79); plus
  ``conv_in`` widened to 12 input channels (latent + normal + position,
  modules.py:437-445), ``class_embedding`` (49-entry camera table,
  modules.py:450-456) and ``learned_text_clip_{gen,ref}`` [1, 77, 1024]
  (modules.py:447-448).
* ``unet_dual.*`` — the reference ("write") stream: a full copy of the
  ORIGINAL 4-channel UNet, same ``.transformer.`` nesting, no extra
  attentions (deep-copied before conv_in widening, modules.py:415-418).

2.1 paintpbr additionally carries ``unet.learned_text_clip_{albedo,mr}``
per-material prompt tokens (hunyuanpaintpbr/unet/modules.py:845-850)
mapped to ``attr_embeds``; its DINO projector / material-attention
extras are intentionally dropped (no DINOv2-giant in this deployment).
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..convert import convert_with_rules, to_numpy
from ..diffusion.convert import (unet_config_from_json, unet_rules,
                                 vae_rules, vae_config_from_json)

# Basic2p5DTransformerBlock nests the wrapped diffusers block under
# `.transformer.`; strip it so the standard unet rules apply
_TRANS_RE = re.compile(r"(transformer_blocks\.\d+)\.transformer\.")

# 2.1-only modules without a flax counterpart here (documented drop)
_DROP_RE = re.compile(
    r"(image_proj_model_dino|attn_dino|attn_mda|pos_embed_2d"
    r"|position_rope)")


def paint_stream_rules(prefix: str):
    """Rules for one UNet stream (`unet.` or `unet_dual.`)."""
    base = unet_rules()

    def rules(key: str, val: np.ndarray):
        if not key.startswith(prefix):
            return None
        key = key[len(prefix):]
        if key.startswith("learned_text_clip") or \
                key.startswith("class_embedding"):
            return None                      # handled at the top level
        if _DROP_RE.search(key):
            from ..convert import DROP
            return DROP
        key = _TRANS_RE.sub(r"\1.", key)
        return base(key, val)

    return rules


def _squeeze_tokens(v: np.ndarray) -> np.ndarray:
    """learned_text_clip params are [1, 77, 1024] in v2.0 and
    [77, 1024] in 2.1 — normalize to [77, 1024]."""
    v = to_numpy(v)
    return v[0] if v.ndim == 3 else v


def convert_paint_state_dict(sd, pbr_settings=()):
    """UNet2p5D state dict → {"unet", "unet_dual", "cls", "text_gen",
    "text_ref"[, "attr_embeds"]} param groups."""
    sd = dict(sd)
    params = {}
    cls_w = sd.pop("unet.class_embedding.weight", None)
    if cls_w is not None:
        params["cls"] = {"embedding": to_numpy(cls_w)}
    t_gen = sd.pop("unet.learned_text_clip_gen", None)
    if t_gen is not None:
        params["text_gen"] = _squeeze_tokens(t_gen)
    t_ref = sd.pop("unet.learned_text_clip_ref", None)
    if t_ref is not None:
        params["text_ref"] = _squeeze_tokens(t_ref)
    attrs = []
    for attr in pbr_settings:
        w = sd.pop(f"unet.learned_text_clip_{attr}", None)
        if w is not None:
            attrs.append(_squeeze_tokens(w))
    if attrs:
        params["attr_embeds"] = np.stack(attrs)
    params["unet"] = convert_with_rules(
        sd, paint_stream_rules("unet."), strict=False)
    if any(k.startswith("unet_dual.") for k in sd):
        params["unet_dual"] = convert_with_rules(
            sd, paint_stream_rules("unet_dual."), strict=False)
    return params


def load_paint_checkpoint(model_dir: str, pbr: bool = False,
                          num_views: int = 6):
    """Load a `hunyuan3d-paint-*` diffusers pipeline directory
    (unet/ + vae/ + scheduler/) into a Hunyuan3DPaintPipeline.

    Reference loaders: `Hunyuan3D_V2/hy3dgen/texgen/pipelines.py:53`
    (Hunyuan3DPaintPipeline.from_pretrained) /
    `Hunyuan3D_2_1/hy3dpaint/utils/multiview_utils.py:27-53`.
    """
    import dataclasses

    from ..loader import load_dir_state_dict, read_json_config
    from .paint import Hunyuan3DPaintPipeline, PaintConfig

    unet_dir = os.path.join(model_dir, "unet")
    raw = read_json_config(os.path.join(unet_dir, "config.json"))
    sd = load_dir_state_dict(unet_dir)
    pbr_settings = ("albedo", "mr") if pbr else ()
    params = convert_paint_state_dict(sd, pbr_settings)

    # conv_in width comes from the checkpoint, not config.json (the
    # wrapper widens it post-construction, modules.py:437-445)
    in_ch = params["unet"]["conv_in"]["kernel"].shape[2]
    ucfg = unet_config_from_json(
        raw, in_channels=in_ch, mv_views=num_views,
        use_ma=True, use_ra=True)

    base = PaintConfig()
    kw = dict(unet=ucfg, pbr_settings=pbr_settings,
              prompt_dim=ucfg.cross_attention_dim)
    if "text_gen" in params:
        kw["prompt_tokens"] = params["text_gen"].shape[0]
    elif "text_ref" in params:
        kw["prompt_tokens"] = params["text_ref"].shape[0]
    if "cls" in params:
        kw["num_cls"] = params["cls"]["embedding"].shape[0]
    vae_dir = os.path.join(model_dir, "vae")
    if os.path.isdir(vae_dir):
        vraw = read_json_config(os.path.join(vae_dir, "config.json"))
        kw["vae"] = vae_config_from_json(vraw)
        kw["vae_scaling"] = vraw.get("scaling_factor", 0.18215)
        vsd = load_dir_state_dict(vae_dir)
        params["vae"] = convert_with_rules(vsd, vae_rules(),
                                           strict=False)
    sched_json = os.path.join(model_dir, "scheduler",
                              "scheduler_config.json")
    if os.path.exists(sched_json):
        sraw = read_json_config(sched_json)
        kw["scheduler"] = dataclasses.replace(
            base.scheduler,
            prediction_type=sraw.get("prediction_type", "v_prediction"),
            num_train_timesteps=sraw.get("num_train_timesteps", 1000),
            beta_start=sraw.get("beta_start", 0.00085),
            beta_end=sraw.get("beta_end", 0.012),
            beta_schedule=sraw.get("beta_schedule", "scaled_linear"))
    cfg = dataclasses.replace(base, **kw)

    from ..loader import on_cpu, validate_tree
    with on_cpu():
        pipe = Hunyuan3DPaintPipeline.init_random(cfg=cfg)
    for group, tree in params.items():
        if group in ("unet", "unet_dual", "vae"):
            validate_tree(tree, pipe.params[group],
                          name=f"paint.{group}")
        pipe.params[group] = tree
    return pipe
