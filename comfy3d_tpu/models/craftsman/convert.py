"""Craftsman checkpoint (wyysf/CraftsMan `model.ckpt`) → flax loader.

The reference checkpoint is one Lightning file whose state dict holds
three prefixes (systems/shape_diffusion.py:158-167):
  * `shape_model.` — MichelangeloAlignedAutoencoder
    (models/autoencoders/michelangelo_autoencoder.py:179-331); its
    decode path maps onto the shared vecset ShapeVAE (same Perceiver /
    cross-attention-decoder layout as Hunyuan, no latents_proj),
  * `denoiser_model.` — SimpleDenoiser
    (models/denoisers/simple_denoiser.py:94-188),
  * `condition.model.` — ConditionalCLIPModel: CLIP ViT-L/14 vision
    with per-layer camera ModLN
    (conditional_encoders/clip/modeling_conditional_clip.py:42-110).
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from .. import convert as C
from ..clip import clip_rules
from ..vecset.convert import _map_block_leaf


def michelangelo_vae_rules() -> Callable:
    """`shape_model.*` decode-path keys → flax ShapeVAE paths."""

    def rules(key: str, val: np.ndarray):
        if not key.startswith("shape_model."):
            return None
        key = key[len("shape_model."):]
        if key.startswith("post_kl."):
            leaf = "kernel" if key.endswith("weight") else "bias"
            v = C.t_linear(val) if leaf == "kernel" else val
            return f"post_kl/{leaf}", v
        if key.startswith("transformer.resblocks."):
            idx, sub = key[len("transformer.resblocks."):].split(".", 1)
            hit = _map_block_leaf(sub, val)
            if hit:
                return f"transformer/resblocks_{idx}/{hit[0]}", hit[1]
            return None
        if key.startswith("decoder."):
            sub = key[len("decoder."):]
            for lin in ("query_proj", "output_proj"):
                if sub.startswith(lin + "."):
                    leaf = "kernel" if sub.endswith("weight") else "bias"
                    v = C.t_linear(val) if leaf == "kernel" else val
                    return f"geo_decoder/{lin}/{leaf}", v
            if sub.startswith("ln_post."):
                leaf = "scale" if sub.endswith("weight") else "bias"
                return f"geo_decoder/ln_post/{leaf}", val
            if sub.startswith("cross_attn_decoder."):
                inner = sub[len("cross_attn_decoder."):]
                hit = _map_block_leaf(inner, val)
                if hit:
                    return ("geo_decoder/cross_attn_decoder/" + hit[0],
                            hit[1])
        return None

    return rules


def denoiser_rules() -> Callable:
    """`denoiser_model.*` keys → flax SimpleDenoiser paths."""

    def rules(key: str, val: np.ndarray):
        if not key.startswith("denoiser_model."):
            return None
        key = key[len("denoiser_model."):]
        linears = {"input_proj": "input_proj",
                   "output_proj": "output_proj",
                   "time_proj.c_fc": "time_proj/c_fc",
                   "time_proj.c_proj": "time_proj/c_proj",
                   "context_embed.1": "context_embed"}
        for tk, fp in linears.items():
            if key == tk + ".weight":
                return f"{fp}/kernel", C.t_linear(val)
            if key == tk + ".bias":
                return f"{fp}/bias", val
        for tk, fp in (("ln_post", "ln_post"),
                       ("context_embed.0", "context_ln")):
            if key == tk + ".weight":
                return f"{fp}/scale", val
            if key == tk + ".bias":
                return f"{fp}/bias", val
        if not key.startswith("backbone."):
            return None
        key = key[len("backbone."):]
        if key.startswith("middle_block."):
            hit = _map_block_leaf(key[len("middle_block."):], val)
            if hit:
                return f"backbone/middle_block/{hit[0]}", hit[1]
            return None
        if key.startswith("encoder."):
            idx, sub = key[len("encoder."):].split(".", 1)
            hit = _map_block_leaf(sub, val)
            if hit:
                return f"backbone/encoder_{idx}/{hit[0]}", hit[1]
            return None
        if key.startswith("decoder."):
            idx, rest = key[len("decoder."):].split(".", 1)
            slot, sub = rest.split(".", 1)
            if slot == "0":                      # resblock
                hit = _map_block_leaf(sub, val)
                if hit:
                    return (f"backbone/decoder_{idx}_resblock/{hit[0]}",
                            hit[1])
                return None
            if slot == "1":                      # skip linear
                leaf = "kernel" if sub == "weight" else "bias"
                v = C.t_linear(val) if leaf == "kernel" else val
                return f"backbone/decoder_{idx}_linear/{leaf}", v
            if slot == "2":                      # skip LayerNorm
                leaf = "scale" if sub == "weight" else "bias"
                return f"backbone/decoder_{idx}_ln/{leaf}", val
        return None

    return rules


def cond_rules() -> Callable:
    """`condition.model.vision_model.*` (+ visual_projection) →
    flax CLIPVisionEncoder paths; text tower skipped."""
    base = clip_rules(prefix="condition.model.")

    def rules(key: str, val: np.ndarray):
        if key.startswith(("condition.model.text_model.",
                           "condition.model.text_projection.")):
            return None
        if key in ("condition.model.logit_scale",):
            return None
        return base(key, val)

    return rules


def load_craftsman_ckpt(cls, path: str, **cfg_overrides):
    """`path` = the model.ckpt file or a directory containing it."""
    from ..loader import load_dir_state_dict
    from .pipeline import CraftsmanConfig

    if os.path.isdir(path):
        # the HF layout nests the ckpt under
        # image-to-shape-diffusion/<variant>/model.ckpt
        cands = []
        for root, _dirs, files in os.walk(path):
            cands += [os.path.join(root, f) for f in files
                      if f.endswith(".ckpt")]
        if not cands:
            raise FileNotFoundError(f"no .ckpt under {path!r}")
        path = sorted(cands)[0]
    sd = load_dir_state_dict(path)

    kw = {}
    kw.update(cfg_overrides)
    cfg = CraftsmanConfig(**kw)
    params = {
        "vae": C.convert_with_rules(sd, michelangelo_vae_rules(),
                                    strict=False),
        "denoiser": C.convert_with_rules(sd, denoiser_rules(),
                                         strict=False),
        "cond": C.convert_with_rules(sd, cond_rules(), strict=False),
    }
    for name, tree in params.items():
        if not tree:
            raise ValueError(f"craftsman ckpt missing {name} weights")
    return cls(params, cfg)
