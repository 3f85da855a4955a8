"""Vecset torch checkpoints → flax param rules (ShapeVAE + DiT).

Key layouts are mirrored module-for-module (see blocks.py/dit.py
docstrings), so every rule is a rename + linear transpose.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .. import convert as C


def _leaf(key: str, val: np.ndarray, linear: bool):
    if key.endswith("weight"):
        return "kernel", (C.t_linear(val) if linear else val)
    return "bias", val


def _map_block_leaf(sub: str, val: np.ndarray):
    """Shared mapping for vecset attention-block leaves under one
    resblock / cross-attn block."""
    parts = sub.split(".")
    if parts[0] in ("ln_1", "ln_2", "ln_3"):
        leaf = "scale" if parts[1] == "weight" else "bias"
        return f"{parts[0]}/{leaf}", val
    if parts[0] == "attn":
        if parts[1] in ("c_q", "c_kv", "c_qkv", "c_proj"):
            leaf, v = _leaf(parts[2], val, linear=True)
            return f"attn/{parts[1]}/{leaf}", v
        if parts[1] == "attention":        # qk_norm LayerNorms
            which = parts[2]               # q_norm | k_norm
            leaf = "scale" if parts[3] == "weight" else "bias"
            return f"attn/{which}_{leaf}", val
    if parts[0] == "mlp":
        leaf, v = _leaf(parts[2], val, linear=True)
        return f"mlp/{parts[1]}/{leaf}", v
    return None


def shape_vae_rules() -> Callable:
    """Reference `ShapeVAE.state_dict()` (autoencoders/model.py:132-189)
    → models.vecset.vae.ShapeVAE paths."""

    def rules(key: str, val: np.ndarray):
        if key.startswith("post_kl."):
            leaf, v = _leaf(key, val, linear=True)
            return f"post_kl/{leaf}", v
        if key.startswith("transformer.resblocks."):
            rest = key[len("transformer.resblocks."):]
            idx, sub = rest.split(".", 1)
            hit = _map_block_leaf(sub, val)
            if hit:
                return f"transformer/resblocks_{idx}/" + hit[0], hit[1]
            return None
        if key.startswith("geo_decoder."):
            sub = key[len("geo_decoder."):]
            for lin in ("query_proj", "latents_proj", "output_proj"):
                if sub.startswith(lin + "."):
                    leaf, v = _leaf(sub, val, linear=True)
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


def dit_rules() -> Callable:
    """Reference `Hunyuan3DDiT.state_dict()` (hunyuan3ddit.py:284-410)
    → models.vecset.dit.Hunyuan3DDiT paths."""

    def rules(key: str, val: np.ndarray):
        simple_linear = {
            "latent_in": "latent_in", "cond_in": "cond_in",
            "final_layer.linear": "final_layer/linear",
            "final_layer.adaLN_modulation.1":
                "final_layer/adaLN_modulation_1",
        }
        for tk, fp in simple_linear.items():
            if key.startswith(tk + "."):
                leaf, v = _leaf(key, val, linear=True)
                return f"{fp}/{leaf}", v
        for emb in ("time_in", "guidance_in"):
            if key.startswith(emb + "."):
                _, layer, leaf = key.split(".")
                leaf, v = _leaf(leaf, val, linear=True)
                return f"{emb}/{layer}/{leaf}", v

        for stage, nsub in (("double_blocks", None),
                            ("single_blocks", None)):
            pre = stage + "."
            if not key.startswith(pre):
                continue
            idx, sub = key[len(pre):].split(".", 1)
            base = f"{stage}_{idx}/"
            # double-stream leaves
            ren = {
                "img_mod.lin": "img_mod_lin",
                "txt_mod.lin": "txt_mod_lin",
                "img_attn.qkv": "img_attn_qkv",
                "txt_attn.qkv": "txt_attn_qkv",
                "img_attn.proj": "img_attn_proj",
                "txt_attn.proj": "txt_attn_proj",
                "img_mlp.0": "img_mlp_0", "img_mlp.2": "img_mlp_2",
                "txt_mlp.0": "txt_mlp_0", "txt_mlp.2": "txt_mlp_2",
                "linear1": "linear1", "linear2": "linear2",
                "modulation.lin": "modulation_lin",
            }
            for tk, fp in ren.items():
                if sub.startswith(tk + "."):
                    leaf, v = _leaf(sub, val, linear=True)
                    return base + f"{fp}/{leaf}", v
            # RMS qk-norm scales
            for tk, fp in (("img_attn.norm", "img_attn_norm"),
                           ("txt_attn.norm", "txt_attn_norm"),
                           ("norm", "norm")):
                if sub.startswith(tk + "."):
                    which = sub[len(tk) + 1:]     # query_norm.scale etc.
                    which = which.replace(".", "_")
                    return base + f"{fp}/{which}", val
        return None

    return rules


def convert_shape_vae(state_dict) -> dict:
    return C.convert_with_rules(state_dict, shape_vae_rules(), strict=True)


def convert_dit(state_dict) -> dict:
    return C.convert_with_rules(state_dict, dit_rules(), strict=True)
