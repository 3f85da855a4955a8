"""LDM-layout checkpoint conversion (CompVis/Stability single-file
state dicts).

CRM's multiview diffusion stages ship as single `.pth` LDM checkpoints
(`pixel-diffusion.pth` / `ccm-diffusion.pth`, reference
nodes.py:2155-2211 + `Configs/CRM_configs/sd_v2_base_ipmv_zero_SNR.yaml`)
holding `model.diffusion_model.*` (MultiViewUNetModel — handled by
`models.mvdream.convert.mv_unet_rules`), `first_stage_model.*` (the LDM
`AutoencoderKL`, `CRM/imagedream/ldm/models/autoencoder.py:12-70`) and
`cond_stage_model.model.*` (OpenCLIP ViT-H text tower,
`CRM/imagedream/ldm/modules/encoders/modules.py` FrozenOpenCLIPEmbedder).
This module converts the latter two into the diffusion substrate's
AutoencoderKL / CLIPTextEncoder flax trees.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .. import convert as C

# ------------------------------------------------------------------ #
# LDM AutoencoderKL (encoder.down.{i}.block.{j}, mid.block_1/attn_1/
# block_2, decoder.up.{i} in reversed application order)
# ------------------------------------------------------------------ #

_RES = {
    "norm1.weight": ("norm1/scale", None),
    "norm1.bias": ("norm1/bias", None),
    "conv1.weight": ("conv1/kernel", C.t_conv),
    "conv1.bias": ("conv1/bias", None),
    "norm2.weight": ("norm2/scale", None),
    "norm2.bias": ("norm2/bias", None),
    "conv2.weight": ("conv2/kernel", C.t_conv),
    "conv2.bias": ("conv2/bias", None),
    "nin_shortcut.weight": ("conv_shortcut/kernel", C.t_conv),
    "nin_shortcut.bias": ("conv_shortcut/bias", None),
}

# vanilla LDM attention: q/k/v/proj_out are 1x1 convs
_ATTN = {
    "norm.weight": ("group_norm/scale", None),
    "norm.bias": ("group_norm/bias", None),
    "q.weight": ("to_q/kernel", "conv1x1"),
    "q.bias": ("to_q/bias", None),
    "k.weight": ("to_k/kernel", "conv1x1"),
    "k.bias": ("to_k/bias", None),
    "v.weight": ("to_v/kernel", "conv1x1"),
    "v.bias": ("to_v/bias", None),
    "proj_out.weight": ("to_out_0/kernel", "conv1x1"),
    "proj_out.bias": ("to_out_0/bias", None),
}


def _apply(table, rest, base, val):
    hit = table.get(rest)
    if hit is None:
        return None
    path, fn = hit
    if fn == "conv1x1":
        return f"{base}/{path}", C.t_linear(val[:, :, 0, 0])
    return f"{base}/{path}", (fn(val) if fn else val)


def ldm_vae_rules(n_levels: int = 4,
                  prefix: str = "first_stage_model.") -> Callable:
    """LDM AutoencoderKL state dict → models.diffusion.vae paths."""

    def rules(key: str, val: np.ndarray):
        if not key.startswith(prefix):
            return None
        key = key[len(prefix):]
        if key == "quant_conv.weight":
            return "encoder/quant_conv/kernel", C.t_conv(val)
        if key == "quant_conv.bias":
            return "encoder/quant_conv/bias", val
        if key == "post_quant_conv.weight":
            return "decoder/post_quant_conv/kernel", C.t_conv(val)
        if key == "post_quant_conv.bias":
            return "decoder/post_quant_conv/bias", val
        for side in ("encoder", "decoder"):
            pre = side + "."
            if not key.startswith(pre):
                continue
            rest = key[len(pre):]
            simple = {
                "conv_in.weight": ("conv_in/kernel", C.t_conv),
                "conv_in.bias": ("conv_in/bias", None),
                "conv_out.weight": ("conv_out/kernel", C.t_conv),
                "conv_out.bias": ("conv_out/bias", None),
                "norm_out.weight": ("norm_out/scale", None),
                "norm_out.bias": ("norm_out/bias", None),
            }
            if rest in simple:
                path, fn = simple[rest]
                return f"{side}/{path}", (fn(val) if fn else val)
            if rest.startswith("mid."):
                sub = rest[len("mid."):]
                for tname, base in (("block_1.", "mid_res_0"),
                                    ("block_2.", "mid_res_1")):
                    if sub.startswith(tname):
                        return _apply(_RES, sub[len(tname):],
                                      f"{side}/{base}", val)
                if sub.startswith("attn_1."):
                    return _apply(_ATTN, sub[len("attn_1."):],
                                  f"{side}/mid_attn", val)
            if side == "encoder" and rest.startswith("down."):
                i, sub = rest[len("down."):].split(".", 1)
                if sub.startswith("block."):
                    j, leaf = sub[len("block."):].split(".", 1)
                    return _apply(_RES, leaf,
                                  f"encoder/down_{i}_res_{j}", val)
                if sub == "downsample.conv.weight":
                    return (f"encoder/down_{i}_downsample/kernel",
                            C.t_conv(val))
                if sub == "downsample.conv.bias":
                    return f"encoder/down_{i}_downsample/bias", val
            if side == "decoder" and rest.startswith("up."):
                i, sub = rest[len("up."):].split(".", 1)
                # ldm indexes up blocks by resolution level (applied in
                # reverse); ours by application order
                bi = n_levels - 1 - int(i)
                if sub.startswith("block."):
                    j, leaf = sub[len("block."):].split(".", 1)
                    return _apply(_RES, leaf,
                                  f"decoder/up_{bi}_res_{j}", val)
                if sub == "upsample.conv.weight":
                    return (f"decoder/up_{bi}_upsample/kernel",
                            C.t_conv(val))
                if sub == "upsample.conv.bias":
                    return f"decoder/up_{bi}_upsample/bias", val
        return None

    return rules


# ------------------------------------------------------------------ #
# OpenCLIP text tower (FrozenOpenCLIPEmbedder, penultimate layer)
# ------------------------------------------------------------------ #

def open_clip_text_rules(n_layers: int,
                         prefix: str = "cond_stage_model.model."
                         ) -> Callable:
    """open_clip text-tower state dict → models.clip.CLIPTextEncoder
    paths, keeping only resblocks < n_layers (penultimate truncation:
    FrozenOpenCLIPEmbedder(layer="penultimate") drops the last block
    but still applies ln_final)."""

    def rules(key: str, val: np.ndarray):
        if not key.startswith(prefix):
            return None
        key = key[len(prefix):]
        simple = {
            "token_embedding.weight": ("token_embedding", None),
            "positional_embedding": ("position_embedding", None),
            "ln_final.weight": ("final_layer_norm/scale", None),
            "ln_final.bias": ("final_layer_norm/bias", None),
        }
        if key in simple:
            path, fn = simple[key]
            return path, (fn(val) if fn else val)
        if key in ("text_projection", "logit_scale",
                   "attn_mask"):
            return C.DROP
        if not key.startswith("transformer.resblocks."):
            return None
        idx, sub = key[len("transformer.resblocks."):].split(".", 1)
        if int(idx) >= n_layers:
            return C.DROP
        base = f"layers_{idx}"
        m = {
            "ln_1.weight": ("layer_norm1/scale", None),
            "ln_1.bias": ("layer_norm1/bias", None),
            "ln_2.weight": ("layer_norm2/scale", None),
            "ln_2.bias": ("layer_norm2/bias", None),
            "attn.out_proj.weight": ("out_proj/kernel", C.t_linear),
            "attn.out_proj.bias": ("out_proj/bias", None),
            "mlp.c_fc.weight": ("fc1/kernel", C.t_linear),
            "mlp.c_fc.bias": ("fc1/bias", None),
            "mlp.c_proj.weight": ("fc2/kernel", C.t_linear),
            "mlp.c_proj.bias": ("fc2/bias", None),
        }
        hit = m.get(sub)
        if hit:
            path, fn = hit
            return f"{base}/{path}", (fn(val) if fn else val)
        return None            # in_proj handled by convert_open_clip

    return rules


def convert_open_clip_text(state_dict, n_layers: int,
                           prefix: str = "cond_stage_model.model."
                           ) -> dict:
    """Full conversion incl. the fused in_proj qkv split."""
    rules = open_clip_text_rules(n_layers, prefix)
    tree: dict = {}
    for key, val in state_dict.items():
        val = C.to_numpy(val)
        out = rules(key, val)
        if out is C.DROP:
            continue
        if out is not None:
            C.set_path(tree, out[0], out[1])
            continue
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        if not rest.startswith("transformer.resblocks."):
            continue
        idx, sub = rest[len("transformer.resblocks."):].split(".", 1)
        if int(idx) >= n_layers:
            continue
        c = val.shape[-1] if val.ndim == 2 else val.shape[0] // 3
        if sub == "attn.in_proj_weight":
            for name, w in zip(("q_proj", "k_proj", "v_proj"),
                               np.split(val, 3, axis=0)):
                C.set_path(tree, f"layers_{idx}/{name}/kernel",
                           C.t_linear(w))
        elif sub == "attn.in_proj_bias":
            for name, b in zip(("q_proj", "k_proj", "v_proj"),
                               np.split(val, 3, axis=0)):
                C.set_path(tree, f"layers_{idx}/{name}/bias", b)
    return tree


def encode_empty_prompt_openclip(state_dict, hidden: int = 1024,
                                 heads: int = 16, mlp_dim: int = 4096,
                                 total_layers: int = 24,
                                 prefix: str = "cond_stage_model.model."
                                 ) -> np.ndarray:
    """Empty-prompt hidden states [77, hidden] via the penultimate
    OpenCLIP layer (what every LDM-era SD2-class pipeline conditions
    on). open_clip pads the empty prompt with id 0."""
    from ..clip import CLIPTextConfig, CLIPTextEncoder, empty_prompt_ids
    n = total_layers - 1
    cfg = CLIPTextConfig(hidden=hidden, layers=n, heads=heads,
                         mlp_dim=mlp_dim, act="gelu")
    params = convert_open_clip_text(state_dict, n, prefix)
    ids = empty_prompt_ids(cfg.max_positions, pad_token_id=0)
    h, _ = CLIPTextEncoder(cfg).apply({"params": params}, ids)
    return np.asarray(h[0])


def convert_open_clip_visual(state_dict,
                             prefix: str =
                             "cond_stage_model.model.visual.") -> dict:
    """open_clip ViT visual tower → models.clip.CLIPVisionEncoder tree
    (the ImageDream `encode_image_with_transformer` weights,
    `CRM/imagedream/ldm/modules/encoders/modules.py:243-263`)."""
    tree: dict = {}
    simple = {
        "class_embedding": "class_embedding",
        "positional_embedding": "position_embedding",
        "ln_pre.weight": "pre_layrnorm/scale",
        "ln_pre.bias": "pre_layrnorm/bias",
        "ln_post.weight": "post_layernorm/scale",
        "ln_post.bias": "post_layernorm/bias",
    }
    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        val = C.to_numpy(val)
        if rest in simple:
            C.set_path(tree, simple[rest], val)
        elif rest == "conv1.weight":
            C.set_path(tree, "patch_embedding/kernel", C.t_conv(val))
        elif rest == "proj":
            # open_clip stores proj as [width, out] (used x @ proj) —
            # already flax kernel layout
            C.set_path(tree, "visual_projection/kernel", val)
        elif rest.startswith("transformer.resblocks."):
            idx, sub = rest[len("transformer.resblocks."):].split(".", 1)
            base = f"layers_{idx}"
            m = {
                "ln_1.weight": ("layer_norm1/scale", None),
                "ln_1.bias": ("layer_norm1/bias", None),
                "ln_2.weight": ("layer_norm2/scale", None),
                "ln_2.bias": ("layer_norm2/bias", None),
                "attn.out_proj.weight": ("out_proj/kernel", C.t_linear),
                "attn.out_proj.bias": ("out_proj/bias", None),
                "mlp.c_fc.weight": ("fc1/kernel", C.t_linear),
                "mlp.c_fc.bias": ("fc1/bias", None),
                "mlp.c_proj.weight": ("fc2/kernel", C.t_linear),
                "mlp.c_proj.bias": ("fc2/bias", None),
            }
            hit = m.get(sub)
            if hit:
                path, fn = hit
                C.set_path(tree, f"{base}/{path}",
                           fn(val) if fn else val)
            elif sub == "attn.in_proj_weight":
                for name, w in zip(("q_proj", "k_proj", "v_proj"),
                                   np.split(val, 3, axis=0)):
                    C.set_path(tree, f"{base}/{name}/kernel",
                               C.t_linear(w))
            elif sub == "attn.in_proj_bias":
                for name, b in zip(("q_proj", "k_proj", "v_proj"),
                                   np.split(val, 3, axis=0)):
                    C.set_path(tree, f"{base}/{name}/bias", b)
    return tree
