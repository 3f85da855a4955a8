"""diffusers-checkpoint → flax converter rules for the UNet and VAE.

Maps the standard `UNet2DConditionModel` / `AutoencoderKL` state-dict
layouts (which every reference diffusion family ships:
Zero123Plus/Wonder3D/Era3D/MVDream checkpoints are diffusers-format) onto
`models.diffusion.unet/vae` flax trees. Handles both conv (SD1.x) and
linear (SD2.x, use_linear_projection) spatial-transformer projections.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np

from ..convert import t_conv, t_linear


def _norm(path, val, kind):
    return path + ("/scale" if kind == "weight" else "/bias"), val


def _conv(path, val, kind):
    if kind == "weight":
        return path + "/kernel", t_conv(val)
    return path + "/bias", val


def _linear(path, val, kind):
    if kind == "weight":
        if val.ndim == 4:          # conv1x1 used as linear (SD1.x proj)
            val = val[:, :, 0, 0]
        return path + "/kernel", t_linear(val)
    return path + "/bias", val


_RESNET_SUB = {
    "norm1": ("norm1", _norm), "conv1": ("conv1", _conv),
    "time_emb_proj": ("time_emb_proj", _linear),
    "norm2": ("norm2", _norm), "conv2": ("conv2", _conv),
    "conv_shortcut": ("conv_shortcut", _conv),
}

_ATTN_SUB = {
    "norm": ("norm", _norm),
    "proj_in": ("proj_in", _linear),
    "proj_out": ("proj_out", _linear),
}

_TBLOCK_SUB = {
    "norm1": ("norm1", _norm), "norm2": ("norm2", _norm),
    "norm3": ("norm3", _norm),
    "attn1.to_q": ("attn1/to_q", _linear),
    "attn1.to_k": ("attn1/to_k", _linear),
    "attn1.to_v": ("attn1/to_v", _linear),
    "attn1.to_out.0": ("attn1/to_out_0", _linear),
    "attn2.to_q": ("attn2/to_q", _linear),
    "attn2.to_k": ("attn2/to_k", _linear),
    "attn2.to_v": ("attn2/to_v", _linear),
    "attn2.to_out.0": ("attn2/to_out_0", _linear),
    "ff.net.0.proj": ("ff_net_0/proj", _linear),
    "ff.net.2": ("ff_net_2", _linear),
    # Wonder3D cross-domain joint attention (transformer_mv2d.py:512-525)
    "norm_joint_mid": ("norm_joint_mid", _norm),
    "attn_joint_mid.to_q": ("attn_joint_mid/to_q", _linear),
    "attn_joint_mid.to_k": ("attn_joint_mid/to_k", _linear),
    "attn_joint_mid.to_v": ("attn_joint_mid/to_v", _linear),
    "attn_joint_mid.to_out.0": ("attn_joint_mid/to_out_0", _linear),
    # Era3D row-wise multiview attention
    # (transformer_mv2d_self_rowwise.py:471-486)
    "norm_mv": ("norm_mv", _norm),
    "attn_mv.to_q": ("attn_mv/to_q", _linear),
    "attn_mv.to_k": ("attn_mv/to_k", _linear),
    "attn_mv.to_v": ("attn_mv/to_v", _linear),
    "attn_mv.to_out.0": ("attn_mv/to_out_0", _linear),
    # Hunyuan paint 2p5D block extras
    # (hunyuanpaint/unet/modules.py:46-79)
    "attn_multiview.to_q": ("attn_multiview/to_q", _linear),
    "attn_multiview.to_k": ("attn_multiview/to_k", _linear),
    "attn_multiview.to_v": ("attn_multiview/to_v", _linear),
    "attn_multiview.to_out.0": ("attn_multiview/to_out_0", _linear),
    "attn_refview.to_q": ("attn_refview/to_q", _linear),
    "attn_refview.to_k": ("attn_refview/to_k", _linear),
    "attn_refview.to_v": ("attn_refview/to_v", _linear),
    "attn_refview.to_out.0": ("attn_refview/to_out_0", _linear),
    # MV-Adapter decoupled processors (attention_processor.py:385-438):
    # saved under attn1.processor.to_*_{mv,ref}
    "attn1.processor.to_q_mv": ("attn1_mv/to_q", _linear),
    "attn1.processor.to_k_mv": ("attn1_mv/to_k", _linear),
    "attn1.processor.to_v_mv": ("attn1_mv/to_v", _linear),
    "attn1.processor.to_out_mv.0": ("attn1_mv/to_out_0", _linear),
    "attn1.processor.to_q_ref": ("attn1_ref/to_q", _linear),
    "attn1.processor.to_k_ref": ("attn1_ref/to_k", _linear),
    "attn1.processor.to_v_ref": ("attn1_ref/to_v", _linear),
    "attn1.processor.to_out_ref.0": ("attn1_ref/to_out_0", _linear),
}


def _map_sub(table, rest, base, val):
    for tk, (fk, fn) in table.items():
        for kind in ("weight", "bias"):
            if rest == f"{tk}.{kind}":
                return fn(f"{base}{fk}", val, kind)
    return None


def unet_rules(prefix: str = "") -> Callable:
    def rules(key: str, val: np.ndarray):
        if prefix:
            if not key.startswith(prefix):
                return None
            key = key[len(prefix):]
        simple = {
            "conv_in.weight": ("conv_in/kernel", t_conv),
            "conv_in.bias": ("conv_in/bias", None),
            "conv_out.weight": ("conv_out/kernel", t_conv),
            "conv_out.bias": ("conv_out/bias", None),
            "conv_norm_out.weight": ("norm_out/scale", None),
            "conv_norm_out.bias": ("norm_out/bias", None),
            "time_embedding.linear_1.weight": ("time_emb_1/kernel",
                                               t_linear),
            "time_embedding.linear_1.bias": ("time_emb_1/bias", None),
            "time_embedding.linear_2.weight": ("time_emb_2/kernel",
                                               t_linear),
            "time_embedding.linear_2.bias": ("time_emb_2/bias", None),
            # SDXL text_time addition embedding
            "add_embedding.linear_1.weight": ("add_emb_1/kernel",
                                              t_linear),
            "add_embedding.linear_1.bias": ("add_emb_1/bias", None),
            "add_embedding.linear_2.weight": ("add_emb_2/kernel",
                                              t_linear),
            "add_embedding.linear_2.bias": ("add_emb_2/bias", None),
        }
        if key in simple:
            path, fn = simple[key]
            return path, (fn(val) if fn else val)

        m = re.match(r"(down|up)_blocks\.(\d+)\.(resnets|attentions"
                     r"|downsamplers|upsamplers)\.(\d+)\.(.*)", key)
        if m:
            side, bi, kind, j, rest = m.groups()
            if kind == "resnets":
                return _map_sub(_RESNET_SUB, rest,
                                f"{side}_{bi}_res_{j}/", val)
            if kind in ("downsamplers", "upsamplers"):
                tag = "downsample" if kind == "downsamplers" else "upsample"
                if rest == "conv.weight":
                    return f"{side}_{bi}_{tag}/conv/kernel", t_conv(val)
                if rest == "conv.bias":
                    return f"{side}_{bi}_{tag}/conv/bias", val
                return None
            base = f"{side}_{bi}_attn_{j}/"
            out = _map_sub(_ATTN_SUB, rest, base, val)
            if out:
                return out
            tb = re.match(r"transformer_blocks\.(\d+)\.(.*)", rest)
            if tb:
                k, sub = tb.groups()
                return _map_sub(_TBLOCK_SUB, sub,
                                f"{base}blocks_{k}/", val)
            return None

        m = re.match(r"mid_block\.(resnets|attentions)\.(\d+)\.(.*)", key)
        if m:
            kind, j, rest = m.groups()
            if kind == "resnets":
                return _map_sub(_RESNET_SUB, rest, f"mid_res_{j}/", val)
            base = "mid_attn/"
            out = _map_sub(_ATTN_SUB, rest, base, val)
            if out:
                return out
            tb = re.match(r"transformer_blocks\.(\d+)\.(.*)", rest)
            if tb:
                k, sub = tb.groups()
                return _map_sub(_TBLOCK_SUB, sub, f"{base}blocks_{k}/",
                                val)
        return None

    return rules


_VAE_ATTN_SUB = {
    "group_norm": ("group_norm", _norm),
    "to_q": ("to_q", _linear), "to_k": ("to_k", _linear),
    "to_v": ("to_v", _linear), "to_out.0": ("to_out_0", _linear),
    # older checkpoints name these query/key/value/proj_attn
    "query": ("to_q", _linear), "key": ("to_k", _linear),
    "value": ("to_v", _linear), "proj_attn": ("to_out_0", _linear),
}

_VAE_RESNET_SUB = {
    "norm1": ("norm1", _norm), "conv1": ("conv1", _conv),
    "norm2": ("norm2", _norm), "conv2": ("conv2", _conv),
    "conv_shortcut": ("conv_shortcut", _conv),
}


def vae_rules(prefix: str = "") -> Callable:
    def rules(key: str, val: np.ndarray):
        if prefix:
            if not key.startswith(prefix):
                return None
            key = key[len(prefix):]
        # quant convs live at the ends of my encoder/decoder
        simple = {
            "quant_conv.weight": ("encoder/quant_conv/kernel", t_conv),
            "quant_conv.bias": ("encoder/quant_conv/bias", None),
            "post_quant_conv.weight": ("decoder/post_quant_conv/kernel",
                                       t_conv),
            "post_quant_conv.bias": ("decoder/post_quant_conv/bias", None),
        }
        if key in simple:
            path, fn = simple[key]
            return path, (fn(val) if fn else val)
        for side in ("encoder", "decoder"):
            if not key.startswith(side + "."):
                continue
            rest = key[len(side) + 1:]
            fixed = {
                "conv_in.weight": (f"{side}/conv_in/kernel", t_conv),
                "conv_in.bias": (f"{side}/conv_in/bias", None),
                "conv_out.weight": (f"{side}/conv_out/kernel", t_conv),
                "conv_out.bias": (f"{side}/conv_out/bias", None),
                "conv_norm_out.weight": (f"{side}/norm_out/scale", None),
                "conv_norm_out.bias": (f"{side}/norm_out/bias", None),
            }
            if rest in fixed:
                path, fn = fixed[rest]
                return path, (fn(val) if fn else val)
            m = re.match(r"(down|up)_blocks\.(\d+)\.(resnets"
                         r"|downsamplers|upsamplers)\.(\d+)\.(.*)", rest)
            if m:
                ud, bi, kind, j, sub = m.groups()
                if kind == "resnets":
                    return _map_sub(_VAE_RESNET_SUB, sub,
                                    f"{side}/{ud}_{bi}_res_{j}/", val)
                tag = ("downsample" if kind == "downsamplers"
                       else "upsample")
                if sub == "conv.weight":
                    return f"{side}/{ud}_{bi}_{tag}/kernel", t_conv(val)
                if sub == "conv.bias":
                    return f"{side}/{ud}_{bi}_{tag}/bias", val
                return None
            m = re.match(r"mid_block\.(resnets|attentions)\.(\d+)\.(.*)",
                         rest)
            if m:
                kind, j, sub = m.groups()
                if kind == "resnets":
                    return _map_sub(_VAE_RESNET_SUB, sub,
                                    f"{side}/mid_res_{j}/", val)
                return _map_sub(_VAE_ATTN_SUB, sub, f"{side}/mid_attn/",
                                val)
        return None

    return rules


# ------------------------------------------------------------------ #
# diffusers directory loading (config.json + weights per component).
# Every reference diffusion family ships this layout on HF; these
# helpers turn `<repo>/unet`, `<repo>/vae`, `<repo>/{text,image,
# vision}_encoder` into (our_config, flax_params).
# ------------------------------------------------------------------ #
def unet_config_from_json(cfg: dict, **overrides):
    from .unet import UNetConfig
    ahd = cfg.get("attention_head_dim", 8)
    if isinstance(ahd, (list, tuple)):
        # per-block head counts (SD2.x style [5,10,20,20] = heads with
        # constant 64-dim heads); uniform lists → negative-head-count
        ahd = -ahd[0] if len(set(ahd)) == 1 else 64
    else:
        # scalar attention_head_dim in UNet2DConditionModel configs is
        # historically the HEAD COUNT (diffusers num_attention_heads
        # fallback) — our module's negative-head-count convention
        ahd = -ahd
    kw = dict(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 1024),
        attention_head_dim=ahd,
        norm_groups=cfg.get("norm_num_groups", 32),
        down_block_types=tuple(cfg.get("down_block_types", (
            "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D", "DownBlock2D"))),
        up_block_types=tuple(cfg.get("up_block_types", (
            "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D"))),
        # multiview-UNet variants (Wonder3D/Era3D UNetMV2DConditionModel)
        mv_views=cfg.get("num_views", 1)
        if cfg.get("multiview_attention", False) else 1,
        # cd pairing: Wonder3D's attn_joint_mid (cd_attention_mid) or
        # Era3D's joint attn1 (mvcd_attention with rowwise blocks)
        cd_joint=bool(cfg.get("cd_attention_mid", False))
        or (bool(cfg.get("mvcd_attention", False))
            and cfg.get("selfattn_block", "") == "self_rowwise"),
        # Era3D row-wise self-attention blocks
        # (selfattn_block="self_rowwise" in MacLab-Era3D configs)
        mv_rowwise=cfg.get("selfattn_block", "") == "self_rowwise",
        # SDXL extensions
        transformer_depth=tuple(tl) if isinstance(
            (tl := cfg.get("transformer_layers_per_block", 1)),
            (list, tuple)) else tl,
        addition_embed_type=cfg.get("addition_embed_type") or "",
        addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256)
        or 256,
        addition_proj_dim=cfg.get(
            "projection_class_embeddings_input_dim", 2816) or 2816,
    )
    kw.update(overrides)
    return UNetConfig(**kw)


def vae_config_from_json(cfg: dict):
    from .vae import VAEConfig
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215))


def _component(path, sub):
    import os
    p = os.path.join(path, sub)
    return p if os.path.isdir(p) else None


def load_unet_dir(path: str, **config_overrides):
    """`<path>` holds config.json + diffusion_pytorch_model weights.
    Returns (UNetConfig, params, raw_config_dict)."""
    import os
    from ..loader import load_dir_state_dict, read_json_config
    from ..convert import convert_with_rules
    raw = read_json_config(os.path.join(path, "config.json"))
    cfg = unet_config_from_json(raw, **config_overrides)
    sd = load_dir_state_dict(path)
    params = convert_with_rules(sd, unet_rules(), strict=False)
    return cfg, params, raw


def load_vae_dir(path: str):
    import os
    from ..loader import load_dir_state_dict, read_json_config
    from ..convert import convert_with_rules
    raw = read_json_config(os.path.join(path, "config.json"))
    cfg = vae_config_from_json(raw)
    sd = load_dir_state_dict(path)
    params = convert_with_rules(sd, vae_rules(), strict=False)
    return cfg, params, raw


def encode_empty_prompt(text_encoder_dir: str):
    """Run the checkpoint's CLIPTextModel on the empty prompt "" and
    return the hidden states [T, D] (the reference pipelines'
    `_encode_prompt(prompt="")` path, e.g.
    `Zero123Plus/pipeline.py:335,377`). The empty prompt needs no
    vocab: it tokenizes to [BOS, EOS] + padding (SD2-class tokenizers
    pad with "!"=0, SD1.x with EOS)."""
    import numpy as _np
    from ..clip import CLIPTextEncoder, empty_prompt_ids
    cfg, params, raw = load_clip_text_dir(text_encoder_dir)
    pad = 0 if cfg.act == "gelu" else 49407
    ids = empty_prompt_ids(cfg.max_positions, pad_token_id=pad)
    h, _ = CLIPTextEncoder(cfg).apply({"params": params}, ids)
    return _np.asarray(h[0])


def load_clip_vision_dir(path: str):
    """CLIPVisionModel(+WithProjection) directory → conditioner parts."""
    import os
    from ..loader import load_dir_state_dict, read_json_config
    from ..clip import CLIPVisionConfig, convert_clip
    raw = read_json_config(os.path.join(path, "config.json"))
    vc = raw.get("vision_config", raw)
    cfg = CLIPVisionConfig(
        hidden=vc.get("hidden_size", 1024),
        layers=vc.get("num_hidden_layers", 24),
        heads=vc.get("num_attention_heads", 16),
        mlp_dim=vc.get("intermediate_size", 4096),
        image_size=vc.get("image_size", 224),
        patch=vc.get("patch_size", 14),
        projection_dim=raw.get("projection_dim", 768),
        act=vc.get("hidden_act", "quick_gelu"))
    sd = load_dir_state_dict(path)
    params = convert_clip(sd)
    return cfg, params, raw


def load_clip_text_dir(path: str):
    import os
    from ..loader import load_dir_state_dict, read_json_config
    from ..clip import CLIPTextConfig, convert_clip
    raw = read_json_config(os.path.join(path, "config.json"))
    cfg = CLIPTextConfig(
        vocab_size=raw.get("vocab_size", 49408),
        hidden=raw.get("hidden_size", 768),
        layers=raw.get("num_hidden_layers", 12),
        heads=raw.get("num_attention_heads", 12),
        mlp_dim=raw.get("intermediate_size", 3072),
        max_positions=raw.get("max_position_embeddings", 77),
        eos_token_id=raw.get("eos_token_id", 49407),
        act=raw.get("hidden_act", "quick_gelu"))
    sd = load_dir_state_dict(path)
    params = convert_clip(sd)
    return cfg, params, raw
