"""Hunyuan3D-V1 SVRM checkpoint → flax converter.

Maps `tencent/Hunyuan3D-1` `svrm/svrm.safetensors` (the state dict of
`svrm/ldm/models/svrm.py` `SVRMModel`) onto `SVRMPipeline` params.
Torch key prefixes and their module sources:

* ``img_encoder.model.*`` — official-layout DINOv2 ViT-B/14 with
  AdaNorm camera modulation (encoders/dinov2/models/
  vision_transformer.py; blocks per layers/block.py `BlockMod`).
* ``img_to_triplane_decoder.*`` — `ImgToTriplaneModel`
  (translator/img_to_triplane.py; inner transformer attr is also named
  `img_to_triplane_decoder`, hence the doubled segment).
* ``render.decoder.net.*`` — the OSGDecoder MLP
  (rendering_neus/synthesizer.py:40-48).
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..convert import DROP, convert_with_rules, t_conv, t_linear, \
    to_numpy


def svrm_rules():
    def rules(key: str, val: np.ndarray):
        # ---------------- image encoder ----------------
        if key.startswith("img_encoder.model."):
            k = key[len("img_encoder.model."):]
            simple = {
                "cls_token": "img_encoder/cls_token",
                "pos_embed": "img_encoder/pos_embed",
                "patch_embed.proj.weight":
                    "img_encoder/patch_embed/kernel",
                "patch_embed.proj.bias": "img_encoder/patch_embed/bias",
                "cam_embed.0.weight": "img_encoder/cam_1/kernel",
                "cam_embed.0.bias": "img_encoder/cam_1/bias",
                "cam_embed.2.weight": "img_encoder/cam_2/kernel",
                "cam_embed.2.bias": "img_encoder/cam_2/bias",
                "norm.adaLN_modulation.1.weight":
                    "img_encoder/norm/mod/kernel",
                "norm.adaLN_modulation.1.bias":
                    "img_encoder/norm/mod/bias",
            }
            if k in simple:
                v = to_numpy(val)
                if k.endswith(".weight") and v.ndim == 4:
                    v = t_conv(v)
                elif k.endswith(".weight") and v.ndim == 2:
                    v = t_linear(v)
                return simple[k], v
            if k == "mask_token":
                return DROP
            m = re.match(r"blocks\.(\d+)\.(.*)", k)
            if m:
                i, rest = m.groups()
                base = f"img_encoder/block_{i}/"
                sub = {
                    "norm1.adaLN_modulation.1.weight":
                        ("norm1/mod/kernel", t_linear),
                    "norm1.adaLN_modulation.1.bias":
                        ("norm1/mod/bias", None),
                    "norm2.adaLN_modulation.1.weight":
                        ("norm2/mod/kernel", t_linear),
                    "norm2.adaLN_modulation.1.bias":
                        ("norm2/mod/bias", None),
                    "attn.qkv.weight": ("qkv/kernel", t_linear),
                    "attn.qkv.bias": ("qkv/bias", None),
                    "attn.proj.weight": ("proj/kernel", t_linear),
                    "attn.proj.bias": ("proj/bias", None),
                    "ls1.gamma": ("ls1_gamma", None),
                    "ls2.gamma": ("ls2_gamma", None),
                    "mlp.fc1.weight": ("fc1/kernel", t_linear),
                    "mlp.fc1.bias": ("fc1/bias", None),
                    "mlp.fc2.weight": ("fc2/kernel", t_linear),
                    "mlp.fc2.bias": ("fc2/bias", None),
                }
                if rest in sub:
                    path, fn = sub[rest]
                    v = to_numpy(val)
                    return base + path, (fn(v) if fn else v)
            return None

        # ---------------- triplane decoder ----------------
        if key == "img_to_triplane_decoder.pos_emb":
            return "pos_emb", to_numpy(val)
        if key.startswith("img_to_triplane_decoder.upsampler."):
            kind = key.rsplit(".", 1)[1]
            v = to_numpy(val)
            return (f"upsampler/{'kernel' if kind == 'weight' else 'bias'}",
                    t_linear(v) if kind == "weight" else v)
        m = re.match(r"img_to_triplane_decoder\.img_to_triplane_decoder"
                     r"\.norm\.(weight|bias)", key)
        if m:
            kind = m.group(1)
            return (f"final_norm/{'scale' if kind == 'weight' else 'bias'}",
                    to_numpy(val))
        m = re.match(r"img_to_triplane_decoder\.img_to_triplane_decoder"
                     r"\.transformer_blocks\.(\d+)\.(.*)", key)
        if m:
            i, rest = m.groups()
            base = f"block_{i}/"
            sub = {
                "norm1.weight": ("norm1/scale", None),
                "norm1.bias": ("norm1/bias", None),
                "norm2.weight": ("norm2/scale", None),
                "norm2.bias": ("norm2/bias", None),
                "norm3.weight": ("norm3/scale", None),
                "norm3.bias": ("norm3/bias", None),
                "attn1.to_q.weight": ("attn1/to_q/kernel", t_linear),
                "attn1.to_k.weight": ("attn1/to_k/kernel", t_linear),
                "attn1.to_v.weight": ("attn1/to_v/kernel", t_linear),
                "attn1.to_out.0.weight": ("attn1/to_out_0/kernel",
                                          t_linear),
                "attn1.to_out.0.bias": ("attn1/to_out_0/bias", None),
                "attn2.to_q.weight": ("attn2/to_q/kernel", t_linear),
                "attn2.to_k.weight": ("attn2/to_k/kernel", t_linear),
                "attn2.to_v.weight": ("attn2/to_v/kernel", t_linear),
                "attn2.to_out.0.weight": ("attn2/to_out_0/kernel",
                                          t_linear),
                "attn2.to_out.0.bias": ("attn2/to_out_0/bias", None),
                "ff.net.0.proj.weight": ("ff_net_0/proj/kernel",
                                         t_linear),
                "ff.net.0.proj.bias": ("ff_net_0/proj/bias", None),
                "ff.net.2.weight": ("ff_net_2/kernel", t_linear),
                "ff.net.2.bias": ("ff_net_2/bias", None),
            }
            if rest in sub:
                path, fn = sub[rest]
                v = to_numpy(val)
                return base + path, (fn(v) if fn else v)
            return None

        # ---------------- render / OSG decoder ----------------
        m = re.match(r"render\.decoder\.net\.(\d+)\.(weight|bias)", key)
        if m:
            j, kind = m.groups()
            name = {"0": "net_0", "2": "net_2"}.get(j)
            if name is None:
                return None
            v = to_numpy(val)
            return (f"{name}/{'kernel' if kind == 'weight' else 'bias'}",
                    t_linear(v) if kind == "weight" else v)
        return None

    return rules


def convert_svrm_state_dict(sd):
    return convert_with_rules(sd, svrm_rules(), strict=False)


def load_svrm_checkpoint(ckpt_path: str):
    """`svrm/svrm.safetensors` → SVRMPipeline (reference
    `MV23DPredictor`, svrm/predictor.py, loaded at nodes.py:3907-3913).
    """
    from ..convert import load_state_dict
    from ..loader import on_cpu, validate_tree
    from .pipeline import SVRMConfig, SVRMModel, SVRMPipeline

    sd = load_state_dict(ckpt_path)
    params = convert_svrm_state_dict(sd)

    enc = params["img_encoder"]
    hidden = enc["patch_embed"]["kernel"].shape[-1]
    inner = params["block_0"]["attn1"]["to_q"]["kernel"].shape[1]
    cfg = SVRMConfig(
        heads=max(1, inner // 64),
        head_dim=min(64, inner),
        vit_hidden=hidden,
        vit_layers=sum(1 for k in enc if k.startswith("block_")),
        vit_heads=max(1, hidden // 64),
        context_dim=hidden,
        cam_cond_dim=enc["cam_1"]["kernel"].shape[0],
        pos_emb_dim=params["pos_emb"].shape[-1],
        pos_emb_size=int(round((params["pos_emb"].shape[1] // 3)
                               ** 0.5)),
        depth=sum(1 for k in params if k.startswith("block_")),
        triplane_dim=params["net_0"]["kernel"].shape[0] // 3,
        mlp_hidden=params["net_0"]["kernel"].shape[1],
        upsample_ratio=int(round((params["upsampler"]["kernel"]
                                  .shape[1]
                                  // (params["net_0"]["kernel"]
                                      .shape[0] // 3)) ** 0.5)),
        pretrain_image_size=int(round(
            (enc["pos_embed"].shape[1] - 1) ** 0.5)) * 14)

    with on_cpu():
        pipe = SVRMPipeline.init_random(cfg=cfg)
    validate_tree(params, pipe.params, name="svrm")
    pipe.params = params
    return pipe
