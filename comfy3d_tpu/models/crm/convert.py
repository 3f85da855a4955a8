"""CRM torch checkpoint → flax param rules.

Maps the public `CRM.pth` state dict
(`ConvolutionalReconstructionModel.state_dict()`,
`/root/reference/Gen_3D_Modules/CRM/model/crm/model.py:23-68`:
`unet2.unet.*` diffusers UNet2DModel + `unet2.learned_plane` +
`sdfMlp/rgbMlp/weightMlp`) onto `models.crm`'s flax paths. Non-parameter
renderer/scheduler buffers are dropped explicitly. Both the modern
(`to_q`) and deprecated (`query`) diffusers attention spellings are
accepted, since `CRM.pth` predates the rename cutover in some release
channels.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .. import convert as C

_RESNET = {
    "norm1.weight": ("norm1/scale", None),
    "norm1.bias": ("norm1/bias", None),
    "conv1.weight": ("conv1/kernel", C.t_conv),
    "conv1.bias": ("conv1/bias", None),
    "time_emb_proj.weight": ("time_emb_proj/kernel", C.t_linear),
    "time_emb_proj.bias": ("time_emb_proj/bias", None),
    "norm2.weight": ("norm2/scale", None),
    "norm2.bias": ("norm2/bias", None),
    "conv2.weight": ("conv2/kernel", C.t_conv),
    "conv2.bias": ("conv2/bias", None),
    "conv_shortcut.weight": ("conv_shortcut/kernel", C.t_conv),
    "conv_shortcut.bias": ("conv_shortcut/bias", None),
}

_ATTN = {
    "group_norm.weight": ("group_norm/scale", None),
    "group_norm.bias": ("group_norm/bias", None),
    "to_q.weight": ("to_q/kernel", C.t_linear),
    "to_q.bias": ("to_q/bias", None),
    "to_k.weight": ("to_k/kernel", C.t_linear),
    "to_k.bias": ("to_k/bias", None),
    "to_v.weight": ("to_v/kernel", C.t_linear),
    "to_v.bias": ("to_v/bias", None),
    "to_out.0.weight": ("to_out_0/kernel", C.t_linear),
    "to_out.0.bias": ("to_out_0/bias", None),
    # deprecated AttentionBlock spellings
    "query.weight": ("to_q/kernel", C.t_linear),
    "query.bias": ("to_q/bias", None),
    "key.weight": ("to_k/kernel", C.t_linear),
    "key.bias": ("to_k/bias", None),
    "value.weight": ("to_v/kernel", C.t_linear),
    "value.bias": ("to_v/bias", None),
    "proj_attn.weight": ("to_out_0/kernel", C.t_linear),
    "proj_attn.bias": ("to_out_0/bias", None),
}


def _apply(table, rest, base, val):
    hit = table.get(rest)
    if hit is None:
        return None
    path, fn = hit
    v = val
    if fn is C.t_linear and v.ndim == 4:     # deprecated 1x1-conv attn
        v = v[:, :, 0, 0]
    return f"{base}/{path}", (fn(v) if fn else v)


def unet2d_rules(prefix: str = "") -> Callable:
    """diffusers UNet2DModel state dict → models.crm.unet2d paths."""

    simple = {
        "conv_in.weight": ("conv_in/kernel", C.t_conv),
        "conv_in.bias": ("conv_in/bias", None),
        "conv_norm_out.weight": ("conv_norm_out/scale", None),
        "conv_norm_out.bias": ("conv_norm_out/bias", None),
        "conv_out.weight": ("conv_out/kernel", C.t_conv),
        "conv_out.bias": ("conv_out/bias", None),
        "time_embedding.linear_1.weight": ("time_1/kernel", C.t_linear),
        "time_embedding.linear_1.bias": ("time_1/bias", None),
        "time_embedding.linear_2.weight": ("time_2/kernel", C.t_linear),
        "time_embedding.linear_2.bias": ("time_2/bias", None),
    }

    def rules(key: str, val: np.ndarray):
        if prefix:
            if not key.startswith(prefix):
                return None
            key = key[len(prefix):]
        if key in simple:
            path, fn = simple[key]
            return path, (fn(val) if fn else val)
        for stage in ("down", "up"):
            pre = f"{stage}_blocks."
            if not key.startswith(pre):
                continue
            i, rest = key[len(pre):].split(".", 1)
            if rest.startswith("resnets."):
                j, leaf = rest[len("resnets."):].split(".", 1)
                return _apply(_RESNET, leaf, f"{stage}_{i}_res_{j}", val)
            if rest.startswith("attentions."):
                j, leaf = rest[len("attentions."):].split(".", 1)
                return _apply(_ATTN, leaf, f"{stage}_{i}_attn_{j}", val)
            if rest == "downsamplers.0.conv.weight":
                return f"down_{i}_down/kernel", C.t_conv(val)
            if rest == "downsamplers.0.conv.bias":
                return f"down_{i}_down/bias", val
            if rest == "upsamplers.0.conv.weight":
                return f"up_{i}_up/kernel", C.t_conv(val)
            if rest == "upsamplers.0.conv.bias":
                return f"up_{i}_up/bias", val
        if key.startswith("mid_block.resnets."):
            j, leaf = key[len("mid_block.resnets."):].split(".", 1)
            return _apply(_RESNET, leaf, f"mid_res_{j}", val)
        if key.startswith("mid_block.attentions.0."):
            leaf = key[len("mid_block.attentions.0."):]
            return _apply(_ATTN, leaf, "mid_attn", val)
        return None

    return rules


_MLPS = {
    "sdfMlp.fc1": "sdf_0", "sdfMlp.fc2": "sdf_1", "sdfMlp.fc3": "sdf_2",
    "rgbMlp.fc1": "rgb_0", "rgbMlp.fc2": "rgb_1", "rgbMlp.fc3": "rgb_2",
    "weightMlp.0": "weight_0", "weightMlp.2": "weight_1",
}


def crm_rules() -> Callable:
    unet = unet2d_rules(prefix="unet2.unet.")

    def rules(key: str, val: np.ndarray):
        if key.startswith(("renderer.", "scheduler.", "decoder.")):
            return C.DROP                         # buffers, no params
        if key == "unet2.learned_plane":
            # [1, C-12, P, 3P] -> [P, 3P, C-12]
            return "learned_plane", np.transpose(val[0], (1, 2, 0))
        hit = unet(key, val)
        if hit is not None:
            return ("unet2/" + hit[0], hit[1])
        base, leaf = key.rsplit(".", 1)
        mlp = _MLPS.get(base)
        if mlp:
            if leaf == "weight":
                return f"{mlp}/kernel", C.t_linear(val)
            return f"{mlp}/bias", val
        return None

    return rules


def convert_crm(state_dict) -> dict:
    return C.convert_with_rules(state_dict, crm_rules(), strict=True)
