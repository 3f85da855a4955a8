"""LGM torch checkpoint → flax param rules.

Maps `LargeMultiviewGaussianModel.state_dict()` keys
(`Gen_3D_Modules/LGM/large_multiview_gaussian_model.py:13-36`: `unet.*`
asymmetric UNet per `LGM/core/unet.py` + trailing `conv.*` 1×1) onto
`models.lgm.model.LGMUNet`'s flax paths. Parity is asserted per layer in
tests/test_parity_lgm.py against the reference torch UNet.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .. import convert as C


def _resnet(sub: str):
    m = {
        "norm1.weight": ("norm1/scale", None),
        "norm1.bias": ("norm1/bias", None),
        "conv1.weight": ("conv1/kernel", C.t_conv),
        "conv1.bias": ("conv1/bias", None),
        "norm2.weight": ("norm2/scale", None),
        "norm2.bias": ("norm2/bias", None),
        "conv2.weight": ("conv2/kernel", C.t_conv),
        "conv2.bias": ("conv2/bias", None),
        "shortcut.weight": ("shortcut/kernel", C.t_conv),
        "shortcut.bias": ("shortcut/bias", None),
    }
    return m.get(sub)


def _attn(sub: str):
    m = {
        "norm.weight": ("norm/scale", None),
        "norm.bias": ("norm/bias", None),
        "attn.qkv.weight": ("qkv/kernel", C.t_linear),
        "attn.qkv.bias": ("qkv/bias", None),
        "attn.proj.weight": ("proj/kernel", C.t_linear),
        "attn.proj.bias": ("proj/bias", None),
    }
    return m.get(sub)


def lgm_rules() -> Callable:
    """Rules for the full LGM state dict (`unet.*` + `conv.*`)."""

    def rules(key: str, val: np.ndarray):
        if key == "conv.weight":
            return "conv_final/kernel", C.t_conv(val)
        if key == "conv.bias":
            return "conv_final/bias", val
        if not key.startswith("unet."):
            return None
        key = key[5:]

        simple = {
            "conv_in.weight": ("conv_in/kernel", C.t_conv),
            "conv_in.bias": ("conv_in/bias", None),
            "norm_out.weight": ("norm_out/scale", None),
            "norm_out.bias": ("norm_out/bias", None),
            "conv_out.weight": ("conv_out/kernel", C.t_conv),
            "conv_out.bias": ("conv_out/bias", None),
        }
        if key in simple:
            path, fn = simple[key]
            return path, (fn(val) if fn else val)

        for stage in ("down", "up"):
            pre = f"{stage}_blocks."
            if not key.startswith(pre):
                continue
            rest = key[len(pre):]
            idx, sub = rest.split(".", 1)
            if sub.startswith("nets."):
                li, leaf = sub[5:].split(".", 1)
                hit = _resnet(leaf)
                if hit:
                    path, fn = hit
                    return (f"{stage}_{idx}_res_{li}/" + path,
                            fn(val) if fn else val)
            if sub.startswith("attns."):
                li, leaf = sub[6:].split(".", 1)
                hit = _attn(leaf)
                if hit:
                    path, fn = hit
                    return (f"{stage}_{idx}_attn_{li}/" + path,
                            fn(val) if fn else val)
            if sub == "downsample.weight":
                return f"down_{idx}_downsample/kernel", C.t_conv(val)
            if sub == "downsample.bias":
                return f"down_{idx}_downsample/bias", val
            if sub == "upsample.weight":
                return f"up_{idx}_upsample/kernel", C.t_conv(val)
            if sub == "upsample.bias":
                return f"up_{idx}_upsample/bias", val

        if key.startswith("mid_block."):
            sub = key[len("mid_block."):]
            if sub.startswith("nets."):
                li, leaf = sub[5:].split(".", 1)
                hit = _resnet(leaf)
                if hit:
                    path, fn = hit
                    return f"mid_res_{li}/" + path, fn(val) if fn else val
            if sub.startswith("attns.0."):
                hit = _attn(sub[len("attns.0."):])
                if hit:
                    path, fn = hit
                    return "mid_attn/" + path, fn(val) if fn else val
        return None

    return rules


def convert_lgm(state_dict) -> dict:
    return C.convert_with_rules(state_dict, lgm_rules(), strict=True)
