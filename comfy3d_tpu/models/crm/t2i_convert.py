"""T2IAdapterV2 torch checkpoint → flax params.

The reference loads the adapter with diffusers'
`T2IAdapterV2.from_pretrained(dir)` (`CRM_T2I_V2/model/
t2i_adapter_v2.py:265`; loader use at reference nodes.py:3547/3693):
a directory holding `config.json` + `diffusion_pytorch_model.
{safetensors,bin}` whose state dict is the `FullAdapterV2` layout —
`adapter.conv2d_img_encoder.{conv_in,blocks.N,conv_out}` and
`adapter.body.B.{in_conv,resnets.R.block{1,2}}`.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from ..convert import load_state_dict, set_path, t_conv, to_numpy


def adapter_rules(key: str, val: np.ndarray):
    """torch key → (flax path, array) or None."""
    pre = "adapter."
    if not key.startswith(pre):
        return None
    key = key[len(pre):]

    def conv(base, leaf):
        if leaf == "weight":
            return base + "/kernel", t_conv(val)
        return base + "/bias", val

    m = re.match(r"conv2d_img_encoder\.conv_(in|out)\.(weight|bias)$",
                 key)
    if m:
        return conv(f"enc_conv_{m.group(1)}", m.group(2))
    m = re.match(r"conv2d_img_encoder\.blocks\.(\d+)\.(weight|bias)$",
                 key)
    if m:
        i = int(m.group(1))
        name = (f"enc_mid_{i // 2}" if i % 2 == 0
                else f"enc_down_{i // 2}")
        return conv(name, m.group(2))
    m = re.match(r"body\.(\d+)\.in_conv\.(weight|bias)$", key)
    if m:
        return conv(f"in_conv_{m.group(1)}", m.group(2))
    m = re.match(r"body\.(\d+)\.resnets\.(\d+)\.(block[12])"
                 r"\.(weight|bias)$", key)
    if m:
        b, r, blk, leaf = m.groups()
        return conv(f"res_{b}_{r}/{blk}", leaf)
    return None


def convert_t2i_adapter(state_dict) -> dict:
    tree = {}
    unused = []
    for key, val in state_dict.items():
        out = adapter_rules(key, to_numpy(val))
        if out is None:
            unused.append(key)
            continue
        path, arr = out
        set_path(tree, path, arr)
    if unused:
        print(f"[crm.t2i_convert] {len(unused)} unconverted keys, "
              f"e.g. {unused[:4]}")
    return tree


def config_from_dir(path: str):
    """Adapter directory → T2IAdapterConfig (reads diffusers
    config.json when present)."""
    from .t2i_adapter import T2IAdapterConfig
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        raw = json.load(open(cfg_path))
        return T2IAdapterConfig(
            in_channels=int(raw.get("in_channels", 3)),
            channels=tuple(raw.get("channels", (320, 640, 1280, 1280))),
            num_res_blocks=int(raw.get("num_res_blocks", 2)),
            cond_channels=tuple(raw.get(
                "conditioning_embedding_out_channels",
                (16, 32, 64, 128, 256))))
    return T2IAdapterConfig()


def load_adapter_dir(path: str):
    """Directory → (T2IAdapterConfig, params) or None if no weights."""
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin"):
        wpath = os.path.join(path, name)
        if os.path.exists(wpath):
            sd = load_state_dict(wpath)
            return config_from_dir(path), convert_t2i_adapter(sd)
    return None
