"""InstantMesh torch checkpoint → flax param rules.

Maps `InstantMesh.state_dict()` (`Gen_3D_Modules/InstantMesh/models/
lrm_mesh.py:30-75`: `encoder.*` adaLN DINO wrapper, `transformer.*`
triplane transformer, `synthesizer.decoder.*` OSG heads) onto
`models.instantmesh.model`'s flax paths. torch MultiheadAttention packs
self-attention qkv into `in_proj_weight` and splits cross-attention into
`q/k/v_proj_weight` (kdim ≠ embed_dim) — both unpacked here. Parity is
asserted in tests/test_parity_instantmesh.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np

from .. import convert as C

_HEAD_PREFIX = {"net_sdf": "sdf", "net_rgb": "rgb",
                "net_deformation": "deform", "net_weight": "weight"}


def _vit_adaln_rules(key: str, val: np.ndarray):
    """`encoder.model.*` — HF-ViT fork keys (encoder/dino.py) + per-layer
    `adaLN_modulation.1` heads; `encoder.camera_embedder.{0,2}`."""
    ce = "encoder.camera_embedder."
    if key.startswith(ce):
        idx, leaf = key[len(ce):].split(".", 1)
        name = {"0": "cam_embed_0", "2": "cam_embed_1"}[idx]
        if leaf == "weight":
            return f"encoder/{name}/kernel", C.t_linear(val)
        return f"encoder/{name}/bias", val
    pre = "encoder.model."
    if not key.startswith(pre):
        return None
    key = key[len(pre):]
    if ".adaLN_modulation.1." in key:
        idx = key.split(".")[2]
        leaf = key.rsplit(".", 1)[-1]
        if leaf == "weight":
            return f"encoder/block_{idx}/adaln/kernel", C.t_linear(val)
        return f"encoder/block_{idx}/adaln/bias", val
    out = C.vit_rules()(key, val)
    if out is None:
        return None
    return "encoder/" + out[0], out[1]


def _transformer_rules(key: str, val: np.ndarray):
    pre = "transformer."
    if not key.startswith(pre):
        return None
    key = key[len(pre):]
    if key == "pos_embed":
        return "transformer/pos_embed", val
    simple = {
        "norm.weight": ("transformer/norm/scale", None),
        "norm.bias": ("transformer/norm/bias", None),
        "deconv.weight": ("transformer/deconv/kernel", C.t_conv_transpose),
        "deconv.bias": ("transformer/deconv/bias", None),
    }
    if key in simple:
        path, fn = simple[key]
        return path, (fn(val) if fn else val)
    if not key.startswith("layers."):
        return None
    idx, sub = key[len("layers."):].split(".", 1)
    base = f"transformer/layer_{idx}/"
    norms = {
        "norm1.weight": "norm1/scale", "norm1.bias": "norm1/bias",
        "norm2.weight": "norm2/scale", "norm2.bias": "norm2/bias",
        "norm3.weight": "norm3/scale", "norm3.bias": "norm3/bias",
    }
    if sub in norms:
        return base + norms[sub], val
    mlp = {
        "mlp.0.weight": ("mlp_in/kernel", C.t_linear),
        "mlp.0.bias": ("mlp_in/bias", None),
        "mlp.3.weight": ("mlp_out/kernel", C.t_linear),
        "mlp.3.bias": ("mlp_out/bias", None),
    }
    if sub in mlp:
        path, fn = mlp[sub]
        return base + path, (fn(val) if fn else val)
    # cross-attn: separate q/k/v projections (kdim = cond_dim)
    attn_map = {
        "cross_attn.q_proj_weight": "cross_attn/to_q/kernel",
        "cross_attn.k_proj_weight": "cross_attn/to_k/kernel",
        "cross_attn.v_proj_weight": "cross_attn/to_v/kernel",
        "cross_attn.out_proj.weight": "cross_attn/to_out_0/kernel",
        "self_attn.out_proj.weight": "self_attn/to_out_0/kernel",
    }
    if sub in attn_map:
        return base + attn_map[sub], C.t_linear(val)
    return None


def convert_instantmesh(state_dict: Mapping[str, np.ndarray],
                        hidden: int = 64, layers: int = 4) -> Dict:
    """Full InstantMesh state dict → flax tree (encoder + transformer +
    decoder). Self-attention `in_proj_weight` is unpacked to q/k/v."""
    tree: Dict = {}
    for key, val in state_dict.items():
        val = C.to_numpy(val)
        out = _vit_adaln_rules(key, val) or _transformer_rules(key, val)
        if out is not None:
            C.set_path(tree, out[0], out[1])
            continue
        if ".self_attn.in_proj_weight" in key:
            idx = key.split(".")[2]
            qw, kw, vw = np.split(val, 3, axis=0)
            base = f"transformer/layer_{idx}/self_attn/"
            C.set_path(tree, base + "to_q/kernel", C.t_linear(qw))
            C.set_path(tree, base + "to_k/kernel", C.t_linear(kw))
            C.set_path(tree, base + "to_v/kernel", C.t_linear(vw))
            continue
        if key.startswith("synthesizer.decoder."):
            rest = key[len("synthesizer.decoder."):]
            net, idx, leaf = rest.split(".")
            prefix = _HEAD_PREFIX[net]
            li = int(idx) // 2
            n_linears = layers
            name = (f"{prefix}_out" if li == n_linears - 1
                    else f"{prefix}_{li}")
            if leaf == "weight":
                C.set_path(tree, f"decoder/{name}/kernel", C.t_linear(val))
            else:
                C.set_path(tree, f"decoder/{name}/bias", val)
    return tree
