"""TRELLIS torch checkpoints → flax param rules.

Covers the sparse-structure flow DiT + conv decoder, the SLAT flow UNet
and the SLAT decoders. Dense-part rules are parity-tested against the
reference torch modules (tests/test_parity_trellis.py); sparse-conv
weight layout follows spconv 2.x ([O, kd, kh, kw, I]) and is flagged for
validation against real checkpoints.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .. import convert as C


def t_conv3d(w: np.ndarray) -> np.ndarray:
    """torch Conv3d [O, I, kd, kh, kw] → flax [kd, kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def t_spconv(w: np.ndarray) -> np.ndarray:
    """spconv 2.x SubMConv3d [O, kd, kh, kw, I] → [kd, kh, kw, I, O]."""
    return np.ascontiguousarray(np.transpose(w, (1, 2, 3, 4, 0)))


def _attn_leaf(sub: str, base: str, val):
    m = {
        "to_qkv.weight": ("to_qkv/kernel", C.t_linear),
        "to_qkv.bias": ("to_qkv/bias", None),
        "to_q.weight": ("to_q/kernel", C.t_linear),
        "to_q.bias": ("to_q/bias", None),
        "to_kv.weight": ("to_kv/kernel", C.t_linear),
        "to_kv.bias": ("to_kv/bias", None),
        "to_out.weight": ("to_out/kernel", C.t_linear),
        "to_out.bias": ("to_out/bias", None),
        "q_rms_norm.gamma": ("q_rms_norm/gamma", None),
        "k_rms_norm.gamma": ("k_rms_norm/gamma", None),
    }
    if sub in m:
        path, fn = m[sub]
        return base + path, (fn(val) if fn else val)
    return None


def _xblock_leaf(sub: str, base: str, val):
    """ModulatedTransformerCrossBlock leaves."""
    if sub.startswith("adaLN_modulation.1."):
        leaf = "kernel" if sub.endswith("weight") else "bias"
        v = C.t_linear(val) if leaf == "kernel" else val
        return base + f"adaLN_modulation_1/{leaf}", v
    if sub.startswith("norm2."):
        leaf = "scale" if sub.endswith("weight") else "bias"
        return base + f"norm2/{leaf}", val
    for attn in ("self_attn", "cross_attn", "attn"):
        if sub.startswith(attn + "."):
            return _attn_leaf(sub[len(attn) + 1:], base + attn + "/", val)
    if sub.startswith("mlp.mlp."):
        idx, leaf = sub[len("mlp.mlp."):].split(".")
        leaf2 = "kernel" if leaf == "weight" else "bias"
        v = C.t_linear(val) if leaf == "weight" else val
        return base + f"mlp/mlp_{idx}/{leaf2}", v
    return None


def ss_flow_rules() -> Callable:
    def rules(key: str, val: np.ndarray):
        if key == "pos_emb":
            return None                     # recomputed analytically
        for lin in ("input_layer", "out_layer"):
            if key.startswith(lin + "."):
                leaf, v = (("kernel", C.t_linear(val))
                           if key.endswith("weight") else ("bias", val))
                return f"{lin}/{leaf}", v
        if key.startswith("t_embedder.mlp."):
            idx, leaf = key[len("t_embedder.mlp."):].split(".")
            leaf2 = "kernel" if leaf == "weight" else "bias"
            v = C.t_linear(val) if leaf == "weight" else val
            return f"t_embedder/mlp_{idx}/{leaf2}", v
        if key.startswith("adaLN_modulation.1."):    # share_mod
            leaf = "kernel" if key.endswith("weight") else "bias"
            v = C.t_linear(val) if leaf == "kernel" else val
            return f"adaLN_modulation_1/{leaf}", v
        if key.startswith("blocks."):
            idx, sub = key[len("blocks."):].split(".", 1)
            return _xblock_leaf(sub, f"blocks_{idx}/", val)
        return None

    return rules


def _resblock3d_leaf(sub: str, base: str, val):
    m = {
        "norm1.weight": ("norm1_scale", None),
        "norm1.bias": ("norm1_bias", None),
        "norm2.weight": ("norm2_scale", None),
        "norm2.bias": ("norm2_bias", None),
        "conv1.weight": ("conv1/kernel", t_conv3d),
        "conv1.bias": ("conv1/bias", None),
        "conv2.weight": ("conv2/kernel", t_conv3d),
        "conv2.bias": ("conv2/bias", None),
        "skip_connection.weight": ("skip_connection/kernel", t_conv3d),
        "skip_connection.bias": ("skip_connection/bias", None),
    }
    if sub in m:
        path, fn = m[sub]
        return base + path, (fn(val) if fn else val)
    return None


def ss_decoder_rules() -> Callable:
    def rules(key: str, val: np.ndarray):
        if key.startswith("input_layer."):
            leaf = "kernel" if key.endswith("weight") else "bias"
            v = t_conv3d(val) if leaf == "kernel" else val
            return f"input_layer/{leaf}", v
        if key.startswith("middle_block."):
            idx, sub = key[len("middle_block."):].split(".", 1)
            return _resblock3d_leaf(sub, f"middle_block_{idx}/", val)
        if key.startswith("blocks."):
            idx, sub = key[len("blocks."):].split(".", 1)
            if sub.startswith("conv."):      # UpsampleBlock3d
                leaf = "kernel" if sub.endswith("weight") else "bias"
                v = t_conv3d(val) if leaf == "kernel" else val
                return f"blocks_{idx}/{leaf}", v
            return _resblock3d_leaf(sub, f"blocks_{idx}/", val)
        if key == "out_layer.0.weight":
            return "out_norm_scale", val
        if key == "out_layer.0.bias":
            return "out_norm_bias", val
        if key == "out_layer.2.weight":
            return "out_layer/kernel", t_conv3d(val)
        if key == "out_layer.2.bias":
            return "out_layer/bias", val
        return None

    return rules


def _sparse_resblock_leaf(sub: str, base: str, val):
    m = {
        "norm1.weight": ("norm1_scale", None),
        "norm1.bias": ("norm1_bias", None),
        "conv1.weight": ("conv1/kernel", t_spconv),
        "conv1.bias": ("conv1/bias", None),
        "conv2.weight": ("conv2/kernel", t_spconv),
        "conv2.bias": ("conv2/bias", None),
        "emb_layers.1.weight": ("emb_layers_1/kernel", C.t_linear),
        "emb_layers.1.bias": ("emb_layers_1/bias", None),
        "skip_connection.weight": ("skip_connection/kernel", C.t_linear),
        "skip_connection.bias": ("skip_connection/bias", None),
    }
    if sub in m:
        path, fn = m[sub]
        return base + path, (fn(val) if fn else val)
    return None


def slat_flow_rules() -> Callable:
    def rules(key: str, val: np.ndarray):
        for lin in ("input_layer", "out_layer"):
            if key.startswith(lin + "."):
                leaf, v = (("kernel", C.t_linear(val))
                           if key.endswith("weight") else ("bias", val))
                return f"{lin}/{leaf}", v
        if key.startswith("t_embedder.mlp."):
            idx, leaf = key[len("t_embedder.mlp."):].split(".")
            leaf2 = "kernel" if leaf == "weight" else "bias"
            v = C.t_linear(val) if leaf == "weight" else val
            return f"t_embedder/mlp_{idx}/{leaf2}", v
        for stage in ("input_blocks", "out_blocks"):
            if key.startswith(stage + "."):
                idx, sub = key[len(stage) + 1:].split(".", 1)
                return _sparse_resblock_leaf(sub, f"{stage}_{idx}/", val)
        if key.startswith("blocks."):
            idx, sub = key[len("blocks."):].split(".", 1)
            return _xblock_leaf(sub, f"blocks_{idx}/", val)
        return None

    return rules


def convert_ss_flow(sd):
    return C.convert_with_rules(sd, ss_flow_rules(), strict=True)


def convert_ss_decoder(sd):
    return C.convert_with_rules(sd, ss_decoder_rules(), strict=True)


def convert_slat_flow(sd):
    return C.convert_with_rules(sd, slat_flow_rules(), strict=True)
