"""Torch-checkpoint → flax-param conversion utilities.

The model zoo loads the reference families' public torch checkpoints
(safetensors / pickled state dicts) into flax param trees. Conventions:

  torch nn.Linear weight [out, in]   → flax Dense kernel [in, out] (T)
  torch nn.Conv2d  weight [O,I,kh,kw]→ flax Conv kernel [kh,kw,I,O]
  torch ConvTranspose2d [I,O,kh,kw]  → flax ConvTranspose [kh,kw,I,O]
                                       with spatial flip (torch computes a
                                       true deconv; flax correlates)
  LayerNorm/GroupNorm weight/bias    → scale/bias (no transpose)

Each family provides a `rename` mapping from its torch key layout to the
flax module path; the generic machinery here does dtype/layout conversion
and tree assembly. Per-layer numeric parity is covered by
tests/test_models.py against `transformers`' torch ViT (SURVEY.md §7
hard-part #5: conversion fidelity needs a numeric diff harness).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_conv_transpose(w: np.ndarray) -> np.ndarray:
    # torch [I, O, kh, kw] → flax [kh, kw, I, O], spatially flipped
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def set_path(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_state_dict(path: str) -> Mapping[str, np.ndarray]:
    """Load a torch checkpoint file (.safetensors or torch pickle)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: to_numpy(v) for k, v in sd.items()}


# Sentinel a rule returns for keys that are intentionally dropped
# (non-parameter buffers) — not reported as unconverted.
DROP = ("__drop__", None)


def convert_with_rules(state_dict: Mapping[str, np.ndarray],
                       rules: Callable[[str, np.ndarray],
                                       tuple[str, np.ndarray] | None],
                       strict: bool = True) -> Dict:
    """Apply per-key rules; rules return (flax_path, array), DROP for an
    intentional skip, or None for an unrecognized key. Returns a nested
    flax param dict."""
    tree: Dict = {}
    unused = []
    for key, val in state_dict.items():
        out = rules(key, to_numpy(val))
        if out is DROP:
            continue
        if out is None:
            unused.append(key)
            continue
        set_path(tree, out[0], out[1])
    if strict and unused:
        import warnings
        warnings.warn(f"{len(unused)} unconverted checkpoint keys, e.g. "
                      f"{unused[:5]}")
    return tree


# ------------------------------------------------------------------ #
# HF ViTModel (DINO) → models.common.ViT
# ------------------------------------------------------------------ #
def vit_rules(prefix: str = "") -> Callable:
    """Rules for `transformers.ViTModel` state dicts (DINO checkpoints).
    `prefix` strips an enclosing module path (e.g. 'model.')."""

    def rules(key: str, val: np.ndarray):
        if prefix:
            if not key.startswith(prefix):
                return None
            key = key[len(prefix):]
        e = "embeddings."
        if key == e + "cls_token":
            return "cls_token", val
        if key == e + "position_embeddings":
            return "pos_embed", val
        if key == e + "patch_embeddings.projection.weight":
            return "patch_embed/kernel", t_conv(val)
        if key == e + "patch_embeddings.projection.bias":
            return "patch_embed/bias", val
        if key.startswith("encoder.layer."):
            rest = key[len("encoder.layer."):]
            idx, sub = rest.split(".", 1)
            base = f"block_{idx}/"
            m = {
                "attention.attention.query.weight": ("attn/query/kernel",
                                                     t_linear),
                "attention.attention.query.bias": ("attn/query/bias", None),
                "attention.attention.key.weight": ("attn/key/kernel",
                                                   t_linear),
                "attention.attention.key.bias": ("attn/key/bias", None),
                "attention.attention.value.weight": ("attn/value/kernel",
                                                     t_linear),
                "attention.attention.value.bias": ("attn/value/bias", None),
                "attention.output.dense.weight": ("attn/out/kernel",
                                                  t_linear),
                "attention.output.dense.bias": ("attn/out/bias", None),
                "intermediate.dense.weight": ("mlp_in/kernel", t_linear),
                "intermediate.dense.bias": ("mlp_in/bias", None),
                "output.dense.weight": ("mlp_out/kernel", t_linear),
                "output.dense.bias": ("mlp_out/bias", None),
                "layernorm_before.weight": ("ln1/scale", None),
                "layernorm_before.bias": ("ln1/bias", None),
                "layernorm_after.weight": ("ln2/scale", None),
                "layernorm_after.bias": ("ln2/bias", None),
            }
            if sub in m:
                path, fn = m[sub]
                return base + path, (fn(val) if fn else val)
            return None
        if key == "layernorm.weight":
            return "ln_final/scale", val
        if key == "layernorm.bias":
            return "ln_final/bias", val
        return None          # pooler etc. — unused by tokenizers

    return rules


# ------------------------------------------------------------------ #
# diffusers-style Transformer1D / attention blocks
# ------------------------------------------------------------------ #
def transformer1d_rules(torch_prefix: str, flax_prefix: str) -> Callable:
    """Reference Transformer1D layout (transformer_1d.py:72-118) →
    models.common.Transformer1D."""

    def rules(key: str, val: np.ndarray):
        if not key.startswith(torch_prefix):
            return None
        key = key[len(torch_prefix):]
        fp = flax_prefix
        simple = {
            "norm.weight": (fp + "norm/scale", None),
            "norm.bias": (fp + "norm/bias", None),
            "proj_in.weight": (fp + "proj_in/kernel", t_linear),
            "proj_in.bias": (fp + "proj_in/bias", None),
            "proj_out.weight": (fp + "proj_out/kernel", t_linear),
            "proj_out.bias": (fp + "proj_out/bias", None),
        }
        if key in simple:
            path, fn = simple[key]
            return path, (fn(val) if fn else val)
        if key.startswith("transformer_blocks."):
            rest = key[len("transformer_blocks."):]
            idx, sub = rest.split(".", 1)
            base = f"{fp}blocks_{idx}/"
            block_map = {
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
                "ff.net.0.proj.weight": ("ff/net_0/proj/kernel", t_linear),
                "ff.net.0.proj.bias": ("ff/net_0/proj/bias", None),
                "ff.net.2.weight": ("ff/net_2/kernel", t_linear),
                "ff.net.2.bias": ("ff/net_2/bias", None),
            }
            if sub in block_map:
                path, fn = block_map[sub]
                return base + path, (fn(val) if fn else val)
        return None

    return rules
