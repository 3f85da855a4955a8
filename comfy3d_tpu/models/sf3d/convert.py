"""SF3D torch checkpoint → flax param conversion.

The public StableFast3D checkpoint (`stabilityai/stable-fast-3d`,
`model.safetensors`) is one flat state dict over the whole `SF3D` system
(`sf3d/system.py:86-129`): `image_tokenizer.model.*` (modulated DINOv2),
`tokenizer.embeddings`, `camera_embedder.linear.*`, `backbone.*`
(TwoStreamInterleaveTransformer), `post_processor.upsample.*`,
`decoder.heads.*`, `image_estimator.*` (open_clip ViT-B-32 + Beta
heads), `global_estimator.*`. Every sub-layout is mapped here;
`from_pretrained` validates the converted tree structurally against the
module's eval_shape tree before returning.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from .. import convert as C
from ..dinov2 import dinov2_rules


def _lin(base, leaf, val):
    if leaf == "weight":
        return base + "/kernel", C.t_linear(val)
    return base + "/bias", val


def _backbone_rules(key: str, val: np.ndarray):
    pre = "backbone."
    if not key.startswith(pre):
        return None
    key = key[len(pre):]
    simple = {
        "norm_triplane.weight": ("backbone/norm_triplane_scale", None),
        "norm_triplane.bias": ("backbone/norm_triplane_bias", None),
        "latent_init": ("backbone/latent_init", None),
        "norm_image.weight": ("backbone/norm_image/scale", None),
        "norm_image.bias": ("backbone/norm_image/bias", None),
        "norm_latent.weight": ("backbone/norm_latent/scale", None),
        "norm_latent.bias": ("backbone/norm_latent/bias", None),
    }
    if key in simple:
        path, fn = simple[key]
        return path, (fn(val) if fn else val)
    m = re.match(r"(proj_triplane|proj_image|proj_latent|proj_out)"
                 r"\.(weight|bias)$", key)
    if m:
        return _lin(f"backbone/{m.group(1)}", m.group(2), val)
    m = re.match(r"main_blocks\.(\d+)\.(.*)", key)
    if not m:
        return None
    bi, rest = m.groups()
    base = f"backbone/main_blocks_{bi}/"
    m = re.match(r"(fuse_block_in|fuse_block_out)\.(.*)", rest)
    if m:
        blk, sub = m.groups()
        return _fuse_or_basic(base + blk, sub, val)
    m = re.match(r"transformer_block\.(\d+)\.(.*)", rest)
    if m:
        j, sub = m.groups()
        return _fuse_or_basic(base + f"transformer_block_{j}", sub, val)
    return None


def _fuse_or_basic(base: str, sub: str, val: np.ndarray):
    """Shared FuseBlock/BasicBlock member layout (backbone.py:36-250)."""
    m = re.match(r"(norm_z1|norm_z2|norm1|norm2|norm3|norm_x)"
                 r"\.(weight|bias)$", sub)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return f"{base}/{m.group(1)}/{leaf}", val
    m = re.match(r"(attn|attn1|attn2)\.(wq|wk|wv|proj)\.(weight|bias)$",
                 sub)
    if m:
        return _lin(f"{base}/{m.group(1)}/{m.group(2)}", m.group(3), val)
    m = re.match(r"ff\.net\.0\.proj\.(weight|bias)$", sub)
    if m:
        return _lin(f"{base}/ff/net_0_proj", m.group(1), val)
    m = re.match(r"ff\.net\.2\.(weight|bias)$", sub)
    if m:
        return _lin(f"{base}/ff/net_2", m.group(1), val)
    return None


def _model_rules(key: str, val: np.ndarray):
    """Everything inside our `SF3DModel` flax tree."""
    if key == "tokenizer.embeddings":
        # [3, C, H, W] → [3, H, W, C]
        return "triplane_tokens", np.transpose(val, (0, 2, 3, 1))
    m = re.match(r"camera_embedder\.linear\.(weight|bias)$", key)
    if m:
        return _lin("camera_embedder", m.group(1), val)
    if key.startswith("image_tokenizer.model."):
        out = dinov2_rules("image_tokenizer.model.")(key, val)
        if out is None:
            return None
        return "image_tokenizer/" + out[0], out[1]
    if key.startswith("image_tokenizer.modulations."):
        return None   # aliases of the per-layer norm*_modulation params
    out = _backbone_rules(key, val)
    if out is not None:
        return out
    m = re.match(r"post_processor\.upsample\.(\d+)\.(weight|bias)$", key)
    if m:
        idx, leaf = m.groups()
        if leaf == "weight":
            return f"post_processor/upsample_{idx}/kernel", C.t_conv(val)
        return f"post_processor/upsample_{idx}/bias", val
    m = re.match(r"decoder\.heads\.(\w+)\.(\d+)\.(weight|bias)$", key)
    if m:
        name, idx, leaf = m.groups()
        return _lin(f"decoder/{name}_{idx}", leaf, val)
    return None


def _image_estimator_head_rules(key: str, val: np.ndarray):
    """`image_estimator.heads.{name}.{0|1|2}.{seq}.{leaf}` →
    ClipHeadEstimator paths (0 = shared stack, 1/2 = α/β branches)."""
    m = re.match(r"image_estimator\.heads\.(\w+)\.(\d)\.(\d+)"
                 r"\.(weight|bias)$", key)
    if not m:
        return None
    name, branch, idx, leaf = m.groups()
    if branch == "0":
        return _lin(f"{name}_shared_{idx}", leaf, val)
    return _lin(f"{name}_b{branch}_{idx}", leaf, val)


def _global_estimator_rules(key: str, val: np.ndarray):
    pre = "global_estimator."
    if not key.startswith(pre):
        return None
    key = key[len(pre):]
    m = re.match(r"layers\.(\d+)\.(weight|bias)$", key)
    if m:
        idx, leaf = m.groups()
        if leaf == "weight":
            return f"layers_{idx}/kernel", C.t_conv(val)
        return f"layers_{idx}/bias", val
    m = re.match(r"heads\.(\w+)\.(\d+)\.(weight|bias)$", key)
    if m:
        name, idx, leaf = m.groups()
        return _lin(f"{name}_{idx}", leaf, val)
    return None


def convert_sf3d(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Dict]:
    """Full SF3D state dict → {"model", "image_estimator", "clip",
    "global_estimator"} flax trees."""
    from ..clip import convert_open_clip_visual

    model = C.convert_with_rules(state_dict, _model_rules, strict=False)
    image_est = C.convert_with_rules(
        state_dict, _image_estimator_head_rules, strict=False)
    clip = convert_open_clip_visual(
        state_dict, prefix="image_estimator.model.visual.")
    global_est = C.convert_with_rules(
        state_dict, _global_estimator_rules, strict=False)
    return {"model": model, "image_estimator": image_est,
            "clip": clip, "global_estimator": global_est}


def from_pretrained(path: str, cfg=None):
    """One checkpoint file/dir → ready SF3DPipeline (validated trees)."""
    import jax.numpy as jnp

    from ..loader import (cast_tree, load_dir_state_dict,
                          module_shape_tree, on_cpu, validate_tree)
    from .pipeline import SF3DConfig, SF3DModel, SF3DPipeline

    cfg = cfg or SF3DConfig()
    sd = load_dir_state_dict(path)
    trees = convert_sf3d(sd)
    s = cfg.cond_image_size
    ref = module_shape_tree(
        SF3DModel(cfg), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, cfg.camera_cond_dim)), jnp.zeros((5, 3)),
        method=SF3DModel.init_all)
    validate_tree(trees["model"], ref, "sf3d")
    with on_cpu():
        params = cast_tree(trees["model"], jnp.float32)
        pipe = SF3DPipeline(params, cfg)
        pipe.set_estimators(
            cast_tree(trees["image_estimator"], jnp.float32)
            if trees["image_estimator"] else None,
            cast_tree(trees["clip"], jnp.float32)
            if trees["clip"] else None,
            cast_tree(trees["global_estimator"], jnp.float32)
            if trees["global_estimator"] else None)
    return pipe
