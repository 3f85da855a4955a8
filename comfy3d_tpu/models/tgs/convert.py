"""TGS torch checkpoint (`model_lvis_rel.ckpt`) → flax params.

Reference load path: nodes.py:1437-1463 builds `TGS(cfg.system)` and
`load_weights(ckpt)` — the state dict is the module tree documented in
model.py. The pointcloud generator's dinov2 backbone is frozen and
registered as a non-module (tokenizers/image.py:36-44), so its weights
are NOT in the checkpoint; `load_tgs_checkpoint` backfills it from a
local stock `facebook/dinov2-base` snapshot when available, else from
the checkpoint's own finetuned tokenizer backbone (closest stand-in;
a warning is printed).
"""

from __future__ import annotations

import os
import re

import numpy as np

from .. import convert as C
from ..dinov2 import dinov2_rules
from .model import TGSConfig
from .pipeline import TGSPipeline

_GS_HEADS = ("xyz", "scaling", "rotation", "opacity", "shs")


def _t_conv1(w):
    """1x1 Conv1d/Conv2d weight [O, I, 1(,1)] → Dense kernel [I, O]."""
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def _mlp_layers(rest: str, base: str):
    m = re.match(r"layers\.(\d+)\.(weight|bias)$", rest)
    if not m:
        return None
    i, leaf = m.groups()
    if leaf == "weight":
        return f"{base}/layers_{i}/kernel", True
    return f"{base}/layers_{i}/bias", False


def _bn(leaf: str):
    return {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}.get(leaf)


def _snowflake_rules(key: str, val, base: str):
    """decoder.* → pointcloud_upsampling/* paths."""
    m = re.match(r"mlp_feat_cond\.mlp\.(\d+)\.(weight|bias)$", key)
    if m:
        i, leaf = m.groups()
        arr = _t_conv1(val) if leaf == "weight" else val
        return f"{base}/mlp_feat_cond/conv_{i}/" \
            f"{'kernel' if leaf == 'weight' else 'bias'}", arr
    m = re.match(r"uppers\.(\d+)\.(.*)$", key)
    if not m:
        return None
    u, rest = m.groups()
    ub = f"{base}/uppers_{u}"
    m = re.match(r"(mlp_1|mlp_2|mlp_ps|mlp_delta)\.mlp\.(\d+)"
                 r"\.(weight|bias)$", rest)
    if m:
        name, i, leaf = m.groups()
        arr = _t_conv1(val) if leaf == "weight" else val
        return f"{ub}/{name}/conv_{i}/" \
            f"{'kernel' if leaf == 'weight' else 'bias'}", arr
    m = re.match(r"mlp_delta_feature\.(conv_1|conv_2|conv_shortcut)"
                 r"\.(weight|bias)$", rest)
    if m:
        name, leaf = m.groups()
        arr = _t_conv1(val) if leaf == "weight" else val
        return f"{ub}/mlp_delta_feature/{name}/" \
            f"{'kernel' if leaf == 'weight' else 'bias'}", arr
    if rest == "ps.weight":                     # ConvTranspose1d [I,O,k]
        return f"{ub}/ps_kernel", np.ascontiguousarray(
            np.transpose(val, (2, 0, 1)))
    m = re.match(r"skip_transformer\.(.*)$", rest)
    if not m:
        return None
    st, sb = m.group(1), f"{ub}/skip_transformer"
    m = re.match(r"mlp_v\.(conv_1|conv_2|conv_shortcut)"
                 r"\.(weight|bias)$", st)
    if m:
        name, leaf = m.groups()
        arr = _t_conv1(val) if leaf == "weight" else val
        return f"{sb}/mlp_v/{name}/" \
            f"{'kernel' if leaf == 'weight' else 'bias'}", arr
    m = re.match(r"(conv_key|conv_query|conv_value|conv_end)"
                 r"\.(weight|bias)$", st)
    if m:
        name, leaf = m.groups()
        arr = _t_conv1(val) if leaf == "weight" else val
        return f"{sb}/{name}/" \
            f"{'kernel' if leaf == 'weight' else 'bias'}", arr
    m = re.match(r"(pos_mlp|attn_mlp)\.(\d+)\.(\w+)$", st)
    if m:
        name, i, leaf = m.groups()
        if leaf == "num_batches_tracked":
            return C.DROP
        if i == "1":                            # BatchNorm (eval affine)
            return f"{sb}/{name}_{i}/{_bn(leaf)}", val
        arr = _t_conv1(val) if leaf == "weight" else val
        return f"{sb}/{name}_{i}/" \
            f"{'kernel' if leaf == 'weight' else 'bias'}", arr
    return None


def tgs_rules(key: str, val: np.ndarray):
    # ---- top-level camera MLP / renderer MLP ------------------------
    for tp, base in (("camera_embedder.", "camera_embedder"),
                     ("pointcloud_generator.camera_embedder.",
                      "pointcloud_generator/camera_embedder"),
                     ("renderer.mlp_net.", "mlp_net")):
        if key.startswith(tp):
            out = _mlp_layers(key[len(tp):], base)
            if out:
                path, is_w = out
                return path, (C.t_linear(val) if is_w else val)
            return None

    # ---- finetuned dinov2 (trainable; modulation keys ride along) ---
    if key.startswith("image_tokenizer.model."):
        out = dinov2_rules("image_tokenizer.model.")(key, val)
        if out is None:
            if ".pooler." in key or key.endswith("mask_token"):
                return C.DROP
            return None
        return "image_tokenizer/" + out[0], out[1]
    if key.startswith("image_tokenizer.modulations."):
        return C.DROP                           # aliases of the above

    # ---- triplane tokens / backbone / upsampler ---------------------
    if key == "tokenizer.embeddings":           # [3, C, H, W]
        return "tokenizer_embeddings", np.ascontiguousarray(
            np.transpose(val, (0, 2, 3, 1)))
    if key.startswith("backbone."):
        return C.transformer1d_rules("backbone.", "backbone/")(key, val)
    if key == "post_processor.upsample.weight":
        return "post_processor/kernel", C.t_conv_transpose(val)
    if key == "post_processor.upsample.bias":
        return "post_processor/bias", val

    # ---- pointcloud generator --------------------------------------
    pg = "pointcloud_generator."
    if key.startswith(pg):
        rest = key[len(pg):]
        m = re.match(r"image_tokenizer\.modulations\.(\d+)\.linear2"
                     r"\.(weight|bias)$", rest)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            mod = "norm1_mod" if i % 2 == 0 else "norm2_mod"
            arr = C.t_linear(val) if leaf == "weight" else val
            return (f"pointcloud_generator/image_tokenizer/"
                    f"layer_{i // 2}/{mod}/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}", arr)
        if rest == "tokenizer.pcl_embeddings.weight":
            return "pointcloud_generator/pcl_embeddings", val
        if rest.startswith("backbone."):
            return C.transformer1d_rules(
                "backbone.", "pointcloud_generator/backbone/")(rest, val)
        m = re.match(r"post_processor\.point_layer\.(weight|bias)$",
                     rest)
        if m:
            leaf = m.group(1)
            arr = C.t_linear(val) if leaf == "weight" else val
            return (f"pointcloud_generator/post_processor/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}", arr)
        if rest.startswith("pointcloud_upsampling.decoder."):
            return _snowflake_rules(
                rest[len("pointcloud_upsampling.decoder."):], val,
                "pointcloud_generator/pointcloud_upsampling")
        return None

    # ---- point encoder ----------------------------------------------
    pe = "point_encoder."
    if key.startswith(pe):
        rest = key[len(pe):]
        m = re.match(r"(fc_pos|fc_c)\.(weight|bias)$", rest)
        if m:
            name, leaf = m.groups()
            arr = C.t_linear(val) if leaf == "weight" else val
            return (f"point_encoder/{name}/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}", arr)
        m = re.match(r"blocks\.(\d+)\.(fc_0|fc_1|shortcut)"
                     r"\.(weight|bias)$", rest)
        if m:
            i, name, leaf = m.groups()
            arr = C.t_linear(val) if leaf == "weight" else val
            return (f"point_encoder/blocks_{i}/{name}/"
                    f"{'kernel' if leaf == 'weight' else 'bias'}", arr)
        return None

    # ---- GS heads ---------------------------------------------------
    m = re.match(r"renderer\.gs_net\.out_layers\.(\d+)\.(weight|bias)$",
                 key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        arr = C.t_linear(val) if leaf == "weight" else val
        return (f"gs_net/out_{_GS_HEADS[i]}/"
                f"{'kernel' if leaf == 'weight' else 'bias'}", arr)

    if key.startswith("image_feature."):
        return C.DROP                           # buffer-only module
    return None


def convert_tgs(state_dict) -> dict:
    return C.convert_with_rules(state_dict, tgs_rules, strict=False)


def load_tgs_checkpoint(ckpt_path: str,
                        cfg: TGSConfig = TGSConfig(),
                        dinov2_dir: str | None = None) -> TGSPipeline:
    """ckpt → TGSPipeline with real weights.

    The generator's frozen dinov2-base backbone is backfilled from
    `dinov2_dir` (a HF snapshot with pytorch_model.bin/safetensors) or,
    failing that, from the checkpoint's finetuned tokenizer backbone.
    """
    sd = C.load_state_dict(ckpt_path)
    params = convert_tgs(sd)

    gen_tok = params.setdefault("pointcloud_generator", {}) \
        .setdefault("image_tokenizer", {})
    backbone = None
    if dinov2_dir:
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(dinov2_dir, name)
            if os.path.exists(p):
                from ..dinov2 import convert_dinov2
                backbone = convert_dinov2(C.load_state_dict(p))
                break
    if backbone is None:
        import copy
        print("[tgs.convert] stock dinov2-base not found locally; "
              "backfilling the frozen generator backbone from the "
              "checkpoint's finetuned tokenizer")
        backbone = copy.deepcopy(params["image_tokenizer"])
        for layer in backbone.values():
            if isinstance(layer, dict):
                layer.pop("norm1_mod", None)
                layer.pop("norm2_mod", None)
    for k, v in backbone.items():
        if k.startswith("layer_") and k in gen_tok:
            merged = dict(v)
            merged.update(gen_tok[k])           # keep ckpt modulations
            gen_tok[k] = merged
        else:
            gen_tok.setdefault(k, v)
    return TGSPipeline(params, cfg)
