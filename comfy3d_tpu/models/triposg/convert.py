"""TripoSG checkpoint (VAST-AI-Research/TripoSG) → flax loader.

The HF repo layout is diffusers-style: `transformer/` (TripoSGDiTModel,
triposg_transformer.py:365-470), `vae/` (TripoSGVAEModel,
autoencoder_kl_triposg.py:219-268) and `image_encoder_dinov2/`
(facebook/dinov2-large). Both shape components are built from the same
DiTBlock family, so one leaf mapper serves DiT and VAE rules.
"""

from __future__ import annotations

import os
import re
from typing import Callable

import numpy as np

from .. import convert as C


def _block_leaf(sub: str, val: np.ndarray):
    """One DiTBlock's torch leaves → flax paths (norm1/attn1,
    norm2/attn2[+norm_cross], norm3/ff, skip_linear/skip_norm)."""
    for n in ("norm1", "norm2", "norm3", "skip_norm"):
        if sub == f"{n}.weight":
            return f"{n}/scale", val
        if sub == f"{n}.bias":
            return f"{n}/bias", val
    m = re.match(r"(attn[12])\.(to_q|to_k|to_v)\.weight$", sub)
    if m:
        return f"{m.group(1)}/{m.group(2)}/kernel", C.t_linear(val)
    m = re.match(r"(attn[12])\.to_out\.0\.(weight|bias)$", sub)
    if m:
        leaf = ("kernel", C.t_linear(val)) if m.group(2) == "weight" \
            else ("bias", val)
        return f"{m.group(1)}/to_out_0/{leaf[0]}", leaf[1]
    m = re.match(r"(attn[12])\.norm_(q|k)\.weight$", sub)
    if m:
        return f"{m.group(1)}/norm_{m.group(2)}_scale", val
    m = re.match(r"attn2\.norm_cross\.(weight|bias)$", sub)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return f"attn2/norm_cross/{leaf}", val
    m = re.match(r"ff\.net\.0\.proj\.(weight|bias)$", sub)
    if m:
        return ("ff_0/kernel", C.t_linear(val)) if m.group(1) == "weight" \
            else ("ff_0/bias", val)
    m = re.match(r"ff\.net\.2\.(weight|bias)$", sub)
    if m:
        return ("ff_2/kernel", C.t_linear(val)) if m.group(1) == "weight" \
            else ("ff_2/bias", val)
    m = re.match(r"skip_linear\.(weight|bias)$", sub)
    if m:
        return ("skip_linear/kernel", C.t_linear(val)) \
            if m.group(1) == "weight" else ("skip_linear/bias", val)
    return None


def dit_rules() -> Callable:
    """TripoSGDiTModel.state_dict() → models.triposg.dit paths."""

    def rules(key: str, val: np.ndarray):
        simple = {"proj_in": "proj_in", "proj_out": "proj_out",
                  "time_proj.linear_1": "time_proj_linear_1",
                  "time_proj.linear_2": "time_proj_linear_2"}
        for tk, fp in simple.items():
            if key == tk + ".weight":
                return f"{fp}/kernel", C.t_linear(val)
            if key == tk + ".bias":
                return f"{fp}/bias", val
        if key == "norm_out.weight":
            return "norm_out/scale", val
        if key == "norm_out.bias":
            return "norm_out/bias", val
        if key.startswith("blocks."):
            idx, sub = key[len("blocks."):].split(".", 1)
            hit = _block_leaf(sub, val)
            if hit:
                return f"blocks_{idx}/{hit[0]}", hit[1]
        return None

    return rules


def vae_rules(num_layers_decoder: int = 16) -> Callable:
    """TripoSGVAEModel.state_dict() → models.triposg.vae paths.
    decoder.blocks[-1] (index == num_layers_decoder) is the query
    cross-attention block (autoencoder_kl_triposg.py:108-139)."""

    def rules(key: str, val: np.ndarray):
        simple = {"quant": "quant", "post_quant": "post_quant",
                  "encoder.proj_in": "enc_proj_in",
                  "decoder.proj_query": "proj_query",
                  "decoder.proj_out": "proj_out"}
        for tk, fp in simple.items():
            if key == tk + ".weight":
                return f"{fp}/kernel", C.t_linear(val)
            if key == tk + ".bias":
                return f"{fp}/bias", val
        for tk, fp in (("encoder.norm_out", "enc_norm_out"),
                       ("decoder.norm_out", "dec_norm_out")):
            if key == tk + ".weight":
                return f"{fp}/scale", val
            if key == tk + ".bias":
                return f"{fp}/bias", val
        for stage, base in (("encoder.blocks.", "enc_blocks"),
                            ("decoder.blocks.", "dec_blocks")):
            if not key.startswith(stage):
                continue
            idx, sub = key[len(stage):].split(".", 1)
            hit = _block_leaf(sub, val)
            if hit is None:
                return None
            if stage.startswith("decoder") and \
                    int(idx) == num_layers_decoder:
                return f"dec_query_block/{hit[0]}", hit[1]
            return f"{base}_{idx}/{hit[0]}", hit[1]
        return None

    return rules


def _repack_heads(attn: dict, heads: int, is_cross: bool) -> None:
    """TripoSGAttnProcessor2_0 re-splits the concatenated projections
    head-major (attention_processor.py:244-255: "pre-trained models
    split heads first then split qkv"): q_h reads concat channels
    [h·3hd, h·3hd+hd) of [to_q|to_k|to_v] (kv pairs for cross-attn).
    Repack the checkpoint kernels so standard per-module attention
    reproduces it."""
    names = ("to_k", "to_v") if is_cross else ("to_q", "to_k", "to_v")
    n = len(names)
    kers = [np.asarray(attn[m]["kernel"]) for m in names]
    din, d = kers[0].shape
    hd = d // heads
    packed = np.concatenate(kers, axis=1).reshape(din, heads, n, hd)
    for j, m in enumerate(names):
        attn[m]["kernel"] = np.ascontiguousarray(
            packed[:, :, j].reshape(din, d))
    if "bias" in attn[names[0]]:
        bs = [np.asarray(attn[m]["bias"]) for m in names]
        bp = np.concatenate(bs).reshape(heads, n, hd)
        for j, m in enumerate(names):
            attn[m]["bias"] = np.ascontiguousarray(
                bp[:, j].reshape(d))


def _repack_tree(tree: dict, heads: int) -> dict:
    for key, sub in tree.items():
        if not isinstance(sub, dict):
            continue
        if "attn1" in sub:
            _repack_heads(sub["attn1"], heads, is_cross=False)
        if "attn2" in sub:
            _repack_heads(sub["attn2"], heads, is_cross=True)
    return tree


def convert_dit(state_dict, heads: int = 16) -> dict:
    tree = C.convert_with_rules(state_dict, dit_rules(), strict=True)
    return _repack_tree(tree, heads)


def convert_vae(state_dict, heads: int = 8,
                num_layers_decoder: int = 16) -> dict:
    tree = C.convert_with_rules(
        state_dict, vae_rules(num_layers_decoder), strict=True)
    return _repack_tree(tree, heads)


def load_triposg_dir(cls, path: str, **cfg_overrides):
    from ..dinov2 import Dinov2Config, convert_dinov2
    from ..loader import load_dir_state_dict, read_json_config
    from .dit import TripoSGDiTConfig
    from .pipeline import TripoSGConfig
    from .vae import TripoSGVAEConfig

    traw = read_json_config(os.path.join(path, "transformer",
                                         "config.json"))
    vraw = read_json_config(os.path.join(path, "vae", "config.json"))
    dit_cfg = TripoSGDiTConfig(
        width=traw.get("width", 2048),
        in_channels=traw.get("in_channels", 64),
        num_layers=traw.get("num_layers", 21),
        heads=traw.get("num_attention_heads", 16),
        cross_attention_dim=traw.get("cross_attention_dim", 1024))
    vae_cfg = TripoSGVAEConfig(
        latent_channels=vraw.get("latent_channels", 64),
        heads=vraw.get("num_attention_heads", 8),
        width_encoder=vraw.get("width_encoder", 512),
        width_decoder=vraw.get("width_decoder", 1024),
        num_layers_encoder=vraw.get("num_layers_encoder", 8),
        num_layers_decoder=vraw.get("num_layers_decoder", 16),
        num_freqs=vraw.get("embed_frequency", 8),
        include_pi=vraw.get("embed_include_pi", False))

    cond_dir = os.path.join(path, "image_encoder_dinov2")
    craw = read_json_config(os.path.join(cond_dir, "config.json")) \
        if os.path.isdir(cond_dir) else {}
    cond_cfg = Dinov2Config(
        hidden=craw.get("hidden_size", 1024),
        layers=craw.get("num_hidden_layers", 24),
        heads=craw.get("num_attention_heads", 16),
        patch=craw.get("patch_size", 14),
        pretrain_image_size=craw.get("image_size", 518),
        layer_norm_eps=craw.get("layer_norm_eps", 1e-6))

    kw = dict(dit=dit_cfg, vae=vae_cfg, cond=cond_cfg,
              image_size=craw.get("image_size", 518))
    kw.update(cfg_overrides)
    cfg = TripoSGConfig(**kw)

    params = {
        "dit": convert_dit(
            load_dir_state_dict(os.path.join(path, "transformer")),
            heads=cfg.dit.heads),
        "vae": convert_vae(
            load_dir_state_dict(os.path.join(path, "vae")),
            heads=cfg.vae.heads,
            num_layers_decoder=cfg.vae.num_layers_decoder),
    }
    if os.path.isdir(cond_dir):
        params["cond"] = convert_dinov2(load_dir_state_dict(cond_dir))
    else:
        import jax
        import jax.numpy as jnp
        from ..dinov2 import Dinov2
        s = cfg.image_size
        params["cond"] = Dinov2(cfg.cond).init(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)))["params"]
        print("[triposg.convert] no image_encoder_dinov2/ — random "
              "conditioner")
    return cls(params, cfg)
