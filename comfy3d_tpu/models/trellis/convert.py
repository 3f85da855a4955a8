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
        "conv1.conv.weight": ("conv1/kernel", t_spconv),
        "conv1.conv.bias": ("conv1/bias", None),
        "conv2.conv.weight": ("conv2/kernel", t_spconv),
        "conv2.conv.bias": ("conv2/bias", None),
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


def slat_decoder_rules(attn_mode: str = "swin") -> Callable:
    """SLat GS/mesh decoders (`structured_latent_vae/base.py:27-116`,
    `decoder_gs.py:11-122`, `decoder_mesh.py:13-167`): sparse-linear
    torso + (swin) transformer blocks, mesh variant adds two
    SparseSubdivideBlock3d upsamplers."""

    def rules(key: str, val: np.ndarray):
        for lin in ("input_layer", "out_layer"):
            if key.startswith(lin + "."):
                leaf, v = (("kernel", C.t_linear(val))
                           if key.endswith("weight") else ("bias", val))
                return f"{lin}/{leaf}", v
        if key.startswith("blocks."):
            idx, sub = key[len("blocks."):].split(".", 1)
            base = f"blocks_{idx}/"
            if sub.startswith("attn."):
                rest = sub[len("attn."):]
                if attn_mode == "swin":
                    # flax flattens swin attention into the block scope
                    m = {
                        "to_qkv.weight": ("attn_to_qkv/kernel",
                                          C.t_linear),
                        "to_qkv.bias": ("attn_to_qkv/bias", None),
                        "to_out.weight": ("attn_to_out/kernel",
                                          C.t_linear),
                        "to_out.bias": ("attn_to_out/bias", None),
                        "q_rms_norm.gamma": ("attn_q_rms/gamma", None),
                        "k_rms_norm.gamma": ("attn_k_rms/gamma", None),
                    }
                    if rest in m:
                        path, fn = m[rest]
                        return base + path, (fn(val) if fn else val)
                    return None
                return _attn_leaf(rest, base + "attn/", val)
            if sub.startswith("mlp.mlp."):
                idx2, leaf = sub[len("mlp.mlp."):].split(".")
                leaf2 = "kernel" if leaf == "weight" else "bias"
                v = C.t_linear(val) if leaf == "weight" else val
                return base + f"mlp/mlp_{idx2}/{leaf2}", v
            return None
        if key.startswith("upsample."):
            idx, sub = key[len("upsample."):].split(".", 1)
            base = f"upsample_{idx}/"
            m = {
                "act_layers.0.weight": ("norm_scale", None),
                "act_layers.0.bias": ("norm_bias", None),
                "out_layers.0.conv.weight": ("conv1/kernel", t_spconv),
                "out_layers.0.conv.bias": ("conv1/bias", None),
                "out_layers.1.weight": ("norm2_scale", None),
                "out_layers.1.bias": ("norm2_bias", None),
                "out_layers.3.conv.weight": ("conv2/kernel", t_spconv),
                "out_layers.3.conv.bias": ("conv2/bias", None),
                "skip_connection.conv.weight": ("skip_connection/kernel",
                                                t_spconv),
                "skip_connection.conv.bias": ("skip_connection/bias",
                                              None),
            }
            if sub in m:
                path, fn = m[sub]
                return base + path, (fn(val) if fn else val)
        return None

    return rules


def convert_ss_flow(sd):
    return C.convert_with_rules(sd, ss_flow_rules(), strict=True)


def convert_ss_decoder(sd):
    return C.convert_with_rules(sd, ss_decoder_rules(), strict=True)


def convert_slat_flow(sd):
    return C.convert_with_rules(sd, slat_flow_rules(), strict=True)


def convert_slat_decoder(sd, attn_mode: str = "swin"):
    # offset_perturbation is a deterministic buffer (decoder_gs.py:58),
    # recomputed by `slat.hammersley_perturbation`
    sd = {k: v for k, v in sd.items() if k != "offset_perturbation"}
    return C.convert_with_rules(sd, slat_decoder_rules(attn_mode),
                                strict=True)


# ------------------------------------------------------------------ #
# pretrained-pipeline assembly (microsoft/TRELLIS-image-large layout:
# pipeline.json + ckpts/<model>.{json,safetensors};
# reference `trellis/pipelines/base.py:21-45`, `models/__init__.py:32`)
# ------------------------------------------------------------------ #
def from_pretrained(path: str):
    """Build a TrellisImageTo3DPipeline from a local checkpoint tree.

    `path` is a directory containing `pipeline.json` whose
    `args.models` maps component names to ckpt stems. The DINOv2
    conditioner comes from torch.hub in the reference; place its
    state dict at `<path>/dinov2_vitl14_reg4_pretrain.pth` to load it
    (warns + random init otherwise)."""
    import os

    import jax

    from ..loader import (load_state_dict_any, read_json_config,
                          validate_tree)
    from ..dinov2 import convert_dinov2
    from .pipeline import TrellisConfig, TrellisImageTo3DPipeline
    from .sparse_structure import SSDecoderConfig, SSFlowConfig
    from .slat import SLatDecoderConfig, SLatFlowConfig

    pj = read_json_config(os.path.join(path, "pipeline.json"))
    args = pj["args"] if "args" in pj else pj
    stems = args["models"]

    def model_cfg(name):
        return read_json_config(os.path.join(path, stems[name] + ".json"))

    def model_sd(name):
        return load_state_dict_any(
            os.path.join(path, stems[name] + ".safetensors"))

    ssf = model_cfg("sparse_structure_flow_model")["args"]
    ssd = model_cfg("sparse_structure_decoder")["args"]
    slf = model_cfg("slat_flow_model")["args"]
    sdg = model_cfg("slat_decoder_gs")["args"]
    sdm = model_cfg("slat_decoder_mesh")["args"]
    rep = sdg.get("representation_config", {})
    norm = args.get("slat_normalization",
                    {"mean": [0.0] * slf["in_channels"],
                     "std": [1.0] * slf["in_channels"]})

    # image_cond_model: a torch.hub dinov2 name in the public
    # pipeline.json, or an inline config dict (tests / custom builds)
    from ..dinov2 import Dinov2Config
    icm = args.get("image_cond_model", "dinov2_vitl14_reg")
    dinov2_presets = {
        "dinov2_vits14_reg": dict(hidden=384, layers=12, heads=6),
        "dinov2_vitb14_reg": dict(hidden=768, layers=12, heads=12),
        "dinov2_vitl14_reg": dict(hidden=1024, layers=24, heads=16),
        "dinov2_vitg14_reg": dict(hidden=1536, layers=40, heads=24),
    }
    if isinstance(icm, dict):
        cond_cfg = Dinov2Config(**{**icm, "return_prenorm": True})
    else:
        cond_cfg = Dinov2Config(**dinov2_presets[icm], num_registers=4,
                                return_prenorm=True)

    cfg = TrellisConfig(
        cond=cond_cfg,
        image_size=args.get("image_size", 518),
        capacity=args.get("capacity", 25000),
        ss_flow=SSFlowConfig(
            resolution=ssf["resolution"], in_channels=ssf["in_channels"],
            model_channels=ssf["model_channels"],
            cond_channels=ssf["cond_channels"],
            out_channels=ssf["out_channels"],
            num_blocks=ssf["num_blocks"], num_heads=ssf["num_heads"],
            mlp_ratio=ssf.get("mlp_ratio", 4.0),
            patch_size=ssf.get("patch_size", 1),
            share_mod=ssf.get("share_mod", False),
            qk_rms_norm=ssf.get("qk_rms_norm", False),
            qk_rms_norm_cross=ssf.get("qk_rms_norm_cross", False)),
        ss_decoder=SSDecoderConfig(
            out_channels=ssd["out_channels"],
            latent_channels=ssd["latent_channels"],
            num_res_blocks=ssd["num_res_blocks"],
            channels=tuple(ssd["channels"]),
            num_res_blocks_middle=ssd["num_res_blocks_middle"]),
        slat_flow=SLatFlowConfig(
            resolution=slf["resolution"], in_channels=slf["in_channels"],
            model_channels=slf["model_channels"],
            cond_channels=slf["cond_channels"],
            out_channels=slf["out_channels"],
            num_blocks=slf["num_blocks"], num_heads=slf["num_heads"],
            mlp_ratio=slf.get("mlp_ratio", 4.0),
            patch_size=slf.get("patch_size", 2),
            num_io_res_blocks=slf.get("num_io_res_blocks", 2),
            io_block_channels=tuple(slf.get("io_block_channels", (128,))),
            share_mod=slf.get("share_mod", False),
            qk_rms_norm=slf.get("qk_rms_norm", False),
            qk_rms_norm_cross=slf.get("qk_rms_norm_cross", False),
            use_skip_connection=slf.get("use_skip_connection", True)),
        slat_dec=SLatDecoderConfig(
            resolution=sdg["resolution"],
            model_channels=sdg["model_channels"],
            latent_channels=sdg["latent_channels"],
            num_blocks=sdg["num_blocks"], num_heads=sdg["num_heads"],
            mlp_ratio=sdg.get("mlp_ratio", 4.0),
            attn_mode=sdg.get("attn_mode", "swin"),
            window_size=sdg.get("window_size", 8),
            qk_rms_norm=sdg.get("qk_rms_norm", False),
            num_gaussians=rep.get("num_gaussians", 32),
            voxel_size=rep.get("voxel_size", 1.5),
            scaling_bias=rep.get("scaling_bias", 0.01),
            opacity_bias=rep.get("opacity_bias", 0.1),
            lr_xyz=rep.get("lr", {}).get("_xyz", 1.0),
            lr_feat=rep.get("lr", {}).get("_features_dc", 1.0),
            lr_rot=rep.get("lr", {}).get("_rotation", 1.0),
            perturb_offset=rep.get("perturb_offset", True),
            scaling_activation=rep.get("scaling_activation", "softplus"),
            min_kernel_size=rep.get("3d_filter_kernel_size", 0.0)),
        slat_dec_mesh=SLatDecoderConfig(
            resolution=sdm["resolution"],
            model_channels=sdm["model_channels"],
            latent_channels=sdm["latent_channels"],
            num_blocks=sdm["num_blocks"], num_heads=sdm["num_heads"],
            mlp_ratio=sdm.get("mlp_ratio", 4.0),
            attn_mode=sdm.get("attn_mode", "swin"),
            window_size=sdm.get("window_size", 8),
            qk_rms_norm=sdm.get("qk_rms_norm", False)),
        slat_mean=tuple(norm["mean"]), slat_std=tuple(norm["std"]))

    import jax.numpy as jnp

    from ..loader import module_shape_tree, on_cpu
    from ...ops import sparse as osp
    from ..dinov2 import Dinov2

    p = {}
    p["ss_flow"] = convert_ss_flow(model_sd("sparse_structure_flow_model"))
    p["ss_decoder"] = convert_ss_decoder(
        model_sd("sparse_structure_decoder"))
    p["slat_flow"] = convert_slat_flow(model_sd("slat_flow_model"))
    p["gs_decoder"] = convert_slat_decoder(
        model_sd("slat_decoder_gs"), sdg.get("attn_mode", "swin"))
    p["mesh_decoder"] = convert_slat_decoder(
        model_sd("slat_decoder_mesh"), sdm.get("attn_mode", "swin"))

    # validate every converted tree against the module's abstract init
    # (eval_shape: no compiles, no device traffic)
    pipe = TrellisImageTo3DPipeline(p, cfg)
    cap = cfg.capacity
    r = cfg.ss_flow.resolution
    ctx = jnp.zeros((1, 7, cfg.ss_flow.cond_channels))
    dummy_vox = osp.SparseVoxels(
        jnp.zeros((cap, cfg.slat_flow.in_channels)),
        jnp.zeros((cap, 4), jnp.int32), jnp.zeros((cap,), bool))
    dummy_lat = osp.SparseVoxels(
        jnp.zeros((cap, cfg.slat_dec.latent_channels)),
        jnp.zeros((cap, 4), jnp.int32), jnp.zeros((cap,), bool))
    mesh_cfg = cfg.slat_dec_mesh or cfg.slat_dec
    dummy_lat_mesh = osp.SparseVoxels(
        jnp.zeros((cap, mesh_cfg.latent_channels)),
        jnp.zeros((cap, 4), jnp.int32), jnp.zeros((cap,), bool))
    refs = {
        "ss_flow": module_shape_tree(
            pipe.ss_flow, jnp.zeros((1, r, r, r, cfg.ss_flow.in_channels)),
            jnp.zeros((1,)), ctx),
        "ss_decoder": module_shape_tree(
            pipe.ss_decoder,
            jnp.zeros((1, r, r, r, cfg.ss_decoder.latent_channels))),
        "slat_flow": module_shape_tree(pipe.slat_flow, dummy_vox,
                                       jnp.zeros((1,)), ctx),
        "gs_decoder": module_shape_tree(pipe.gs_decoder, dummy_lat),
        "mesh_decoder": module_shape_tree(pipe.mesh_decoder,
                                          dummy_lat_mesh),
    }
    for name, ref_tree in refs.items():
        validate_tree(p[name], ref_tree, f"trellis/{name}")

    dino = os.path.join(path, "dinov2_vitl14_reg4_pretrain.pth")
    if os.path.exists(dino):
        p["cond"] = convert_dinov2(load_state_dict_any(dino))
        validate_tree(
            p["cond"],
            module_shape_tree(
                pipe.cond_model,
                jnp.zeros((1, cfg.image_size, cfg.image_size, 3))),
            "trellis/cond")
    else:
        print("[trellis.from_pretrained] no DINOv2 state dict at "
              f"{dino}; conditioner initialized randomly")
        with on_cpu():
            p["cond"] = Dinov2(cfg.cond).init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
            )["params"]
    pipe.params = p
    return pipe
