"""Fabricate tiny diffusers-format checkpoint directories on disk.

No-egress environments have no real HF checkpoints, so `from_pretrained`
paths are validated against *fabricated* checkpoints that reproduce the
exact on-disk layout the public repos ship: `model_index.json`,
per-component `config.json` + `diffusion_pytorch_model.safetensors` /
`model.safetensors`, torch tensor layouts ([O,I,kh,kw] convs, [O,I]
linears), and the diffusers key naming enumerated here from the same
block-structure rules diffusers uses (verified against the reference's
`Checkpoints/Diffusers/*/*/config.json` skeletons).

The fabricator is itself a converter test: every enumerated torch key
must map through the conversion rules onto a distinct flax param path,
and every flax param must be hit — a bijection check that fails loudly
on layout drift in either direction.
"""

from __future__ import annotations

import json
import os

import numpy as np

# (name, kind) kinds: conv -> torch [O,I,kh,kw]; linear -> [O,I];
# conv1x1 -> [O,I,1,1] stored for a flax 2D kernel; raw -> stored as-is


def _wb(name, kind_w, kinds):
    """weight+bias pair."""
    kinds.append((name + ".weight", kind_w))
    kinds.append((name + ".bias", "raw"))


def enumerate_unet_keys(down_block_types, up_block_types,
                        block_out_channels,
                        layers_per_block=2, use_linear_projection=True,
                        transformer_layers_per_block=1,
                        cd_joint=False, mv_rowwise=False,
                        hunyuan_2p5d=False, sdxl_add_embed=False,
                        mv_decoupled=False):
    """Key layout of diffusers UNet2DConditionModel state dicts
    (the layout `models.diffusion.convert.unet_rules` consumes).
    `cd_joint` adds Wonder3D's per-transformer-block cross-domain
    joint attention (UNetMV2DConditionModel, transformer_mv2d.py).
    `hunyuan_2p5d` reproduces Basic2p5DTransformerBlock nesting
    (hunyuanpaint/unet/modules.py:46-79): "gen" = diffusers sublayers
    under an extra `.transformer.` segment plus sibling attn_multiview /
    attn_refview attentions; "dual" = the write-stream copy, which is
    wrapped (same nesting) but carries no extra attentions
    (modules.py:415-418 wraps with use_ma=use_ra=False).
    `sdxl_add_embed` adds SDXL's text_time add_embedding;
    `transformer_layers_per_block` may be a per-block tuple (SDXL);
    `mv_decoupled` ∈ {False, "mv", "mv+ref"} adds MV-Adapter's
    decoupled attn1.processor projections."""
    keys = []
    proj_kind = "linear" if use_linear_projection else "conv1x1"
    _wb("conv_in", "conv", keys)
    _wb("time_embedding.linear_1", "linear", keys)
    _wb("time_embedding.linear_2", "linear", keys)
    if sdxl_add_embed:
        _wb("add_embedding.linear_1", "linear", keys)
        _wb("add_embedding.linear_2", "linear", keys)

    def depth_of(block_index):
        d = transformer_layers_per_block
        if isinstance(d, (tuple, list)):
            return d[block_index] if block_index < len(d) else d[-1]
        return d

    def resnet(base, shortcut):
        _wb(base + ".norm1", "raw", keys)
        _wb(base + ".conv1", "conv", keys)
        _wb(base + ".time_emb_proj", "linear", keys)
        _wb(base + ".norm2", "raw", keys)
        _wb(base + ".conv2", "conv", keys)
        if shortcut:
            _wb(base + ".conv_shortcut", "conv1x1", keys)

    def attention(base, depth=1):
        _wb(base + ".norm", "raw", keys)
        _wb(base + ".proj_in", proj_kind, keys)
        for k in range(depth):
            tb = f"{base}.transformer_blocks.{k}"
            inner = tb + (".transformer" if hunyuan_2p5d else "")
            for a in ("attn1", "attn2"):
                for p in ("to_q", "to_k", "to_v"):
                    keys.append((f"{inner}.{a}.{p}.weight", "linear"))
                _wb(f"{inner}.{a}.to_out.0", "linear", keys)
            _wb(inner + ".norm1", "raw", keys)
            _wb(inner + ".norm2", "raw", keys)
            _wb(inner + ".norm3", "raw", keys)
            _wb(inner + ".ff.net.0.proj", "linear", keys)
            _wb(inner + ".ff.net.2", "linear", keys)
            if hunyuan_2p5d == "gen" or hunyuan_2p5d is True:
                for a in ("attn_multiview", "attn_refview"):
                    for p in ("to_q", "to_k", "to_v"):
                        keys.append((f"{tb}.{a}.{p}.weight", "linear"))
                    _wb(f"{tb}.{a}.to_out.0", "linear", keys)
            if mv_decoupled:
                suffixes = ("mv", "ref") if mv_decoupled == "mv+ref" \
                    else ("mv",)
                for sfx in suffixes:
                    for p in ("to_q", "to_k", "to_v"):
                        keys.append((
                            f"{tb}.attn1.processor.{p}_{sfx}.weight",
                            "linear"))
                    _wb(f"{tb}.attn1.processor.to_out_{sfx}.0",
                        "linear", keys)
            if cd_joint and not mv_rowwise:
                for p in ("to_q", "to_k", "to_v"):
                    keys.append((f"{tb}.attn_joint_mid.{p}.weight",
                                 "linear"))
                _wb(f"{tb}.attn_joint_mid.to_out.0", "linear", keys)
                _wb(tb + ".norm_joint_mid", "raw", keys)
            if mv_rowwise:
                # Era3D self_rowwise: separate row-wise mv attention
                for p in ("to_q", "to_k", "to_v"):
                    keys.append((f"{tb}.attn_mv.{p}.weight", "linear"))
                _wb(f"{tb}.attn_mv.to_out.0", "linear", keys)
                _wb(tb + ".norm_mv", "raw", keys)
        _wb(base + ".proj_out", proj_kind, keys)

    n = len(down_block_types)
    for i, bt in enumerate(down_block_types):
        ch_change = i > 0 and block_out_channels[i] != \
            block_out_channels[i - 1]
        for j in range(layers_per_block):
            # shortcut only where the first resnet changes channels
            resnet(f"down_blocks.{i}.resnets.{j}", ch_change and j == 0)
            if "CrossAttn" in bt:
                attention(f"down_blocks.{i}.attentions.{j}",
                          depth_of(i))
        if i < n - 1:
            _wb(f"down_blocks.{i}.downsamplers.0.conv", "conv", keys)

    resnet("mid_block.resnets.0", False)
    attention("mid_block.attentions.0", depth_of(n - 1))
    resnet("mid_block.resnets.1", False)

    for i, bt in enumerate(up_block_types):
        for j in range(layers_per_block + 1):
            # every up resnet concatenates a skip -> always a shortcut
            resnet(f"up_blocks.{i}.resnets.{j}", True)
            if "CrossAttn" in bt:
                attention(f"up_blocks.{i}.attentions.{j}",
                          depth_of(n - 1 - i))
        if i < n - 1:
            _wb(f"up_blocks.{i}.upsamplers.0.conv", "conv", keys)

    _wb("conv_norm_out", "raw", keys)
    _wb("conv_out", "conv", keys)
    return keys


def enumerate_vae_keys(block_out_channels, layers_per_block=2):
    keys = []

    def resnet(base, shortcut):
        _wb(base + ".norm1", "raw", keys)
        _wb(base + ".conv1", "conv", keys)
        _wb(base + ".norm2", "raw", keys)
        _wb(base + ".conv2", "conv", keys)
        if shortcut:
            _wb(base + ".conv_shortcut", "conv1x1", keys)

    n = len(block_out_channels)
    # encoder
    _wb("encoder.conv_in", "conv", keys)
    for i in range(n):
        ch_change = i > 0 and block_out_channels[i] != \
            block_out_channels[i - 1]
        for j in range(layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   ch_change and j == 0)
        if i < n - 1:
            _wb(f"encoder.down_blocks.{i}.downsamplers.0.conv", "conv",
                keys)
    resnet("encoder.mid_block.resnets.0", False)
    for p, k in (("group_norm", "raw"), ("to_q", "linear"),
                 ("to_k", "linear"), ("to_v", "linear"),
                 ("to_out.0", "linear")):
        _wb(f"encoder.mid_block.attentions.0.{p}", k, keys)
    resnet("encoder.mid_block.resnets.1", False)
    _wb("encoder.conv_norm_out", "raw", keys)
    _wb("encoder.conv_out", "conv", keys)
    _wb("quant_conv", "conv1x1", keys)

    # decoder (reversed channels; layers_per_block+1 resnets per block)
    _wb("post_quant_conv", "conv1x1", keys)
    _wb("decoder.conv_in", "conv", keys)
    resnet("decoder.mid_block.resnets.0", False)
    for p, k in (("group_norm", "raw"), ("to_q", "linear"),
                 ("to_k", "linear"), ("to_v", "linear"),
                 ("to_out.0", "linear")):
        _wb(f"decoder.mid_block.attentions.0.{p}", k, keys)
    resnet("decoder.mid_block.resnets.1", False)
    rev = list(reversed(block_out_channels))
    for i in range(n):
        ch_change = i > 0 and rev[i] != rev[i - 1]
        for j in range(layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   ch_change and j == 0)
        if i < n - 1:
            _wb(f"decoder.up_blocks.{i}.upsamplers.0.conv", "conv", keys)
    _wb("decoder.conv_norm_out", "raw", keys)
    _wb("decoder.conv_out", "conv", keys)
    return keys


def enumerate_clip_keys(layers, is_vision):
    root = "vision_model." if is_vision else "text_model."
    keys = []
    if is_vision:
        keys.append((root + "embeddings.class_embedding", "raw"))
        keys.append((root + "embeddings.patch_embedding.weight", "conv"))
        keys.append((root + "embeddings.position_embedding.weight",
                     "raw"))
        _wb(root + "pre_layrnorm", "raw", keys)
        _wb(root + "post_layernorm", "raw", keys)
        keys.append(("visual_projection.weight", "linear"))
    else:
        keys.append((root + "embeddings.token_embedding.weight", "raw"))
        keys.append((root + "embeddings.position_embedding.weight",
                     "raw"))
        _wb(root + "final_layer_norm", "raw", keys)
    for i in range(layers):
        b = f"{root}encoder.layers.{i}."
        for p in ("self_attn.q_proj", "self_attn.k_proj",
                  "self_attn.v_proj", "self_attn.out_proj",
                  "mlp.fc1", "mlp.fc2"):
            _wb(b + p, "linear", keys)
        _wb(b + "layer_norm1", "raw", keys)
        _wb(b + "layer_norm2", "raw", keys)
    return keys


# ------------------------------------------------------------------ #
def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def fabricate_state_dict(keys, rules, flax_params, rng):
    """Build a torch-layout state dict whose conversion through `rules`
    exactly reproduces the shape tree of `flax_params` (values random).
    Raises if the mapping isn't a bijection."""
    flat = _flat(flax_params)
    seen = set()
    sd = {}
    for name, kind in keys:
        probe = np.zeros((1, 1, 1, 1), np.float32)
        out = rules(name, probe)
        assert out is not None, f"rule has no mapping for {name}"
        path = out[0]
        assert path in flat, f"{name} -> {path} not in flax tree"
        assert path not in seen, f"{name} -> {path} mapped twice"
        seen.add(path)
        fshape = flat[path].shape
        arr = rng.standard_normal(fshape).astype(np.float32) * 0.05
        if kind == "conv":
            arr = np.transpose(arr, (3, 2, 0, 1))       # HWIO -> OIHW
        elif kind == "linear":
            if arr.ndim == 2:
                arr = arr.T                              # IO -> OI
            # else raw vectors (bias) pass through
        elif kind == "conv1x1":
            if arr.ndim == 2:
                arr = arr.T[:, :, None, None]            # IO -> OI11
            else:
                arr = np.transpose(arr, (3, 2, 0, 1))
        sd[name] = np.ascontiguousarray(arr)
    missing = sorted(set(flat) - seen)
    assert not missing, f"flax params never written: {missing[:8]}"
    return sd


def write_component(dirpath, config, state_dict,
                    weights_name="diffusion_pytorch_model.safetensors"):
    from safetensors.numpy import save_file
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(config, f)
    save_file(state_dict, os.path.join(dirpath, weights_name))
