"""MVDream / ImageDream checkpoint → flax converter.

The ashawkey/{mvdream-sd2.1,imagedream-ipmv}-diffusers checkpoints ship
an LDM/OpenAI-layout UNet (`MultiViewUNetModel`,
`LGM/mvdream/mv_unet.py:635`): input_blocks/middle_block/output_blocks
CondSequentials, ResBlocks with in/emb/out_layers, SpatialTransformer3D
with linear proj, plus the camera MLP (`camera_embed`) and the
ImageDream IP Resampler (`image_embed`). These rules map that layout
onto the same flax tree `models.diffusion.unet` uses for the diffusers
layout, so one substrate serves both naming schemes.
"""

from __future__ import annotations

import re

import numpy as np

from ..convert import convert_with_rules, set_path, t_conv, t_linear


def _res_sub(rest, base):
    table = {
        "in_layers.0": (base + "/norm1", "norm"),
        "in_layers.2": (base + "/conv1", "conv"),
        "emb_layers.1": (base + "/time_emb_proj", "linear"),
        "out_layers.0": (base + "/norm2", "norm"),
        "out_layers.3": (base + "/conv2", "conv"),
        "skip_connection": (base + "/conv_shortcut", "conv"),
    }
    for tk, (path, kind) in table.items():
        for suffix, leaf in (("weight", None), ("bias", "bias")):
            if rest != f"{tk}.{suffix}":
                continue
            if leaf == "bias":
                return path + "/bias", "raw"
            if kind == "norm":
                return path + "/scale", "raw"
            return path + "/kernel", kind
    return None


_TB = {
    "attn1.to_q": "attn1/to_q", "attn1.to_k": "attn1/to_k",
    "attn1.to_v": "attn1/to_v", "attn1.to_out.0": "attn1/to_out_0",
    "attn2.to_q": "attn2/to_q", "attn2.to_k": "attn2/to_k",
    "attn2.to_v": "attn2/to_v", "attn2.to_out.0": "attn2/to_out_0",
    "attn2.to_k_ip": "attn2/to_k_ip", "attn2.to_v_ip": "attn2/to_v_ip",
    "ff.net.0.proj": "ff_net_0/proj", "ff.net.2": "ff_net_2",
}


def _attn_sub(rest, base):
    simple = {
        "norm": ("norm", "norm"),
        "proj_in": ("proj_in", "linear"),
        "proj_out": ("proj_out", "linear"),
    }
    for tk, (fk, kind) in simple.items():
        for suffix in ("weight", "bias"):
            if rest != f"{tk}.{suffix}":
                continue
            if suffix == "bias":
                return f"{base}/{fk}/bias", "raw"
            if kind == "norm":
                return f"{base}/{fk}/scale", "raw"
            return f"{base}/{fk}/kernel", kind
    m = re.match(r"transformer_blocks\.(\d+)\.(.*)", rest)
    if not m:
        return None
    k, sub = m.groups()
    tb = f"{base}/blocks_{k}"
    for norm in ("norm1", "norm2", "norm3"):
        if sub == f"{norm}.weight":
            return f"{tb}/{norm}/scale", "raw"
        if sub == f"{norm}.bias":
            return f"{tb}/{norm}/bias", "raw"
    for tk, fk in _TB.items():
        if sub == f"{tk}.weight":
            return f"{tb}/{fk}/kernel", "linear"
        if sub == f"{tk}.bias":
            return f"{tb}/{fk}/bias", "raw"
    return None


def mv_unet_rules(num_res_blocks: int = 2):
    """torch key → ("unet"|"camera"|"resampler", flax_path, value)."""
    stride = num_res_blocks + 1

    def apply_kind(path, kind, val):
        if kind == "conv":
            return path, t_conv(val)
        if kind == "linear":
            if val.ndim == 4:
                val = val[:, :, 0, 0]
            return path, t_linear(val)
        return path, val

    def rules(key: str, val: np.ndarray):
        simple = {
            "time_embed.0.weight": ("time_emb_1/kernel", "linear"),
            "time_embed.0.bias": ("time_emb_1/bias", "raw"),
            "time_embed.2.weight": ("time_emb_2/kernel", "linear"),
            "time_embed.2.bias": ("time_emb_2/bias", "raw"),
            "out.0.weight": ("norm_out/scale", "raw"),
            "out.0.bias": ("norm_out/bias", "raw"),
            "out.2.weight": ("conv_out/kernel", "conv"),
            "out.2.bias": ("conv_out/bias", "raw"),
            "input_blocks.0.0.weight": ("conv_in/kernel", "conv"),
            "input_blocks.0.0.bias": ("conv_in/bias", "raw"),
        }
        if key in simple:
            path, kind = simple[key]
            return ("unet",) + apply_kind(path, kind, val)

        if key.startswith("camera_embed."):
            rest = key[len("camera_embed."):]
            tgt = {"0.weight": ("linear_1/kernel", "linear"),
                   "0.bias": ("linear_1/bias", "raw"),
                   "2.weight": ("linear_2/kernel", "linear"),
                   "2.bias": ("linear_2/bias", "raw")}.get(rest)
            if tgt is None:
                return None
            return ("camera",) + apply_kind(tgt[0], tgt[1], val)

        if key.startswith("image_embed."):
            rest = key[len("image_embed."):]
            simple_rs = {
                "latents": ("latents", "raw"),
                "proj_in.weight": ("proj_in/kernel", "linear"),
                "proj_in.bias": ("proj_in/bias", "raw"),
                "proj_out.weight": ("proj_out/kernel", "linear"),
                "proj_out.bias": ("proj_out/bias", "raw"),
                "norm_out.weight": ("norm_out/scale", "raw"),
                "norm_out.bias": ("norm_out/bias", "raw"),
            }
            if rest in simple_rs:
                path, kind = simple_rs[rest]
                return ("resampler",) + apply_kind(path, kind, val)
            m = re.match(r"layers\.(\d+)\.(\d+)\.(.*)", rest)
            if m:
                n, sub, tail = m.groups()
                if sub == "0":          # PerceiverAttention
                    tgt = {"norm1.weight": (f"layers_{n}_attn/norm1/"
                                            "scale", "raw"),
                           "norm1.bias": (f"layers_{n}_attn/norm1/bias",
                                          "raw"),
                           "norm2.weight": (f"layers_{n}_attn/norm2/"
                                            "scale", "raw"),
                           "norm2.bias": (f"layers_{n}_attn/norm2/bias",
                                          "raw"),
                           "to_q.weight": (f"layers_{n}_attn/to_q/"
                                           "kernel", "linear"),
                           "to_kv.weight": (f"layers_{n}_attn/to_kv/"
                                            "kernel", "linear"),
                           "to_out.weight": (f"layers_{n}_attn/to_out/"
                                             "kernel", "linear")}.get(
                        tail)
                else:                   # LayerNorm+Linear+GELU+Linear
                    tgt = {"0.weight": (f"layers_{n}_norm/scale", "raw"),
                           "0.bias": (f"layers_{n}_norm/bias", "raw"),
                           "1.weight": (f"layers_{n}_fc1/kernel",
                                        "linear"),
                           "3.weight": (f"layers_{n}_fc2/kernel",
                                        "linear")}.get(tail)
                if tgt is None:
                    return None
                return ("resampler",) + apply_kind(tgt[0], tgt[1], val)
            return None

        m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)", key)
        if m:
            i, sub, rest = int(m.group(1)), m.group(2), m.group(3)
            level, j = (i - 1) // stride, (i - 1) % stride
            if rest.startswith("op."):
                tail = rest[len("op."):]
                path = f"down_{level}_downsample/conv"
                if tail == "weight":
                    return "unet", path + "/kernel", t_conv(val)
                return "unet", path + "/bias", val
            if sub == "0":
                out = _res_sub(rest, f"down_{level}_res_{j}")
            else:
                out = _attn_sub(rest, f"down_{level}_attn_{j}")
            if out is None:
                return None
            return ("unet",) + apply_kind(out[0], out[1], val)

        m = re.match(r"middle_block\.(\d+)\.(.*)", key)
        if m:
            sub, rest = m.group(1), m.group(2)
            if sub in ("0", "2"):
                out = _res_sub(rest, f"mid_res_{0 if sub == '0' else 1}")
            else:
                out = _attn_sub(rest, "mid_attn")
            if out is None:
                return None
            return ("unet",) + apply_kind(out[0], out[1], val)

        m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)", key)
        if m:
            i, sub, rest = int(m.group(1)), m.group(2), m.group(3)
            level, j = i // stride, i % stride
            if sub != "0" and rest.startswith("conv."):
                tail = rest[len("conv."):]
                path = f"up_{level}_upsample/conv"
                if tail == "weight":
                    return "unet", path + "/kernel", t_conv(val)
                return "unet", path + "/bias", val
            if sub == "0":
                out = _res_sub(rest, f"up_{level}_res_{j}")
            else:
                out = _attn_sub(rest, f"up_{level}_attn_{j}")
            if out is None:
                return None
            return ("unet",) + apply_kind(out[0], out[1], val)
        return None

    return rules


def convert_mv_unet(state_dict, num_res_blocks: int = 2):
    """→ {"unet": tree, "camera": tree, "resampler": tree} (resampler
    present only for ImageDream checkpoints)."""
    from ..convert import to_numpy
    rules = mv_unet_rules(num_res_blocks)
    trees = {"unet": {}, "camera": {}, "resampler": {}}
    unused = []
    for key, val in state_dict.items():
        out = rules(key, to_numpy(val))
        if out is None:
            unused.append(key)
            continue
        tree, path, arr = out
        set_path(trees[tree], path, arr)
    if unused:
        print(f"[mvdream.convert] {len(unused)} unconverted keys, "
              f"e.g. {unused[:4]}")
    if not trees["resampler"]:
        trees.pop("resampler")
    return trees


def config_from_mv_unet_json(raw: dict):
    """MultiViewUNetModel config.json → (UNetConfig kwargs, extras)."""
    from ..diffusion.unet import UNetConfig
    mult = raw.get("channel_mult", (1, 2, 4, 4))
    ch = raw.get("model_channels", 320)
    attn_res = set(raw.get("attention_resolutions", (4, 2, 1)))
    down, ds = [], 1
    for li in range(len(mult)):
        down.append("CrossAttnDownBlock2D" if ds in attn_res
                    else "DownBlock2D")
        if li != len(mult) - 1:
            ds *= 2
    up = ["CrossAttnUpBlock2D" if b == "CrossAttnDownBlock2D"
          else "UpBlock2D" for b in reversed(down)]
    nhc = raw.get("num_head_channels", 64)
    ahd = nhc if nhc and nhc > 0 else -max(raw.get("num_heads", 8), 1)
    cfg = UNetConfig(
        in_channels=raw.get("in_channels", 4),
        out_channels=raw.get("out_channels", 4),
        block_out_channels=tuple(ch * m for m in mult),
        layers_per_block=raw.get("num_res_blocks", 2),
        cross_attention_dim=raw.get("context_dim", 1024),
        attention_head_dim=ahd,
        down_block_types=tuple(down), up_block_types=tuple(up),
        ip_dim=raw.get("ip_dim", 0),
        ip_weight=raw.get("ip_weight", 1.0))
    return cfg


def load_mvdream_dir(cls, path: str, **cfg_overrides):
    import dataclasses
    import os

    from ..diffusion.convert import (encode_empty_prompt,
                                     load_clip_vision_dir, load_vae_dir)
    from ..loader import load_dir_state_dict, read_json_config

    unet_dir = os.path.join(path, "unet")
    raw = read_json_config(os.path.join(unet_dir, "config.json"))
    base_unet = config_from_mv_unet_json(raw)
    vae_cfg, vae_params, _ = load_vae_dir(os.path.join(path, "vae"))

    from .pipeline import MVDreamConfig
    num_views = 4
    kw = dict(
        unet=dataclasses.replace(base_unet, mv_views=num_views),
        vae=vae_cfg, num_views=num_views,
        prompt_dim=base_unet.cross_attention_dim,
        camera_dim=raw.get("camera_dim", 16) or 16,
        ip_dim=base_unet.ip_dim, ip_weight=base_unet.ip_weight,
        image_size=raw.get("image_size", 32)
        * 2 ** (len(vae_cfg.block_out_channels) - 1))
    kw.update(cfg_overrides)
    cfg = MVDreamConfig(**kw)

    sd = load_dir_state_dict(unet_dir)
    trees = convert_mv_unet(sd, cfg.unet.layers_per_block)
    trees["vae"] = vae_params
    pipe = cls(trees, cfg)

    te = os.path.join(path, "text_encoder")
    if os.path.isdir(te) and any(
            f.startswith(("model", "pytorch_model"))
            for f in os.listdir(te)):
        emb = encode_empty_prompt(te)
        pipe.default_prompt_embeds = emb
        pipe.default_negative_embeds = emb

    ie = os.path.join(path, "image_encoder")
    if os.path.isdir(ie) and any(
            f.startswith(("model", "pytorch_model"))
            for f in os.listdir(ie)):
        from ..clip import make_vision_hidden_conditioner
        vcfg, vparams, _ = load_clip_vision_dir(ie)
        pipe.set_vision_encoder(
            make_vision_hidden_conditioner(vparams, vcfg))
    return pipe


def load_ldm_checkpoint(cls, ckpt_path: str, **cfg_overrides):
    """Build an MVDreamPipeline from a single LDM checkpoint file — the
    CRM multiview stages (`pixel-diffusion.pth`/`ccm-diffusion.pth`,
    reference nodes.py:2188-2211 + Configs/CRM_configs/
    sd_v2_base_ipmv_zero_SNR.yaml): MultiViewUNetModel under
    `model.diffusion_model.`, LDM AutoencoderKL under
    `first_stage_model.`, OpenCLIP ViT-H (text + visual towers) under
    `cond_stage_model.model.`."""
    import dataclasses

    from ..convert import load_state_dict, to_numpy
    from ..diffusion.ldm_convert import (convert_open_clip_visual,
                                         encode_empty_prompt_openclip,
                                         ldm_vae_rules)
    from ..diffusion.vae import VAEConfig
    from ..convert import convert_with_rules
    from .pipeline import MVDreamConfig

    sd = {k: to_numpy(v) for k, v in load_state_dict(ckpt_path).items()}

    # --- UNet (+ camera MLP + IP resampler) -------------------------
    unet_sd = {k[len("model.diffusion_model."):]: v
               for k, v in sd.items()
               if k.startswith("model.diffusion_model.")}
    # infer in/out channels from the conv_in/conv_out kernels: the CRM
    # CCM stage is MultiViewUNetModelStage2 with in_channels=8
    # (sd_v2_base_ipmv_chin8_zero_snr.yaml — noisy latent ‖ stage-1
    # pixel latent), the pixel stage is 4
    cin = (int(unet_sd["input_blocks.0.0.weight"].shape[1])
           if "input_blocks.0.0.weight" in unet_sd else 4)
    cout = (int(unet_sd["out.2.weight"].shape[0])
            if "out.2.weight" in unet_sd else 4)
    raw = {"in_channels": cin, "out_channels": cout,
           "model_channels": 320,
           "attention_resolutions": [4, 2, 1], "num_res_blocks": 2,
           "channel_mult": [1, 2, 4, 4], "num_head_channels": 64,
           "context_dim": 1024, "camera_dim": 16}
    if any(k.startswith("image_embed") or "resampler" in k
           for k in unet_sd):
        raw["ip_dim"] = 16
    base_unet = config_from_mv_unet_json(raw)

    num_views = int(cfg_overrides.pop("num_views", 6))
    vae_cfg = VAEConfig()
    kw = dict(
        unet=dataclasses.replace(base_unet, mv_views=num_views),
        vae=vae_cfg, num_views=num_views,
        prompt_dim=base_unet.cross_attention_dim,
        camera_dim=16, ip_dim=base_unet.ip_dim,
        ip_weight=base_unet.ip_weight, image_size=256)
    kw.update(cfg_overrides)
    cfg = MVDreamConfig(**kw)

    trees = convert_mv_unet(unet_sd, cfg.unet.layers_per_block)
    trees["vae"] = convert_with_rules(
        sd, ldm_vae_rules(len(vae_cfg.block_out_channels)),
        strict=False)
    pipe = cls(trees, cfg)

    if any(k.startswith("cond_stage_model.model.transformer.")
           for k in sd):
        emb = encode_empty_prompt_openclip(sd)
        pipe.default_prompt_embeds = emb
        pipe.default_negative_embeds = emb
    if any(k.startswith("cond_stage_model.model.visual.") for k in sd):
        from ..clip import (CLIPVisionConfig,
                            make_vision_hidden_conditioner)
        vcfg = CLIPVisionConfig(hidden=1280, layers=32, heads=16,
                                mlp_dim=5120, image_size=224, patch=14,
                                act="gelu")
        vparams = convert_open_clip_visual(sd)
        pipe.set_vision_encoder(
            make_vision_hidden_conditioner(vparams, vcfg))
    return pipe


# ------------------------------------------------------------------ #
# LoRA / DoRA folding (CRM T2I V3)
# ------------------------------------------------------------------ #
def _get_path(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def fold_lora_checkpoint(pipe, lora_path: str, alpha: float | None = None,
                         verbose: bool = True) -> int:
    """Fold a peft-injected LoRA/DoRA checkpoint into `pipe` in place.

    The reference V3 loader (nodes.py:3629-3730) injects peft adapters
    on to_q/to_k/to_v/to_k_ip/to_v_ip/to_out.0 and loads
    `pixel-diffusion_{lora,dora}_*.pth` over the UNet with strict=False;
    at inference the adapter output is W·x + (α/r)·B·A·x — an exact
    weight-space fold W' = W + (α/r)·B·A (peft uses α=r here → scale 1),
    and for DoRA W' = m ⊙ row_normalize(W + B·A), so folding at load
    time reproduces the reference forward exactly with zero runtime
    overhead. Returns the number of folded projections.
    """
    from ..convert import load_state_dict, to_numpy

    sd = {k: to_numpy(v) for k, v in load_state_dict(lora_path).items()}
    # keys come from `unet.state_dict()` (wrapper holding
    # diffusion_model); tolerate the full-LDM prefix too
    stripped = {}
    for k, v in sd.items():
        for pre in ("model.diffusion_model.", "diffusion_model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        stripped[k] = v
    sd = stripped

    nrb = getattr(getattr(pipe, "cfg", None), "unet", None)
    rules = mv_unet_rules(nrb.layers_per_block if nrb is not None else 2)
    pat = re.compile(r"(.+)\.lora_A\.([^.]+)\.weight$")
    unet_tree = pipe.params["unet"] if "unet" in pipe.params \
        else pipe.params
    folded = 0
    for key in list(sd):
        m = pat.match(key)
        if not m:
            continue
        mod, adapter = m.groups()
        A = sd[key]                                        # [r, in]
        B = sd.get(f"{mod}.lora_B.{adapter}.weight")       # [out, r]
        if B is None:
            continue
        r = A.shape[0]
        scale = (alpha if alpha is not None else r) / r
        base = sd.get(f"{mod}.base_layer.weight")
        out = rules(f"{mod}.weight",
                    np.zeros((B.shape[0], A.shape[1]), np.float32))
        if out is None:
            if verbose:
                print(f"[mvdream.fold_lora] no rule for {mod}")
            continue
        tree_name, path, _ = out
        if tree_name != "unet":
            continue
        if base is None:
            # reconstruct the torch-layout base from the already
            # converted flax kernel ([in, out] → W = kernel.T)
            base = np.asarray(
                _get_path(unet_tree, path), np.float32).T
        W = base + scale * (B @ A)
        mag = sd.get(f"{mod}.lora_magnitude_vector.{adapter}.weight")
        if mag is not None:                                # DoRA
            norm = np.linalg.norm(W, axis=1)
            W = W * (mag.reshape(-1) / np.maximum(norm, 1e-8))[:, None]
        _, path2, arr = rules(f"{mod}.weight", W)
        node = unet_tree
        parts = path2.split("/")
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = arr
        # a fine-tuned bias may ride along under base_layer
        b = sd.get(f"{mod}.base_layer.bias")
        if b is not None:
            bias_path = path2.rsplit("/", 1)[0] + "/bias"
            bnode = unet_tree
            bparts = bias_path.split("/")
            for part in bparts[:-1]:
                bnode = bnode[part]
            bnode[bparts[-1]] = b
        folded += 1
    if verbose:
        print(f"[mvdream.fold_lora] folded {folded} projections "
              f"from {lora_path}")
    return folded
