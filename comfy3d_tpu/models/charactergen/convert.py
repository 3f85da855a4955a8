"""CharacterGen checkpoint → flax converters.

Stage 2D (`zjpshadow/CharacterGen` HF layout, loaded by the reference
at `CharacterGen/character_inference.py:103-127` per
`Configs/CharacterGen_configs/Stage_2D_infer.yaml`):

* ``2D_Stage/models/checkpoint/pytorch_model.bin`` — the fine-tuned
  gen UNet (`UNetMV2DConditionModel`): standard diffusers UNet keys
  plus ``camera_embedding.{0,2}`` (Linear-SiLU-Linear on the flattened
  3×4 view matrix, `unet_mv2d_condition.py:424-428`) and a
  ``class_embedding`` projection head that inference never feeds
  (`class_labels` is None in every call — dropped, documented).
* ``pytorch_model_1.bin`` — PoseGuider. The reference LOADS it but
  passes ``pose_guider=None`` into the pipeline call
  (`character_inference.py:183`), so it is functionally dead at
  inference; we skip it for the same reason.
* ``pytorch_model_2.bin`` — the ref UNet (`UNetMV2DRefModel`),
  standard diffusers keys.
* ``2D_Stage/models/image_encoder`` — CLIPVisionModelWithProjection
  (the single image token conditioning, pipeline_tuneavideo.py:177).
* VAE / text encoder come from the SD-2.1 base
  (`Stage_2D_infer.yaml: pretrained_model_path`).

Stage 3D: see `lrm.py` / `load_charactergen_lrm` below.
"""

from __future__ import annotations

import os

import numpy as np

from ..convert import DROP, convert_with_rules, t_linear, to_numpy
from ..diffusion.convert import (unet_config_from_json, unet_rules,
                                 vae_config_from_json, vae_rules)

# SD-2.1 UNet layout — the base `from_pretrained_2d` reads its config
# from (character_inference.py:115); constants match
# stabilityai/stable-diffusion-2-1 unet/config.json
SD21_UNET_JSON = {
    "in_channels": 4, "out_channels": 4,
    "block_out_channels": [320, 640, 1280, 1280],
    "layers_per_block": 2, "cross_attention_dim": 1024,
    "attention_head_dim": [5, 10, 20, 20],
    "multiview_attention": True,
}


def charactergen_unet_rules(with_camera: bool = True):
    """Rules for the Stage-2D gen/ref UNet state dicts."""
    base = unet_rules()

    def rules(key: str, val: np.ndarray):
        if key.startswith("camera_embedding."):
            if not with_camera:
                return DROP
            idx = key.split(".")[1]
            name = {"0": "linear_1", "2": "linear_2"}[idx]
            kind = key.rsplit(".", 1)[1]
            return (f"{name}/{'kernel' if kind == 'weight' else 'bias'}",
                    t_linear(to_numpy(val)) if kind == "weight"
                    else to_numpy(val))
        if key.startswith("class_embedding."):
            # projection class embedding: class_labels is None in all
            # reference inference calls → never executed
            return DROP
        return base(key, val)

    return rules


def convert_charactergen_2d(gen_sd, ref_sd):
    """(gen state dict, ref state dict) → {"unet", "ref_unet",
    "camera"} param groups (vae/image encoder handled by the loader)."""
    gen = convert_with_rules(gen_sd, charactergen_unet_rules(),
                             strict=False)
    camera = gen.pop("linear_1", None)
    camera2 = gen.pop("linear_2", None)
    params = {"unet": gen}
    if camera is not None:
        params["camera"] = {"linear_1": camera, "linear_2": camera2}
    params["ref_unet"] = convert_with_rules(
        ref_sd, charactergen_unet_rules(with_camera=False),
        strict=False)
    return params


def load_charactergen_2d(ckpt_root: str, sd_base: str | None = None):
    """Load the Stage-2D checkpoint directory into a
    `CharacterGen2DPipeline`.

    `ckpt_root` = `Checkpoints/CharacterGen` (the zjpshadow snapshot);
    `sd_base` = optional local diffusers SD-2.1 directory for vae."""
    import dataclasses

    from ..loader import (load_dir_state_dict, on_cpu,
                          read_json_config, validate_tree)
    from .pipeline import CharacterGen2DConfig, CharacterGen2DPipeline

    ckpt_dir = os.path.join(ckpt_root, "2D_Stage", "models",
                            "checkpoint")
    from ..convert import load_state_dict
    gen_sd = load_state_dict(os.path.join(ckpt_dir,
                                          "pytorch_model.bin"))
    # with use_pose_guider=True the ref UNet is pytorch_model_2.bin
    # (pytorch_model_1.bin is the dead PoseGuider); fall back to _1
    ref_path = os.path.join(ckpt_dir, "pytorch_model_2.bin")
    if not os.path.exists(ref_path):
        ref_path = os.path.join(ckpt_dir, "pytorch_model_1.bin")
    ref_sd = load_state_dict(ref_path)
    params = convert_charactergen_2d(gen_sd, ref_sd)

    xdim = params["unet"]["down_0_attn_0"]["blocks_0"]["attn2"][
        "to_k"]["kernel"].shape[0]
    ucfg = unet_config_from_json(
        dict(SD21_UNET_JSON, cross_attention_dim=xdim, num_views=4))
    cfg = CharacterGen2DConfig(
        unet=ucfg, prompt_dim=xdim,
        camera_dim=params["camera"]["linear_1"]["kernel"].shape[0]
        if "camera" in params else 12)
    if sd_base and os.path.isdir(os.path.join(sd_base, "vae")):
        vraw = read_json_config(os.path.join(sd_base, "vae",
                                             "config.json"))
        cfg = dataclasses.replace(
            cfg, vae=vae_config_from_json(vraw),
            vae_scaling=vraw.get("scaling_factor", 0.18215))
        params["vae"] = convert_with_rules(
            load_dir_state_dict(os.path.join(sd_base, "vae")),
            vae_rules(), strict=False)

    with on_cpu():
        pipe = CharacterGen2DPipeline.init_random(cfg=cfg)
    for group, tree in params.items():
        if group in ("unet", "ref_unet", "vae"):
            validate_tree(tree, pipe.params[group],
                          name=f"charactergen2d.{group}")
        pipe.params[group] = tree

    enc_dir = os.path.join(ckpt_root, "2D_Stage", "models",
                           "image_encoder")
    if os.path.isdir(enc_dir):
        from ..clip import make_vision_conditioner
        from ..diffusion.convert import load_clip_vision_dir
        vcfg, vparams, _ = load_clip_vision_dir(enc_dir)
        pipe.set_image_encoder(make_vision_conditioner(vparams, vcfg))
    return pipe


# ------------------------------------------------------------------ #
# Stage 3D: MultiviewLRM (lrm.ckpt)
# ------------------------------------------------------------------ #
def convert_charactergen_lrm(sd):
    """`3D_Stage/models/lrm.ckpt` state dict → CharacterGenLRM params.

    Layout per `Stage_3D_infer.yaml` + the module sources cited in
    `lrm.py`'s docstring. The checkpoint's `decoder.heads.density` is
    ignored by the reference too (`weights_ignore_modules`)."""
    from ..dinov2 import dinov2_rules
    from ..convert import (convert_with_rules, t_conv_transpose,
                           transformer1d_rules)

    params = {}
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("lpips", "renderer.", "exporter."))}

    # image tokenizer: HF-layout dinov2 + per-layer camera Modulation
    # (the `image_tokenizer.modulations.*` ModuleList entries are
    # aliases of the per-layer registrations — dinov2_rules skips them)
    dino = convert_with_rules(
        {k: v for k, v in sd.items()
         if k.startswith("image_tokenizer.")},
        dinov2_rules("image_tokenizer.model."), strict=False)
    params["image_tokenizer"] = dino

    if "camera_embedder.linear.weight" in sd:
        params["camera_embedder"] = {
            "kernel": t_linear(to_numpy(
                sd["camera_embedder.linear.weight"])),
            "bias": to_numpy(sd["camera_embedder.linear.bias"])}

    if "tokenizer.embeddings" in sd:
        emb = to_numpy(sd["tokenizer.embeddings"])   # [3, C, P, P]
        params["triplane_tokens"] = np.transpose(emb, (0, 2, 3, 1))

    bb = convert_with_rules(
        {k: v for k, v in sd.items() if k.startswith("backbone.")},
        transformer1d_rules("backbone.", ""), strict=False)
    if bb:
        params["backbone"] = bb

    if "post_processor.upsample.weight" in sd:
        params["post_processor"] = {
            "kernel": t_conv_transpose(to_numpy(
                sd["post_processor.upsample.weight"])),
            "bias": to_numpy(sd["post_processor.upsample.bias"])}

    # decoder: shared Sequential (even indices = Linears) + heads
    i = 0
    while f"decoder.shared_layers.{2 * i}.weight" in sd:
        params[f"shared_{i}"] = {
            "kernel": t_linear(to_numpy(
                sd[f"decoder.shared_layers.{2 * i}.weight"])),
            "bias": to_numpy(sd[f"decoder.shared_layers.{2 * i}.bias"])}
        i += 1
    for head in ("sdf", "features"):
        j = 0
        while f"decoder.heads.{head}.{2 * (j + 1)}.weight" in sd:
            params[f"head_{head}_{j}"] = {
                "kernel": t_linear(to_numpy(
                    sd[f"decoder.heads.{head}.{2 * j}.weight"])),
                "bias": to_numpy(
                    sd[f"decoder.heads.{head}.{2 * j}.bias"])}
            j += 1
        last = 2 * j
        if f"decoder.heads.{head}.{last}.weight" in sd:
            params[f"head_{head}_out"] = {
                "kernel": t_linear(to_numpy(
                    sd[f"decoder.heads.{head}.{last}.weight"])),
                "bias": to_numpy(sd[f"decoder.heads.{head}.{last}.bias"])}
    return params


def load_charactergen_lrm(ckpt_root: str):
    """Load `3D_Stage/models/lrm.ckpt` into a
    `CharacterGenLRMPipeline` (reference `Inference3D_API.__init__`,
    character_inference.py:194-199)."""
    from ..convert import load_state_dict
    from ..loader import on_cpu, validate_tree
    from .lrm import CGLRMConfig, CharacterGenLRM, \
        CharacterGenLRMPipeline

    sd = load_state_dict(os.path.join(ckpt_root, "3D_Stage", "models",
                                      "lrm.ckpt"))
    params = convert_charactergen_lrm(sd)

    from ..dinov2 import Dinov2Config
    import dataclasses
    hidden = params["image_tokenizer"]["patch_embed"]["kernel"] \
        .shape[-1]
    n_layers = sum(1 for k in params["image_tokenizer"]
                   if k.startswith("layer_"))
    cam_out = params["camera_embedder"]["kernel"].shape[1]
    inner = params["backbone"]["proj_in"]["kernel"].shape[1]
    cfg = CGLRMConfig(
        cam_dim=params["camera_embedder"]["kernel"].shape[0],
        cam_embed_dim=cam_out,
        plane_size=params["triplane_tokens"].shape[1],
        num_channels=params["triplane_tokens"].shape[-1],
        backbone_layers=sum(1 for k in params["backbone"]
                            if k.startswith("blocks_")),
        backbone_heads=max(1, inner // 64),
        backbone_head_dim=min(64, inner),
        triplane_dim=params["post_processor"]["kernel"].shape[-1],
        n_neurons=params["shared_0"]["kernel"].shape[1],
        n_hidden_shared=sum(1 for k in params
                            if k.startswith("shared_")),
        context_dim=hidden,
        dino=dataclasses.replace(
            CGLRMConfig().dino, hidden=hidden, layers=n_layers,
            heads=max(1, hidden // 64), modulation_dim=cam_out))

    with on_cpu():
        pipe = CharacterGenLRMPipeline.init_random(cfg=cfg)
    validate_tree(params, pipe.params, name="charactergen_lrm")
    pipe.params = params
    return pipe
