"""PartCrafter checkpoint (wgsxm/PartCrafter*) → flax loader.

The HF repo is diffusers-layout: `transformer/` (PartCrafterDiTModel —
the TripoSG DiT plus a part embedding,
partcrafter_transformer.py:326-447), `vae/` (TripoSGVAEModel layout)
and `image_encoder_dinov2/`. All rules are shared with
models/triposg/convert.py, including the head-major qkv repack
(PartCrafterAttnProcessor re-splits identically,
attention_processor.py:498-509).
"""

from __future__ import annotations

import os

import numpy as np

from .. import convert as C
from ..triposg.convert import (_repack_tree, convert_vae,
                               dit_rules as triposg_dit_rules)


def dit_rules():
    base = triposg_dit_rules()

    def rules(key: str, val: np.ndarray):
        if key == "part_embedding.weight":
            return "part_embedding", val
        return base(key, val)

    return rules


def convert_dit(state_dict, heads: int = 16) -> dict:
    tree = C.convert_with_rules(state_dict, dit_rules(), strict=True)
    return _repack_tree(tree, heads)


def load_partcrafter_dir(cls, path: str, **cfg_overrides):
    from ..dinov2 import Dinov2Config, convert_dinov2
    from ..loader import load_dir_state_dict, read_json_config
    from ..triposg.dit import TripoSGDiTConfig
    from ..triposg.vae import TripoSGVAEConfig
    from .pipeline import PartCrafterConfig, PartCrafterDiTConfig

    traw = read_json_config(os.path.join(path, "transformer",
                                         "config.json"))
    vraw = read_json_config(os.path.join(path, "vae", "config.json"))
    gids = traw.get("global_attn_block_ids")
    if gids is None:
        rng_ = traw.get("global_attn_block_id_range")
        gids = list(range(rng_[0], rng_[1] + 1)) if rng_ else []
    dit_cfg = PartCrafterDiTConfig(
        base=TripoSGDiTConfig(
            width=traw.get("width", 1024),
            in_channels=traw.get("in_channels", 64),
            num_layers=traw.get("num_layers", 21),
            heads=traw.get("num_attention_heads", 16),
            cross_attention_dim=traw.get("cross_attention_dim", 1024)),
        max_num_parts=traw.get("max_num_parts", 32),
        global_attn_block_ids=tuple(gids))
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
        pretrain_image_size=craw.get("image_size", 518))

    kw = dict(dit=dit_cfg, vae=vae_cfg, cond=cond_cfg,
              image_size=craw.get("image_size", 518))
    kw.update(cfg_overrides)
    cfg = PartCrafterConfig(**kw)

    params = {
        "dit": convert_dit(
            load_dir_state_dict(os.path.join(path, "transformer")),
            heads=cfg.dit.base.heads),
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
        print("[partcrafter.convert] no image_encoder_dinov2/ — random "
              "conditioner")
    return cls(params, cfg)
