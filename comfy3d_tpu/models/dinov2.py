"""DINOv2 vision encoder (flax) + converter from HF torch checkpoints.

Conditioner for the vecset families (Hunyuan3D V2/2.1 `DinoImageEncoder`,
`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/models/conditioner.py:127`),
TRELLIS DINOv2 feature extraction
(`TRELLIS/trellis/pipelines/trellis_image_to_3d.py:71-145`), TripoSG and
StableFast3D. Mirrors `transformers.Dinov2Model`: patch-14 conv embed,
cls token, bicubic-interpolated position embeddings, pre-LN blocks with
LayerScale, gelu-MLP or SwiGLU FFN (giant), final LayerNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import convert as C


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    hidden: int = 1024               # large; giant = 1536
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    patch: int = 14
    pretrain_image_size: int = 518   # → 37² patches
    use_swiglu: bool = False         # giant: True
    layer_norm_eps: float = 1e-6
    num_registers: int = 0           # dinov2-with-registers variants
    return_prenorm: bool = False     # TRELLIS reads x_prenorm
    modulation_dim: int = 0          # >0: SF3D-style adaLN modulation
                                     # (sf3d/models/tokenizers/image.py:35-51)

    @property
    def swiglu_hidden(self) -> int:
        h = int(self.hidden * self.mlp_ratio)
        return (int(h * 2 / 3) + 7) // 8 * 8


def _modulate(x, cond, dense):
    """SF3D `Modulation` (sf3d/models/transformers/attention.py:5-31),
    single_layer=True: emb = Dense(silu(cond)); x·(1+scale)+shift."""
    emb = dense(nn.silu(cond))
    scale, shift = jnp.split(emb, 2, axis=-1)
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class Dinov2Layer(nn.Module):
    cfg: Dinov2Config

    @nn.compact
    def __call__(self, x, mod_cond=None):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x)
        if c.modulation_dim:
            h = _modulate(h, mod_cond,
                          nn.Dense(2 * c.hidden, name="norm1_mod"))
        hd = c.hidden // c.heads
        b, t, _ = x.shape
        q = nn.Dense(c.hidden, name="query")(h)
        k = nn.Dense(c.hidden, name="key")(h)
        v = nn.Dense(c.hidden, name="value")(h)
        rs = lambda a: a.reshape(b, t, c.heads, hd)
        attn = jax.nn.dot_product_attention(rs(q), rs(k), rs(v))
        attn = nn.Dense(c.hidden, name="attn_out")(
            attn.reshape(b, t, c.hidden))
        ls1 = self.param("layer_scale1", nn.initializers.ones, (c.hidden,))
        x = x + attn * ls1

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x)
        if c.modulation_dim:
            h = _modulate(h, mod_cond,
                          nn.Dense(2 * c.hidden, name="norm2_mod"))
        if c.use_swiglu:
            w = nn.Dense(2 * c.swiglu_hidden, name="weights_in")(h)
            x1, x2 = jnp.split(w, 2, axis=-1)
            h = nn.Dense(c.hidden, name="weights_out")(nn.silu(x1) * x2)
        else:
            h = nn.Dense(c.hidden * c.mlp_ratio, name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(c.hidden, name="fc2")(h)
        ls2 = self.param("layer_scale2", nn.initializers.ones, (c.hidden,))
        return x + h * ls2


class Dinov2(nn.Module):
    cfg: Dinov2Config = Dinov2Config()

    @nn.compact
    def __call__(self, images, mod_cond=None):
        """images [B, H, W, 3] already normalized → tokens [B, 1+N, C].
        `mod_cond` [B, modulation_dim] drives per-layer adaLN when
        cfg.modulation_dim > 0 (SF3D image tokenizer)."""
        c = self.cfg
        b, h, w, _ = images.shape
        gh, gw = h // c.patch, w // c.patch
        x = nn.Conv(c.hidden, (c.patch, c.patch),
                    strides=(c.patch, c.patch), padding="VALID",
                    name="patch_embed")(images)
        x = x.reshape(b, gh * gw, c.hidden)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.hidden))
        grid0 = c.pretrain_image_size // c.patch
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid0 ** 2 + 1, c.hidden))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (grid0, grid0):
            grid = pos_patch.reshape(1, grid0, grid0, c.hidden)
            grid = jax.image.resize(grid, (1, gh, gw, c.hidden), "bicubic")
            pos_patch = grid.reshape(1, gh * gw, c.hidden)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden)), x], axis=1)
        x = x + jnp.concatenate([pos_cls, pos_patch], axis=1)
        if c.num_registers:
            # registers are appended after the positional add (official
            # dinov2 vision_transformer.py ordering: cls, reg, patches)
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, c.num_registers, c.hidden))
            x = jnp.concatenate(
                [x[:, :1], jnp.broadcast_to(
                    reg, (b, c.num_registers, c.hidden)), x[:, 1:]],
                axis=1)
        for i in range(c.layers):
            x = Dinov2Layer(c, name=f"layer_{i}")(x, mod_cond)
        if c.return_prenorm:
            return x
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_final")(x)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def dinov2_rules(prefix: str = "") -> Callable:
    """`transformers.Dinov2Model` state dict → Dinov2 flax paths."""

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
        if key == e + "mask_token":
            return None
        if key == e + "patch_embeddings.projection.weight":
            return "patch_embed/kernel", C.t_conv(val)
        if key == e + "patch_embeddings.projection.bias":
            return "patch_embed/bias", val
        if key == "layernorm.weight":
            return "ln_final/scale", val
        if key == "layernorm.bias":
            return "ln_final/bias", val
        if not key.startswith("encoder.layer."):
            return None
        idx, sub = key[len("encoder.layer."):].split(".", 1)
        base = f"layer_{idx}/"
        m = {
            "norm1.weight": ("norm1/scale", None),
            "norm1.bias": ("norm1/bias", None),
            "norm2.weight": ("norm2/scale", None),
            "norm2.bias": ("norm2/bias", None),
            "attention.attention.query.weight": ("query/kernel",
                                                 C.t_linear),
            "attention.attention.query.bias": ("query/bias", None),
            "attention.attention.key.weight": ("key/kernel", C.t_linear),
            "attention.attention.key.bias": ("key/bias", None),
            "attention.attention.value.weight": ("value/kernel",
                                                 C.t_linear),
            "attention.attention.value.bias": ("value/bias", None),
            "attention.output.dense.weight": ("attn_out/kernel",
                                              C.t_linear),
            "attention.output.dense.bias": ("attn_out/bias", None),
            "layer_scale1.lambda1": ("layer_scale1", None),
            "layer_scale2.lambda1": ("layer_scale2", None),
            "mlp.fc1.weight": ("fc1/kernel", C.t_linear),
            "mlp.fc1.bias": ("fc1/bias", None),
            "mlp.fc2.weight": ("fc2/kernel", C.t_linear),
            "mlp.fc2.bias": ("fc2/bias", None),
            "mlp.weights_in.weight": ("weights_in/kernel", C.t_linear),
            "mlp.weights_in.bias": ("weights_in/bias", None),
            "mlp.weights_out.weight": ("weights_out/kernel", C.t_linear),
            "mlp.weights_out.bias": ("weights_out/bias", None),
            # SF3D per-layer adaLN modulation (registered on the layer;
            # the duplicate `modulations.*` aliases are skipped)
            "norm1_modulation.linear2.weight": ("norm1_mod/kernel",
                                                C.t_linear),
            "norm1_modulation.linear2.bias": ("norm1_mod/bias", None),
            "norm2_modulation.linear2.weight": ("norm2_mod/kernel",
                                                C.t_linear),
            "norm2_modulation.linear2.bias": ("norm2_mod/bias", None),
        }
        if sub in m:
            path, fn = m[sub]
            return base + path, (fn(val) if fn else val)
        return None

    return rules


def convert_dinov2(state_dict, prefix: str = "") -> dict:
    return C.convert_with_rules(state_dict, dinov2_rules(prefix),
                                strict=False)
