"""Vecset (vector-set / "3DShape2VecSet") substrate.

One shared latent-set stack — FourierEmbedder, packed-per-head attention
blocks, ShapeVAE with cross-attention volume decoder, flow-matching DiT,
and the flow Euler scheduler — that covers the reference's Hunyuan3D
V2/2.1 shape generation (`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/`)
and the TripoSG / PartCrafter / Craftsman family of vecset pipelines
(SURVEY.md §2.4).
"""

from .blocks import (FourierConfig, fourier_embed, VecTransformer,
                     CrossAttentionDecoder)
from .vae import ShapeVAE, ShapeVAEConfig
from .dit import Hunyuan3DDiT, DiTConfig
from .scheduler import flow_match_sigmas, flow_match_step

__all__ = ["FourierConfig", "fourier_embed", "VecTransformer",
           "CrossAttentionDecoder", "ShapeVAE", "ShapeVAEConfig",
           "Hunyuan3DDiT", "DiTConfig", "flow_match_sigmas",
           "flow_match_step"]
