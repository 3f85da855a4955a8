"""TRELLIS: structured 3D latents (sparse-voxel flow) family.

Counterpart of `Gen_3D_Modules/TRELLIS/trellis/` — sparse-structure flow
DiT + decoder, SLAT sparse flow UNet, SLAT gaussian/mesh decoders, flow
Euler samplers with guidance interval, and the image→3D pipeline on the
`ops.sparse` TPU backend.
"""

from .pipeline import TrellisImageTo3DPipeline, TrellisConfig

__all__ = ["TrellisImageTo3DPipeline", "TrellisConfig"]
