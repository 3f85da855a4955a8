from .pipeline import TripoSGConfig, TripoSGPipeline
from .dit import TripoSGDiT, TripoSGDiTConfig

__all__ = ["TripoSGConfig", "TripoSGPipeline", "TripoSGDiT",
           "TripoSGDiTConfig"]
