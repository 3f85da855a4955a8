from .lrm import (CGLRMConfig, CharacterGenLRM,
                  CharacterGenLRMPipeline)
from .pipeline import CharacterGen2DConfig, CharacterGen2DPipeline

CharacterGenLRMConfig = CGLRMConfig

__all__ = ["CharacterGen2DConfig", "CharacterGen2DPipeline",
           "CGLRMConfig", "CharacterGenLRM", "CharacterGenLRMConfig",
           "CharacterGenLRMPipeline"]
