from .pipeline import (CharacterGen2DConfig, CharacterGen2DPipeline,
                       CharacterGenLRMConfig, CharacterGenLRMPipeline)

__all__ = ["CharacterGen2DConfig", "CharacterGen2DPipeline",
           "CharacterGenLRMConfig", "CharacterGenLRMPipeline"]
