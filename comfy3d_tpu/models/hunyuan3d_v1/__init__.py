from .mvd import Hunyuan3DV1MVDPipeline
from .pipeline import SVRMConfig, SVRMPipeline

__all__ = ["Hunyuan3DV1MVDPipeline", "SVRMConfig", "SVRMPipeline"]
