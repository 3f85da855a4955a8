from .pipeline import Hunyuan3DShapePipeline, Hunyuan3DShapeConfig

__all__ = ["Hunyuan3DShapePipeline", "Hunyuan3DShapeConfig"]
