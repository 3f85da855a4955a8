from .paint import Hunyuan3DPaintPipeline, PaintConfig
from .pipeline import Hunyuan3DShapePipeline, Hunyuan3DShapeConfig

__all__ = ["Hunyuan3DPaintPipeline", "Hunyuan3DShapeConfig",
           "Hunyuan3DShapePipeline", "PaintConfig"]
