from .pipeline import YosoConfig, YosoNormalsPipeline

__all__ = ["YosoConfig", "YosoNormalsPipeline"]
