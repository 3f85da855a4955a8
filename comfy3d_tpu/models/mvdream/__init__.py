from .pipeline import MVDreamConfig, MVDreamPipeline

__all__ = ["MVDreamConfig", "MVDreamPipeline"]
