from .pipeline import Wonder3DConfig, Wonder3DPipeline

__all__ = ["Wonder3DConfig", "Wonder3DPipeline"]
