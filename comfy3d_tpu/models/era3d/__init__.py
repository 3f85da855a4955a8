from .pipeline import Era3DConfig, Era3DPipeline

__all__ = ["Era3DConfig", "Era3DPipeline"]
