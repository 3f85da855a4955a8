from .pipeline import SF3DConfig, SF3DPipeline

__all__ = ["SF3DConfig", "SF3DPipeline"]
