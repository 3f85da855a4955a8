from .pipeline import TGSConfig, TGSPipeline

__all__ = ["TGSConfig", "TGSPipeline"]
