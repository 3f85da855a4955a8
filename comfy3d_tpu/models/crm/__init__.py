from .pipeline import CRMConfig, CRMReconPipeline

__all__ = ["CRMConfig", "CRMReconPipeline"]
