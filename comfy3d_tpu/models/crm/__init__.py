from .pipeline import CRMConfig, CRMModel, CRMReconPipeline

__all__ = ["CRMConfig", "CRMModel", "CRMReconPipeline"]
