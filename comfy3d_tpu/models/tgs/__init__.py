from .model import TGSConfig, TGSModel
from .pipeline import TGSPipeline

__all__ = ["TGSConfig", "TGSModel", "TGSPipeline"]
