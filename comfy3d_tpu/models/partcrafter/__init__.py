from .pipeline import PartCrafterConfig, PartCrafterPipeline

__all__ = ["PartCrafterConfig", "PartCrafterPipeline"]
