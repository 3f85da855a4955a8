from .pipeline import PartCrafterConfig, PartCrafterPipeline, merge_parts

__all__ = ["PartCrafterConfig", "PartCrafterPipeline", "merge_parts"]
