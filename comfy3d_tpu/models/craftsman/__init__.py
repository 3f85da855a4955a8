from .pipeline import CraftsmanConfig, CraftsmanPipeline

__all__ = ["CraftsmanConfig", "CraftsmanPipeline"]
