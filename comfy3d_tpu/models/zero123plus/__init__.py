from .pipeline import Zero123PlusConfig, Zero123PlusPipeline

__all__ = ["Zero123PlusConfig", "Zero123PlusPipeline"]
