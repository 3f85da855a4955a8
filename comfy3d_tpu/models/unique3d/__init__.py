from .pipeline import (Unique3DImage2MVPipeline, Unique3DImage2NormalPipeline,
                       Unique3DMVConfig, Unique3DNormalConfig)

__all__ = ["Unique3DImage2MVPipeline", "Unique3DImage2NormalPipeline",
           "Unique3DMVConfig", "Unique3DNormalConfig"]
