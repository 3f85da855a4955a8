from .pipeline import (MVAdapterConfig, MVAdapterIG2MVPipeline,
                       MVAdapterTG2MVPipeline, render_control_images)

__all__ = ["MVAdapterConfig", "MVAdapterIG2MVPipeline",
           "MVAdapterTG2MVPipeline", "render_control_images"]
