"""Node API layer: ComfyUI-compatible node classes + standalone executor."""

from .base import (NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS,
                   register)
from .graph import load_node_mappings, run_workflow

# populate the registry on package import (each module self-registers)
load_node_mappings()

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS",
           "register", "run_workflow", "load_node_mappings"]
