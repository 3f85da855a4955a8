"""Device kernels: rasterization, splatting, ray marching, surface extraction.

Lazy imports (model-family kernels are heavy; see package __init__ rationale).
"""

import importlib as _importlib

_SUBMODULES = (
    "binning", "rasterize", "gs_render", "mesh_render", "hashgrid",
    "raymarch", "tetra", "ssim", "knn", "texture",
    "sparse", "attention", "pallas",
)


def __getattr__(name):
    if name in _SUBMODULES:
        return _importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
