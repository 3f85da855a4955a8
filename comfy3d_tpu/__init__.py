"""comfy3d_tpu — a TPU-native 3D asset-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ComfyUI-3D-Pack (reference: MrForExample/ComfyUI-3D-Pack): image/text→3D
model families, per-asset optimization algorithms (3DGS, differentiable
mesh fitting, FlexiCubes, Instant-NGP), a torch-free geometry core, and a
node-graph product surface compatible with the reference's workflow JSONs.

Layering (see SURVEY.md §7):
  core/        pytree containers (Mesh, GaussianSplat), cameras, SH, I/O
  ops/         device kernels: tile rasterizers, 3DGS splatting, hash grid,
               ray marching, marching cubes, FlexiCubes, texture baking
  algorithms/  jitted optimization loops (3DGS trainer, mesh fit, NGP fit)
  models/      flax model zoo behind a common Pipeline protocol
  parallel/    jax.sharding mesh policies, host-offload utilities
  nodes/       the ComfyUI-compatible node API + standalone graph executor
  native/      C++ host-side mesh ops (ctypes), for work XLA shouldn't do
"""

__version__ = "0.1.0"

# Lazy subpackage access: the reference eagerly imports every model family at
# module scope (reference __init__.py:50-63 / nodes.py:19-130), which SURVEY.md
# flags as a load-time hot spot. We import on attribute access instead.
import importlib as _importlib

_SUBMODULES = (
    "core", "ops", "algorithms", "models", "parallel", "nodes", "native",
)


# ComfyUI custom-node plug-in surface (reference __init__.py:50-66):
# ComfyUI imports NODE_CLASS_MAPPINGS / NODE_DISPLAY_NAME_MAPPINGS /
# WEB_DIRECTORY from the package root. The mappings resolve lazily via
# PEP 562 so `import comfy3d_tpu` stays light outside ComfyUI.
WEB_DIRECTORY = "./server/web"


def __getattr__(name):
    if name in _SUBMODULES:
        return _importlib.import_module(f".{name}", __name__)
    if name in ("NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"):
        graph = _importlib.import_module(".nodes.graph", __name__)
        base = _importlib.import_module(".nodes.base", __name__)
        graph.load_node_mappings()
        return getattr(base, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES)
                  + ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"])
