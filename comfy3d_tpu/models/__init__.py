"""Model zoo (Gen_3D_Modules role): flax families behind Pipeline classes.

Families import lazily — the reference's eager module-scope imports of ~40
packages (`nodes.py:19-130`) are a documented load-time hot spot.
"""

import importlib as _importlib

_SUBMODULES = ("common", "convert", "diffusion", "triposr", "zero123plus",
               "instantmesh", "lgm", "mvdream")


def __getattr__(name):
    if name in _SUBMODULES:
        return _importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
