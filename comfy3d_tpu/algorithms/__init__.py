"""Per-asset optimization algorithms as jitted loops (MVs_Algorithms role)."""

import importlib as _importlib

_SUBMODULES = ("gs_trainer", "diff_mesh", "ngp", "sdf_fit", "gs_to_mesh")


def __getattr__(name):
    if name in _SUBMODULES:
        return _importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
