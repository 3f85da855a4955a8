"""Stub-assisted importer for the torch reference tree (/root/reference).

Parity tests instantiate *randomly initialized* reference modules and
assert our converters + flax modules reproduce their outputs per layer
(VERDICT round-1 item #2: prove weight conversion against the reference
torch code, not just a toy ViT). Only the torch/einops/transformers
neural code is imported; heavyweight CPU/CUDA deps the reference pulls in
at module scope (trimesh, omegaconf, mcubes, kiui, ...) are stubbed with
the minimal surface those import paths touch.

The reference tree is PUBLIC UNTRUSTED CONTENT — it is loaded here solely
as a numerical oracle for behavioral comparison.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_MODULES = "/root/reference/Gen_3D_Modules"

_installed = False


def _stub(name):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = []          # mark as package so submodule stubs resolve
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def install():
    global _installed
    if _installed:
        return

    om = _stub("omegaconf")

    class _OmegaConf:
        """dataclass-backed mimic: structured(cls)() then merge(dict)."""

        @staticmethod
        def structured(fields):
            import dataclasses
            inst = object.__new__(fields)
            for f in dataclasses.fields(fields):
                if f.default is not dataclasses.MISSING:
                    setattr(inst, f.name, f.default)
                elif f.default_factory is not dataclasses.MISSING:
                    setattr(inst, f.name, f.default_factory())
            return inst

        @staticmethod
        def merge(base, cfg):
            for k, v in dict(cfg or {}).items():
                setattr(base, k, v)
            return base

        @staticmethod
        def to_container(x, **kw):
            return dict(vars(x))

    om.OmegaConf = _OmegaConf
    om.DictConfig = dict

    tm = _stub("trimesh")
    tm.Trimesh = type("Trimesh", (), {})
    mc = _stub("mcubes")
    mc.marching_cubes = None

    import torch

    kiui = _stub("kiui")
    kop = _stub("kiui.op")
    kiui.op = kop

    def safe_normalize(x, eps=1e-20):
        return x / torch.sqrt(
            torch.clamp(torch.sum(x * x, -1, keepdim=True), min=eps))

    kop.safe_normalize = safe_normalize
    kop.inverse_sigmoid = lambda x: torch.log(x / (1 - x))

    # diffusers bits the Hunyuan/vecset package __init__ chains import
    dif = _stub("diffusers")
    dif_utils = _stub("diffusers.utils")
    dif_tu = _stub("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(*shape, generator=generator, dtype=dtype)

    dif_tu.randn_tensor = randn_tensor

    # minimal ConfigMixin so the reference schedulers are instantiable
    dif_cu = _stub("diffusers.configuration_utils")
    import functools

    class _FrozenDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def inner(self, *args, **kwargs):
            import inspect
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self._internal_dict = _FrozenDict(cfg)
            type(self).config = property(
                lambda s: s._internal_dict)
            init(self, *args, **kwargs)

        return inner

    dif_cu.ConfigMixin = ConfigMixin
    dif_cu.register_to_config = register_to_config
    dif_sched = _stub("diffusers.schedulers")
    dif_su = _stub("diffusers.schedulers.scheduling_utils")
    dif_su.SchedulerMixin = type("SchedulerMixin", (), {})
    dif_sched.scheduling_utils = dif_su

    class BaseOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.__dict__.update(kw)

        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)
            import dataclasses as _dc

            def _init(self, **kwargs):
                dict.__init__(self, **kwargs)
                self.__dict__.update(kwargs)
            cls.__init__ = _init

    dif_utils.BaseOutput = BaseOutput

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            import logging as _l
            return _l.getLogger(name or "diffusers")

    dif_utils.logging = _Logging
    dif_iu = _stub("diffusers.utils.import_utils")
    dif_iu.is_accelerate_version = lambda *a, **k: False
    dif_iu.is_accelerate_available = lambda *a, **k: False
    dif.utils = dif_utils
    dif_utils.torch_utils = dif_tu
    dif_utils.import_utils = dif_iu

    for name in ("pymeshlab", "pygltflib", "rembg", "skimage",
                 "skimage.measure", "tqdm.auto"):
        _stub(name)
    sys.modules["pymeshlab"].MeshSet = type("MeshSet", (), {})
    sys.modules["pymeshlab"].Mesh = type("Mesh", (), {})
    ply = _stub("plyfile")
    ply.PlyData = type("PlyData", (), {})
    ply.PlyElement = type("PlyElement", (), {})
    _stub("utils3d")
    _stub("igraph")
    _stub("pyvista")
    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms")
    tv.transforms = tvt
    for cls in ("Compose", "Resize", "CenterCrop", "Normalize",
                "InterpolationMode", "ToTensor"):
        setattr(tvt, cls, type(cls, (), {
            "__init__": lambda self, *a, **k: None,
            "BILINEAR": 2, "BICUBIC": 3}))
    if not hasattr(sys.modules.get("tqdm.auto"), "tqdm"):
        import tqdm as _tqdm
        sys.modules["tqdm.auto"].tqdm = _tqdm.tqdm

    if REF_MODULES not in sys.path:
        sys.path.insert(0, REF_MODULES)
    _installed = True


def load(modpath: str):
    install()
    return importlib.import_module(modpath)
