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
            if not isinstance(fields, type):
                return fields              # already an instance
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
    ndr = _stub("nvdiffrast")
    ndr_t = _stub("nvdiffrast.torch")
    ndr.torch = ndr_t
    ndr_t.RasterizeCudaContext = type("RasterizeCudaContext", (), {})
    ndr_t.rasterize = ndr_t.interpolate = ndr_t.texture = None
    xa = _stub("xatlas")
    xa.parametrize = None
    fcm = _stub("FlexiCubes.flexicubes")
    fcm.FlexiCubes = type("FlexiCubes", (), {})
    _stub("FlexiCubes").flexicubes = fcm
    mpm = _stub("mesh_processer.mesh")
    mpm.Mesh = type("Mesh", (), {})
    _stub("mesh_processer").mesh = mpm
    pr = _stub("pkg_resources")
    pr.packaging = None
    pr.parse_version = lambda v: v

    import torch

    kiui = _stub("kiui")
    kop = _stub("kiui.op")
    kiui.op = kop

    def safe_normalize(x, eps=1e-20):
        return x / torch.sqrt(
            torch.clamp(torch.sum(x * x, -1, keepdim=True), min=eps))

    kop.safe_normalize = safe_normalize
    kop.inverse_sigmoid = lambda x: torch.log(x / (1 - x))

    kcam = _stub("kiui.cam")
    kiui.cam = kcam

    def orbit_camera(elevation, azimuth, radius=1.0, **kw):
        import numpy as _np
        e, a = _np.deg2rad(elevation), _np.deg2rad(azimuth)
        pos = _np.array([radius * _np.cos(e) * _np.sin(a),
                         -radius * _np.sin(e),
                         radius * _np.cos(e) * _np.cos(a)], _np.float32)
        fwd = pos / _np.linalg.norm(pos)
        up = _np.array([0, 1, 0], _np.float32)
        right = _np.cross(up, fwd)
        right /= _np.linalg.norm(right)
        up2 = _np.cross(fwd, right)
        T = _np.eye(4, dtype=_np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, up2, fwd, pos
        return T

    kcam.orbit_camera = orbit_camera

    # diffusers.models.modeling_utils.ModelMixin (mv_unet.py base class)
    dif_models = _stub("diffusers.models")
    dif_mu = _stub("diffusers.models.modeling_utils")

    class ModelMixin(torch.nn.Module):
        pass

    dif_mu.ModelMixin = ModelMixin
    dif_models.modeling_utils = dif_mu

    # diffusers bits the Hunyuan/vecset package __init__ chains import
    dif = _stub("diffusers")
    # symbols CRM's module scope references but our tests never call
    dif.UNet2DModel = type("UNet2DModel", (), {})
    dif.DDIMScheduler = type("DDIMScheduler", (), {})
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
    dif_iu.is_torch_npu_available = lambda *a, **k: False
    dif_iu.is_xformers_available = lambda *a, **k: False
    dif.utils = dif_utils
    dif_utils.torch_utils = dif_tu
    dif_utils.import_utils = dif_iu

    # ---- functional diffusers pieces (numerics-exact re-creations of
    # the handful of modules TripoSG/PartCrafter instantiate) ----
    dif_utils.USE_PEFT_BACKEND = False
    dif_utils.is_torch_version = lambda *a, **k: True
    dif_utils.scale_lora_layers = lambda *a, **k: None
    dif_utils.unscale_lora_layers = lambda *a, **k: None
    dif_utils.deprecate = lambda *a, **k: None
    dif_tu.maybe_allow_in_graph = lambda cls: cls
    dif_tu.is_torch_version = lambda *a, **k: True
    dif_au = _stub("diffusers.utils.accelerate_utils")
    dif_au.apply_forward_hook = lambda fn: fn
    dif_loaders = _stub("diffusers.loaders")
    dif_loaders.PeftAdapterMixin = type("PeftAdapterMixin", (), {})
    dif_loaders.FromOriginalModelMixin = type(
        "FromOriginalModelMixin", (), {})

    import torch.nn.functional as _F

    class _FP32LayerNorm(torch.nn.LayerNorm):
        def forward(self, x):
            return _F.layer_norm(
                x.float(), self.normalized_shape,
                None if self.weight is None else self.weight.float(),
                None if self.bias is None else self.bias.float(),
                self.eps).to(x.dtype)

    class _RMSNorm(torch.nn.Module):
        def __init__(self, dim, eps=1e-6, elementwise_affine=True,
                     bias=False):
            super().__init__()
            self.eps = eps
            self.weight = torch.nn.Parameter(torch.ones(dim)) \
                if elementwise_affine else None

        def forward(self, x):
            var = x.float().pow(2).mean(-1, keepdim=True)
            x = (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype)
            return x if self.weight is None else x * self.weight

    dif_norm = _stub("diffusers.models.normalization")
    dif_norm.FP32LayerNorm = _FP32LayerNorm
    dif_norm.LayerNorm = torch.nn.LayerNorm
    dif_norm.RMSNorm = _RMSNorm
    dif_norm.AdaLayerNormContinuous = type("AdaLayerNormContinuous",
                                           (torch.nn.Module,), {})

    class _GELUProj(torch.nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = torch.nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x):
            return _F.gelu(self.proj(x), approximate=self.approximate)

    class _FeedForward(torch.nn.Module):
        """diffusers.models.attention.FeedForward, activation 'gelu'."""

        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", final_dropout=False,
                     inner_dim=None, bias=True):
            super().__init__()
            inner_dim = inner_dim or int(dim * mult)
            dim_out = dim_out or dim
            assert activation_fn in ("gelu", "gelu-approximate"), \
                activation_fn
            approx = "tanh" if activation_fn == "gelu-approximate" \
                else "none"
            self.net = torch.nn.ModuleList([
                _GELUProj(dim, inner_dim, approx, bias),
                torch.nn.Dropout(dropout),
                torch.nn.Linear(inner_dim, dim_out, bias=bias)])

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    dif_attn_mod = _stub("diffusers.models.attention")
    dif_attn_mod.FeedForward = _FeedForward

    class _Attention(torch.nn.Module):
        """diffusers.models.attention_processor.Attention — only the
        surface TripoSG-family processors touch."""

        def __init__(self, query_dim, cross_attention_dim=None,
                     heads=8, dim_head=64, dropout=0.0, bias=False,
                     upcast_attention=False, upcast_softmax=False,
                     cross_attention_norm=None, qk_norm=None, eps=1e-5,
                     rescale_output_factor=1.0, residual_connection=False,
                     out_bias=True, processor=None, out_dim=None,
                     **unused):
            super().__init__()
            inner = (out_dim if out_dim is not None
                     else dim_head * heads)
            self.heads = heads
            self.is_cross_attention = cross_attention_dim is not None
            kv_dim = cross_attention_dim or query_dim
            self.to_q = torch.nn.Linear(query_dim, inner, bias=bias)
            self.to_k = torch.nn.Linear(kv_dim, inner, bias=bias)
            self.to_v = torch.nn.Linear(kv_dim, inner, bias=bias)
            self.to_out = torch.nn.ModuleList(
                [torch.nn.Linear(inner, query_dim, bias=out_bias),
                 torch.nn.Dropout(dropout)])
            if qk_norm == "rms_norm":
                self.norm_q = _RMSNorm(dim_head, eps=eps)
                self.norm_k = _RMSNorm(dim_head, eps=eps)
            else:
                self.norm_q = self.norm_k = None
            self.norm_cross = None
            if cross_attention_norm == "layer_norm":
                self.norm_cross = torch.nn.LayerNorm(kv_dim)
            self.spatial_norm = None
            self.group_norm = None
            self.residual_connection = residual_connection
            self.rescale_output_factor = rescale_output_factor
            self.processor = processor

        def norm_encoder_hidden_states(self, ehs):
            return self.norm_cross(ehs)

        def get_processor(self, *a, **k):
            return self.processor

        def set_processor(self, processor):
            self.processor = processor

        def forward(self, hidden_states, encoder_hidden_states=None,
                    attention_mask=None, **kwargs):
            return self.processor(
                self, hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask, **kwargs)

    dif_ap = _stub("diffusers.models.attention_processor")
    dif_ap.Attention = _Attention
    dif_ap.AttentionProcessor = object
    dif_models.attention = dif_attn_mod
    dif_models.attention_processor = dif_ap
    dif_models.normalization = dif_norm

    def _get_timestep_embedding(timesteps, embedding_dim,
                                flip_sin_to_cos=False,
                                downscale_freq_shift=0.0, scale=1.0,
                                max_period=10000):
        import math
        half = embedding_dim // 2
        exponent = -math.log(max_period) * torch.arange(
            half, dtype=torch.float32) / (half - downscale_freq_shift)
        emb = timesteps.float()[:, None] * exponent.exp()[None]
        emb = scale * emb
        emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
        if flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb

    class _Timesteps(torch.nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos,
                     downscale_freq_shift, scale=1.0):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift
            self.scale = scale

        def forward(self, t):
            return _get_timestep_embedding(
                t, self.num_channels, self.flip_sin_to_cos,
                self.downscale_freq_shift, self.scale)

    class _TimestepEmbedding(torch.nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None,
                     sample_proj_bias=True):
            super().__init__()
            self.linear_1 = torch.nn.Linear(in_channels, time_embed_dim,
                                            sample_proj_bias)
            self.act = {"silu": _F.silu,
                        "gelu": _F.gelu,
                        "mish": _F.mish}[act_fn]
            self.linear_2 = torch.nn.Linear(
                time_embed_dim, out_dim or time_embed_dim,
                sample_proj_bias)

        def forward(self, sample):
            return self.linear_2(self.act(self.linear_1(sample)))

    dif_emb = _stub("diffusers.models.embeddings")
    dif_emb.Timesteps = _Timesteps
    dif_emb.TimestepEmbedding = _TimestepEmbedding
    dif_emb.GaussianFourierProjection = type(
        "GaussianFourierProjection", (torch.nn.Module,), {})
    dif_emb.get_timestep_embedding = _get_timestep_embedding
    dif_emb.apply_rotary_emb = None
    dif_models.embeddings = dif_emb

    dif_mo = _stub("diffusers.models.modeling_outputs")
    dif_mo.AutoencoderKLOutput = type(
        "AutoencoderKLOutput", (BaseOutput,), {})
    dif_ae = _stub("diffusers.models.autoencoders")
    dif_ae_vae = _stub("diffusers.models.autoencoders.vae")
    dif_ae_vae.DecoderOutput = type("DecoderOutput", (BaseOutput,), {})
    dif_ae.vae = dif_ae_vae

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
    p3d_ops = _stub("pytorch3d.ops")
    p3d_ops.sample_farthest_points = None
    _stub("pytorch3d").ops = p3d_ops
    _stub("torch_cluster").fps = None
    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms")
    tv.transforms = tvt
    for cls in ("Compose", "Resize", "CenterCrop", "Normalize",
                "InterpolationMode", "ToTensor"):
        setattr(tvt, cls, type(cls, (), {
            "__init__": lambda self, *a, **k: None,
            "BILINEAR": 2, "BICUBIC": 3}))
    tvtt = _stub("torchvision.transforms.transforms")
    tvtt._interpolation_modes_from_int = lambda i: i
    tvt.transforms = tvtt
    if not hasattr(sys.modules.get("tqdm.auto"), "tqdm"):
        import tqdm as _tqdm
        sys.modules["tqdm.auto"].tqdm = _tqdm.tqdm

    # modules that only `import PIL` rely on PIL.Image being pre-loaded
    import PIL.Image  # noqa: F401

    if REF_MODULES not in sys.path:
        sys.path.insert(0, REF_MODULES)
    _installed = True


def load(modpath: str):
    install()
    return importlib.import_module(modpath)


_craftsman_installed = False


def install_craftsman():
    """Extra stubs for the craftsman package chain (pytorch_lightning,
    omegaconf resolver, torchvision interpolation helper)."""
    global _craftsman_installed
    if _craftsman_installed:
        return
    install()
    pl = _stub("pytorch_lightning")
    pl.LightningModule = type("LightningModule", (), {})
    pl.LightningDataModule = object
    pl.Callback = object
    pl.Trainer = object
    _stub("pytorch_lightning.utilities")
    rz = _stub("pytorch_lightning.utilities.rank_zero")
    rz.rank_zero_debug = lambda *a, **k: None
    rz.rank_zero_info = lambda *a, **k: None
    rz.rank_zero_only = lambda f: f
    cb = _stub("pytorch_lightning.callbacks")
    cb.Callback = object
    lg = _stub("pytorch_lightning.loggers")
    lg.WandbLogger = object
    import omegaconf
    if not hasattr(omegaconf.OmegaConf, "register_new_resolver"):
        omegaconf.OmegaConf.register_new_resolver = staticmethod(
            lambda *a, **k: None)
    dif = sys.modules["diffusers"]
    for sched in ("DDPMScheduler", "DDIMScheduler",
                  "UniPCMultistepScheduler", "KarrasVeScheduler",
                  "DPMSolverMultistepScheduler"):
        if not hasattr(dif, sched):
            setattr(dif, sched, type(sched, (), {}))
    comfy = _stub("comfy")
    cu = _stub("comfy.utils")

    class _ProgressBar:
        def __init__(self, *a):
            pass

        def update_absolute(self, *a):
            pass

    cu.ProgressBar = _ProgressBar
    comfy.utils = cu
    _craftsman_installed = True


_sparse_installed = False


def install_trellis_sparse():
    """Functional CPU stubs for spconv + xformers so the reference
    TRELLIS sparse modules (SLat flow / decoders) run as numeric
    oracles. SubMConv3d follows spconv 2.x semantics: weight layout
    KRSC [out, k0, k1, k2, in] over the (x, y, z) index order, computed
    here by densify → torch conv3d → gather (submanifold conv equals
    the dense conv at active sites because inactive cells hold zeros).
    """
    global _sparse_installed
    if _sparse_installed:
        return
    import os
    os.environ.setdefault("ATTN_BACKEND", "xformers")
    os.environ.setdefault("SPARSE_BACKEND", "spconv")
    os.environ.setdefault("SPCONV_ALGO", "auto")
    install()
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    comfy = _stub("comfy")
    cu = _stub("comfy.utils")

    class ProgressBar:
        def __init__(self, *a):
            pass

        def update_absolute(self, *a):
            pass

    cu.ProgressBar = ProgressBar
    comfy.utils = cu
    ed = _stub("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    if not hasattr(ed, "EasyDict"):
        ed.EasyDict = EasyDict

    spconv = _stub("spconv")
    sppt = _stub("spconv.pytorch")
    spconv.pytorch = sppt

    class ConvAlgo:
        Native = "native"
        MaskImplicitGemm = "implicit_gemm"

    class SparseConvTensor:
        def __init__(self, features, indices, spatial_shape, batch_size,
                     grid=None, voxel_num=None, indice_dict=None):
            self.features = features          # [N, C]
            self.indices = indices            # [N, 4] int (b, x, y, z)
            self.spatial_shape = list(spatial_shape)
            self.batch_size = batch_size
            self.grid = grid
            self.voxel_num = voxel_num
            self.indice_dict = indice_dict or {}
            self.benchmark = False
            self.benchmark_record = {}
            self.thrust_allocator = None
            self._timer = None
            self.force_algo = None
            self.int8_scale = None

        @property
        def _features(self):
            return self.features

        @_features.setter
        def _features(self, v):
            self.features = v

        def replace_feature(self, feats):
            return SparseConvTensor(feats, self.indices,
                                    self.spatial_shape, self.batch_size)

        def dense(self):
            b = self.batch_size
            sx, sy, sz = self.spatial_shape
            c = self.features.shape[1]
            out = torch.zeros(b, sx, sy, sz, c,
                              dtype=self.features.dtype)
            idx = self.indices.long()
            out[idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]] = \
                self.features
            return out.permute(0, 4, 1, 2, 3)

    class SubMConv3d(tnn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     dilation=1, bias=True, indice_key=None, algo=None,
                     stride=1, padding=None):
            super().__init__()
            k = kernel_size if isinstance(kernel_size, int) \
                else kernel_size[0]
            self.kernel_size = k
            self.in_channels = in_channels
            self.out_channels = out_channels
            w = torch.empty(out_channels, k, k, k, in_channels)
            tnn.init.kaiming_uniform_(w.view(out_channels, -1), a=5 ** .5)
            self.weight = tnn.Parameter(
                w.view(out_channels, k, k, k, in_channels))
            self.bias = tnn.Parameter(torch.zeros(out_channels)) \
                if bias else None

        def forward(self, x):
            dense = x.dense()                     # [B, C, X, Y, Z]
            w = self.weight.permute(0, 4, 1, 2, 3)  # [O, I, k, k, k]
            out = F.conv3d(dense, w, self.bias,
                           padding=self.kernel_size // 2)
            idx = x.indices.long()
            feats = out.permute(0, 2, 3, 4, 1)[
                idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]]
            return SparseConvTensor(feats, x.indices, x.spatial_shape,
                                    x.batch_size)

    sppt.ConvAlgo = ConvAlgo
    sppt.SparseConvTensor = SparseConvTensor
    sppt.SubMConv3d = SubMConv3d
    sppt.SparseConv3d = SubMConv3d          # stride-1 cases only
    sppt.SparseInverseConv3d = SubMConv3d

    xf = _stub("xformers")
    xo = _stub("xformers.ops")
    xf.ops = xo

    class BlockDiagonalMask:
        def __init__(self, q_seqlen, kv_seqlen):
            self.q_seqlen = list(q_seqlen)
            self.kv_seqlen = list(kv_seqlen)

        @classmethod
        def from_seqlens(cls, q_seqlen, kv_seqlen=None):
            return cls(q_seqlen, kv_seqlen if kv_seqlen is not None
                       else q_seqlen)

        def materialize(self):
            nq, nk = sum(self.q_seqlen), sum(self.kv_seqlen)
            m = torch.full((nq, nk), float("-inf"))
            qo = ko = 0
            for ql, kl in zip(self.q_seqlen, self.kv_seqlen):
                m[qo:qo + ql, ko:ko + kl] = 0.0
                qo += ql
                ko += kl
            return m

    fmha = types.SimpleNamespace(BlockDiagonalMask=BlockDiagonalMask)

    def memory_efficient_attention(q, k, v, attn_bias=None):
        # xformers layout [B, N, H, C] → sdpa layout [B, H, N, C]
        qt, kt, vt = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        mask = None
        if isinstance(attn_bias, BlockDiagonalMask):
            mask = attn_bias.materialize()[None, None]
        out = F.scaled_dot_product_attention(qt, kt, vt, attn_mask=mask)
        return out.permute(0, 2, 1, 3)

    xo.memory_efficient_attention = memory_efficient_attention
    xo.fmha = fmha

    # reference code sprinkles hardcoded .cuda() calls
    # (e.g. gaussian_model.py:65-69); make them no-ops on CPU torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _sparse_installed = True


_tgs_installed = False


def install_tgs():
    """Extra stubs for the TriplaneGaussian chain: cv2 + pytorch3d
    (imported at utils/ops.py module scope; the rasterization entry
    points are never called by the modules under parity test),
    torch_scatter (pure-torch scatter_mean/max with torch_scatter 2.x
    semantics: untouched entries stay 0, touched get the true reduce)
    and pointnet2_ops grouping (pure-torch gather)."""
    global _tgs_installed
    if _tgs_installed:
        return
    install()
    import torch
    import omegaconf
    if not hasattr(omegaconf.OmegaConf, "register_new_resolver"):
        omegaconf.OmegaConf.register_new_resolver = staticmethod(
            lambda *a, **k: None)

    cv2 = _stub("cv2")
    cv2.DIST_L2 = 2
    cv2.DIST_MASK_3 = 3
    cv2.distanceTransform = None     # host EDT path not under test

    p3d = _stub("pytorch3d")
    p3r = _stub("pytorch3d.renderer")
    for name in ("AlphaCompositor", "NormWeightedCompositor",
                 "PointsRasterizationSettings", "PointsRasterizer",
                 "PointsRenderer"):
        setattr(p3r, name, type(name, (), {}))
    p3rc = _stub("pytorch3d.renderer.cameras")
    p3rc.CamerasBase = object
    p3s = _stub("pytorch3d.structures")
    p3s.Pointclouds = object
    p3u = _stub("pytorch3d.utils")
    p3uc = _stub("pytorch3d.utils.camera_conversions")
    p3uc.cameras_from_opencv_projection = None
    p3d.renderer = p3r
    p3d.structures = p3s
    p3d.utils = p3u

    ts = _stub("torch_scatter")

    def _expand_index(src, index, dim):
        if index.dim() < src.dim():
            for _ in range(src.dim() - index.dim()):
                index = index.unsqueeze(-1)
        return index.expand_as(src) if index.shape != src.shape \
            else index

    def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
        if out is None:
            size = list(src.shape)
            size[dim] = dim_size if dim_size is not None \
                else int(index.max()) + 1
            out = src.new_zeros(size)
        idx = _expand_index(src, index, dim)
        out = out.scatter_reduce(dim, idx, src, "mean",
                                 include_self=False)
        return out

    def scatter_max(src, index, dim=-1, out=None, dim_size=None):
        if out is None:
            size = list(src.shape)
            size[dim] = dim_size if dim_size is not None \
                else int(index.max()) + 1
            out = src.new_zeros(size)
        idx = _expand_index(src, index, dim)
        out = out.scatter_reduce(dim, idx, src, "amax",
                                 include_self=False)
        return out, None             # argmax unused by the reference

    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max

    po = _stub("pointnet2_ops")
    pou = _stub("pointnet2_ops.pointnet2_utils")

    def grouping_operation(feat, idx):
        """feat [B,C,N], idx [B,n,k] int → [B,C,n,k]."""
        b, c, _ = feat.shape
        _, n, k = idx.shape
        flat = idx.reshape(b, 1, n * k).expand(b, c, n * k).long()
        return feat.gather(2, flat).reshape(b, c, n, k)

    pou.grouping_operation = grouping_operation
    for name in ("furthest_point_sample", "gather_operation",
                 "ball_query", "three_nn", "three_interpolate"):
        setattr(pou, name, None)     # unused at inference
    po.pointnet2_utils = pou

    mpu = sys.modules.get("mesh_processer.mesh_utils") \
        or _stub("mesh_processer.mesh_utils")
    if not hasattr(mpu, "construct_list_of_gs_attributes"):
        mpu.construct_list_of_gs_attributes = lambda *a, **k: []
    if not hasattr(mpu, "write_gs_ply"):
        mpu.write_gs_ply = lambda *a, **k: None
    sys.modules["mesh_processer"].mesh_utils = mpu
    _tgs_installed = True
