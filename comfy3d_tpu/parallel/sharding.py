"""Device-mesh policies: dp batch sharding + tp megatron-style attention
sharding for the model zoo.

The reference has no multi-device support at all (SURVEY.md §2.7: single
`DEVICE = cuda`, no process groups); this module is the framework-native
parallelism layer it lacks. Design follows the scaling-book recipe: pick a
mesh, annotate shardings with NamedSharding/PartitionSpec, let GSPMD insert
the collectives (all-gather/reduce-scatter ride ICI), profile, iterate.

Axes:
  dp — batch / view / ray axis (pure data parallel)
  tp — attention heads + MLP hidden of transformer blocks
       (column-parallel QKV & FF-in, row-parallel out-proj & FF-out —
       one psum per block pair, inserted by XLA)
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              devices=None) -> Mesh:
    """Build a device mesh. Default: all devices on dp × tp with tp as the
    innermost (fastest-varying → adjacent devices → ICI-local) axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        # favor tp up to 4 within one host, rest dp
        tp = 1
        for cand in (4, 2, 1):
            if n % cand == 0:
                tp = cand
                break
        shape = (n // tp, tp)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Column-parallel (shard output features): QKV projections, FF expansion.
# Covers the zoo's block families: diffusers-style (to_q/to_k/to_v,
# ff_0), vecset/Michelangelo (c_qkv/c_kv/c_q, mlp c_fc), HF ViT
# (query/key/value, fc1), CLIP (q_proj/k_proj/v_proj).
_COL_PAT = re.compile(
    r"(to_q|to_k|to_v|query|key|value|q_proj|k_proj|v_proj|c_qkv|c_kv"
    r"|c_q\b|net_0/proj|ff_0|fc1|c_fc|weights_in|mlp_in|sig1|col1)"
    r"/kernel$")
# Row-parallel (shard input features): attention out-proj, FF contraction.
_ROW_PAT = re.compile(
    r"(to_out_0|out_proj|attn_out|\bout|net_2|ff_2|fc2|weights_out"
    r"|c_proj|mlp_out|sig2|col2)/kernel$")


def tp_spec_for_path(path: str, ndim: int, axis: str = "tp") -> P:
    """PartitionSpec for one param. `path` is '/'-joined module path."""
    if ndim == 2:
        if _COL_PAT.search(path):
            return P(None, axis)
        if _ROW_PAT.search(path):
            return P(axis, None)
    return P()


def apply_tp_sharding(params, mesh: Mesh, axis: str = "tp"):
    """device_put a param tree with megatron tp shardings (replicated
    elsewhere). Divisibility guard: falls back to replication when a dim
    doesn't divide by the axis size."""
    tp_size = mesh.shape[axis]

    def place(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        spec = tp_spec_for_path(path, leaf.ndim, axis)
        for dim, name in enumerate(spec):
            if name == axis and leaf.shape[dim] % tp_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_pipeline(pipe, mesh: Optional[Mesh] = None, axis: str = "tp"):
    """Shard a model-zoo pipeline's parameters over a device mesh and
    record the mesh on the pipe (read by the chunked volume decoders to
    dp-shard query points). The product-path entrance to `parallel/`:
    `Load_*` nodes call this when more than one device is visible, so a
    user on a v5e-8 gets tensor-parallel denoisers and sharded decode
    without touching this module (SURVEY.md §2.7 implications a–c)."""
    if mesh is None:
        mesh = make_mesh()
    if isinstance(pipe.params, dict) and all(
            isinstance(v, dict) for v in pipe.params.values()):
        pipe.params = {k: apply_tp_sharding(v, mesh, axis)
                       for k, v in pipe.params.items()}
    else:
        pipe.params = apply_tp_sharding(pipe.params, mesh, axis)
    pipe.mesh = mesh
    return pipe


def maybe_default_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """A dp×tp mesh over all visible devices, or None single-device."""
    if len(jax.devices()) < min_devices:
        return None
    return make_mesh()
