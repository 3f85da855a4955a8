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
_COL_PAT = re.compile(
    r"(to_q|to_k|to_v|query|key|value|net_0/proj|mlp_in|sig1|col1)"
    r"/kernel$")
# Row-parallel (shard input features): attention out-proj, FF contraction.
_ROW_PAT = re.compile(r"(to_out_0|out|net_2|mlp_out|sig2|col2)/kernel$")


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
