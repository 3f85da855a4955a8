"""Host↔device offload + teardown for multi-pipeline workflows.

The reference manages VRAM with mmgp offload profiles
(`nodes.py:115,5382-5390`) and manual `.to('cpu')` + `del` +
`empty_cache` teardown choreography (`nodes.py:5449-5463`). The
TPU-native equivalents:

* `offload(pipe)` — move every parameter tree to host RAM (numpy),
  freeing HBM; the pipeline stays callable (weights stream back on the
  next dispatch) and `restore(pipe)` re-pins them to device.
* `teardown(pipe)` — drop the parameter trees entirely.
* `PipelineVault` — a keep-K-resident registry: loader nodes register
  their pipelines; loading pipeline K+1 offloads the least recently
  used one, which is the workflow-level memory profile big multi-stage
  graphs (shape → paint → upscale) need on one chip.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import numpy as np


def _map_params(pipe, fn):
    params = getattr(pipe, "params", None)
    if params is None:
        return pipe
    import jax
    pipe.params = jax.tree.map(fn, params)
    return pipe


def offload(pipe):
    """Device params → host numpy (HBM freed on the next GC)."""
    return _map_params(pipe, lambda x: np.asarray(x))


def restore(pipe):
    """Host params → device arrays (re-sharded if the pipe has a mesh
    via its recorded shardings being re-derived by `shard_pipeline`)."""
    import jax.numpy as jnp
    pipe = _map_params(pipe, jnp.asarray)
    mesh = getattr(pipe, "mesh", None)
    if mesh is not None:
        from .sharding import shard_pipeline
        shard_pipeline(pipe, mesh)
    return pipe


def is_offloaded(pipe) -> bool:
    import jax
    leaves = jax.tree.leaves(getattr(pipe, "params", None))
    return bool(leaves) and isinstance(leaves[0], np.ndarray)


def teardown(pipe):
    """Drop parameters entirely (reference nodes.py:5449-5463 role)."""
    if hasattr(pipe, "params"):
        pipe.params = None
    for attr in ("vision_encoder", "delight", "superres"):
        if hasattr(pipe, attr):
            setattr(pipe, attr, None)
    return pipe


class PipelineVault:
    """Keep at most `max_resident` pipelines on device; LRU-offload the
    rest to host RAM. Loader nodes call `admit`; run nodes call `touch`
    before use (restores if offloaded)."""

    def __init__(self, max_resident: int = 1):
        self.max_resident = max(1, int(max_resident))
        self._lru: "OrderedDict[int, object]" = OrderedDict()

    def admit(self, pipe):
        self.touch(pipe)
        return pipe

    def touch(self, pipe):
        key = id(pipe)
        if key in self._lru:
            self._lru.move_to_end(key)
        else:
            self._lru[key] = pipe
        if is_offloaded(pipe):
            restore(pipe)
        while len(self._lru) > self.max_resident:
            _, victim = self._lru.popitem(last=False)
            if victim is not pipe and not is_offloaded(victim):
                offload(victim)
        return pipe

    def evict_all(self):
        for _, pipe in self._lru.items():
            offload(pipe)
        self._lru.clear()


_default_vault: Optional[PipelineVault] = None


def default_vault() -> PipelineVault:
    """Process-wide vault sized by COMFY3D_MAX_RESIDENT_PIPES (default
    2 — e.g. shape + paint stay resident, everything else offloads)."""
    global _default_vault
    if _default_vault is None:
        import os
        _default_vault = PipelineVault(
            int(os.environ.get("COMFY3D_MAX_RESIDENT_PIPES", "2")))
    return _default_vault
