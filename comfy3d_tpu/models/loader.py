"""Shared checkpoint-loading machinery for the model zoo.

Every family's `from_pretrained` builds on three primitives:

  * `load_state_dict_any(path)`  — one torch/safetensors file → flat dict
  * `load_dir_state_dict(dir)`   — a diffusers-style weights directory
    (handles `diffusion_pytorch_model.safetensors`, sharded
    `*.safetensors.index.json`, `.bin` fallbacks)
  * `validate_tree(converted, reference, name)` — structural check that a
    converted param tree matches the randomly initialized tree exactly
    (same paths, same shapes). This is the zero-network guarantee that a
    real public checkpoint will drop into the flax module: the rename
    tables are exercised by per-family parity/structure tests, and the
    tree check catches every missing/extra/transposed leaf at load time
    instead of at trace time.

Counterpart of the reference's per-family `from_pretrained` loaders
(e.g. `TripoSR/system.py:52`, `TRELLIS/trellis/pipelines/base.py:21-45`,
`shared_utils/common_utils.py:73-82`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import numpy as np


def load_state_dict_any(path: str) -> Dict[str, np.ndarray]:
    """One checkpoint file → flat {torch_key: np.ndarray}."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        try:
            return dict(load_file(path))
        except Exception:
            # bf16/fp16 tensors: go through torch for dtype support
            from safetensors.torch import load_file as tload
            return {k: v.float().numpy() for k, v in tload(path).items()}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


_WEIGHT_NAMES = (
    "diffusion_pytorch_model.safetensors",
    "model.safetensors",
    "diffusion_pytorch_model.bin",
    "pytorch_model.bin",
    "model.ckpt",
)


def load_dir_state_dict(path: str) -> Dict[str, np.ndarray]:
    """A single file, or a diffusers-style directory (possibly sharded)."""
    if os.path.isfile(path):
        return load_state_dict_any(path)
    for idx_name in ("diffusion_pytorch_model.safetensors.index.json",
                     "model.safetensors.index.json"):
        idx = os.path.join(path, idx_name)
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            sd: Dict[str, np.ndarray] = {}
            for shard in sorted(set(weight_map.values())):
                sd.update(load_state_dict_any(os.path.join(path, shard)))
            return sd
    for name in _WEIGHT_NAMES:
        p = os.path.join(path, name)
        if os.path.exists(p):
            return load_state_dict_any(p)
    cands = [f for f in sorted(os.listdir(path))
             if f.endswith((".safetensors", ".bin", ".ckpt", ".pth",
                            ".pt"))]
    if len(cands) == 1:
        return load_state_dict_any(os.path.join(path, cands[0]))
    raise FileNotFoundError(
        f"no recognizable weight file in {path!r} (found {cands})")


def read_json_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def validate_tree(converted: Mapping, reference: Mapping,
                  name: str = "model") -> None:
    """Raise if `converted` isn't structurally identical (paths + leaf
    shapes) to the `reference` (init_random) tree."""
    a, b = _flatten(converted), _flatten(reference)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    bad = sorted(k for k in set(a) & set(b) if a[k] != b[k])
    if missing or extra or bad:
        msgs = []
        if missing:
            msgs.append(f"missing {len(missing)}: {missing[:6]}")
        if extra:
            msgs.append(f"extra {len(extra)}: {extra[:6]}")
        if bad:
            msgs.append("shape mismatches: " + ", ".join(
                f"{k} {a[k]}vs{b[k]}" for k in bad[:6]))
        raise ValueError(f"[{name}] converted checkpoint does not match "
                         f"the module tree — " + "; ".join(msgs))


def cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


def module_shape_tree(module, *dummy_args, **dummy_kwargs):
    """Abstract init: the module's param tree as ShapeDtypeStructs —
    free (no compile, no device work). Use as the `reference` arg of
    `validate_tree` when loading checkpoints."""
    import jax

    def _init():
        return module.init(jax.random.PRNGKey(0), *dummy_args,
                           **dummy_kwargs)

    out = jax.eval_shape(_init)
    return out["params"]


def on_cpu():
    """Context manager: run eager jax ops on the host CPU device.
    Model initialization is thousands of tiny eager dispatches; over
    the axon TPU tunnel each costs ~ms (345 s for a tiny pipeline init,
    measured) while CPU finishes in seconds. Params transfer to the TPU
    lazily at first apply."""
    import jax
    return jax.default_device(jax.devices("cpu")[0])
