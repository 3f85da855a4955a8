"""Node-layer foundation: registry, paths, tensor conventions.

Mirrors the reference's node protocol so its 52 example workflow JSONs run
unchanged (SURVEY.md §2.5): each node class declares `INPUT_TYPES`
(classmethod), `RETURN_TYPES`, `RETURN_NAMES`, `FUNCTION`, `CATEGORY`;
registration prefixes display names with "[Comfy3D] " and maps class
names with underscores→spaces (reference `__init__.py:54-63`).

Tensor conventions on graph edges (reference `nodes.py` preamble):
IMAGE = float32 [N, H, W, 3] in [0,1] (numpy on the boundary);
MASK = float32 [N, H, W]; MESH = core.Mesh; GS_PLY = core.GaussianSplat;
ORBIT_CAMPOSES = list of [radius, elevation, azimuth, cx, cy, cz].
"""

from __future__ import annotations

import os
from typing import Dict, Type

NODE_CLASS_MAPPINGS: Dict[str, Type] = {}
NODE_DISPLAY_NAME_MAPPINGS: Dict[str, str] = {}

ROOT_PATH = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CKPT_ROOT_PATH = os.environ.get(
    "COMFY3D_CHECKPOINTS", os.path.join(ROOT_PATH, "checkpoints"))
INPUT_ROOT_PATH = os.environ.get(
    "COMFY3D_INPUT", os.path.join(ROOT_PATH, "input"))
OUTPUT_ROOT_PATH = os.environ.get(
    "COMFY3D_OUTPUT", os.path.join(ROOT_PATH, "output"))

SUPPORTED_3D_EXTENSIONS = (".obj", ".ply", ".glb", ".gltf")
SUPPORTED_3DGS_EXTENSIONS = (".ply",)
SUPPORTED_CHECKPOINTS_EXTENSIONS = (".ckpt", ".bin", ".safetensors",
                                    ".pth", ".pt")

WEIGHT_DTYPE = "bfloat16"   # fp16 in the reference (nodes.py:204); bf16 on TPU


def maybe_shard(pipe):
    """Prepare a freshly-loaded pipeline: shard it over all visible
    devices (tp on transformer matmuls, dp available to the chunked
    decoders; no-op on one device or under COMFY3D_NO_SHARD) and, when
    COMFY3D_OFFLOAD is set, register it with the LRU pipeline vault so
    earlier pipelines offload to host RAM (the mmgp profile role,
    reference nodes.py:5382-5390). The single chokepoint through which
    every Load_* node reaches `parallel/`."""
    if not hasattr(pipe, "params"):
        return pipe
    if not os.environ.get("COMFY3D_NO_SHARD"):
        from ..parallel import maybe_default_mesh, shard_pipeline
        mesh = maybe_default_mesh()
        if mesh is not None:
            print(f"[Comfy3D] sharding pipeline over mesh "
                  f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
            shard_pipeline(pipe, mesh)
    if os.environ.get("COMFY3D_OFFLOAD"):
        from ..parallel import default_vault
        default_vault().admit(pipe)
    return pipe


def register(cls=None, *, comfy3d: bool = True):
    """Class decorator: add to the node registry."""
    def deco(c):
        name = c.__name__
        if comfy3d:
            key = f"[Comfy3D] {name.replace('_', ' ')}"
        else:
            key = name
        NODE_CLASS_MAPPINGS[key] = c
        NODE_DISPLAY_NAME_MAPPINGS[key] = key
        return c
    return deco(cls) if cls is not None else deco


def parse_save_filename(save_path: str, output_dir: str,
                        supported_extensions, class_name: str):
    """Timestamp-token expansion + extension check (counterpart of
    reference `shared_utils/common_utils.py:22-45`)."""
    import datetime
    now = datetime.datetime.now()
    tokens = {"%Y": f"{now.year:04d}", "%M": f"{now.month:02d}",
              "%D": f"{now.day:02d}", "%h": f"{now.hour:02d}",
              "%m": f"{now.minute:02d}", "%s": f"{now.second:02d}"}
    for t, v in tokens.items():
        save_path = save_path.replace(t, v)
    path = os.path.join(output_dir, save_path)
    ext = os.path.splitext(path)[1].lower()
    if ext not in supported_extensions:
        print(f"[{class_name}] unsupported save extension {ext!r}; "
              f"expected one of {supported_extensions}")
        return None
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def get_list_filenames(directory: str, extensions) -> list:
    if not os.path.isdir(directory):
        return []
    return sorted(
        f for f in os.listdir(directory)
        if os.path.splitext(f)[1].lower() in extensions)


def error_none(class_name: str, message: str):
    """Reference-style failure: print + None return (nodes.py:1308-1311)."""
    print(f"[{class_name}] {message}")
    return (None,)


def resume_or_download_model_from_hf(checkpoints_dir: str, repo_id: str,
                                     model_name: str,
                                     class_name: str = "") -> str:
    """Local-first checkpoint resolution (reference
    `shared_utils/common_utils.py` resume_or_download role).

    Looks for `<checkpoints_dir>/<model_name>`; if absent, attempts a
    huggingface_hub download when the library + network are available,
    else raises with the exact path to place the file at."""
    import os
    path = os.path.join(checkpoints_dir, model_name)
    if os.path.exists(path):
        return path
    try:
        from huggingface_hub import hf_hub_download
        os.makedirs(checkpoints_dir, exist_ok=True)
        try:   # hub cache hit needs no network
            return hf_hub_download(repo_id=repo_id, filename=model_name,
                                   local_dir=checkpoints_dir,
                                   local_files_only=True)
        except Exception:
            pass
        if os.environ.get("COMFY3D_ALLOW_DOWNLOAD", "0") != "1":
            raise RuntimeError(
                "network download disabled (set "
                "COMFY3D_ALLOW_DOWNLOAD=1 to enable)")
        return hf_hub_download(repo_id=repo_id, filename=model_name,
                               local_dir=checkpoints_dir)
    except Exception as exc:
        raise FileNotFoundError(
            f"[{class_name}] checkpoint {model_name!r} not found at "
            f"{path} and download from {repo_id!r} unavailable "
            f"({type(exc).__name__}). Place the file at that path.")
