"""Generic diffusers-pipeline plumbing + Unique3D custom-UNet nodes.

Counterparts of reference nodes.py:1510 (`Load_Diffusers_Pipeline`),
:1560 (`Set_Diffusers_Pipeline_Scheduler`), :1588
(`Set_Diffusers_Pipeline_State_Dict`), :2836
(`Load_Unique3D_Custom_UNet`), :2887 (`Unique3D_MVDiffusion_Model`).

The reference resolves pipeline classes from DIFFUSERS_PIPE_DICT
(nodes.py:146-161); here each name maps to the TPU pipeline that fills
that role. Checkpoints are loaded when present under
``Checkpoints/Diffusers/<repo_id>``; otherwise weights are random
(explicitly logged), keeping graph plumbing runnable end-to-end.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from .base import maybe_shard, CKPT_ROOT_PATH, register

CKPT_DIFFUSERS_PATH = os.path.join(CKPT_ROOT_PATH, "Diffusers")


def _has_weights(path: str) -> bool:
    """True when the directory tree holds at least one weight file —
    distinguishes a real checkpoint from the config-skeleton dirs the
    reference ships under `Checkpoints/` as placeholders."""
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith((".safetensors", ".bin", ".ckpt", ".pth")):
                return True
    return False


def _mvdream(ckpt_dir=None):
    from ..models.mvdream import MVDreamPipeline
    if ckpt_dir:
        return MVDreamPipeline.from_pretrained(ckpt_dir)
    return MVDreamPipeline.init_random()


def _wonder3d(ckpt_dir=None):
    from ..models.wonder3d import Wonder3DPipeline
    if ckpt_dir:
        return Wonder3DPipeline.from_pretrained(ckpt_dir)
    return Wonder3DPipeline.init_random()


def _zero123plus(ckpt_dir=None):
    from ..models.zero123plus import Zero123PlusPipeline
    if ckpt_dir:
        return Zero123PlusPipeline.from_pretrained(ckpt_dir)
    return Zero123PlusPipeline.init_random()


def _era3d(ckpt_dir=None):
    from ..models.era3d import Era3DPipeline
    if ckpt_dir:
        return Era3DPipeline.from_pretrained(ckpt_dir)
    return Era3DPipeline.init_random()


def _unique3d_mv(ckpt_dir=None):
    from ..models.unique3d import Unique3DImage2MVPipeline
    if ckpt_dir:
        sub = os.path.join(ckpt_dir, "image2mvimage")
        return Unique3DImage2MVPipeline.from_pretrained(
            sub if os.path.isdir(sub) else ckpt_dir)
    return Unique3DImage2MVPipeline.init_random()


def _unique3d_single(ckpt_dir=None):
    from ..models.unique3d import Unique3DImage2NormalPipeline
    if ckpt_dir:
        sub = os.path.join(ckpt_dir, "image2normal")
        return Unique3DImage2NormalPipeline.from_pretrained(
            sub if os.path.isdir(sub) else ckpt_dir)
    return Unique3DImage2NormalPipeline.init_random()


def _hunyuan_mvd_std(ckpt_dir=None):
    from ..models.hunyuan3d_v1 import Hunyuan3DV1MVDPipeline
    if ckpt_dir:
        return Hunyuan3DV1MVDPipeline.from_pretrained(ckpt_dir,
                                                      variant="std")
    return Hunyuan3DV1MVDPipeline.init_random(variant="std")


def _hunyuan_mvd_lite(ckpt_dir=None):
    from ..models.hunyuan3d_v1 import Hunyuan3DV1MVDPipeline
    if ckpt_dir:
        return Hunyuan3DV1MVDPipeline.from_pretrained(ckpt_dir,
                                                      variant="lite")
    return Hunyuan3DV1MVDPipeline.init_random(variant="lite")


def _hunyuan_dit(ckpt_dir=None):
    from ..models.hunyuan3d import Hunyuan3DShapePipeline

    def _find(subdir):
        # resolve each file's extension independently — a directory can
        # mix model.fp16.safetensors with model.fp16.ckpt (ADVICE r3 #3)
        for ext in ("safetensors", "ckpt"):
            cand = os.path.join(ckpt_dir, subdir, f"model.fp16.{ext}")
            if os.path.exists(cand):
                return cand
        return None

    if ckpt_dir:
        dit = _find("hunyuan3d-dit-v2-0")
        vae = _find("hunyuan3d-vae-v2-0")
        if dit and vae:
            return Hunyuan3DShapePipeline.from_pretrained(dit, vae)
    return Hunyuan3DShapePipeline.init_random()


def _triposg(ckpt_dir=None):
    from ..models.triposg import TripoSGPipeline
    if ckpt_dir:
        return TripoSGPipeline.from_pretrained(ckpt_dir)
    return TripoSGPipeline.init_random()


def _triposg_scribble(ckpt_dir=None):
    pipe = _triposg(ckpt_dir)
    pipe.is_scribble = True
    return pipe


def _stablex(ckpt_dir=None):
    from ..models.stablegen import YosoNormalsPipeline
    if ckpt_dir:
        return YosoNormalsPipeline.from_pretrained(ckpt_dir)
    return YosoNormalsPipeline.init_random()


DIFFUSERS_PIPE_FACTORIES = {
    "MVDreamPipeline": _mvdream,
    "Wonder3DMVDiffusionPipeline": _wonder3d,
    "Zero123PlusPipeline": _zero123plus,
    "DiffusionPipeline": _zero123plus,
    "StableDiffusionPipeline": _stablex,
    "Era3DPipeline": _era3d,
    "Unique3DImage2MVCustomPipeline": _unique3d_mv,
    "Unique3DImageCustomPipeline": _unique3d_single,
    "HunYuan3DMVDStdPipeline": _hunyuan_mvd_std,
    "Hunyuan3DMVDLitePipeline": _hunyuan_mvd_lite,
    "Hunyuan3DDiTFlowMatchingPipeline": _hunyuan_dit,
    "TripoSGPipeline": _triposg,
    "TripoSGScribblePipeline": _triposg_scribble,
}

DIFFUSERS_SCHEDULER_NAMES = [
    "EulerAncestralDiscreteScheduler",
    "EulerDiscreteScheduler",
    "DDIMScheduler",
    "DDIMParallelScheduler",
    "LCMScheduler",
    "KDPM2AncestralDiscreteScheduler",
    "KDPM2DiscreteScheduler",
]


@register
class Load_Diffusers_Pipeline:
    """reference nodes.py:1510 — name-keyed pipeline factory."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("pipe",)
    FUNCTION = "load_diffusers_pipe"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "diffusers_pipeline_name":
                    (list(DIFFUSERS_PIPE_FACTORIES.keys()),),
                "repo_id": ("STRING",
                            {"default": "ashawkey/imagedream-ipmv-diffusers",
                             "multiline": False}),
                "custom_pipeline": ("STRING", {"default": "",
                                               "multiline": False}),
                "force_download": ("BOOLEAN", {"default": False}),
            },
            "optional": {
                "checkpoint_sub_dir": ("STRING", {"default": "",
                                                  "multiline": False}),
                "force_disable_xformers": ("BOOLEAN", {"default": False}),
            },
        }

    def load_diffusers_pipe(self, diffusers_pipeline_name, repo_id="",
                            custom_pipeline="", force_download=False,
                            checkpoint_sub_dir="",
                            force_disable_xformers=False):
        factory = DIFFUSERS_PIPE_FACTORIES[diffusers_pipeline_name]
        ckpt_dir = os.path.join(CKPT_DIFFUSERS_PATH, repo_id)
        if checkpoint_sub_dir:
            ckpt_dir = os.path.join(ckpt_dir, checkpoint_sub_dir)
        import inspect
        takes_ckpt = "ckpt_dir" in inspect.signature(factory).parameters
        if _has_weights(ckpt_dir) and takes_ckpt:
            pipe = factory(ckpt_dir=ckpt_dir)
            print(f"[Load_Diffusers_Pipeline] loaded "
                  f"{diffusers_pipeline_name} from {ckpt_dir}")
            pipe.repo_id = repo_id
            from .base import maybe_shard
            return (maybe_shard(pipe),)
        elif _has_weights(ckpt_dir):
            print(f"[Load_Diffusers_Pipeline] "
                  f"{diffusers_pipeline_name} has no checkpoint "
                  f"loader yet — initializing random weights")
        else:
            print(f"[Load_Diffusers_Pipeline] no local checkpoint at "
                  f"{ckpt_dir} — initializing "
                  f"{diffusers_pipeline_name} with random weights")
        pipe = factory()
        pipe.repo_id = repo_id
        from .base import maybe_shard
        return (maybe_shard(pipe),)


@register
class Set_Diffusers_Pipeline_Scheduler:
    """reference nodes.py:1560 — swap the sampler (always with
    trailing timestep spacing, matching the reference's
    `from_config(..., timestep_spacing='trailing')`)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("pipe",)
    FUNCTION = "set_pipe_scheduler"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("DIFFUSERS_PIPE",),
            "diffusers_scheduler_name": (DIFFUSERS_SCHEDULER_NAMES,),
        }}

    def set_pipe_scheduler(self, pipe, diffusers_scheduler_name):
        cfg = getattr(pipe, "cfg", None)
        if cfg is not None and hasattr(cfg, "scheduler"):
            sched = dataclasses.replace(cfg.scheduler,
                                        timestep_spacing="trailing")
            pipe.cfg = dataclasses.replace(cfg, scheduler=sched)
        pipe.scheduler_name = diffusers_scheduler_name
        return (pipe,)


@register
class Set_Diffusers_Pipeline_State_Dict:
    """reference nodes.py:1588 — load a UNet state dict into the pipe.
    Converts a torch checkpoint through the weight-conversion rules
    when the file exists locally; otherwise a no-op with notice."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("pipe",)
    FUNCTION = "set_pipe_state_dict"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("DIFFUSERS_PIPE",),
            "repo_id": ("STRING", {"default": "TencentARC/InstantMesh",
                                   "multiline": False}),
            "model_name": ("STRING",
                           {"default": "diffusion_pytorch_model.bin",
                            "multiline": False}),
        }}

    def set_pipe_state_dict(self, pipe, repo_id, model_name):
        path = os.path.join(CKPT_DIFFUSERS_PATH, repo_id, model_name)
        if not os.path.exists(path):
            print(f"[Set_Diffusers_Pipeline_State_Dict] {path} not "
                  f"found — keeping current weights")
            return (maybe_shard(pipe),)
        from ..models.convert import convert_with_rules, load_state_dict
        from ..models.diffusion.convert import unet_rules
        sd = load_state_dict(path)
        pipe.params["unet"] = convert_with_rules(sd, unet_rules())
        print(f"[Set_Diffusers_Pipeline_State_Dict] loaded {path}")
        return (maybe_shard(pipe),)


@register
class Load_Unique3D_Custom_UNet:
    """reference nodes.py:2836 — rebuild the pipe's UNet from a
    Unique3D unifield config (image2mvimage / image2normal)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("pipe",)
    FUNCTION = "load_diffusers_unet"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("DIFFUSERS_PIPE",),
            "config_name": (["image2mvimage", "image2normal"],),
        }}

    def load_diffusers_unet(self, pipe, config_name):
        from ..models.unique3d import (Unique3DImage2MVPipeline,
                                       Unique3DImage2NormalPipeline)
        if config_name == "image2mvimage":
            new = Unique3DImage2MVPipeline.init_random()
        else:
            new = Unique3DImage2NormalPipeline.init_random()
        # keep the host pipe's VAE if shapes match (the reference swaps
        # only the UNet into the loaded SD pipe)
        if (hasattr(pipe, "params") and isinstance(pipe.params, dict)
                and "vae" in pipe.params):
            try:
                import jax
                chex_ok = jax.tree_util.tree_structure(
                    pipe.params["vae"]) == jax.tree_util.tree_structure(
                    new.params["vae"])
                if chex_ok:
                    new.params["vae"] = pipe.params["vae"]
            except Exception:
                pass
        print(f"[Load_Unique3D_Custom_UNet] built {config_name} UNet")
        return (maybe_shard(new),)


@register
class Unique3D_MVDiffusion_Model:
    """reference nodes.py:2887 — image → 4 orthographic views +
    Unique3D(4) orbit poses."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiviews", "orbit_camposes")
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "unique3d_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "seed": ("INT", {"default": 1145, "min": 0,
                             "max": 0xffffffffffffffff}),
            "guidance_scale": ("FLOAT", {"default": 1.5, "min": 0.0,
                                         "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 30, "min": 1}),
            "image_resolution": ([256, 512],),
            "radius": ("FLOAT", {"default": 4.0, "min": 0.1,
                                 "step": 0.01}),
            "preprocess_images": ("BOOLEAN", {"default": True}),
        }}

    def run_model(self, unique3d_pipe, reference_image, seed=1145,
                  guidance_scale=1.5, num_inference_steps=30,
                  image_resolution=256, radius=4.0,
                  preprocess_images=True):
        img = np.asarray(reference_image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if img.shape[-1] == 4:
            a = img[..., 3:4]
            img = img[..., :3] * a + (1.0 - a)
        views = np.asarray(unique3d_pipe(
            img, seed=int(seed), guidance_scale=float(guidance_scale),
            num_inference_steps=int(num_inference_steps)))
        # Unique3D(4): front / right / back / left at elevation 0
        azimuths = [0.0, 90.0, 180.0, 270.0]
        camposes = [[float(radius), 0.0, az, 0.0, 0.0, 0.0]
                    for az in azimuths]
        return (views, camposes)
