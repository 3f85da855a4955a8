"""Vendor/ecosystem utility nodes the reference example workflows use.

The reference runs inside ComfyUI where these ship with the host app or
common custom-node packs (WAS, VideoHelperSuite, Impact, Eden). The
standalone executor provides minimal functional counterparts so every
`example_workflows/*.json` runs headlessly.
"""

from __future__ import annotations

import os

import numpy as np

from .base import INPUT_ROOT_PATH, register


def _img(x):
    a = np.asarray(x, np.float32)
    return a[None] if a.ndim == 3 else a


@register(comfy3d=False)
class Reroute:
    """ComfyUI pass-through."""

    CATEGORY = "utils"
    RETURN_TYPES = ("*",)
    FUNCTION = "route"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"": ("*",)}}

    def route(self, **kwargs):
        return (next(iter(kwargs.values())),)


@register(comfy3d=False)
class ImageScale:
    CATEGORY = "image/upscaling"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "upscale"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "image": ("IMAGE",),
            "upscale_method": (["nearest-exact", "bilinear", "area",
                                "bicubic", "lanczos"],),
            "width": ("INT", {"default": 512, "min": 0}),
            "height": ("INT", {"default": 512, "min": 0}),
            "crop": (["disabled", "center"],),
        }}

    def upscale(self, image, upscale_method="bilinear", width=512,
                height=512, crop="disabled"):
        import jax
        import jax.numpy as jnp
        img = _img(image)
        method = {"nearest-exact": "nearest", "area": "linear",
                  "lanczos": "lanczos3"}.get(upscale_method,
                                             upscale_method)
        if method not in ("nearest", "bilinear", "bicubic", "lanczos3",
                          "linear"):
            method = "bilinear"
        if method == "linear":
            method = "bilinear"
        out = jax.image.resize(
            jnp.asarray(img),
            (img.shape[0], int(height), int(width), img.shape[-1]),
            method)
        return (np.asarray(out),)


@register(comfy3d=False)
class ImageToMask:
    CATEGORY = "mask"
    RETURN_TYPES = ("MASK",)
    FUNCTION = "image_to_mask"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "image": ("IMAGE",),
            "channel": (["red", "green", "blue", "alpha"],),
        }}

    def image_to_mask(self, image, channel="red"):
        img = _img(image)
        idx = {"red": 0, "green": 1, "blue": 2, "alpha": 3}[channel]
        if idx >= img.shape[-1]:
            idx = 0
        return (img[..., idx],)


@register(comfy3d=False)
class MaskToImage:
    CATEGORY = "mask"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "mask_to_image"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"mask": ("MASK",)}}

    def mask_to_image(self, mask):
        m = np.asarray(mask, np.float32)
        if m.ndim == 2:
            m = m[None]
        return (np.repeat(m[..., None], 3, axis=-1),)


@register(comfy3d=False)
class ConvertToGrayscale:
    """ControlAltAI-style channel utility used by the CRM T2I V3
    LoRA/DoRA example workflows (`CRM_T2I_V3_to_MV_to_Texture_*.json`):
    rec.601 luma, replicated back to 3 channels."""

    CATEGORY = "image"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "convert"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"image": ("IMAGE",)}}

    def convert(self, image):
        img = _img(image)
        luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])
        return (np.repeat(luma[..., None], 3, axis=-1),)


@register(comfy3d=False)
class MergeImageChannels:
    """Compose an RGB image from per-channel sources (each source's
    first channel), optional mask becomes alpha."""

    CATEGORY = "image"
    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("image",)
    FUNCTION = "merge"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "red": ("IMAGE",),
            "green": ("IMAGE",),
            "blue": ("IMAGE",),
        }, "optional": {"mask": ("MASK",)}}

    def merge(self, red, green, blue, mask=None):
        chans = [_img(c)[..., 0] for c in (red, green, blue)]
        n = max(c.shape[0] for c in chans)
        h = max(c.shape[1] for c in chans)
        w = max(c.shape[2] for c in chans)
        out = np.zeros((n, h, w, 3), np.float32)
        for i, c in enumerate(chans):
            out[:, :c.shape[1], :c.shape[2], i] = c[:n]
        if mask is not None:
            m = np.asarray(mask, np.float32)
            if m.ndim == 2:
                m = m[None]
            alpha = np.ones((n, h, w, 1), np.float32)
            alpha[:, :m.shape[1], :m.shape[2], 0] = m[:n]
            out = np.concatenate([out, alpha], axis=-1)
        return (out,)


@register(comfy3d=False)
class GetImagesFromBatchIndexed:
    """Impact-pack: select images from a batch by index list."""

    CATEGORY = "image"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "pick"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "images": ("IMAGE",),
            "indexes": ("STRING", {"default": "0,1"}),
        }}

    def pick(self, images, indexes="0,1"):
        img = _img(images)
        idx = [int(i) for i in str(indexes).replace(" ", "").split(",")
               if i != ""]
        idx = [i for i in idx if -img.shape[0] <= i < img.shape[0]]
        return (img[idx],)


@register(comfy3d=False)
class ImageListToImageBatch:
    CATEGORY = "image"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "doit"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"images": ("IMAGE",)}}

    def doit(self, images):
        if isinstance(images, (list, tuple)):
            images = np.concatenate([_img(i) for i in images])
        return (_img(images),)


@register(comfy3d=False)
class PrimitiveString:
    CATEGORY = "utils/primitive"
    RETURN_TYPES = ("STRING",)
    FUNCTION = "execute"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"value": ("STRING", {"default": ""})}}

    def execute(self, value=""):
        return (value,)


@register(comfy3d=False)
class PrimitiveNode:
    CATEGORY = "utils/primitive"
    RETURN_TYPES = ("*",)
    FUNCTION = "execute"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"value": ("STRING", {"default": ""})}}

    def execute(self, value=""):
        return (value,)


@register(comfy3d=False)
class INTConstant:
    CATEGORY = "utils/primitive"
    RETURN_TYPES = ("INT",)
    FUNCTION = "get_value"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"value": ("INT", {"default": 0})}}

    def get_value(self, value=0):
        return (int(value),)


@register(comfy3d=False)
class ImpactFloat:
    CATEGORY = "ImpactPack"
    RETURN_TYPES = ("FLOAT",)
    FUNCTION = "doit"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"value": ("FLOAT", {"default": 0.0})}}

    def doit(self, value=0.0):
        return (float(value),)


@register(comfy3d=False)
class PreviewAny:
    CATEGORY = "utils"
    RETURN_TYPES = ()
    OUTPUT_NODE = True
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"source": ("*",)}}

    def run(self, source=None):
        print(f"[PreviewAny] {type(source).__name__}: "
              f"{str(source)[:200]}")
        return ()


@register(comfy3d=False)
class Note:
    CATEGORY = "utils"
    RETURN_TYPES = ()
    OUTPUT_NODE = True
    FUNCTION = "noop"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {}}

    def noop(self, **kwargs):
        return ()


class _RembgBase:
    """Corner-sampled background estimation: distance from the corner
    median color → soft alpha (the Image Rembg role without the u2net
    checkpoint)."""

    @staticmethod
    def _alpha(img):
        corners = np.concatenate([
            img[:4, :4].reshape(-1, 3), img[:4, -4:].reshape(-1, 3),
            img[-4:, :4].reshape(-1, 3), img[-4:, -4:].reshape(-1, 3)])
        bg = np.median(corners, axis=0)
        dist = np.linalg.norm(img - bg, axis=-1)
        return np.clip((dist - 0.08) / 0.25, 0.0, 1.0)


@register(comfy3d=False)
class Image_Rembg_Remove_Background(_RembgBase):
    CATEGORY = "WAS Suite/Image/AI"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "image_rembg"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "images": ("IMAGE",),
            "transparency": ("BOOLEAN", {"default": True}),
            "model": (["u2net"],),
            "post_processing": ("BOOLEAN", {"default": False}),
            "only_mask": ("BOOLEAN", {"default": False}),
            "alpha_matting": ("BOOLEAN", {"default": False}),
            "alpha_matting_foreground_threshold":
                ("INT", {"default": 240}),
            "alpha_matting_background_threshold":
                ("INT", {"default": 10}),
            "alpha_matting_erode_size": ("INT", {"default": 10}),
            "background_color": (["none", "black", "white"],),
        }}

    def image_rembg(self, images, transparency=True, model="u2net",
                    only_mask=False, background_color="none", **_):
        imgs = _img(images)
        out = []
        for im in imgs:
            a = self._alpha(im[..., :3])
            if only_mask:
                out.append(np.repeat(a[..., None], 3, -1))
            elif transparency:
                out.append(np.concatenate([im[..., :3], a[..., None]],
                                          -1))
            else:
                bgc = 1.0 if background_color == "white" else 0.0
                out.append(im[..., :3] * a[..., None]
                           + bgc * (1 - a[..., None]))
        return (np.stack(out),)


# ComfyUI type names with spaces/parens can't be Python identifiers;
# register the canonical workflow name explicitly.
from .base import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS  # noqa: E402

NODE_CLASS_MAPPINGS["Image Rembg (Remove Background)"] = \
    Image_Rembg_Remove_Background
NODE_DISPLAY_NAME_MAPPINGS["Image Rembg (Remove Background)"] = \
    "Image Rembg (Remove Background)"


@register(comfy3d=False)
class Morphology:
    """comfy core morphology (erode/dilate/open/close...)."""

    CATEGORY = "image/postprocessing"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "process"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "image": ("IMAGE",),
            "operation": (["erode", "dilate", "open", "close",
                           "gradient", "bottom_hat", "top_hat"],),
            "kernel_size": ("INT", {"default": 3, "min": 3, "max": 999,
                                    "step": 2}),
        }}

    def process(self, image, operation="erode", kernel_size=3):
        import jax.numpy as jnp
        from jax import lax
        img = jnp.asarray(_img(image))
        k = int(kernel_size)
        pads = [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)]

        def erode(x):
            return -lax.reduce_window(-x, -jnp.inf, lax.max,
                                      (1, k, k, 1), (1, 1, 1, 1),
                                      pads)

        def dilate(x):
            return lax.reduce_window(x, -jnp.inf, lax.max,
                                     (1, k, k, 1), (1, 1, 1, 1), pads)

        ops = {
            "erode": erode, "dilate": dilate,
            "open": lambda x: dilate(erode(x)),
            "close": lambda x: erode(dilate(x)),
            "gradient": lambda x: dilate(x) - erode(x),
            "top_hat": lambda x: x - dilate(erode(x)),
            "bottom_hat": lambda x: erode(dilate(x)) - x,
        }
        return (np.asarray(jnp.clip(ops[operation](img), 0, 1)),)


@register(comfy3d=False)
class ResizeMask:
    CATEGORY = "mask"
    RETURN_TYPES = ("MASK",)
    FUNCTION = "resize"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mask": ("MASK",),
            "width": ("INT", {"default": 512, "min": 1}),
            "height": ("INT", {"default": 512, "min": 1}),
            "keep_proportions": ("BOOLEAN", {"default": False}),
        }}

    def resize(self, mask, width=512, height=512,
               keep_proportions=False, **_):
        import jax
        import jax.numpy as jnp
        m = np.asarray(mask, np.float32)
        if m.ndim == 2:
            m = m[None]
        out = jax.image.resize(jnp.asarray(m),
                               (m.shape[0], int(height), int(width)),
                               "bilinear")
        return (np.asarray(out),)


@register(comfy3d=False)
class RemapImageRange:
    CATEGORY = "image"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "remap"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "image": ("IMAGE",),
            "min": ("FLOAT", {"default": 0.0, "step": 0.01}),
            "max": ("FLOAT", {"default": 1.0, "step": 0.01}),
            "clamp": ("BOOLEAN", {"default": True}),
        }}

    def remap(self, image, min=0.0, max=1.0, clamp=True):
        img = _img(image)
        out = img * (float(max) - float(min)) + float(min)
        if clamp:
            out = np.clip(out, 0.0, 1.0)
        return (out,)


@register(comfy3d=False)
class Eden_IMG_padder:
    """Pad an image to square with a fill color (Eden pack role)."""

    CATEGORY = "Eden"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "pad"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "image": ("IMAGE",),
            "pad_value": ("FLOAT", {"default": 1.0, "min": 0.0,
                                    "max": 1.0}),
        }}

    def pad(self, image, pad_value=1.0, **_):
        img = _img(image)
        b, h, w, c = img.shape
        m = max(h, w)
        out = np.full((b, m, m, c), float(pad_value), np.float32)
        y0, x0 = (m - h) // 2, (m - w) // 2
        out[:, y0:y0 + h, x0:x0 + w] = img
        return (out,)


@register(comfy3d=False)
class VHS_LoadImagesPath:
    """VideoHelperSuite: load all images from a directory."""

    CATEGORY = "Video Helper Suite"
    RETURN_TYPES = ("IMAGE", "MASK", "INT")
    FUNCTION = "load_images"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "directory": ("STRING", {"default": ""}),
            "image_load_cap": ("INT", {"default": 0, "min": 0}),
            "skip_first_images": ("INT", {"default": 0, "min": 0}),
            "select_every_nth": ("INT", {"default": 1, "min": 1}),
        }}

    def load_images(self, directory="", image_load_cap=0,
                    skip_first_images=0, select_every_nth=1, **_):
        import cv2
        d = directory if os.path.isabs(directory) else os.path.join(
            INPUT_ROOT_PATH, directory)
        files = sorted(
            f for f in os.listdir(d)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
        files = files[int(skip_first_images)::int(select_every_nth)]
        if image_load_cap:
            files = files[:int(image_load_cap)]
        imgs, masks = [], []
        for f in files:
            raw = cv2.imread(os.path.join(d, f), cv2.IMREAD_UNCHANGED)
            if raw is None:
                continue
            if raw.ndim == 2:
                raw = cv2.cvtColor(raw, cv2.COLOR_GRAY2BGR)
            if raw.shape[2] == 4:
                raw = cv2.cvtColor(raw, cv2.COLOR_BGRA2RGBA)
            else:
                raw = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            a = raw.astype(np.float32) / 255.0
            if a.shape[-1] == 4:
                masks.append(1.0 - a[..., 3])
                a = a[..., :3]
            else:
                masks.append(np.zeros(a.shape[:2], np.float32))
            imgs.append(a)
        return (np.stack(imgs), np.stack(masks), len(imgs))


@register(comfy3d=False)
class VHS_MergeImages:
    CATEGORY = "Video Helper Suite"
    RETURN_TYPES = ("IMAGE", "INT")
    FUNCTION = "merge"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "images_A": ("IMAGE",),
            "images_B": ("IMAGE",),
            "merge_strategy": (["match A", "match B"],),
            "scale_method": (["nearest-exact", "bilinear"],),
            "crop": (["none", "center"],),
        }}

    def merge(self, images_A, images_B, merge_strategy="match A",
              scale_method="bilinear", crop="none"):
        import jax
        import jax.numpy as jnp
        a, b = _img(images_A), _img(images_B)
        target = a.shape[1:3] if merge_strategy == "match A" \
            else b.shape[1:3]

        def fit(x):
            if x.shape[1:3] == target:
                return x
            return np.asarray(jax.image.resize(
                jnp.asarray(x),
                (x.shape[0],) + target + (x.shape[-1],), "bilinear"))

        out = np.concatenate([fit(a), fit(b)])
        return (out, out.shape[0])


@register(comfy3d=False)
class UpscaleModelLoader:
    CATEGORY = "loaders"
    RETURN_TYPES = ("UPSCALE_MODEL",)
    FUNCTION = "load_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_name": ("STRING", {"default": "RealESRGAN_x2.pth"}),
        }}

    def load_model(self, model_name=""):
        import functools

        import jax
        import jax.numpy as jnp
        from ..models.esrgan import RRDBConfig, RRDBNet, upscale
        cfg = RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8,
                         scale=2)
        params = RRDBNet(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        print(f"[UpscaleModelLoader] initializing random weights "
              f"({model_name} not bundled; reduced-depth RRDB)")
        return (functools.partial(upscale, params, cfg=cfg),)


@register(comfy3d=False)
class ImageUpscaleWithModel:
    CATEGORY = "image/upscaling"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "upscale"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "upscale_model": ("UPSCALE_MODEL",),
            "image": ("IMAGE",),
        }}

    def upscale(self, upscale_model, image):
        img = _img(image)
        return (np.stack([np.asarray(upscale_model(im))
                          for im in img]),)


class LoadImagesFromDirInspire:
    """Inspire-pack `LoadImagesFromDir //Inspire`: load every image in
    a directory (sorted), with start_index/cap widgets — the FlexiCubes
    depth/normal/mask feeder in the reference workflows."""

    CATEGORY = "InspirePack/image"
    RETURN_TYPES = ("IMAGE", "MASK", "INT")
    RETURN_NAMES = ("images", "masks", "count")
    FUNCTION = "load_images"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "directory": ("STRING", {"default": ""}),
            "image_load_cap": ("INT", {"default": 0, "min": 0}),
            "start_index": ("INT", {"default": 0, "min": 0}),
        }}

    def load_images(self, directory="", image_load_cap=0,
                    start_index=0, **_):
        import cv2
        names = sorted(
            f for f in (os.listdir(directory)
                        if os.path.isdir(directory) else [])
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp",
                                   ".bmp")))
        names = names[int(start_index):]
        if image_load_cap:
            names = names[:int(image_load_cap)]
        imgs, masks = [], []
        for f in names:
            raw = cv2.imread(os.path.join(directory, f),
                             cv2.IMREAD_UNCHANGED)
            if raw is None:
                continue
            if raw.ndim == 2:
                raw = np.repeat(raw[..., None], 3, -1)
            if raw.shape[-1] == 4:
                rgb = cv2.cvtColor(raw, cv2.COLOR_BGRA2RGB)
                alpha = raw[..., 3].astype(np.float32) / 255.0
            else:
                rgb = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
                alpha = np.ones(raw.shape[:2], np.float32)
            imgs.append(rgb.astype(np.float32) / 255.0)
            masks.append(alpha)
        if not imgs:
            raise ValueError(
                f"LoadImagesFromDir: no images under {directory!r}")
        return (np.stack(imgs), np.stack(masks), len(imgs))


# the Inspire pack registers with a display-name suffix the plain
# class-name decorator can't express
NODE_CLASS_MAPPINGS["LoadImagesFromDir //Inspire"] = \
    LoadImagesFromDirInspire
NODE_DISPLAY_NAME_MAPPINGS["LoadImagesFromDir //Inspire"] = \
    "Load Images From Dir (Inspire)"
