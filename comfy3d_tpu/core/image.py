"""Image utilities on the node-layer tensor conventions.

Counterpart of reference `shared_utils/image_utils.py` with the same
conventions: IMAGE = float32 [N, H, W, 3] in [0,1]; MASK = [N, H, W].
jnp-native so preprocessing fuses into the device graph; the few
host-only helpers (PIL interop) stay numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def composite_background(images: jnp.ndarray, masks: jnp.ndarray,
                         color=(1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Alpha-composite over a pure color (ref `image_utils.py:16-42` and the
    Image_Add_Pure_Color_Background node, `nodes.py:417`)."""
    c = jnp.asarray(color, images.dtype)
    return images * masks[..., None] + c * (1.0 - masks[..., None])


def resize_images(images: jnp.ndarray, height: int, width: int,
                  method: str = "bilinear") -> jnp.ndarray:
    """[N,H,W,C] resize (ref `prepare_torch_img`, image_utils.py:8)."""
    n, _, _, c = images.shape
    return jax.image.resize(images, (n, height, width, c), method=method)


def make_image_grid(images: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """[N,H,W,C] → single [rows*H, cols*W, C] grid (ref :90-118)."""
    n, h, w, c = images.shape
    assert n == rows * cols, f"{n} images != {rows}x{cols}"
    return (images.reshape(rows, cols, h, w, c)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(rows * h, cols * w, c))


def split_image_grid(image: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Single grid image → [rows*cols, H, W, C] (ref :119-141)."""
    gh, gw, c = image.shape
    h, w = gh // rows, gw // cols
    return (image[:rows * h, :cols * w]
            .reshape(rows, h, cols, w, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows * cols, h, w, c))


def erode_mask(masks: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Binary erosion via min-pooling (ref `image_utils.py:142-154`)."""
    if radius <= 0:
        return masks
    k = 2 * radius + 1
    return -jax.lax.reduce_window(
        -masks, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius)))


def dilate_texture(image: jnp.ndarray, mask: jnp.ndarray,
                   iterations: int = 8) -> jnp.ndarray:
    """Grow valid texels into empty UV space by repeated neighbor-max fill
    (ref `troch_image_dilate`, image_utils.py:43-89: grayscale morphology).

    image: [H, W, C]; mask: [H, W] (1 = valid). XLA-friendly fixed loop.
    """
    def body(_, state):
        img, m = state
        m4 = m[None, ..., None]
        i4 = (img * m[..., None])[None]
        ksum = jax.lax.reduce_window(
            i4, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        msum = jax.lax.reduce_window(
            m4, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        fill = ksum / jnp.maximum(msum, 1e-8)
        new_m = jnp.clip(msum[0, ..., 0], 0.0, 1.0)
        new_img = jnp.where(m[..., None] > 0, img, fill[0])
        return new_img, jnp.maximum(m, new_m)

    out, _ = jax.lax.fori_loop(0, iterations, body, (image, mask))
    return out


def resize_foreground(image: np.ndarray, mask: np.ndarray,
                      ratio: float = 0.85):
    """Crop to the mask bbox and re-pad so the object fills `ratio` of the
    square frame (ref `pils_resize_foreground`, image_utils.py:155-199).
    Host-side (shape-dynamic)."""
    ys, xs = np.where(mask > 0.5)
    if len(ys) == 0:
        return image, mask
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    fg = image[y0:y1, x0:x1]
    fg_m = mask[y0:y1, x0:x1]
    side = int(round(max(fg.shape[0], fg.shape[1]) / ratio))
    out = np.zeros((side, side, image.shape[2]), image.dtype)
    out_m = np.zeros((side, side), mask.dtype)
    oy = (side - fg.shape[0]) // 2
    ox = (side - fg.shape[1]) // 2
    out[oy:oy + fg.shape[0], ox:ox + fg.shape[1]] = fg
    out_m[oy:oy + fg.shape[0], ox:ox + fg.shape[1]] = fg_m
    h, w = image.shape[:2]
    import cv2
    out = cv2.resize(out, (w, h), interpolation=cv2.INTER_LINEAR)
    out_m = cv2.resize(out_m, (w, h), interpolation=cv2.INTER_LINEAR)
    return out.astype(np.float32), out_m.astype(np.float32)


def masks_from_normal_maps(normals: jnp.ndarray,
                           threshold: float = 0.99) -> jnp.ndarray:
    """Background detection on normal maps: background pixels encode a
    constant (0.5,0.5,1)-ish normal (ref Get_Masks_From_Normal_Maps,
    nodes.py:562)."""
    bg = jnp.asarray([0.5, 0.5, 1.0], normals.dtype)
    dist = jnp.linalg.norm(normals - bg, axis=-1)
    return (dist > (1.0 - threshold)).astype(normals.dtype)


def rotate_normals_horizontally(normals: jnp.ndarray,
                                angle_deg: float) -> jnp.ndarray:
    """Rotate world-space normal maps around +Y (ref nodes.py:588)."""
    a = jnp.deg2rad(angle_deg)
    n = normals * 2.0 - 1.0
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    x2 = x * jnp.cos(a) + z * jnp.sin(a)
    z2 = -x * jnp.sin(a) + z * jnp.cos(a)
    return (jnp.stack([x2, y, z2], -1) + 1.0) / 2.0
