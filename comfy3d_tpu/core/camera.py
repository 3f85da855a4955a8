"""Camera math: orbit poses, view/projection matrices, ray generation.

TPU-native re-design of the reference camera layer
(`shared_utils/camera_utils.py:45-288` in ComfyUI-3D-Pack): the reference
keeps cameras as per-object Python classes holding torch tensors; here a
camera is a plain pytree of jnp arrays so whole *batches* of cameras jit,
vmap, and shard over a device mesh (views are the natural data-parallel
axis for renderers and per-asset optimizers).

Conventions (used consistently everywhere in this framework):
  * World: right-handed, +Y up.
  * Camera-to-world (c2w, "OpenGL"): camera looks down its -Z axis, +X
    right, +Y up.
  * Orbit pose parameterization matches the reference node protocol
    `ORBIT_CAMPOSES` = rows of [radius, elevation_deg, azimuth_deg, cx, cy, cz]
    (reference `nodes.py:1173`, `shared_utils/camera_utils.py:276-288`).
    elevation > 0 means the camera is above the target looking down;
    azimuth 0 places the camera on +Z looking toward -Z (front view),
    azimuth 90 on +X.
  * Projection: OpenGL-style clip space, z in [-1, 1] after divide.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-model-family orbit pose presets. Mirrors the semantics of the preset
# table in reference `shared_utils/camera_utils.py:12-21` (azimuth offsets and
# elevation bounds differ per multi-view model family).
ORBITPOSE_PRESETS = {
    "FOUR_VIEWS": [[0.0, 0.0], [0.0, 90.0], [0.0, 180.0], [0.0, 270.0]],
    "SIX_VIEWS_ZERO123PLUS": [
        [30.0, 30.0], [-20.0, 90.0], [30.0, 150.0],
        [-20.0, 210.0], [30.0, 270.0], [-20.0, 330.0],
    ],
    "SIX_VIEWS_WONDER3D": [
        [0.0, 0.0], [0.0, 45.0], [0.0, 90.0],
        [0.0, 180.0], [0.0, 270.0], [0.0, 315.0],
    ],
    # reference preset table values ([elevation, azimuth] per view)
    "CRM(6)": [
        [0.0, -90.0], [90.0, 0.0], [0.0, 180.0],
        [0.0, 90.0], [-90.0, 0.0], [0.0, 0.0],
    ],
    "Wonder3D(6)": [
        [0.0, 0.0], [0.0, 45.0], [0.0, 90.0],
        [0.0, 180.0], [0.0, -90.0], [0.0, -45.0],
    ],
    "Zero123Plus(6)": [
        [-20.0, 30.0], [10.0, 90.0], [-20.0, 150.0],
        [10.0, -150.0], [-20.0, -90.0], [10.0, -30.0],
    ],
    "Era3D(6)": [
        [0.0, 0.0], [0.0, 45.0], [0.0, 90.0],
        [0.0, 180.0], [0.0, -90.0], [0.0, -45.0],
    ],
    "MVDream(4)": [[0.0, 0.0], [0.0, 90.0], [0.0, 180.0], [0.0, -90.0]],
    "Unique3D(4)": [[0.0, 0.0], [0.0, 90.0], [0.0, 180.0], [0.0, -90.0]],
    "CharacterGen(4)": [
        [0.0, -90.0], [0.0, 180.0], [0.0, 90.0], [0.0, 0.0],
    ],
}

ELEVATION_MIN, ELEVATION_MAX = -90.0, 90.0
AZIMUTH_MIN, AZIMUTH_MAX = -180.0, 180.0


def look_at(campos, target, up=None):
    """c2w rotation (3x3) for a camera at `campos` looking at `target`.

    Counterpart of reference `shared_utils/camera_utils.py:45-66`, jnp-native.
    Columns are the camera's (right, up, back) axes in world space.
    """
    campos = jnp.asarray(campos, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    back = _normalize(campos - target)          # camera +Z (looks down -Z)
    right = _normalize(jnp.cross(up, back))
    up2 = _normalize(jnp.cross(back, right))
    return jnp.stack([right, up2, back], axis=-1)


def _normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps))


def orbit_c2w(elevation_deg, azimuth_deg, radius, target=None):
    """Camera-to-world 4x4 for an orbit pose. Vectorizes over leading dims.

    Re-implements the role of `kiui.cam.orbit_camera` as used by the
    reference render controller (`shared_utils/camera_utils.py:240-251`).
    """
    elevation = jnp.deg2rad(jnp.asarray(elevation_deg, jnp.float32))
    azimuth = jnp.deg2rad(jnp.asarray(azimuth_deg, jnp.float32))
    radius = jnp.asarray(radius, jnp.float32)
    if target is None:
        target = jnp.zeros(elevation.shape + (3,), jnp.float32)
    else:
        target = jnp.broadcast_to(
            jnp.asarray(target, jnp.float32), elevation.shape + (3,))
    x = radius * jnp.cos(elevation) * jnp.sin(azimuth)
    y = radius * jnp.sin(elevation)
    z = radius * jnp.cos(elevation) * jnp.cos(azimuth)
    campos = jnp.stack([x, y, z], axis=-1) + target

    rot = _batched_look_at(campos, target)
    c2w = jnp.zeros(elevation.shape + (4, 4), jnp.float32)
    c2w = c2w.at[..., :3, :3].set(rot)
    c2w = c2w.at[..., :3, 3].set(campos)
    c2w = c2w.at[..., 3, 3].set(1.0)
    return c2w


def _batched_look_at(campos, target):
    fn = look_at
    for _ in range(campos.ndim - 1):
        fn = jax.vmap(fn)
    return fn(campos, target)


def perspective(fovy_deg, aspect=1.0, near=0.01, far=100.0):
    """OpenGL perspective projection 4x4 (z_clip in [-1, 1]).

    Counterpart of reference `shared_utils/camera_utils.py:174-186`.
    """
    fovy = jnp.deg2rad(jnp.asarray(fovy_deg, jnp.float32))
    f = 1.0 / jnp.tan(fovy / 2.0)
    z = jnp.zeros(jnp.shape(fovy) + (4, 4), jnp.float32)
    z = z.at[..., 0, 0].set(f / aspect)
    z = z.at[..., 1, 1].set(f)
    z = z.at[..., 2, 2].set((far + near) / (near - far))
    z = z.at[..., 2, 3].set(2.0 * far * near / (near - far))
    z = z.at[..., 3, 2].set(-1.0)
    return z


def orthographic(left=-1.0, right=1.0, bottom=-1.0, top=1.0,
                 near=0.01, far=100.0):
    """OpenGL orthographic projection 4x4 (z_clip in [-1, 1]) — the
    MV-Adapter render camera (`mvadapter/utils/camera.py`
    get_orthogonal_camera; used with ±0.55 bounds,
    mvadapter_node_utils.py:175-183)."""
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = -2.0 / (far - near)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -(far + near) / (far - near)
    m[3, 3] = 1.0
    return jnp.asarray(m)


def invert_rigid(c2w):
    """Fast inverse of a rigid 4x4 (rotation+translation)."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[..., :3, :3].set(Rt)
    w2c = w2c.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    w2c = w2c.at[..., 3, 3].set(1.0)
    return w2c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A batch of pinhole cameras as a pytree of arrays.

    Replaces the reference's `OrbitCamera`/`MiniCam` objects
    (`shared_utils/camera_utils.py:88-214`) with a vmap/shard-friendly
    container. All fields broadcast over a shared leading batch shape.
    """

    c2w: jnp.ndarray          # [..., 4, 4]
    fovy_deg: jnp.ndarray     # [...]
    width: int = dataclasses.field(metadata=dict(static=True), default=512)
    height: int = dataclasses.field(metadata=dict(static=True), default=512)
    near: float = dataclasses.field(metadata=dict(static=True), default=0.01)
    far: float = dataclasses.field(metadata=dict(static=True), default=100.0)

    @property
    def batch_shape(self):
        return self.c2w.shape[:-2]

    @property
    def aspect(self):
        return self.width / self.height

    @property
    def campos(self):
        return self.c2w[..., :3, 3]

    @property
    def w2c(self):
        return invert_rigid(self.c2w)

    @property
    def proj(self):
        return perspective(self.fovy_deg, self.aspect, self.near, self.far)

    @property
    def view_proj(self):
        return jnp.einsum("...ij,...jk->...ik", self.proj, self.w2c)

    @property
    def intrinsics(self):
        """[..., 4] = (fx, fy, cx, cy) in pixels."""
        fovy = jnp.deg2rad(self.fovy_deg)
        fy = 0.5 * self.height / jnp.tan(0.5 * fovy)
        fx = fy  # square pixels; fovx derived from aspect
        cx = jnp.full_like(fx, self.width / 2.0)
        cy = jnp.full_like(fy, self.height / 2.0)
        return jnp.stack([jnp.broadcast_to(fx, cx.shape), fy, cx, cy], -1)

    @classmethod
    def from_orbit(cls, elevation_deg, azimuth_deg, radius, target=None,
                   fovy_deg=49.1, width=512, height=512,
                   near=0.01, far=100.0) -> "Camera":
        c2w = orbit_c2w(elevation_deg, azimuth_deg, radius, target)
        fov = jnp.broadcast_to(jnp.asarray(fovy_deg, jnp.float32),
                               c2w.shape[:-2])
        return cls(c2w=c2w, fovy_deg=fov, width=width, height=height,
                   near=near, far=far)

    @classmethod
    def from_camposes(cls, camposes, fovy_deg=49.1, width=512, height=512,
                      near=0.01, far=100.0) -> "Camera":
        """Build from reference-format ORBIT_CAMPOSES rows
        [radius, elevation, azimuth, cx, cy, cz]."""
        arr = jnp.asarray(camposes, jnp.float32)
        return cls.from_orbit(arr[..., 1], arr[..., 2], arr[..., 0],
                              target=arr[..., 3:6], fovy_deg=fovy_deg,
                              width=width, height=height, near=near, far=far)


def compose_orbit_camposes(radii, elevations, azimuths,
                           centers_x=None, centers_y=None, centers_z=None):
    """Stack per-axis lists into ORBIT_CAMPOSES rows; counterpart of
    reference `shared_utils/camera_utils.py:276-288`."""
    n = len(radii)
    cx = centers_x if centers_x is not None else [0.0] * n
    cy = centers_y if centers_y is not None else [0.0] * n
    cz = centers_z if centers_z is not None else [0.0] * n
    return [[float(radii[i]), float(elevations[i]), float(azimuths[i]),
             float(cx[i]), float(cy[i]), float(cz[i])] for i in range(n)]


def get_rays(camera: Camera, normalize_dirs: bool = True
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray origins and directions, [..., H, W, 3].

    Counterpart of reference `MVs_Algorithms/NeRF/Instant_NGP.py:37-70`,
    but batched over the camera pytree (vmap over views is free).
    """
    H, W = camera.height, camera.width
    intr = camera.intrinsics
    fx, fy = intr[..., 0], intr[..., 1]
    cx, cy = intr[..., 2], intr[..., 3]

    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]

    bshape = camera.batch_shape
    expand = (...,) + (None,) * 2
    dir_x = (px - cx[expand]) / fx[expand]
    dir_y = -(py - cy[expand]) / fy[expand]       # +Y up in camera space
    dir_z = -jnp.ones_like(dir_x)                 # looks down -Z
    dirs_cam = jnp.stack([dir_x, dir_y, dir_z], -1)

    R = camera.c2w[..., :3, :3]
    dirs = jnp.einsum("...ij,...hwj->...hwi", R, dirs_cam)
    if normalize_dirs:
        dirs = _normalize(dirs)
    origins = jnp.broadcast_to(camera.campos[..., None, None, :],
                               bshape + (H, W, 3))
    return origins, dirs
