"""3D Gaussian Splat container.

Counterpart of the parameter block of the reference `GaussianModel`
(`MVs_Algorithms/GaussianSplatting/main_3DGS_renderer.py:217-323`) and the
GS-PLY attribute schema (`mesh_processer/mesh_utils.py:333-392`), redesigned
as an immutable pytree so an entire splat set jits/vmaps/shards directly.

Storage is in *raw* (pre-activation) space exactly like the reference so the
PLY files interoperate bit-for-bit:
  xyz [N,3];  sh [N, K, 3] SH coefficients (K=(deg+1)^2, row 0 = DC);
  opacity_raw [N] (sigmoid→opacity);  scale_raw [N,3] (exp→scale);
  rot_raw [N,4] quaternion wxyz (normalize→unit).

Padded capacity: `alive` marks real Gaussians. Densify/prune under jit keep
the leading dimension fixed and toggle `alive` (SURVEY.md §7 hard-part #2:
the JAX answer to the reference's optimizer-tensor reallocation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import sh as sh_utils


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianSplat:
    xyz: jnp.ndarray           # [N, 3]
    sh: jnp.ndarray            # [N, K, 3]
    opacity_raw: jnp.ndarray   # [N]
    scale_raw: jnp.ndarray     # [N, 3]
    rot_raw: jnp.ndarray       # [N, 4] wxyz
    alive: jnp.ndarray         # [N] bool

    # ---------------- activations (ref renderer.py:230-268) -------------- #
    @property
    def num_capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def opacity(self):
        return jax.nn.sigmoid(self.opacity_raw)

    @property
    def scale(self):
        return jnp.exp(self.scale_raw)

    @property
    def rotation(self):
        q = self.rot_raw
        return q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)

    @property
    def sh_degree(self) -> int:
        return int(round(self.sh.shape[1] ** 0.5)) - 1

    def colors_toward(self, campos: jnp.ndarray) -> jnp.ndarray:
        """View-dependent RGB via SH toward a camera position. [N, 3]."""
        dirs = self.xyz - campos[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        shc = jnp.swapaxes(self.sh, 1, 2)  # [N, 3, K]
        rgb = sh_utils.eval_sh(self.sh_degree, shc, dirs)
        return jnp.clip(rgb + 0.5, 0.0, 1.0)

    def covariance(self) -> jnp.ndarray:
        """3D covariance Σ = R S Sᵀ Rᵀ, [N, 3, 3]."""
        R = quat_to_rotmat(self.rotation)
        S = self.scale
        RS = R * S[:, None, :]
        return jnp.einsum("nij,nkj->nik", RS, RS)

    # ---------------- constructors -------------------------------------- #
    @classmethod
    def from_points(cls, points, colors=None, sh_degree: int = 0,
                    capacity: int | None = None,
                    initial_scale: float | None = None) -> "GaussianSplat":
        """Init from a point cloud (ref `create_from_pcd`, renderer.py:407).

        Scales default to the mean nearest-neighbor spacing heuristic; we use
        a cheap global density estimate instead of exact KNN at init.
        """
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        cap = capacity or n
        K = (sh_degree + 1) ** 2

        if colors is None:
            colors = np.full((n, 3), 0.5, np.float32)
        sh = np.zeros((cap, K, 3), np.float32)
        sh[:n, 0] = sh_utils.rgb_to_sh(np.asarray(colors, np.float32))

        if initial_scale is None:
            extent = float((points.max(0) - points.min(0)).max()) if n else 1.0
            initial_scale = max(extent / max(n, 1) ** (1.0 / 3.0), 1e-4)
        xyz = np.zeros((cap, 3), np.float32)
        xyz[:n] = points
        scale_raw = np.full((cap, 3), np.log(initial_scale), np.float32)
        rot_raw = np.zeros((cap, 4), np.float32)
        rot_raw[:, 0] = 1.0
        opacity_raw = np.full((cap,), _inverse_sigmoid(0.1), np.float32)
        alive = np.zeros((cap,), bool)
        alive[:n] = True
        return cls(xyz=jnp.asarray(xyz), sh=jnp.asarray(sh),
                   opacity_raw=jnp.asarray(opacity_raw),
                   scale_raw=jnp.asarray(scale_raw),
                   rot_raw=jnp.asarray(rot_raw), alive=jnp.asarray(alive))

    @classmethod
    def random(cls, key, n: int, sh_degree: int = 0, radius: float = 0.5
               ) -> "GaussianSplat":
        """Random sphere init (ref `initialize(num_pts)`, renderer.py:526)."""
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
        pts = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-6)
        pts = pts * jax.random.uniform(k2, (n, 1)) ** (1.0 / 3.0) * radius
        return cls.from_points(np.asarray(pts), sh_degree=sh_degree)

    # ---------------- PLY interop (schema: mesh_utils.py:333-392) -------- #
    def to_ply_arrays(self):
        """Dict of numpy arrays matching the reference GS-PLY column order."""
        n = self.num_capacity
        alive = np.asarray(self.alive)
        K = self.sh.shape[1]
        f_dc = np.asarray(self.sh[:, 0, :])                     # [N, 3]
        f_rest = np.asarray(self.sh[:, 1:, :])                  # [N, K-1, 3]
        # reference layout: f_rest stored channel-major (transpose(1,2))
        f_rest = np.transpose(f_rest, (0, 2, 1)).reshape(n, 3 * (K - 1))
        out = {
            "xyz": np.asarray(self.xyz),
            "normals": np.zeros((n, 3), np.float32),
            "f_dc": f_dc,
            "f_rest": f_rest,
            "opacity": np.asarray(self.opacity_raw)[:, None],
            "scale": np.asarray(self.scale_raw),
            "rotation": np.asarray(self.rot_raw),
        }
        return {k: v[alive] for k, v in out.items()}

    @classmethod
    def from_ply_arrays(cls, xyz, f_dc, f_rest, opacity, scale, rotation,
                        capacity: int | None = None) -> "GaussianSplat":
        n = xyz.shape[0]
        cap = capacity or n
        rest_cols = f_rest.shape[1] if f_rest is not None else 0
        K = 1 + rest_cols // 3
        sh = np.zeros((cap, K, 3), np.float32)
        sh[:n, 0] = f_dc
        if rest_cols:
            sh[:n, 1:] = np.transpose(
                f_rest.reshape(n, 3, K - 1), (0, 2, 1))

        def padded(a, shape):
            out = np.zeros((cap,) + shape, np.float32)
            out[:n] = a.reshape((n,) + shape)
            return out

        alive = np.zeros((cap,), bool)
        alive[:n] = True
        rot = padded(rotation, (4,))
        rot[n:, 0] = 1.0
        return cls(xyz=jnp.asarray(padded(xyz, (3,))),
                   sh=jnp.asarray(sh),
                   opacity_raw=jnp.asarray(padded(opacity, ())),
                   scale_raw=jnp.asarray(padded(scale, (3,))),
                   rot_raw=jnp.asarray(rot),
                   alive=jnp.asarray(alive))

    def switch_axis(self, spec: str = "+x+y+z") -> "GaussianSplat":
        """Axis remap for splats (ref `mesh_utils.py:443-487`). Rotates xyz
        and the quaternion frame; SH beyond DC are left as-is (same
        approximation as the reference, which only permutes positions)."""
        from .mesh import _parse_axis_spec
        parts = _parse_axis_spec(spec)
        perm = [idx for _, idx in parts]
        signs = jnp.array([s for s, _ in parts], jnp.float32)
        xyz = self.xyz[:, perm] * signs[None, :]
        scale_raw = self.scale_raw[:, perm]
        m = np.zeros((3, 3), np.float32)
        for i, (s, idx) in enumerate(parts):
            m[i, idx] = s
        R = quat_to_rotmat(self.rotation)
        R2 = jnp.einsum("ij,njk->nik", jnp.asarray(m), R)
        rot = rotmat_to_quat(R2)
        return dataclasses.replace(self, xyz=xyz, scale_raw=scale_raw,
                                   rot_raw=rot)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (wxyz) → rotation matrix. [..., 4] → [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → quaternion wxyz, branchless (numerically safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(1 + tr, 1e-12)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 1e-12)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 1e-12)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 1e-12)) / 2
    cand = jnp.stack([
        jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw),
                   (m10 - m01) / (4 * qw)], -1),
        jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx),
                   (m02 + m20) / (4 * qx)], -1),
        jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy,
                   (m12 + m21) / (4 * qy)], -1),
        jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz),
                   (m12 + m21) / (4 * qz), qz], -1),
    ], -2)  # [..., 4, 4]
    pick = jnp.argmax(jnp.stack([tr, m00, m11, m22], -1), axis=-1)
    q = jnp.take_along_axis(cand, pick[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1.0 - x)))
