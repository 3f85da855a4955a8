"""Unit tests for the core layer: cameras, SH, containers, I/O round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from comfy3d_tpu.core import camera as cam
from comfy3d_tpu.core import sh as sh_utils
from comfy3d_tpu.core.gaussian import (GaussianSplat, quat_to_rotmat,
                                       rotmat_to_quat)
from comfy3d_tpu.core.mesh import Mesh, vertex_normals_np
from comfy3d_tpu.core import image as img_utils
from comfy3d_tpu.core.io import (load_gs_ply, load_mesh, save_gs_ply,
                                 save_mesh)


# --------------------------------------------------------------------- #
# cameras
# --------------------------------------------------------------------- #
class TestCamera:
    def test_orbit_front_view(self):
        c2w = np.asarray(cam.orbit_c2w(0.0, 0.0, 2.0))
        np.testing.assert_allclose(c2w[:3, 3], [0, 0, 2], atol=1e-6)
        # camera back (+Z col) points from target to camera → +Z world
        np.testing.assert_allclose(c2w[:3, 2], [0, 0, 1], atol=1e-6)
        # up stays +Y
        np.testing.assert_allclose(c2w[:3, 1], [0, 1, 0], atol=1e-6)

    def test_orbit_elevation_sign(self):
        c2w = np.asarray(cam.orbit_c2w(90.0, 0.0, 3.0))
        np.testing.assert_allclose(c2w[:3, 3], [0, 3, 0], atol=1e-5)

    def test_rigid_inverse(self):
        c2w = cam.orbit_c2w(23.0, 117.0, 2.5, target=jnp.array([0.1, -0.2, 0.3]))
        ident = np.asarray(c2w @ cam.invert_rigid(c2w))
        np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)

    def test_batched_camera_pytree(self):
        c = cam.Camera.from_orbit(
            jnp.array([0.0, 30.0]), jnp.array([0.0, 90.0]), 2.0,
            width=64, height=64)
        assert c.batch_shape == (2,)
        assert c.view_proj.shape == (2, 4, 4)
        leaves = jax.tree_util.tree_leaves(c)
        assert all(isinstance(l, jnp.ndarray) for l in leaves)

    def test_projection_of_center_point(self):
        c = cam.Camera.from_orbit(0.0, 0.0, 2.0, width=128, height=128)
        p = jnp.array([0.0, 0.0, 0.0, 1.0])
        clip = c.view_proj @ p
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(np.asarray(ndc[:2]), [0, 0], atol=1e-6)
        assert -1 <= float(ndc[2]) <= 1

    def test_get_rays_through_center(self):
        c = cam.Camera.from_orbit(0.0, 0.0, 2.0, width=33, height=33)
        o, d = cam.get_rays(c)
        assert o.shape == (33, 33, 3) and d.shape == (33, 33, 3)
        center_dir = np.asarray(d[16, 16])
        np.testing.assert_allclose(center_dir, [0, 0, -1], atol=0.05)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1),
                                   1.0, atol=1e-5)

    def test_from_camposes_roundtrip(self):
        rows = cam.compose_orbit_camposes([2.0, 3.0], [10.0, -20.0],
                                          [45.0, 180.0])
        c = cam.Camera.from_camposes(rows, width=32, height=32)
        assert c.batch_shape == (2,)
        r = np.linalg.norm(np.asarray(c.campos), axis=-1)
        np.testing.assert_allclose(r, [2.0, 3.0], atol=1e-5)


# --------------------------------------------------------------------- #
# spherical harmonics
# --------------------------------------------------------------------- #
class TestSH:
    def test_dc_only(self):
        sh = jnp.zeros((5, 3, 1)).at[:, :, 0].set(1.0)
        dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_utils.eval_sh(0, sh, dirs)
        np.testing.assert_allclose(np.asarray(out), sh_utils.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            np.asarray(sh_utils.sh_to_rgb(sh_utils.rgb_to_sh(rgb))),
            np.asarray(rgb), atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_higher_degrees_finite_and_direction_dependent(self, deg):
        K = (deg + 1) ** 2
        sh = jax.random.normal(jax.random.PRNGKey(deg), (4, 3, K)) * 0.3
        d1 = jnp.array([[0.0, 0.0, 1.0]] * 4)
        d2 = jnp.array([[1.0, 0.0, 0.0]] * 4)
        o1, o2 = sh_utils.eval_sh(deg, sh, d1), sh_utils.eval_sh(deg, sh, d2)
        assert np.all(np.isfinite(np.asarray(o1)))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


# --------------------------------------------------------------------- #
# mesh container
# --------------------------------------------------------------------- #
def unit_tetra():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return Mesh(v=v, f=f)


class TestMesh:
    def test_auto_size(self):
        m = unit_tetra().auto_size(bound=0.9)
        lo, hi = m.aabb()
        assert max(hi) <= 0.9 + 1e-5 and min(lo) >= -0.9 - 1e-5
        assert np.isclose((hi - lo).max(), 1.8, atol=1e-5)

    def test_auto_normal_outward(self):
        m = unit_tetra().auto_normal()
        center = m.v.mean(0)
        # normals of a convex solid with outward winding point away
        dots = ((m.v - center) * m.vn).sum(-1)
        assert (dots > 0).all()
        np.testing.assert_allclose(np.linalg.norm(m.vn, axis=-1), 1.0,
                                   atol=1e-5)

    def test_switch_axis_reflection_flips_winding(self):
        m = unit_tetra()
        m2 = m.switch_axis("-x+y+z")
        np.testing.assert_allclose(m2.v[:, 0], -m.v[:, 0])
        assert (m2.f == m.f[:, ::-1]).all()

    def test_switch_axis_rotation_keeps_winding(self):
        m = unit_tetra()
        m2 = m.switch_axis("+y+z+x")
        assert (m2.f == m.f).all()

    def test_device_arrays_padded(self):
        m = unit_tetra()
        d = m.device_arrays(capacity_v=16, capacity_f=8)
        assert d["v"].shape == (16, 3) and d["f"].shape == (8, 3)
        assert int(d["num_v"]) == 4 and int(d["num_f"]) == 4

    def test_vertex_normals_np_matches_flat_quad(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        vn = vertex_normals_np(v, f)
        np.testing.assert_allclose(vn, [[0, 0, 1]] * 4, atol=1e-6)


# --------------------------------------------------------------------- #
# gaussians
# --------------------------------------------------------------------- #
class TestGaussianSplat:
    def test_quat_roundtrip(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (32, 4))
        q /= jnp.linalg.norm(q, axis=-1, keepdims=True)
        # canonicalize sign (q and -q are the same rotation)
        q = q * jnp.sign(q[:, :1] + 1e-12)
        q2 = rotmat_to_quat(quat_to_rotmat(q))
        q2 = q2 * jnp.sign(q2[:, :1] + 1e-12)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-4)

    def test_from_points_activations(self):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        g = GaussianSplat.from_points(pts, capacity=128)
        assert g.num_capacity == 128
        assert int(np.asarray(g.alive).sum()) == 100
        np.testing.assert_allclose(np.asarray(g.opacity[:100]), 0.1,
                                   atol=1e-5)
        assert np.all(np.asarray(g.scale) > 0)

    def test_covariance_psd(self):
        g = GaussianSplat.random(jax.random.PRNGKey(1), 16)
        cov = np.asarray(g.covariance())
        eig = np.linalg.eigvalsh(cov)
        assert (eig > -1e-7).all()

    def test_colors_toward(self):
        g = GaussianSplat.random(jax.random.PRNGKey(2), 8)
        c = g.colors_toward(jnp.array([0.0, 0.0, 3.0]))
        assert c.shape == (8, 3)
        assert np.all(np.asarray(c) >= 0) and np.all(np.asarray(c) <= 1)


# --------------------------------------------------------------------- #
# I/O round-trips
# --------------------------------------------------------------------- #
class TestIO:
    def _textured_quad(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        vt = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        albedo = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        return Mesh(v=v, f=f, vt=vt, ft=f.copy(), albedo=albedo).auto_normal()

    def test_obj_roundtrip(self, tmp_path):
        m = self._textured_quad()
        p = str(tmp_path / "quad.obj")
        save_mesh(m, p)
        m2 = load_mesh(p)
        np.testing.assert_allclose(m2.v, m.v, atol=1e-5)
        assert (m2.f == m.f).all()
        np.testing.assert_allclose(m2.vt, m.vt, atol=1e-5)
        assert m2.albedo is not None
        np.testing.assert_allclose(m2.albedo, m.albedo, atol=2.0 / 255)

    def test_ply_roundtrip_binary(self, tmp_path):
        m = unit_tetra().auto_normal()
        m.vc = np.random.RandomState(1).rand(4, 3).astype(np.float32)
        p = str(tmp_path / "tetra.ply")
        save_mesh(m, p)
        m2 = load_mesh(p)
        np.testing.assert_allclose(m2.v, m.v, atol=1e-6)
        assert (m2.f == m.f).all()
        np.testing.assert_allclose(m2.vc, m.vc, atol=2.0 / 255)

    def test_glb_roundtrip(self, tmp_path):
        m = self._textured_quad()
        p = str(tmp_path / "quad.glb")
        save_mesh(m, p)
        m2 = load_mesh(p)
        assert m2.num_faces == m.num_faces
        # vertices may be re-welded; compare sets of face centroids
        c1 = np.sort(m.v[m.f].mean(1), axis=0)
        c2 = np.sort(m2.v[m2.f].mean(1), axis=0)
        np.testing.assert_allclose(c2, c1, atol=1e-5)
        assert m2.albedo is not None
        np.testing.assert_allclose(m2.albedo, m.albedo, atol=2.0 / 255)

    def test_gs_ply_roundtrip(self, tmp_path):
        g = GaussianSplat.random(jax.random.PRNGKey(3), 50, sh_degree=1)
        p = str(tmp_path / "splat.ply")
        save_gs_ply(p, g)
        g2 = load_gs_ply(p)
        np.testing.assert_allclose(np.asarray(g2.xyz), np.asarray(g.xyz),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g2.sh), np.asarray(g.sh),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g2.rot_raw),
                                   np.asarray(g.rot_raw), atol=1e-6)


# --------------------------------------------------------------------- #
# image utils
# --------------------------------------------------------------------- #
class TestImageUtils:
    def test_grid_roundtrip(self):
        imgs = np.random.RandomState(0).rand(6, 8, 8, 3).astype(np.float32)
        grid = img_utils.make_image_grid(imgs, 2, 3)
        assert grid.shape == (16, 24, 3)
        back = img_utils.split_image_grid(grid, 2, 3)
        np.testing.assert_allclose(back, imgs)

    def test_composite_background(self):
        img = jnp.zeros((1, 4, 4, 3))
        mask = jnp.zeros((1, 4, 4))
        out = img_utils.composite_background(img, mask, (1.0, 0.0, 0.0))
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [1, 0, 0])

    def test_dilate_texture_fills(self):
        img = jnp.zeros((8, 8, 3)).at[4, 4].set(jnp.array([1.0, 0.5, 0.25]))
        mask = jnp.zeros((8, 8)).at[4, 4].set(1.0)
        out = img_utils.dilate_texture(img, mask, iterations=8)
        np.testing.assert_allclose(np.asarray(out[0, 0]), [1.0, 0.5, 0.25],
                                   atol=1e-5)

    def test_erode_mask(self):
        m = jnp.ones((1, 8, 8)).at[:, :2].set(0.0)
        out = img_utils.erode_mask(m, 1)
        assert float(out[0, 2, 4]) == 0.0 and float(out[0, 4, 4]) == 1.0
