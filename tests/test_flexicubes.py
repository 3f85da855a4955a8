"""FlexiCubes extraction (ops.flexicubes): geometry correctness on an
analytic SDF, the 21-weight knobs, L_dev, gradient flow, and the
sdf_fit engine integration (reference
MVs_Algorithms/FlexiCubes/{flexicubes.py,flexicubes_trainer.py})."""

import pytest

# compile-heavy tier — excluded from the <2 min CI smoke job
pytestmark = pytest.mark.heavy

import numpy as np

import jax
import jax.numpy as jnp

from comfy3d_tpu.ops import flexicubes as FC


def _sphere(res, r=0.6):
    verts = FC.grid_verts(res)
    sdf = np.linalg.norm(verts, axis=-1) - r
    return jnp.asarray(sdf), jnp.asarray(verts)


def _mesh_from(vd, vd_valid, faces, face_valid):
    vd = np.asarray(vd)
    faces = np.asarray(faces)[np.asarray(face_valid)]
    return vd, faces


def test_sphere_extraction_geometry():
    res = 16
    sdf, verts = _sphere(res)
    vd, vd_valid, faces, face_valid, l_dev = FC.flexicubes(
        sdf, verts, res)
    vd_np, f = _mesh_from(vd, vd_valid, faces, face_valid)
    assert f.shape[0] > 100
    used = np.unique(f)
    radii = np.linalg.norm(vd_np[used], axis=-1)
    # dual vertices hug the 0.6-radius isosurface
    assert abs(float(radii.mean()) - 0.6) < 0.05
    assert float(np.abs(radii - 0.6).max()) < 2.2 / res
    # default weights → L_dev small but finite
    assert np.isfinite(float(l_dev))


def test_faces_index_valid_dual_vertices():
    res = 8
    sdf, verts = _sphere(res)
    vd, vd_valid, faces, face_valid, _ = FC.flexicubes(sdf, verts, res)
    f = np.asarray(faces)[np.asarray(face_valid)]
    assert np.asarray(vd_valid)[np.unique(f)].all()


def test_weights_change_surface():
    """The 21 per-cube weights must actually move the surface (the
    whole point of FlexiCubes vs plain DMC)."""
    res = 8
    sdf, verts = _sphere(res)
    n = res ** 3
    w0 = jnp.zeros((n, 21))
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((n, 21)).astype(np.float32))
    vd0, valid0, *_ = FC.flexicubes(sdf, verts, res, weights=w0)
    vd1, valid1, *_ = FC.flexicubes(sdf, verts, res, weights=w1)
    m = np.asarray(valid0) & np.asarray(valid1)
    diff = np.abs(np.asarray(vd0)[m] - np.asarray(vd1)[m]).max()
    assert diff > 1e-3


def test_gamma_changes_triangulation():
    res = 8
    sdf, verts = _sphere(res)
    n = res ** 3
    w_lo = jnp.zeros((n, 21)).at[:, 20].set(-3.0)
    w_alt = jnp.zeros((n, 21)).at[::2, 20].set(3.0).at[1::2, 20].set(
        -3.0)
    _, _, f0, fv0, _ = FC.flexicubes(sdf, verts, res, weights=w_lo)
    _, _, f1, fv1, _ = FC.flexicubes(sdf, verts, res, weights=w_alt)
    assert not np.array_equal(np.asarray(f0)[np.asarray(fv0)],
                              np.asarray(f1)[np.asarray(fv1)])


def test_training_mode_differentiable():
    """Gradients reach sdf, deform-ed verts and all 21 weights through
    the training-mode extraction (γ-weighted quad centers)."""
    res = 6
    sdf, verts = _sphere(res)
    n = res ** 3
    w = jnp.zeros((n, 21))

    def loss(sdf_, verts_, w_):
        vd, vdv, faces, fv, l_dev = FC.flexicubes(
            sdf_, verts_, res, weights=w_, training=True)
        tris = vd[faces]
        cr = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        # eps under the sqrt: masked-out degenerate faces otherwise
        # NaN the gradient (0 · d||0|| = 0 · nan)
        area2 = jnp.sqrt((cr ** 2).sum(-1) + 1e-12)
        return (area2 * fv).sum() + l_dev

    gs, gv, gw = jax.grad(loss, argnums=(0, 1, 2))(sdf, verts, w)
    assert np.isfinite(np.asarray(gs)).all()
    assert float(jnp.abs(gs).max()) > 0
    assert float(jnp.abs(gv).max()) > 0
    # beta, alpha AND gamma slices all receive gradient
    gw = np.asarray(gw)
    assert np.abs(gw[:, :12]).max() > 0      # beta
    assert np.abs(gw[:, 12:20]).max() > 0    # alpha
    assert np.abs(gw[:, 20]).max() > 0       # gamma


def test_sdf_fit_flexicubes_engine():
    """sdf_fit with the flexicubes engine converges on a synthetic
    2-view scene and exposes the reference's knobs."""
    from comfy3d_tpu.algorithms import sdf_fit
    from comfy3d_tpu.core.camera import Camera
    from comfy3d_tpu.ops import rasterize as R

    # synthetic reference views of a cube mesh
    v = np.array([[x, y, z] for x in (-0.45, 0.45)
                  for y in (-0.45, 0.45) for z in (-0.45, 0.45)],
                 np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    cams = Camera.from_orbit(jnp.asarray([0.0, 20.0]),
                             jnp.asarray([0.0, 120.0]), 2.0,
                             width=48, height=48)
    masks, depths = [], []
    for i in range(2):
        rast = R.rasterize(jnp.asarray(v), jnp.asarray(f),
                           cams.view_proj[i], 48, 48)
        bary = R.recompute_barycentrics(jnp.asarray(v),
                                        cams.view_proj[i],
                                        jnp.asarray(f), rast)
        v_clip = R.project_vertices(jnp.asarray(v), cams.view_proj[i])
        _, w_view, _ = R.clip_to_screen(v_clip, 48, 48)
        d = R.interpolate(w_view[:, None], rast, jnp.asarray(f),
                          bary)[..., 0]
        masks.append(np.asarray(rast.mask, np.float32))
        depths.append(np.asarray(d))
    cfg = sdf_fit.SDFFitConfig(resolution=12, iterations=40,
                               batch_size=2, engine="flexicubes",
                               lambda_dev=0.5, lambda_weights=0.1)
    mesh = sdf_fit.fit(cams, np.stack(masks),
                       ref_depths=np.stack(depths), cfg=cfg)
    assert mesh.num_vertices > 0
    assert np.isfinite(np.asarray(mesh.v)).all()
    # fitted surface should stay near the unit cube's scale
    assert float(np.abs(np.asarray(mesh.v)).max()) < 1.1
