"""Isotropic remesh (native) + its product wiring.

Covers the reference roles that were remesh-shaped:
* pymeshlab `meshing_isotropic_explicit_remeshing`
  (`mesh_processer/mesh_utils.py:272`) → `native.isotropic_remesh`
* DiffRastMesh periodic remesh (`MVs_Algorithms/DiffRastMesh/
  diff_mesh.py:129-141`) → `DiffMeshConfig.remesh_every`
* StableFast3D `triangle_remesh` (`sf3d/models/mesh.py:170`) →
  `SF3DPipeline.generate_mesh(remesh="triangle")`
* Hunyuan 2.1 TexGen `use_remesh` (`hy3dpaint/utils/
  simplify_mesh_utils.py:19`: QEM simplify to 40k) → node widget
"""

import numpy as np
import pytest

from comfy3d_tpu import native


def icosphere_np(subdiv=0, radius=1.0):
    phi = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                  [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                  [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
                 np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2], [3, 2, 6],
                  [3, 6, 8], [3, 8, 9], [4, 9, 5], [2, 4, 11], [6, 2, 10],
                  [8, 6, 7], [9, 8, 1]], np.int32)
    for _ in range(subdiv):
        mid = {}
        vl = list(map(tuple, v))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                mid[key] = len(vl)
                p = (np.array(vl[a]) + np.array(vl[b])) / 2
                vl.append(tuple(p / np.linalg.norm(p)))
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(vl, np.float32)
        f = np.array(nf, np.int32)
    return v * radius, f


def edge_stats(v, f):
    e = np.concatenate([np.linalg.norm(v[f[:, 1]] - v[f[:, 0]], axis=1),
                        np.linalg.norm(v[f[:, 2]] - v[f[:, 1]], axis=1),
                        np.linalg.norm(v[f[:, 0]] - v[f[:, 2]], axis=1)])
    return e


def is_watertight(v, f):
    e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]),
                axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    return bool((cnt == 2).all())


class TestIsotropicRemesh:
    def test_refines_toward_target_edge_length(self):
        v, f = icosphere_np()
        rv, rf = native.isotropic_remesh(v, f, target_len=0.15,
                                         iterations=5)
        el = edge_stats(rv, rf)
        assert 0.07 < el.mean() < 0.25, el.mean()
        assert len(rf) > len(f) * 4          # genuinely refined

    def test_coarsens_dense_mesh(self):
        v, f = icosphere_np(subdiv=3)        # 1280 faces, edge ~0.066
        rv, rf = native.isotropic_remesh(v, f, target_len=0.35,
                                         iterations=5)
        assert len(rf) < len(f) / 3
        el = edge_stats(rv, rf)
        assert 0.2 < el.mean() < 0.55, el.mean()

    def test_preserves_watertightness_and_genus(self):
        for target in (0.15, 0.4):
            v, f = icosphere_np(subdiv=2)
            rv, rf = native.isotropic_remesh(v, f, target_len=target,
                                             iterations=4)
            assert is_watertight(rv, rf)
            e = np.sort(np.concatenate(
                [rf[:, [0, 1]], rf[:, [1, 2]], rf[:, [2, 0]]]), axis=1)
            n_edges = len(np.unique(e, axis=0))
            assert len(rv) - n_edges + len(rf) == 2   # sphere Euler char

    def test_shape_roughly_preserved(self):
        v, f = icosphere_np(subdiv=2)
        rv, rf = native.isotropic_remesh(v, f, target_len=0.2,
                                         iterations=4)
        r = np.linalg.norm(rv, axis=1)
        assert 0.85 < r.mean() < 1.05, r.mean()

    def test_target_frac_default(self):
        v, f = icosphere_np(subdiv=1)
        rv, rf = native.isotropic_remesh(v, f, target_frac=0.05,
                                         iterations=3)
        diag = np.linalg.norm(v.max(0) - v.min(0))
        el = edge_stats(rv, rf)
        assert el.mean() < 0.09 * diag

    def test_empty_mesh_passthrough(self):
        rv, rf = native.isotropic_remesh(np.zeros((0, 3), np.float32),
                                         np.zeros((0, 3), np.int32))
        assert len(rv) == 0 and len(rf) == 0


class TestDiffMeshPeriodicRemesh:
    def test_remesh_changes_topology_during_fit(self):
        import jax.numpy as jnp

        from comfy3d_tpu.algorithms import diff_mesh
        from comfy3d_tpu.core.camera import Camera
        from comfy3d_tpu.core.mesh import Mesh
        from comfy3d_tpu.ops import mesh_render

        v, f = icosphere_np(subdiv=1, radius=0.7)
        mesh = Mesh(v=v, f=f).auto_normal()
        cams = Camera.from_orbit(jnp.full((3,), 15.0),
                                 jnp.arange(3) * 120.0, 2.0,
                                 width=32, height=32)
        ref = mesh_render.render_mesh(jnp.asarray(v), jnp.asarray(f),
                                      cams, method="bruteforce")
        base = diff_mesh.DiffMeshConfig(iterations=20, batch_size=1,
                                        method="bruteforce",
                                        remesh_size=0.08)
        out_off = diff_mesh.fit(mesh, cams, ref["image"], ref["alpha"],
                                dataclasses_replace(base, remesh_every=0))
        out_on = diff_mesh.fit(mesh, cams, ref["image"], ref["alpha"],
                               dataclasses_replace(base, remesh_every=10))
        assert out_off.num_faces == mesh.num_faces       # topology fixed
        assert out_on.num_faces != mesh.num_faces        # widget is live
        assert np.isfinite(out_on.v).all()
        assert out_on.vc is not None                     # colors survived


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


class TestSF3DRemeshOption:
    @pytest.mark.heavy
    def test_triangle_remesh_changes_output(self):
        from comfy3d_tpu.models.sf3d import SF3DConfig, SF3DPipeline

        import jax
        import jax.numpy as jnp

        from comfy3d_tpu.models.sf3d.pipeline import SF3DModel

        pipe = SF3DPipeline.init_random(cfg=SF3DConfig.tiny())
        img = np.random.RandomState(1).rand(28, 28, 3).astype(np.float32)
        planes = pipe.forward_planes(img)
        # random-init density needs a quantile threshold for a surface
        probe = jax.random.uniform(jax.random.PRNGKey(0), (512, 3),
                                   minval=-0.8, maxval=0.8)
        dens = pipe.model.apply({"params": pipe.params}, planes[0],
                                probe, method=SF3DModel.query,
                                include=("density",))["density"]
        thr = float(np.quantile(np.asarray(dens), 0.9))
        m_none = pipe.generate_mesh(planes[0], threshold=thr,
                                    texture_size=32, remesh="none")
        m_tri = pipe.generate_mesh(planes[0], threshold=thr,
                                   texture_size=32, remesh="triangle")
        if m_none.num_vertices == 0:
            pytest.skip("random field produced no surface")
        # remeshing at the mean edge length regularizes topology —
        # vertex count must actually change
        assert m_tri.num_vertices != m_none.num_vertices
        assert np.isfinite(m_tri.v).all()
        assert m_tri.vt is not None                      # re-unwrapped


class TestHunyuanTexGenRemesh:
    def test_use_remesh_decimates_to_40k(self):
        from comfy3d_tpu.core.mesh import Mesh
        from comfy3d_tpu.models.hunyuan3d import Hunyuan3DPaintPipeline
        from comfy3d_tpu.nodes.nodes_texture import Hunyuan3D_21_TexGen

        v, f = icosphere_np(subdiv=4)                    # 5120 faces

        calls = {}

        class FakePipe(Hunyuan3DPaintPipeline):
            default_steps = 1

            def __init__(self):
                pass

            def __call__(self, mesh, img, num_steps=1):
                calls["faces"] = mesh.num_faces
                return mesh

        node = Hunyuan3D_21_TexGen()
        img = np.zeros((8, 8, 3), np.float32)
        mesh = Mesh(v=v, f=f)
        (out_plain,) = node.generate(FakePipe(), image=img,
                                     mesh=mesh, use_remesh=False)
        plain_faces = calls["faces"]
        # a mesh already under 40k faces passes through ~unchanged;
        # use_remesh must still run the decimate path (observable via
        # the 40k cap on a >40k mesh)
        big_v, big_f = icosphere_np(subdiv=5)            # 20480 faces
        big = Mesh(v=np.concatenate([big_v, big_v + 3.0]),
                   f=np.concatenate([big_f, big_f + len(big_v)]))
        (out_re,) = node.generate(FakePipe(), image=img, mesh=big,
                                  use_remesh=True)
        assert calls["faces"] <= 40000
        assert plain_faces == 5120
        assert out_re.num_faces != 0
