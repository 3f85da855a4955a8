"""Node layer + workflow executor tests, including the TripoSR_to_Mesh
example workflow run headlessly (SURVEY.md §4: workflow JSONs are the
acceptance fixtures)."""

import json
import os

import numpy as np
import pytest

import comfy3d_tpu.nodes as nodes_pkg
from comfy3d_tpu.nodes import NODE_CLASS_MAPPINGS, run_workflow
from comfy3d_tpu.nodes import base as node_base


@pytest.fixture(autouse=True)
def io_dirs(tmp_path, monkeypatch):
    monkeypatch.setattr(node_base, "INPUT_ROOT_PATH", str(tmp_path / "in"))
    monkeypatch.setattr(node_base, "OUTPUT_ROOT_PATH",
                        str(tmp_path / "out"))
    os.makedirs(tmp_path / "in", exist_ok=True)
    os.makedirs(tmp_path / "out", exist_ok=True)
    return tmp_path


def make_test_image(path, size=64):
    import cv2
    rgba = np.zeros((size, size, 4), np.uint8)
    cv2.circle(rgba, (size // 2, size // 2), size // 3,
               (40, 90, 200, 255), -1)
    cv2.imwrite(str(path), rgba)


class TestRegistry:
    def test_core_nodes_registered(self):
        for name in ["[Comfy3D] Load 3D Mesh", "[Comfy3D] Save 3D Mesh",
                     "[Comfy3D] Load 3DGS", "[Comfy3D] Save 3DGS",
                     "[Comfy3D] Preview 3DMesh", "[Comfy3D] Preview 3DGS",
                     "[Comfy3D] Switch Mesh Axis",
                     "[Comfy3D] Stack Orbit Camera Poses",
                     "[Comfy3D] Mesh Orbit Renderer",
                     "[Comfy3D] Gaussian Splatting Orbit Renderer",
                     "[Comfy3D] Gaussian Splatting 3D",
                     "[Comfy3D] Instant NGP",
                     "[Comfy3D] FlexiCubes MVS",
                     "[Comfy3D] Load TripoSR Model", "[Comfy3D] TripoSR",
                     "LoadImage", "InvertMask", "SaveImage"]:
            assert name in NODE_CLASS_MAPPINGS, name

    def test_node_protocol(self):
        for name, cls in NODE_CLASS_MAPPINGS.items():
            spec = cls.INPUT_TYPES()
            assert isinstance(spec, dict) and "required" in spec, name
            assert hasattr(cls, "FUNCTION"), name
            assert hasattr(cls, "RETURN_TYPES"), name
            assert callable(getattr(cls, cls.FUNCTION, None)), name


class TestIndividualNodes:
    def test_mesh_roundtrip_nodes(self, io_dirs):
        from comfy3d_tpu.core.mesh import Mesh
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        Mesh(v=v, f=f).write(str(io_dirs / "in" / "tri.obj"))

        load = NODE_CLASS_MAPPINGS["[Comfy3D] Load 3D Mesh"]()
        (mesh,) = load.load_mesh("tri.obj")
        assert mesh.num_faces == 1

        save = NODE_CLASS_MAPPINGS["[Comfy3D] Save 3D Mesh"]()
        (path,) = save.save_mesh(mesh, "sub/out.ply")
        assert os.path.exists(path)

    def test_stack_orbit_camera_poses(self):
        node = NODE_CLASS_MAPPINGS["[Comfy3D] Stack Orbit Camera Poses"]()
        poses, rl, el, al = node.stack_poses(
            2.0, 2.0, 0.1, 0.0, 0.0, 30.0, 0.0, 360.0, 90.0)
        assert len(poses) == 4
        assert al == [0.0, 90.0, 180.0, 270.0]
        assert all(len(p) == 6 for p in poses)

    def test_orbit_renderer_node(self):
        from comfy3d_tpu.core.mesh import Mesh
        t = 0.5
        v = np.array([[-t, -t, 0], [t, -t, 0], [t, t, 0], [-t, t, 0]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = Mesh(v=v, f=f).auto_normal()
        node = NODE_CLASS_MAPPINGS["[Comfy3D] Mesh Orbit Renderer"]()
        poses = [[2.0, 0.0, 0.0, 0, 0, 0], [2.0, 30.0, 90.0, 0, 0, 0]]
        imgs, masks, depths, normals, viewcos = node.render_mesh(
            mesh, 64, poses, 49.1)
        assert imgs.shape == (2, 64, 64, 3)
        assert masks[0, 32, 32] == 1.0

    def test_gs_renderer_node(self):
        import jax
        from comfy3d_tpu.core.gaussian import GaussianSplat
        splat = GaussianSplat.random(jax.random.PRNGKey(0), 64)
        node = NODE_CLASS_MAPPINGS[
            "[Comfy3D] Gaussian Splatting Orbit Renderer"]()
        imgs, masks, depths_gs = node.render_gs(
            splat, 64, [[2.0, 0.0, 0.0, 0, 0, 0]], 49.1)
        assert imgs.shape == (1, 64, 64, 3)

    def test_load_image_and_invert(self, io_dirs):
        make_test_image(io_dirs / "in" / "circle.png")
        img, mask = NODE_CLASS_MAPPINGS["LoadImage"]().load_image(
            "circle.png")
        assert img.shape == (1, 64, 64, 3)
        # ComfyUI: mask = 1 - alpha → center (opaque) is 0
        assert mask[0, 32, 32] == 0.0
        (inv,) = NODE_CLASS_MAPPINGS["InvertMask"]().invert(mask)
        assert inv[0, 32, 32] == 1.0


class TestWorkflowExecutor:
    @pytest.mark.heavy
    def test_runs_reference_triposr_workflow(self, io_dirs):
        """The actual reference example workflow JSON, with sizes dialed
        down and the real KungFuCat input swapped for a synthetic one."""
        wf_path = "/root/reference/example_workflows/TripoSR_to_Mesh.json"
        if not os.path.exists(wf_path):
            pytest.skip("reference workflows not mounted")
        make_test_image(io_dirs / "in" / "KungFuCat.png")
        wf = json.load(open(wf_path))
        overrides = {
            20: {"geometry_extract_resolution": 32,
                 "marching_cude_threshold": 0.5},
            14: {"save_path": "TripoSR_Test/out.obj"},
        }
        # shrink the TripoSR model: patch the loader to a tiny config
        from comfy3d_tpu.models.triposr import (TripoSRConfig,
                                                TripoSRPipeline)
        import comfy3d_tpu.nodes.nodes_models as nm
        tiny = TripoSRConfig(
            cond_image_size=64, plane_size=8, token_channels=64,
            num_layers=2, heads=4, dim_head=16, cross_attention_dim=48,
            triplane_channels=8, mlp_neurons=16, mlp_hidden_layers=2,
            vit_hidden=48, vit_layers=2, vit_heads=2)
        orig = nm.Load_TripoSR_Model.load_TSR
        nm.Load_TripoSR_Model.load_TSR = lambda self, *a, **k: (
            TripoSRPipeline.init_random(cfg=tiny),)
        try:
            results = run_workflow(wf, overrides=overrides)
        finally:
            nm.Load_TripoSR_Model.load_TSR = orig
        # node 20 = TripoSR → MESH; node 25 = Switch Mesh Axis;
        # node 14 = Save 3D Mesh → path
        assert 20 in results and 25 in results and 14 in results
        mesh = results[25][0]
        assert mesh is not None

    def test_synthetic_render_workflow(self, io_dirs):
        """Hand-built graph: poses → mesh load → orbit render → save."""
        from comfy3d_tpu.core.mesh import Mesh
        v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0],
                      [-0.5, 0.5, 0]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        Mesh(v=v, f=f).auto_normal().write(
            str(io_dirs / "in" / "quad.glb"))
        wf = {
            "nodes": [
                {"id": 1, "type": "[Comfy3D] Load 3D Mesh",
                 "widgets_values": ["quad.glb", False, True, False,
                                    False],
                 "inputs": [], "outputs": []},
                {"id": 2, "type": "[Comfy3D] Stack Orbit Camera Poses",
                 "widgets_values": [2.0, 2.0, 0.1, 0.0, 0.0, 30.0, 0.0,
                                    360.0, 180.0],
                 "inputs": [], "outputs": []},
                {"id": 3, "type": "[Comfy3D] Mesh Orbit Renderer",
                 "widgets_values": [32, 49.1, 1.0, 1.0, 1.0],
                 "inputs": [
                     {"name": "mesh", "link": 1},
                     {"name": "render_orbit_camera_poses", "link": 2}],
                 "outputs": []},
                {"id": 4, "type": "SaveImage",
                 "widgets_values": ["render"],
                 "inputs": [{"name": "images", "link": 3}],
                 "outputs": []},
            ],
            "links": [
                [1, 1, 0, 3, 0, "MESH"],
                [2, 2, 0, 3, 2, "ORBIT_CAMPOSES"],
                [3, 3, 0, 4, 0, "IMAGE"],
            ],
        }
        results = run_workflow(wf)
        imgs = results[3][0]
        assert imgs.shape == (2, 32, 32, 3)
        import glob
        assert glob.glob(str(io_dirs / "out" / "render_*.png"))

    def test_unknown_node_type_raises(self):
        from comfy3d_tpu.nodes.graph import WorkflowError
        wf = {"nodes": [{"id": 1, "type": "NoSuchNode",
                         "widgets_values": [], "inputs": []}],
              "links": []}
        with pytest.raises(WorkflowError, match="NoSuchNode"):
            run_workflow(wf)

    def test_cycle_detection(self):
        from comfy3d_tpu.nodes.graph import WorkflowError
        wf = {"nodes": [
            {"id": 1, "type": "InvertMask",
             "inputs": [{"name": "mask", "link": 2}]},
            {"id": 2, "type": "InvertMask",
             "inputs": [{"name": "mask", "link": 1}]},
        ], "links": [[1, 1, 0, 2, 0, "MASK"], [2, 2, 0, 1, 0, "MASK"]]}
        with pytest.raises(WorkflowError, match="cycle"):
            run_workflow(wf)


class TestFittingNodes:
    @pytest.mark.heavy
    def test_fitting_mesh_node(self, io_dirs):
        """DiffRastMesh node: auto-unwrap + short fit run end-to-end."""
        from tests.test_algorithms import icosphere
        import jax.numpy as jnp
        from comfy3d_tpu.ops import mesh_render
        mesh = icosphere(subdiv=1, radius=0.6)
        poses = [[2.0, 0.0, a, 0, 0, 0] for a in (0.0, 120.0, 240.0)]
        from comfy3d_tpu.core.camera import Camera
        cams = Camera.from_camposes(poses, width=32, height=32)
        ref = mesh_render.render_mesh(jnp.asarray(mesh.v),
                                      jnp.asarray(mesh.f), cams,
                                      method="bruteforce")
        node = NODE_CLASS_MAPPINGS[
            "[Comfy3D] Fitting Mesh With Multiview Images"]()
        (out,) = node.fit_mesh(mesh, np.asarray(ref["image"]),
                               np.asarray(ref["alpha"]), poses, 49.1,
                               training_iterations=6, batch_size=1,
                               texture_resolution=64)
        assert out.vt is not None and out.albedo is not None
        assert out.albedo.shape == (64, 64, 3)

    def test_orbit_poses_jk(self):
        node = NODE_CLASS_MAPPINGS["[Comfy3D] OrbitPoses JK"]()
        (rows,) = node.get_camposes("SIX_VIEWS_ZERO123PLUS", 2.0)
        assert len(rows) == 6
        assert all(r[0] == 2.0 and len(r) == 6 for r in rows)
