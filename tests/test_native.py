"""Native (C++/ctypes) mesh-ops tests + the nodes that wrap them."""

import numpy as np
import pytest

from comfy3d_tpu import native
from tests.test_algorithms import icosphere


class TestInpaint:
    def test_diffuses_colors(self):
        mesh = icosphere(subdiv=2)
        v, f = mesh.v, mesh.f
        colors = np.zeros((len(v), 3), np.float32)
        mask = np.zeros(len(v), bool)
        # paint the top hemisphere red
        top = v[:, 1] > 0.2
        colors[top] = [1.0, 0.0, 0.0]
        mask[top] = True
        out, filled = native.inpaint_vertex_colors(colors, mask, f)
        assert filled.all()
        np.testing.assert_allclose(out[~top][:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(out[~top][:, 1], 0.0, atol=1e-5)

    def test_painted_unchanged(self):
        mesh = icosphere(subdiv=1)
        colors = np.random.RandomState(0).rand(
            mesh.num_vertices, 3).astype(np.float32)
        mask = np.ones(mesh.num_vertices, bool)
        mask[:3] = False
        out, _ = native.inpaint_vertex_colors(colors, mask, mesh.f)
        np.testing.assert_array_equal(out[3:], colors[3:])


class TestCleanMesh:
    def test_welds_duplicates(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        ov, of = native.clean_mesh(v, f, weld_eps=1e-5)
        assert len(ov) == 4
        assert len(of) == 2

    def test_drops_degenerate_and_duplicate_faces(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2], [0, 1, 1], [0, 1, 2]], np.int32)
        _, of = native.clean_mesh(v, f)
        assert len(of) == 1

    def test_drops_dust_components(self):
        big = icosphere(subdiv=2)
        tiny = np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]], np.float32)
        v = np.concatenate([big.v, tiny])
        f = np.concatenate([big.f, np.array(
            [[len(big.v), len(big.v) + 1, len(big.v) + 2]], np.int32)])
        ov, of = native.clean_mesh(v, f, min_component_frac=0.1)
        assert len(of) == big.num_faces
        assert len(ov) == big.num_vertices


class TestDecimate:
    def test_reduces_face_count_preserves_shape(self):
        mesh = icosphere(subdiv=3, radius=0.6)   # 1280 faces
        ov, of = native.decimate_mesh(mesh.v, mesh.f, 300)
        assert len(of) <= 320
        assert len(of) >= 150
        radii = np.linalg.norm(ov, axis=-1)
        np.testing.assert_allclose(radii.mean(), 0.6, atol=0.05)
        assert radii.std() < 0.05

    def test_noop_when_under_target(self):
        mesh = icosphere(subdiv=0)
        ov, of = native.decimate_mesh(mesh.v, mesh.f, 100)
        assert len(of) == mesh.num_faces

    def test_valid_topology(self):
        mesh = icosphere(subdiv=3)
        ov, of = native.decimate_mesh(mesh.v, mesh.f, 200)
        assert of.min() >= 0 and of.max() < len(ov)
        # no degenerate faces
        assert ((of[:, 0] != of[:, 1]) & (of[:, 1] != of[:, 2])
                & (of[:, 0] != of[:, 2])).all()
