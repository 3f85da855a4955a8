"""Charted LSCM UV atlas (ops/uv_atlas.py, the xatlas role).

Checks: valid non-degenerate atlases on sphere/cube, conformality on a
developable chart (angles preserved), and a bake-reconstruction error
that beats the box-projection unwrap on a sphere (VERDICT item 7's
acceptance: no seam tears vs the box output)."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np

import jax.numpy as jnp

from comfy3d_tpu.ops import texture as T
from comfy3d_tpu.ops.uv_atlas import atlas_unwrap


def _sphere(n=24):
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.sin(tt) * np.sin(pp)
    z = np.cos(tt)
    v = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    f = []
    for i in range(n - 1):
        for j in range(2 * n):
            a = i * 2 * n + j
            b = i * 2 * n + (j + 1) % (2 * n)
            c = (i + 1) * 2 * n + j
            d = (i + 1) * 2 * n + (j + 1) % (2 * n)
            f += [[a, b, c], [b, d, c]]
    f = np.asarray(f, np.int64)
    # drop degenerate pole triangles
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    area = np.linalg.norm(np.cross(e1, e2), axis=1)
    return v, f[area > 1e-8]


def _uv_face_areas(vt, ft):
    e1 = vt[ft[:, 1]] - vt[ft[:, 0]]
    e2 = vt[ft[:, 2]] - vt[ft[:, 0]]
    return 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])


def test_sphere_atlas_valid():
    v, f = _sphere()
    vt, ft = atlas_unwrap(v, f)
    assert ft.shape == f.shape
    assert vt.min() >= -1e-6 and vt.max() <= 1.0 + 1e-6
    areas = _uv_face_areas(vt, ft)
    assert (areas > 1e-10).mean() > 0.995    # almost no degenerate UVs


def test_conformality_on_developable_chart():
    """A flat grid embedded in 3D must flatten angle-preserving."""
    n = 8
    gx, gy = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 2, n),
                         indexing="ij")
    v = np.stack([gx, gy, 0.3 * gx + 0.1 * gy], -1).reshape(-1, 3)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            f += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    f = np.asarray(f, np.int64)
    vt, ft = atlas_unwrap(v, f)

    def angles(p, faces):
        out = []
        for k in range(3):
            a = p[faces[:, k]]
            b = p[faces[:, (k + 1) % 3]]
            c = p[faces[:, (k + 2) % 3]]
            u, w = b - a, c - a
            cosang = np.einsum("ij,ij->i", u, w) / (
                np.linalg.norm(u, axis=1) * np.linalg.norm(w, axis=1))
            out.append(np.arccos(np.clip(cosang, -1, 1)))
        return np.stack(out, 1)

    a3d = angles(v, f)
    auv = angles(np.asarray(vt, np.float64), ft)
    assert np.abs(a3d - auv).max() < 0.05      # radians


def test_bake_reconstruction_beats_box():
    """Bake xyz-as-color into a texture with each unwrap and sample it
    back per face corner; the charted atlas must reconstruct better."""
    v, f = _sphere(16)
    colors = (v * 0.5 + 0.5).astype(np.float32)

    def roundtrip(vt, ft, size=256):
        tex = np.asarray(T.bake_vertex_colors(
            jnp.asarray(v), jnp.asarray(f), jnp.asarray(vt),
            jnp.asarray(ft), jnp.asarray(colors), texture_size=size))
        # sample the texture back at each face-corner UV
        uv = np.asarray(vt)[np.asarray(ft).reshape(-1)]
        px = np.clip((uv * (size - 1)).astype(np.int64), 0, size - 1)
        got = tex[px[:, 1], px[:, 0]]
        want = colors[f.reshape(-1)]
        return float(np.abs(got - want).mean())

    err_atlas = roundtrip(*atlas_unwrap(v, f))
    err_box = roundtrip(*T.box_unwrap(v, f))
    assert err_atlas < err_box * 0.9, (err_atlas, err_box)
    assert err_atlas < 0.05