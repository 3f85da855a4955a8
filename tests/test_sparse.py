"""Sparse voxel op tests vs dense numpy oracles (the spconv role,
SURVEY.md §2.6 E3). Submanifold conv, down/upsample inversion,
subdivision, masked + windowed attention."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfy3d_tpu.ops import sparse as sp

RES = 8
CAP = 64


def make_voxels(seed=0, n=40, c=6):
    rng = np.random.RandomState(seed)
    xyz = rng.permutation(RES ** 3)[:n]
    coords = np.zeros((CAP, 4), np.int32)
    coords[:n, 1] = xyz // (RES * RES)
    coords[:n, 2] = (xyz // RES) % RES
    coords[:n, 3] = xyz % RES
    mask = np.zeros((CAP,), bool)
    mask[:n] = True
    feats = np.zeros((CAP, c), np.float32)
    feats[:n] = rng.randn(n, c)
    return sp.SparseVoxels(jnp.asarray(feats), jnp.asarray(coords),
                           jnp.asarray(mask)), n


class TestSubmConv:
    def test_matches_dense_masked_conv(self):
        st, n = make_voxels(c=4)
        rng = np.random.RandomState(1)
        k = rng.randn(3, 3, 3, 4, 5).astype(np.float32) * 0.2
        b = rng.randn(5).astype(np.float32)
        out = sp.subm_conv3d(st, jnp.asarray(k), jnp.asarray(b), RES)

        # dense oracle: scatter to grid, correlate, read at active sites
        dense = np.zeros((RES, RES, RES, 4), np.float32)
        coords = np.asarray(st.coords)
        feats = np.asarray(st.feats)
        for i in range(n):
            dense[tuple(coords[i, 1:])] = feats[i]
        ref = np.zeros((RES, RES, RES, 5), np.float32)
        pad = np.pad(dense, ((1, 1), (1, 1), (1, 1), (0, 0)))
        for di in range(3):
            for dj in range(3):
                for dk in range(3):
                    ref += pad[di:di + RES, dj:dj + RES,
                               dk:dk + RES] @ k[di, dj, dk]
        ref += b
        for i in range(n):
            np.testing.assert_allclose(np.asarray(out.feats)[i],
                                       ref[tuple(coords[i, 1:])],
                                       rtol=1e-4, atol=1e-4)
        assert np.all(np.asarray(out.feats)[n:] == 0)

    def test_submanifold_only_active_neighbors(self):
        """Neighbors that are not active sites contribute nothing even if
        the dense grid would have data there (defining property)."""
        coords = np.zeros((8, 4), np.int32)
        coords[0, 1:] = (2, 2, 2)
        coords[1, 1:] = (2, 2, 3)
        mask = np.array([True, True] + [False] * 6)
        feats = np.zeros((8, 1), np.float32)
        feats[0] = 1.0
        feats[1] = 10.0
        st = sp.SparseVoxels(jnp.asarray(feats), jnp.asarray(coords),
                             jnp.asarray(mask))
        k = np.zeros((3, 3, 3, 1, 1), np.float32)
        k[1, 1, 1] = 1.0       # identity tap
        k[1, 1, 2] = 0.5       # +z neighbor tap
        out = np.asarray(sp.subm_conv3d(st, jnp.asarray(k), None,
                                        RES).feats)
        assert out[0, 0] == pytest.approx(1.0 + 0.5 * 10.0)
        assert out[1, 0] == pytest.approx(10.0)   # +z of (2,2,3) absent


class TestDownUp:
    def test_downsample_mean_pools(self):
        st, n = make_voxels(seed=2, c=3)
        parent, cache = sp.downsample2(st, RES)
        pc = np.asarray(parent.coords)
        pm = np.asarray(parent.mask)
        pf = np.asarray(parent.feats)
        coords = np.asarray(st.coords)[:n]
        feats = np.asarray(st.feats)[:n]
        # oracle: group children by parent cell
        groups = {}
        for i in range(n):
            key = tuple(coords[i, 1:] // 2)
            groups.setdefault(key, []).append(feats[i])
        assert pm.sum() == len(groups)
        for j in range(int(pm.sum())):
            key = tuple(pc[j, 1:])
            np.testing.assert_allclose(pf[j],
                                       np.mean(groups[key], axis=0),
                                       rtol=1e-5, atol=1e-5)

    def test_upsample_exact_inverse_coords(self):
        st, n = make_voxels(seed=3, c=2)
        parent, cache = sp.downsample2(st, RES)
        back = sp.upsample2(parent, cache)
        np.testing.assert_array_equal(np.asarray(back.coords),
                                      np.asarray(st.coords))
        np.testing.assert_array_equal(np.asarray(back.mask),
                                      np.asarray(st.mask))
        # each child receives its parent's pooled feature
        pc = {tuple(c[1:]): f for c, f, m in
              zip(np.asarray(parent.coords), np.asarray(parent.feats),
                  np.asarray(parent.mask)) if m}
        for i in range(n):
            key = tuple(np.asarray(st.coords)[i, 1:] // 2)
            np.testing.assert_allclose(np.asarray(back.feats)[i],
                                       pc[key], rtol=1e-5)


class TestSubdivide:
    def test_children_coords(self):
        st, n = make_voxels(seed=4, c=2)
        out = sp.subdivide(st)
        assert out.capacity == 8 * CAP
        oc = np.asarray(out.coords)
        for i in range(3):        # spot-check first few parents
            base = np.asarray(st.coords)[i, 1:] * 2
            kids = oc[8 * i:8 * (i + 1), 1:]
            assert set(map(tuple, kids - base)) == {
                (a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)}


class TestAttention:
    def test_masked_attention_ignores_padding(self):
        st, n = make_voxels(seed=5, c=8)
        rng = np.random.RandomState(6)
        q = rng.randn(CAP, 2, 4).astype(np.float32)
        k = rng.randn(CAP, 2, 4).astype(np.float32)
        v = rng.randn(CAP, 2, 4).astype(np.float32)
        out = sp.masked_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), st.mask, st.mask)
        # oracle on the compact set
        import scipy.special as ss
        for h in range(2):
            logits = (q[:n, h] @ k[:n, h].T) / np.sqrt(4)
            w = ss.softmax(logits, axis=-1)
            ref = w @ v[:n, h]
            np.testing.assert_allclose(np.asarray(out)[:n, h], ref,
                                       rtol=2e-4, atol=2e-4)
        assert np.all(np.asarray(out)[n:] == 0)

    def test_windowed_attention_is_blockwise(self):
        """Tokens in different windows must not interact."""
        st, n = make_voxels(seed=7, c=4)
        rng = np.random.RandomState(8)
        qkv = rng.randn(CAP, 3, 2, 4).astype(np.float32)
        out = sp.windowed_attention(jnp.asarray(qkv), st, RES,
                                    window=4, heads=2)
        out = np.asarray(out)
        coords = np.asarray(st.coords)
        import scipy.special as ss
        # oracle: group active rows by window id
        wins = {}
        for i in range(n):
            wid = tuple(coords[i, 1:] // 4)
            wins.setdefault(wid, []).append(i)
        for rows in wins.values():
            rows = np.array(rows)
            for h in range(2):
                q = qkv[rows, 0, h]
                k = qkv[rows, 1, h]
                v = qkv[rows, 2, h]
                w = ss.softmax(q @ k.T / np.sqrt(4), axis=-1)
                ref = w @ v
                np.testing.assert_allclose(
                    out[rows, h * 4:(h + 1) * 4], ref,
                    rtol=2e-4, atol=2e-4)
