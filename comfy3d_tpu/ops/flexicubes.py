"""FlexiCubes surface extraction — dense, fixed-capacity, jit-safe.

TPU-native implementation of the reference's FlexiCubes
(`MVs_Algorithms/FlexiCubes/flexicubes.py:133` `__call__`, the Dual
Marching Cubes variant of "Flexible Isosurface Extraction for Gradient-
Based Mesh Optimization"). Matches the reference's differentiable
machinery:

* per-cube weights (the paper's 21): 8 corner interpolation weights
  `alpha` (tanh·0.99 + 1), 12 edge weights `beta` (same mapping) and
  one splitting weight `gamma` (sigmoid·0.99 + 0.005) —
  `_normalize_weights`, flexicubes.py:228-249;
* alpha-weighted zero-crossing interpolation (`_linear_interp`,
  :331-341): ue = (x0·(α1 s1) − x1·(α0 s0)) / (α1 s1 − α0 s0);
* beta-weighted dual vertex per surface cube (`_compute_vd`, :357-447):
  vd = Σ β_e ue_e / Σ β_e over the cube's crossing edges;
* the L_dev regularizer (Equation 8, `_compute_reg_loss`, :218-226):
  mean absolute deviation of each crossing point's distance to its
  dual vertex;
* gamma-guided quad splitting (`_triangulate`, :449-500): each
  sign-flipping interior grid edge connects its 4 adjacent cubes' dual
  vertices into a quad (winding by the edge's sdf sign), split along
  the diagonal with the larger γ·γ product — and, in training mode, a
  γ-weighted center vertex + 4-triangle fan so the split is
  differentiable.

Deliberate deviation: the reference disambiguates the rare non-manifold
DMC corner cases by duplicating dual vertices via its `check_table`
(`_get_case_id`, :252). This implementation keeps ONE dual vertex per
surface cube (the classic surface-nets resolution) — every regular case
is identical; ambiguous saddle cubes (<0.1% of surface cubes on smooth
SDFs) resolve to the thin-connection topology instead of a split. The
tables approach is hostile to fixed-shape SPMD; this keeps the whole
extraction one dense jit program.

Everything is fixed capacity over the R³ cube grid: dual vertices
[R³, 3] with a validity mask, quads [3·R³, 4] masked — no host sync,
fully differentiable through sdf / deform / alpha / beta / gamma.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# cube corner offsets, lexicographic (z-minor): bit 0↔x, 1↔y, 2↔z
_CORNERS = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                     for z in (0, 1)], np.int32)
# 12 cube edges as corner-index pairs (pairs differing in one axis)
_EDGES = np.array([(a, b) for a in range(8) for b in range(8)
                   if a < b and bin(a ^ b).count("1") == 1], np.int32)


def normalize_weights(weights, n_cubes: int):
    """raw [N, 21] (or None) → (alpha [N,8], beta [N,12], gamma [N])
    with the reference's squashings AND packing (flexicubes.py:228-249,
    flexicubes_trainer.py:134-135: [:12]=beta, [12:20]=alpha,
    [20]=gamma)."""
    ws = 0.99
    if weights is None:
        return (jnp.ones((n_cubes, 8), jnp.float32),
                jnp.ones((n_cubes, 12), jnp.float32),
                jnp.ones((n_cubes,), jnp.float32))
    beta = jnp.tanh(weights[:, :12]) * ws + 1.0
    alpha = jnp.tanh(weights[:, 12:20]) * ws + 1.0
    gamma = jax.nn.sigmoid(weights[:, 20]) * ws + (1 - ws) / 2
    return alpha, beta, gamma


@partial(jax.jit, static_argnames=("res", "training"))
def flexicubes(sdf, verts, res: int, weights=None,
               training: bool = False):
    """sdf [(res+1)³]; verts [(res+1)³, 3] (grid positions + any
    deformation, z-minor lexicographic); weights [res³, 21] or None.

    → (vd [res³(+Q), 3] dual vertices (training appends Q=3·res³ quad
       centers), vd_valid [res³(+Q)], faces [2·Q or 4·Q, 3] indices
       into vd, face_valid, L_dev scalar)."""
    rv = res + 1
    n_cubes = res ** 3

    # cube corner vertex indices, z-minor flattening
    ci = jnp.arange(res)
    cx, cy, cz = jnp.meshgrid(ci, ci, ci, indexing="ij")
    base = jnp.stack([cx, cy, cz], -1).reshape(-1, 3)      # [C, 3]
    corners = base[:, None, :] + jnp.asarray(_CORNERS)[None]
    corner_idx = (corners[..., 0] * rv + corners[..., 1]) * rv \
        + corners[..., 2]                                   # [C, 8]

    s8 = sdf[corner_idx]                                    # [C, 8]
    occ = s8 < 0
    inside = occ.sum(-1)
    surf_cube = (inside > 0) & (inside < 8)

    alpha, beta, gamma = normalize_weights(weights, n_cubes)

    e = jnp.asarray(_EDGES)                                 # [12, 2]
    s0 = s8[:, e[:, 0]]
    s1 = s8[:, e[:, 1]]
    a0 = alpha[:, e[:, 0]]
    a1 = alpha[:, e[:, 1]]
    x0 = verts[corner_idx[:, e[:, 0]]]                      # [C, 12, 3]
    x1 = verts[corner_idx[:, e[:, 1]]]
    crossing = (s0 < 0) != (s1 < 0)                         # [C, 12]
    w0 = a0 * s0
    w1 = a1 * s1
    denom = w1 - w0
    # non-crossing edges (same-sign sdf) can have denom → 0 and an
    # exploding interpolant whose 0-masked contribution still NaNs the
    # gradient — substitute the midpoint there (masked out of every
    # forward quantity anyway)
    safe_denom = jnp.where(crossing, denom,
                           jnp.where(denom < 0, denom - 1.0,
                                     denom + 1.0))
    ue_raw = (x0 * w1[..., None] - x1 * w0[..., None]) \
        / safe_denom[..., None]
    ue = jnp.where(crossing[..., None], ue_raw, (x0 + x1) * 0.5)

    bmask = beta * crossing
    # non-surface cubes have zero crossing mass — give them unit mass
    # (vd = 0 there, and the 1/1e-12 scale would poison gradients)
    bsum = jnp.where(surf_cube[:, None],
                     jnp.maximum(bmask.sum(-1, keepdims=True), 1e-12),
                     1.0)
    vd = (ue * bmask[..., None]).sum(1) / bsum              # [C, 3]
    vd_valid = surf_cube

    # L_dev (Equation 8): per-vd mean |dist − mean dist| over its
    # crossing points (eps inside the sqrt: d||x|| at 0 is NaN)
    dist = jnp.sqrt(((ue - vd[:, None, :]) ** 2).sum(-1) + 1e-12)
    n_cross = jnp.maximum(crossing.sum(-1), 1)
    mean_d = (dist * crossing).sum(-1) / n_cross
    mad = (jnp.abs(dist - mean_d[:, None]) * crossing).sum(-1) \
        / n_cross
    L_dev = (mad * surf_cube).sum() / jnp.maximum(surf_cube.sum(), 1)

    # ---------------- quads over interior grid edges ----------------
    # For the grid edge along axis k starting at vertex (i, j, l): the
    # 4 adjacent cubes offset by {-1, 0} in the two other axes. Edge
    # capacity per axis: res · (res-1)² interior positions.
    def cube_flat(p):
        return (p[..., 0] * res + p[..., 1]) * res + p[..., 2]

    all_quads = []
    all_gamma = []
    all_flip = []
    all_valid = []
    for axis in range(3):
        o1, o2 = [a for a in range(3) if a != axis]
        gi = jnp.arange(res)        # cell index along the edge axis
        g1 = jnp.arange(1, res)     # interior vertex positions
        g2 = jnp.arange(1, res)
        A, B, Cc = jnp.meshgrid(gi, g1, g2, indexing="ij")
        pos = jnp.zeros(A.shape + (3,), jnp.int32)
        pos = pos.at[..., axis].set(A)
        pos = pos.at[..., o1].set(B)
        pos = pos.at[..., o2].set(Cc)
        pos = pos.reshape(-1, 3)                           # [Q, 3]
        # edge endpoints in the vertex grid
        v0 = (pos[:, 0] * rv + pos[:, 1]) * rv + pos[:, 2]
        p1 = pos.at[:, axis].add(1)
        v1 = (p1[:, 0] * rv + p1[:, 1]) * rv + p1[:, 2]
        sA = sdf[v0]
        sB = sdf[v1]
        flip_edge = (sA < 0) != (sB < 0)
        # 4 adjacent cubes in the cyclic order (-1,-1), (-1,0),
        # (0,0), (0,-1) over (o1, o2) — a proper quad cycle (the
        # reference's sorted-group + [0,1,3,2] pattern)
        offs = [(-1, -1), (-1, 0), (0, 0), (0, -1)]
        quad = []
        qvalid = flip_edge
        for (d1, d2) in offs:
            c = pos.at[:, o1].add(d1).at[:, o2].add(d2)
            quad.append(cube_flat(c))
        quad = jnp.stack(quad, -1)                         # [Q, 4]
        all_quads.append(quad)
        all_gamma.append(gamma[quad])
        all_flip.append(sA > 0)
        all_valid.append(qvalid)

    quads = jnp.concatenate(all_quads)                     # [Qt, 4]
    qgamma = jnp.concatenate(all_gamma)                    # [Qt, 4]
    flip = jnp.concatenate(all_flip)
    qvalid = jnp.concatenate(all_valid)

    # winding: faces point toward positive sdf (reference flip rule)
    quads = jnp.where(flip[:, None], quads[:, (0, 1, 3, 2)],
                      quads[:, (2, 3, 1, 0)])
    qgamma = jnp.where(flip[:, None], qgamma[:, (0, 1, 3, 2)],
                       qgamma[:, (2, 3, 1, 0)])

    g02 = qgamma[:, 0] * qgamma[:, 2]
    g13 = qgamma[:, 1] * qgamma[:, 3]

    if not training:
        # split along the higher-gamma diagonal (quad_split_1/2)
        use02 = g02 > g13
        tris_a = jnp.where(use02[:, None],
                           jnp.stack([quads[:, 0], quads[:, 1],
                                      quads[:, 2]], -1),
                           jnp.stack([quads[:, 0], quads[:, 1],
                                      quads[:, 3]], -1))
        tris_b = jnp.where(use02[:, None],
                           jnp.stack([quads[:, 0], quads[:, 2],
                                      quads[:, 3]], -1),
                           jnp.stack([quads[:, 3], quads[:, 1],
                                      quads[:, 2]], -1))
        faces = jnp.concatenate([tris_a, tris_b])
        face_valid = jnp.concatenate([qvalid, qvalid])
        return vd, vd_valid, faces, face_valid, L_dev

    # training: γ-weighted differentiable center vertex + 4-fan
    vq = vd[quads]                                         # [Qt, 4, 3]
    c02 = (vq[:, 0] + vq[:, 2]) / 2
    c13 = (vq[:, 1] + vq[:, 3]) / 2
    center = (c02 * g02[:, None] + c13 * g13[:, None]) \
        / (g02 + g13 + 1e-8)[:, None]
    n_q = quads.shape[0]
    cidx = n_cubes + jnp.arange(n_q)
    vd_all = jnp.concatenate([vd, center])
    vd_valid_all = jnp.concatenate([vd_valid, qvalid])
    fan = []
    for k in range(4):
        fan.append(jnp.stack([quads[:, k], quads[:, (k + 1) % 4],
                              cidx], -1))
    faces = jnp.concatenate(fan)
    face_valid = jnp.tile(qvalid, 4)
    return vd_all, vd_valid_all, faces, face_valid, L_dev


def grid_verts(res: int, bounds=(-1.0, 1.0)):
    """[(res+1)³, 3] z-minor lexicographic grid vertex positions."""
    lin = np.linspace(bounds[0], bounds[1], res + 1, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.stack([gx, gy, gz], -1).reshape(-1, 3)
