"""Differentiable 3D Gaussian Splatting renderer (flagship kernel).

TPU-native replacement for the CUDA `diff_gaussian_rasterization` package the
reference invokes at `MVs_Algorithms/GaussianSplatting/main_3DGS_renderer.py:
830-948` (also TriplaneGaussian `models/renderer.py`, TRELLIS
`trellis/renderers/gaussian_render.py`, and the LGM GS→mesh converter).
Outputs match that fork's extended contract: image, alpha, depth, radii —
plus the viewspace-gradient hook densification needs (`main_3DGS.py:211-213`).

Architecture (same tile structure as the CUDA rasterizer, but XLA-shaped):
  1. `project_gaussians` — 3D→2D: EWA splatting Jacobian, 2D covariance +
     0.3px dilation, conic, 3σ radius, frustum cull. Plain differentiable
     jnp; XLA fuses it into one elementwise pass (VPU).
  2. `ops.binning.bin_primitives` — (tile, depth)-sorted padded lists; the
     one O(P log P) sort replaces the CUDA radix sort.
  3. `tile_composite` — front-to-back alpha compositing per tile with a
     *custom VJP*: forward stores only (image, alpha, final transmittance);
     backward re-walks the sorted lists back-to-front reconstructing the
     transmittance by division (the classic 3DGS backward), so memory is
     O(pixels), not O(pixels × gaussians). Compositing within each chunk is
     vectorized with exclusive cumprods so the sequential scan advances
     `chunk` gaussians per step — this is the part the Pallas kernel
     (`ops/pallas/gs_tile.py`) replaces with a fused VMEM-resident loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussian import GaussianSplat, quat_to_rotmat
from . import binning
from .binning import TILE


# ------------------------------------------------------------------ #
# 1. Projection (differentiable, pure jnp)
# ------------------------------------------------------------------ #
def project_gaussians(xyz, scale, rot_quat, w2c, intrinsics, width, height,
                      near: float = 0.01):
    """EWA projection of 3D gaussians to screen.

    Fully scalarized: all 3×3 algebra is written out on [N] component
    vectors. Rank-3 [N,3,3] einsum temporaries pad the minor dims to the
    (8,128) TPU tile — hundreds of MB of dead HBM traffic per frame
    (measured 5 ms at N=100k on v5e); the component form is one fused
    elementwise pass (~0.3 ms).

    Returns (means2d [N,2] px, depths [N], conics [N,3] (a,b,c) of the
    inverse 2D covariance, radii [N] px, in_frustum [N] bool).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    R = w2c[:3, :3]
    x, y, z3 = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    t0 = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z3 + w2c[0, 3]
    t1 = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z3 + w2c[1, 3]
    t2 = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z3 + w2c[2, 3]
    depth = -t2                             # camera looks down -Z
    in_front = depth > near
    d = jnp.maximum(depth, near)
    inv_d = 1.0 / d

    # frustum-clamped view-plane coords (3DGS limits the EWA Jacobian blowup)
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    tx = jnp.clip(t0 * inv_d, -lim_x, lim_x) * d
    ty = jnp.clip(t1 * inv_d, -lim_y, lim_y) * d

    u = fx * t0 * inv_d + cx
    v = -fy * t1 * inv_d + cy               # image rows grow downward

    # J rows: (j00, 0, j02) and (0, j11, j12)
    j00 = fx * inv_d
    j02 = fx * tx * inv_d * inv_d
    j11 = -fy * inv_d
    j12 = -fy * ty * inv_d * inv_d

    # world cov Σ = (R_q S)(R_q S)^T, expanded per component
    qw = rot_quat[:, 0]
    qx = rot_quat[:, 1]
    qy = rot_quat[:, 2]
    qz = rot_quat[:, 3]
    sx, sy, sz = scale[:, 0], scale[:, 1], scale[:, 2]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    s00 = m00 * m00 + m01 * m01 + m02 * m02
    s01 = m00 * m10 + m01 * m11 + m02 * m12
    s02 = m00 * m20 + m01 * m21 + m02 * m22
    s11 = m10 * m10 + m11 * m11 + m12 * m12
    s12 = m10 * m20 + m11 * m21 + m12 * m22
    s22 = m20 * m20 + m21 * m21 + m22 * m22

    # camera-frame cov: W = R Σ Rᵀ (R is the 3×3 w2c rotation)
    def rot_row(i):
        return R[i, 0], R[i, 1], R[i, 2]

    w_rows = []
    for i in (0, 1, 2):
        ri0, ri1, ri2 = rot_row(i)
        a0 = ri0 * s00 + ri1 * s01 + ri2 * s02
        a1 = ri0 * s01 + ri1 * s11 + ri2 * s12
        a2 = ri0 * s02 + ri1 * s12 + ri2 * s22
        w_rows.append((a0, a1, a2))
    c00 = w_rows[0][0] * R[0, 0] + w_rows[0][1] * R[0, 1] \
        + w_rows[0][2] * R[0, 2]
    c01 = w_rows[0][0] * R[1, 0] + w_rows[0][1] * R[1, 1] \
        + w_rows[0][2] * R[1, 2]
    c02 = w_rows[0][0] * R[2, 0] + w_rows[0][1] * R[2, 1] \
        + w_rows[0][2] * R[2, 2]
    c11 = w_rows[1][0] * R[1, 0] + w_rows[1][1] * R[1, 1] \
        + w_rows[1][2] * R[1, 2]
    c12 = w_rows[1][0] * R[2, 0] + w_rows[1][1] * R[2, 1] \
        + w_rows[1][2] * R[2, 2]
    c22 = w_rows[2][0] * R[2, 0] + w_rows[2][1] * R[2, 1] \
        + w_rows[2][2] * R[2, 2]

    # 2D cov = J W Jᵀ with J = [[j00,0,j02],[0,j11,j12]]
    a = (j00 * j00 * c00 + 2 * j00 * j02 * c02 + j02 * j02 * c22) + 0.3
    b = (j00 * j11 * c01 + j00 * j12 * c02
         + j02 * j11 * c12 + j02 * j12 * c22)
    c = (j11 * j11 * c11 + 2 * j11 * j12 * c12 + j12 * j12 * c22) + 0.3

    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)
    means2d = jnp.stack([u, v], -1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))
    visible = in_front & (det > 1e-12) & (radii > 0)
    return means2d, depth, conic, radii, visible


# ------------------------------------------------------------------ #
# 3. Tile compositing with custom VJP
# ------------------------------------------------------------------ #
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0


def default_backend() -> str:
    """pallas on real TPU hardware, xla elsewhere (CPU tests use the
    interpreter only when explicitly requested)."""
    try:
        import jax
        plat = jax.devices()[0].platform
    except Exception:
        return "xla"
    return "pallas" if plat in ("tpu", "axon") else "xla"


def _chunk_alphas(centers, means2d, conics, opacities, valid):
    """α for one chunk: centers [T,P,2]; per-chunk gathers [T,Mc,...].
    Returns α [T,P,Mc]."""
    dx = centers[:, :, None, 0] - means2d[:, None, :, 0]
    dy = centers[:, :, None, 1] - means2d[:, None, :, 1]
    power = -0.5 * (conics[:, None, :, 0] * dx * dx
                    + conics[:, None, :, 2] * dy * dy) \
        - conics[:, None, :, 1] * dx * dy
    alpha = opacities[:, None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.where(power > 0.0, 0.0, alpha)  # outside the exp dome
    alpha = jnp.clip(alpha, 0.0, ALPHA_MAX)
    alpha = jnp.where(valid[:, None, :] & (alpha >= ALPHA_MIN), alpha, 0.0)
    return alpha


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def tile_composite(means2d, conics, opacities, colors, prim_idx, prim_valid,
                   grid_h, grid_w, chunk):
    out, _ = _composite_fwd_impl(means2d, conics, opacities, colors,
                                 prim_idx, prim_valid, grid_h, grid_w, chunk)
    return out


def _composite_fwd_impl(means2d, conics, opacities, colors, prim_idx,
                        prim_valid, grid_h, grid_w, chunk):
    ntiles = grid_h * grid_w
    npix = TILE * TILE
    nch = colors.shape[-1]
    m = prim_idx.shape[1]
    nsteps = m // chunk
    centers = binning.tile_pixel_centers(grid_h, grid_w)

    pi = prim_idx.reshape(ntiles, nsteps, chunk).transpose(1, 0, 2)
    pv = prim_valid.reshape(ntiles, nsteps, chunk).transpose(1, 0, 2)

    def step(carry, inp):
        acc, T = carry                         # [T,P,C], [T,P]
        idx, val = inp                         # [T,chunk]
        alpha = _chunk_alphas(centers, means2d[idx], conics[idx],
                              opacities[idx], val)
        one_m = 1.0 - alpha
        cp = jnp.cumprod(one_m, axis=-1)
        cp_excl = jnp.concatenate(
            [jnp.ones_like(cp[..., :1]), cp[..., :-1]], -1)
        w = alpha * cp_excl                    # [T,P,Mc]
        contrib = jnp.einsum("tpm,tmc->tpc", w, colors[idx])
        acc = acc + T[..., None] * contrib
        T = T * cp[..., -1]
        return (acc, T), None

    init = (jnp.zeros((ntiles, npix, nch), jnp.float32),
            jnp.ones((ntiles, npix), jnp.float32))
    (acc, T_final), _ = jax.lax.scan(step, init, (pi, pv))
    return (acc, T_final), T_final


def _composite_fwd(means2d, conics, opacities, colors, prim_idx, prim_valid,
                   grid_h, grid_w, chunk):
    out, T_final = _composite_fwd_impl(means2d, conics, opacities, colors,
                                       prim_idx, prim_valid, grid_h, grid_w,
                                       chunk)
    res = (means2d, conics, opacities, colors, prim_idx, prim_valid, T_final)
    return out, res


def _composite_bwd(grid_h, grid_w, chunk, res, cotangents):
    """Back-to-front re-walk; O(pixels) residual memory.

    Gradients: C = Σ_i c_i α_i T_i with T_i = Π_{j<i}(1-α_j);
      ∂C/∂c_i = α_i T_i
      ∂C/∂α_i = c_i T_i − S_i/(1−α_i),  S_i = Σ_{j>i} c_j α_j T_j
      ∂(1−T_fin)/∂α_i = T_fin/(1−α_i)
    then α_i = o_i·exp(power) chains into (opacity, conic, mean2d).
    """
    means2d, conics, opacities, colors, prim_idx, prim_valid, T_final = res
    g_acc, g_T = cotangents
    ntiles = grid_h * grid_w
    m = prim_idx.shape[1]
    nsteps = m // chunk
    centers = binning.tile_pixel_centers(grid_h, grid_w)
    nch = colors.shape[-1]

    pi = prim_idx.reshape(ntiles, nsteps, chunk).transpose(1, 0, 2)
    pv = prim_valid.reshape(ntiles, nsteps, chunk).transpose(1, 0, 2)
    # reverse chunk order AND within-chunk order for back-to-front
    pi_rev = pi[::-1, :, ::-1]
    pv_rev = pv[::-1, :, ::-1]

    gm = jnp.zeros_like(means2d)
    gc = jnp.zeros_like(conics)
    go = jnp.zeros_like(opacities)
    gcol = jnp.zeros_like(colors)

    def step(carry, inp):
        T_cur, S, gm, gc, go, gcol = carry
        idx, val = inp
        mu = means2d[idx]
        cn = conics[idx]
        op = opacities[idx]
        col = colors[idx]                     # [T,Mc,C]

        dx = centers[:, :, None, 0] - mu[:, None, :, 0]
        dy = centers[:, :, None, 1] - mu[:, None, :, 1]
        power = -0.5 * (cn[:, None, :, 0] * dx * dx
                        + cn[:, None, :, 2] * dy * dy) \
            - cn[:, None, :, 1] * dx * dy
        G = jnp.exp(jnp.minimum(power, 0.0))
        alpha = op[:, None, :] * G
        live = (power <= 0.0) & val[:, None, :] & (alpha >= ALPHA_MIN)
        alpha = jnp.where(live, jnp.clip(alpha, 0.0, ALPHA_MAX), 0.0)
        one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)

        # reconstruct T_i for every slot in this (reversed) chunk:
        # T before gaussian i = T_after / Π_{j>=i within chunk}(1-α_j)
        inv_cp = jnp.cumprod(1.0 / one_m, axis=-1)      # [T,P,Mc]
        T_i = jnp.minimum(T_cur[..., None] * inv_cp, 1.0)  # clamp drift
        # S_i: color accumulated after i (walking reversed order)
        wc = (alpha * T_i)[..., None] * col[:, None]     # [T,P,Mc,C]
        S_cum = jnp.cumsum(wc, axis=2)
        S_before = S_cum - wc                            # Σ over visited j>i
        S_i = S[:, :, None, :] + S_before

        # per-slot grads
        g_pix = g_acc[:, :, None, :]                     # [T,P,1,C]
        d_color = (alpha * T_i)[..., None] * g_pix       # [T,P,Mc,C]
        d_alpha_from_c = ((col[:, None] * T_i[..., None]
                           - S_i / one_m[..., None]) * g_pix).sum(-1)
        d_alpha_from_T = -g_T[:, :, None] * (
            T_final[:, :, None] / one_m)
        # clip saturation: no gradient where α was clamped at ALPHA_MAX
        unsaturated = op[:, None, :] * G < ALPHA_MAX
        d_alpha = jnp.where(live & unsaturated,
                            d_alpha_from_c + d_alpha_from_T, 0.0)

        d_G = d_alpha * op[:, None, :]
        d_op = (d_alpha * G * live).sum(1)               # [T,Mc]
        d_power = d_G * G * (power <= 0.0)
        d_cn_a = (-0.5 * dx * dx * d_power).sum(1)
        d_cn_b = (-dx * dy * d_power).sum(1)
        d_cn_c = (-0.5 * dy * dy * d_power).sum(1)
        d_dx = d_power * (-(cn[:, None, :, 0] * dx + cn[:, None, :, 1] * dy))
        d_dy = d_power * (-(cn[:, None, :, 2] * dy + cn[:, None, :, 1] * dx))
        d_mu = jnp.stack([-(d_dx).sum(1), -(d_dy).sum(1)], -1)  # [T,Mc,2]

        d_color = (d_color * live[..., None]).sum(1)     # [T,Mc,C]
        flat = idx.reshape(-1)
        gm = gm.at[flat].add(d_mu.reshape(-1, 2))
        gc = gc.at[flat].add(
            jnp.stack([d_cn_a, d_cn_b, d_cn_c], -1).reshape(-1, 3))
        go = go.at[flat].add(d_op.reshape(-1))
        gcol = gcol.at[flat].add(d_color.reshape(-1, nch))

        # advance carries to "before this chunk"
        S = S + S_cum[:, :, -1, :]
        T_cur = T_i[..., -1]
        return (T_cur, S, gm, gc, go, gcol), None

    init = (T_final, jnp.zeros(T_final.shape + (nch,), jnp.float32),
            gm, gc, go, gcol)
    carry, _ = jax.lax.scan(step, init, (pi_rev, pv_rev))
    gm, gc, go, gcol = carry[2], carry[3], carry[4], carry[5]
    return gm, gc, go, gcol, None, None


tile_composite.defvjp(_composite_fwd, _composite_bwd)


# ------------------------------------------------------------------ #
# Public renderer
# ------------------------------------------------------------------ #
@partial(jax.jit, static_argnames=("width", "height", "max_per_tile",
                                   "max_tiles_per_prim", "chunk",
                                   "backend", "bin_px", "interpret"))
def render_arrays(xyz, scale, rot_quat, opacity, colors, alive,
                  w2c, intrinsics, width: int, height: int,
                  background=None, max_per_tile: int = 512,
                  max_tiles_per_prim: int = 16, chunk: int = 16,
                  means2d_offset=None, backend: str = "xla",
                  bin_px: int = 32, interpret: bool = False):
    """Render raw gaussian arrays for one camera. Fully differentiable.

    colors: [N, C] per-gaussian channel vector (precomputed — SH eval or
    raw RGB). `means2d_offset` [N,2] (zeros) is the viewspace-gradient
    hook: its cotangent is the per-gaussian screen-space gradient that
    densification thresholds on (the reference reads
    `viewspace_points.grad`, main_3DGS.py:211-213).
    Returns dict(image [H,W,C], alpha, depth, radii [N], means2d [N,2],
    overflow flag).
    """
    n = xyz.shape[0]
    grid_h, grid_w = binning.num_tiles(height, width)

    means2d, depth, conic, radii, visible = project_gaussians(
        xyz, scale, rot_quat, w2c, intrinsics, width, height)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset
    active = visible & alive & (opacity > ALPHA_MIN)

    if backend == "pallas":
        # coarse-bin flat pipeline (ops/pallas/gs_flat.py): one
        # (bin|depth)-key sort, one flat row gather, fused DMA compositing
        # with saturation early-exit; per-bin lists are unbounded.
        chans = jnp.concatenate([colors, depth[:, None]], -1)
        rgb, alpha, depth_img, overflow = render_flat(
            means2d, conic, opacity, chans, depth, active,
            jax.lax.stop_gradient(radii), width, height,
            k=max_tiles_per_prim_coarse(max_tiles_per_prim),
            bin_px=bin_px, interpret=interpret)
        if background is not None:
            bg = jnp.asarray(background, rgb.dtype)
            rgb = rgb + (1.0 - alpha[..., None]) * bg
        return {"image": rgb, "alpha": alpha, "depth": depth_img,
                "radii": radii * active, "means2d": means2d,
                "overflow": overflow}

    # ------------- XLA reference path (CPU tests / fallback) ------------ #
    # global front-to-back depth sort of the N gaussians: makes per-tile
    # order equal emission order, collapsing the pair sort to a cheap
    # single-key sort (see binning.bin_primitives depth_sorted)
    order = jax.lax.stop_gradient(
        jnp.argsort(jnp.where(active, depth, jnp.inf)))
    s_means2d = means2d[order]
    s_conic = conic[order]
    s_opacity = opacity[order]
    s_active = active[order]
    s_radii = jax.lax.stop_gradient(radii)[order]

    bb_min = s_means2d - s_radii[:, None]
    bb_max = s_means2d + s_radii[:, None]
    # channels: [rgb..., depth] composited together
    chans = jnp.concatenate([colors, depth[:, None]], -1)[order]
    bins = binning.bin_primitives(
        jax.lax.stop_gradient(bb_min), jax.lax.stop_gradient(bb_max),
        s_active, grid_h, grid_w, max_per_tile=max_per_tile,
        max_tiles_per_prim=max_tiles_per_prim)
    overflow = bins.overflow
    acc, T_final = tile_composite(s_means2d, s_conic, s_opacity, chans,
                                  bins.prim_idx, bins.valid,
                                  grid_h, grid_w, chunk)

    to_img = lambda a: binning.tiles_to_image(a, grid_h, grid_w,
                                              height, width)
    img = to_img(acc)
    alpha = 1.0 - to_img(T_final)
    rgb = img[..., :-1]
    depth_img = img[..., -1]
    if background is not None:
        bg = jnp.asarray(background, rgb.dtype)
        rgb = rgb + (1.0 - alpha[..., None]) * bg
    return {"image": rgb, "alpha": alpha, "depth": depth_img,
            "radii": radii * active, "means2d": means2d,
            "overflow": overflow}


def render(splat: GaussianSplat, camera: Camera, background=(1.0, 1.0, 1.0),
           **kw):
    """Render a GaussianSplat for one or a batch of cameras (vmapped —
    the view axis shards under a device mesh)."""
    kw.setdefault("backend", default_backend())
    w2c = camera.w2c
    intr = camera.intrinsics

    def one(w2c_i, intr_i, campos_i):
        colors = splat.colors_toward(campos_i)
        return render_arrays(splat.xyz, splat.scale, splat.rotation,
                             splat.opacity, colors, splat.alive,
                             w2c_i, intr_i, camera.width, camera.height,
                             background=jnp.asarray(background), **kw)

    if camera.batch_shape:
        return jax.vmap(one)(w2c, intr, camera.campos)
    return one(w2c, intr, camera.campos)


# ------------------------------------------------------------------ #
# Pallas backend (ops/pallas/gs_tile.py): VMEM-resident per-tile loop
# with dynamic early-exit — the production TPU path.
# ------------------------------------------------------------------ #
def _build_tile_data(means2d, conics, opacities, colors, prim_idx,
                     prim_valid):
    """Gather per-tile gaussian columns [T, D, M] (D padded to 8·k).

    Packs all per-gaussian channels into one [N, D] matrix first so the
    expansion is a single contiguous row gather (4 separate gathers cost
    ~4x the HBM walks)."""
    d_raw = 2 + 3 + 1 + colors.shape[-1]
    pad = (-d_raw) % 8
    packed = jnp.concatenate(
        [means2d, conics, opacities[:, None], colors]
        + ([jnp.zeros((means2d.shape[0], pad), means2d.dtype)] if pad
           else []), axis=-1)                            # [N, D]
    gathered = packed[prim_idx]                          # [T, M, D]
    # dead slots → zero opacity (column 5)
    gathered = gathered.at[..., 5].multiply(prim_valid)
    return gathered.transpose(0, 2, 1)                   # [T, D, M]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def tile_composite_pallas(means2d, conics, opacities, colors, radii_signed,
                          grid_h, grid_w, max_per_tile, max_tiles_per_prim,
                          interpret):
    """Pallas tile compositor with the binning fused inside: the payload
    (means/conic/opacity/colors) rides the pair sort as extra operands and
    per-tile data blocks come out as contiguous slices — no scattered
    [T, M]-row gather (measured ~2x whole-frame win on v5e).

    radii_signed: stop-gradient per-gaussian radius, negative = culled.
    Returns (acc [T, NPIX, C], T_final [T, NPIX], overflow)."""
    out, _ = _pallas_fwd_impl(means2d, conics, opacities, colors,
                              radii_signed, grid_h, grid_w, max_per_tile,
                              max_tiles_per_prim, interpret)
    return out


def _pallas_fwd_impl(means2d, conics, opacities, colors, radii_signed,
                     grid_h, grid_w, max_per_tile, max_tiles_per_prim,
                     interpret):
    from .pallas import gs_tile

    nchan = colors.shape[-1]
    radii = jax.lax.stop_gradient(radii_signed)
    active = radii > 0
    bb_min = jax.lax.stop_gradient(means2d) - radii[:, None]
    bb_max = jax.lax.stop_gradient(means2d) + radii[:, None]
    # measured on v5e: prim-idx binning + one packed row gather beats
    # carrying the 16 payload columns through the pair sort
    # (bin_primitives_with_payload) by ~10 ms/frame at 100k/800²
    bins = binning.bin_primitives(
        bb_min, bb_max, active, grid_h, grid_w,
        max_per_tile=max_per_tile, max_tiles_per_prim=max_tiles_per_prim)
    tile_data = _build_tile_data(means2d, conics, opacities, colors,
                                 bins.prim_idx, bins.valid)
    counts = jnp.minimum(bins.count, max_per_tile).astype(jnp.int32)
    acc, trans = gs_tile.composite_tiles_fwd(tile_data, counts, grid_w,
                                             nchan, interpret=interpret)
    acc_out = acc.transpose(0, 2, 1)                     # [T, NPIX, C]
    t_out = trans[:, 0, :]                               # [T, NPIX]
    out = (acc_out, t_out, bins.overflow)
    return out, (tile_data, counts, trans, bins.prim_idx)


def _pallas_vjp_fwd(means2d, conics, opacities, colors, radii_signed,
                    grid_h, grid_w, max_per_tile, max_tiles_per_prim,
                    interpret):
    out, saved = _pallas_fwd_impl(means2d, conics, opacities, colors,
                                  radii_signed, grid_h, grid_w,
                                  max_per_tile, max_tiles_per_prim,
                                  interpret)
    res = saved + (means2d.shape[0], colors.shape[-1],
                   radii_signed)
    return out, res


def _pallas_vjp_bwd(grid_h, grid_w, max_per_tile, max_tiles_per_prim,
                    interpret, res, cotangents):
    from .pallas import gs_tile

    tile_data, counts, trans, prim_idx, n, nchan, radii_signed = res
    g_acc, g_t, _ = cotangents
    gdata = gs_tile.composite_tiles_bwd(
        tile_data, counts, grid_w, trans,
        g_acc.transpose(0, 2, 1), g_t[:, None, :], nchan,
        interpret=interpret)                             # [T, D, M]
    g_rows = gdata.transpose(0, 2, 1)                    # [T, M, D]
    flat_idx = prim_idx.reshape(-1)
    flat = g_rows.reshape(-1, g_rows.shape[-1])
    # dead slots produced zero rows (opacity was zeroed) → safe to add
    gm = jnp.zeros((n, 2)).at[flat_idx].add(flat[:, 0:2])
    gc = jnp.zeros((n, 3)).at[flat_idx].add(flat[:, 2:5])
    go = jnp.zeros((n,)).at[flat_idx].add(flat[:, 5])
    gcol = jnp.zeros((n, nchan)).at[flat_idx].add(flat[:, 6:6 + nchan])
    return gm, gc, go, gcol, jnp.zeros_like(radii_signed)


tile_composite_pallas.defvjp(_pallas_vjp_fwd, _pallas_vjp_bwd)


# ------------------------------------------------------------------ #
# Coarse-bin flat pipeline (ops/pallas/gs_flat.py) — the v2 TPU path.
# One (bin|depth)-key sort + one flat row gather + fused-DMA compositing.
# ------------------------------------------------------------------ #
def max_tiles_per_prim_coarse(max_tiles_per_prim: int) -> int:
    """Map a 16-px-tile footprint cap to the equivalent 64-px-bin cap
    (same pixel coverage; ≥4 so a 2×2 bin straddle always fits)."""
    return max(4, max_tiles_per_prim // 4)


def _bins_to_image(x, nby, nbx, height, width, bin_px=32):
    """[nbins, NSUB, C, NPIX] → [H, W, C] (crop the bin padding)."""
    from .pallas.gs_flat import TILE

    sub = bin_px // TILE
    c = x.shape[2]
    img = x.reshape(nby, nbx, sub, sub, c, TILE, TILE)
    img = img.transpose(0, 2, 5, 1, 3, 6, 4)   # nby,sy,ty,nbx,sx,tx,c
    img = img.reshape(nby * sub * TILE, nbx * sub * TILE, c)
    return img[:height, :width]


def render_flat(means2d, conic, opacity, chans, depth, active, radii,
                width: int, height: int, k: int = 4, bin_px: int = 32,
                interpret: bool = False):
    """Differentiable coarse-bin splat compositing for one camera.

    chans: [N, C] channel vector (rgb... + depth last). Returns
    (rgb [H,W,C-1], alpha [H,W], depth [H,W], overflow)."""
    nby, nbx = binning.num_bins(height, width, bin_px)
    sprim, bounds, overflow = binning.bin_coarse(
        jax.lax.stop_gradient(means2d), jax.lax.stop_gradient(depth),
        radii, active, nby, nbx, k=k, bin_px=bin_px)
    # dead/inactive pairs get radius 0 → they fail every sub-tile
    # footprint test inside the kernel
    r_row = jnp.where(active, jnp.maximum(radii, 0.5), 0.0)
    acc, trans = _composite_flat(means2d, conic, opacity, chans, r_row,
                                 sprim, bounds, nbx, nby, width, height,
                                 bin_px, interpret)
    img = _bins_to_image(acc, nby, nbx, height, width, bin_px)
    tr = _bins_to_image(trans, nby, nbx, height, width, bin_px)[..., 0]
    alpha = 1.0 - tr
    return img[..., :-1], alpha, img[..., -1], overflow


def _flat_fwd_impl(means2d, conic, opacity, chans, radii, sprim, bounds,
                   nbx, nby, width, height, bin_px, interpret):
    from .pallas import gs_flat

    n = means2d.shape[0]
    c = chans.shape[-1]
    d_raw = 7 + c                       # +1: 3σ radius row (footprint test)
    dpay = -(-d_raw // 8) * 8
    parts = [means2d, conic, opacity[:, None], chans, radii[:, None]]
    if dpay > d_raw:
        parts.append(jnp.zeros((n, dpay - d_raw), means2d.dtype))
    packed = jnp.concatenate(parts, axis=-1)          # [N, D]
    flat = packed[sprim].T                            # [D, P]
    flat = jnp.concatenate(
        [flat, jnp.zeros((dpay, gs_flat.BLK), flat.dtype)], axis=1)
    acc, trans, stops = gs_flat.composite_bins_fwd(
        flat, bounds, nbx, nby, c, width, height, bin_px=bin_px,
        interpret=interpret)
    return (acc, trans), (flat, stops)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _composite_flat(means2d, conic, opacity, chans, radii, sprim, bounds,
                    nbx, nby, width, height, bin_px, interpret):
    out, _ = _flat_fwd_impl(means2d, conic, opacity, chans, radii,
                            sprim, bounds, nbx, nby, width, height,
                            bin_px, interpret)
    return out


def _flat_vjp_fwd(means2d, conic, opacity, chans, radii, sprim, bounds,
                  nbx, nby, width, height, bin_px, interpret):
    (acc, trans), (flat, stops) = _flat_fwd_impl(
        means2d, conic, opacity, chans, radii, sprim, bounds,
        nbx, nby, width, height, bin_px, interpret)
    res = (flat, stops, trans, sprim, bounds,
           means2d.shape[0], chans.shape[-1])
    return (acc, trans), res


def _flat_vjp_bwd(nbx, nby, width, height, bin_px, interpret,
                  res, cotangents):
    from .pallas import gs_flat

    flat, stops, trans, sprim, bounds, n, c = res
    g_acc, g_trans = cotangents
    gflat = gs_flat.composite_bins_bwd(
        flat, bounds, trans, stops, g_acc, g_trans,
        nbx, nby, c, width, height, bin_px=bin_px,
        interpret=interpret)   # [DG, Ppad]
    p = sprim.shape[0]
    g_rows = gflat[:, :p].T                                # [P, DG]
    gm = jnp.zeros((n, 2)).at[sprim].add(g_rows[:, 0:2])
    gc = jnp.zeros((n, 3)).at[sprim].add(g_rows[:, 2:5])
    go = jnp.zeros((n,)).at[sprim].add(g_rows[:, 5])
    gch = jnp.zeros((n, c)).at[sprim].add(g_rows[:, 6:6 + c])
    return gm, gc, go, gch, None, None, None


_composite_flat.defvjp(_flat_vjp_fwd, _flat_vjp_bwd)


