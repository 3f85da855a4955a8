"""Pallas TPU kernel: per-tile 3DGS alpha compositing.

The hot inner loop of the splat renderer (`ops.gs_render.tile_composite`).
The pure-XLA scan pays for `max_per_tile` slots in *every* tile and spills
[tiles, 256, chunk] intermediates to HBM each step; this kernel keeps one
tile's gathered gaussian block resident in VMEM, composites 256 pixels ×
128 gaussians per iteration on the VPU/MXU, and — the part XLA cannot
express — exits each tile's loop early at its actual gaussian count
(scalar-prefetched), which on real scenes skips most of the padded work.

Hardware mapping notes:
  * tile_data is [T, D, M]: gaussian index on the 128-lane axis so chunk
    loads are lane-aligned (Mosaic requires 128-multiple lane offsets);
    one [D, 128] block is transposed in-kernel to [128, D] registers.
  * The within-chunk front-to-back compositing uses an associative
    prefix scan (Hillis-Steele doubling over log(1-α)) instead of a
    sequential walk — 7 shifted adds replace 128 dependent multiplies,
    and cumprod/cumsum (no Mosaic lowering) are never needed.
  * Per-chunk color accumulation is a [C,128]x[128,256] MXU matmul.

Backward re-walks chunks in reverse (classic 3DGS backward), reconstructing
per-slot transmittance in log space (robust to underflow at 128-deep
chunks), and writes *per-tile* gradient columns [T, D, M]; the caller
segment-sums them into per-gaussian gradients outside (deterministic, no
cross-tile atomics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
NPIX = TILE * TILE
CHUNK = 128
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_FLOOR = -80.0          # exp(-80) ≈ 1.8e-35: transmittance underflow clamp


def _prefix_sum_sublane(x):
    """Inclusive prefix sum along axis 0 of [CHUNK, N] via Hillis-Steele
    doubling (static log2(CHUNK) steps of shifted adds)."""
    n = x.shape[0]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:k]), x[:n - k]], axis=0)
        x = x + shifted
        k *= 2
    return x


def _pixel_grid(ox, oy):
    # flat pixel index on the lane axis; row-major within the tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (idx % TILE).astype(jnp.float32) + 0.5
    py = (idx // TILE).astype(jnp.float32) + 0.5
    return px + ox, py + oy


def _chunk_terms(dT, ox, oy, count_in_chunk):
    """dT [CHUNK, D] (gaussians on sublanes) → per-slot quantities.

    Returns (alpha, G, power, raw, live, log_one_m, geom) with pixel
    broadcasts of shape [CHUNK, NPIX]."""
    px, py = _pixel_grid(ox, oy)                        # [1, NPIX]
    slot = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    in_count = slot < count_in_chunk                    # [CHUNK, 1]

    mu_x = dT[:, 0:1]
    mu_y = dT[:, 1:2]
    a = dT[:, 2:3]
    b = dT[:, 3:4]
    c = dT[:, 4:5]
    op = dT[:, 5:6]
    mx = mu_x - px                                      # [CHUNK, NPIX]
    my = mu_y - py
    power = -0.5 * (a * mx * mx + c * my * my) - b * mx * my
    G = jnp.exp(jnp.minimum(power, 0.0))
    raw = op * G
    live = (power <= 0.0) & (raw >= ALPHA_MIN) & in_count
    alpha = jnp.where(live, jnp.minimum(raw, ALPHA_MAX), 0.0)
    log_one_m = jnp.log1p(-alpha)                       # ∈ [log 0.01, 0]
    return alpha, G, power, raw, live, log_one_m, (mx, my, a, b, c, op)


def _fwd_kernel(counts_ref, data_ref, acc_ref, t_ref,
                *, nchan: int, max_per_tile: int, grid_w: int):
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], max_per_tile)
    ox = ((t % grid_w) * TILE).astype(jnp.float32)
    oy = ((t // grid_w) * TILE).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    t_ref[:] = jnp.ones_like(t_ref)
    nsteps = pl.cdiv(count, CHUNK)

    def body(i, _):
        off = pl.multiple_of(i * CHUNK, CHUNK)
        dsl = data_ref[0, :, pl.ds(off, CHUNK)]          # [D, CHUNK]
        dT = dsl.T                                       # [CHUNK, D]
        alpha, _, _, _, _, log_one_m, _ = _chunk_terms(
            dT, ox, oy, count - i * CHUNK)
        lcp = _prefix_sum_sublane(log_one_m)             # log prefix prods
        # exclusive prefix transmittance within chunk: exp(lcp - own log)
        t_excl = jnp.exp(jnp.maximum(lcp - log_one_m, LOG_FLOOR))
        w = alpha * t_excl                               # [CHUNK, NPIX]
        colors = dT[:, 6:6 + nchan]                      # [CHUNK, C]
        contrib = jax.lax.dot_general(
            colors, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [C, NPIX]
        t_cur = t_ref[0]                                 # [1, NPIX]
        acc_ref[0] = acc_ref[0] + t_cur * contrib
        chunk_prod = jnp.exp(jnp.maximum(
            jnp.sum(log_one_m, axis=0, keepdims=True), LOG_FLOOR))
        t_ref[0] = t_cur * chunk_prod
        return 0

    jax.lax.fori_loop(0, nsteps, body, 0)


def _bwd_kernel(counts_ref, data_ref, tfin_ref, gacc_ref, gt_ref,
                gdata_ref, *, nchan: int, max_per_tile: int, grid_w: int):
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], max_per_tile)
    ox = ((t % grid_w) * TILE).astype(jnp.float32)
    oy = ((t // grid_w) * TILE).astype(jnp.float32)

    gdata_ref[:] = jnp.zeros_like(gdata_ref)
    nsteps = pl.cdiv(count, CHUNK)
    tfin = tfin_ref[0]                                   # [1, NPIX]
    gacc = gacc_ref[0]                                   # [C, NPIX]
    gt = gt_ref[0]                                       # [1, NPIX]

    def body(j, carry):
        log_t_after, s_dot_g_cur = carry                 # [1,NPIX] each
        i = nsteps - 1 - j
        off = pl.multiple_of(i * CHUNK, CHUNK)
        dsl = data_ref[0, :, pl.ds(off, CHUNK)]
        dT = dsl.T
        alpha, G, power, raw, live, log_one_m, (mx, my, a, b, c, op) = \
            _chunk_terms(dT, ox, oy, count - i * CHUNK)
        one_m = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)

        lcp = _prefix_sum_sublane(log_one_m)
        total_log = jnp.sum(log_one_m, axis=0, keepdims=True)
        # T before slot k = T_after_chunk / Π_{j>=k} = exp(log_t_after
        #   + (lcp[k] − log_one_m[k]) − total_log)
        log_t_i = log_t_after + (lcp - log_one_m) - total_log
        t_i = jnp.exp(jnp.minimum(jnp.maximum(log_t_i, LOG_FLOOR), 0.0))

        wc = alpha * t_i                                 # [CHUNK, NPIX]
        colors = dT[:, 6:6 + nchan]                      # [CHUNK, C]
        # u[k,pix] = Σ_c colors[k,c]·gacc[c,pix]·wc[k,pix]
        colgdot = jnp.dot(colors, gacc,
                          preferred_element_type=jnp.float32)
        u = colgdot * wc
        # S_k·g = (Σ over slots behind k, this chunk) + carry
        total_u = jnp.sum(u, axis=0, keepdims=True)
        incl_u = _prefix_sum_sublane(u)
        s_dot_g_k = (total_u - incl_u) + s_dot_g_cur     # [CHUNK, NPIX]

        d_alpha_c = colgdot * t_i - s_dot_g_k / one_m
        d_alpha_T = -gt * (tfin / one_m)
        unsat = raw < ALPHA_MAX
        d_alpha = jnp.where(live & unsat, d_alpha_c + d_alpha_T, 0.0)

        d_G = d_alpha * op
        d_op = jnp.sum(d_alpha * G * live, axis=1)       # [CHUNK]
        d_power = d_G * G * (power <= 0.0)
        d_a = jnp.sum(-0.5 * mx * mx * d_power, axis=1)
        d_b = jnp.sum(-mx * my * d_power, axis=1)
        d_c = jnp.sum(-0.5 * my * my * d_power, axis=1)
        d_mux = jnp.sum(d_power * (-(a * mx + b * my)), axis=1)
        d_muy = jnp.sum(d_power * (-(c * my + b * mx)), axis=1)
        # d_col[k, c] = Σ_pix wc[k,pix]·live·gacc[c,pix]
        d_col = jax.lax.dot_general(
            wc * live, gacc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [CHUNK, C]

        grad_cols = jnp.concatenate([
            d_mux[:, None], d_muy[:, None], d_a[:, None], d_b[:, None],
            d_c[:, None], d_op[:, None], d_col], axis=1)  # [CHUNK, 6+C]
        pad = gdata_ref.shape[1] - grad_cols.shape[1]
        if pad:
            grad_cols = jnp.concatenate(
                [grad_cols,
                 jnp.zeros((CHUNK, pad), jnp.float32)], axis=1)
        gdata_ref[0, :, pl.ds(off, CHUNK)] = grad_cols.T

        new_s = s_dot_g_cur + total_u
        new_log_t = jnp.maximum(log_t_after - total_log, LOG_FLOOR)
        return new_log_t, new_s

    log_tfin = jnp.log(jnp.maximum(tfin, jnp.exp(LOG_FLOOR)))
    jax.lax.fori_loop(
        0, nsteps, body,
        (log_tfin, jnp.zeros((1, NPIX), jnp.float32)))


def composite_tiles_fwd(tile_data, counts, grid_w: int, nchan: int,
                        interpret: bool = False):
    """tile_data [T, D, M]; counts [T] int32.
    Returns (acc [T, C, NPIX], transmittance [T, 1, NPIX])."""
    t_tiles, d, m = tile_data.shape
    assert m % CHUNK == 0, f"max_per_tile {m} must be a multiple of {CHUNK}"
    kernel = functools.partial(_fwd_kernel, nchan=nchan, max_per_tile=m,
                               grid_w=grid_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, d, m), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nchan, NPIX), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc, trans = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_tiles, nchan, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, 1, NPIX), jnp.float32),
        ],
        interpret=interpret,
    )(counts, tile_data)
    return acc, trans


def composite_tiles_bwd(tile_data, counts, grid_w, trans, g_acc, g_trans,
                        nchan: int, interpret: bool = False):
    """Returns per-tile gradient columns [T, D, M] (layout mirrors
    tile_data); caller segment-sums by the tile lists' prim ids."""
    t_tiles, d, m = tile_data.shape
    kernel = functools.partial(_bwd_kernel, nchan=nchan, max_per_tile=m,
                               grid_w=grid_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, d, m), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchan, NPIX), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, m), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, d, m), jnp.float32),
        interpret=interpret,
    )(counts, tile_data, trans, g_acc, g_trans)
