"""3D Gaussian Splatting per-asset optimization (multi-view → splats).

TPU-native counterpart of `GaussianSplatting3D`
(`MVs_Algorithms/GaussianSplatting/main_3DGS.py:84-232`) and the
optimizer-coupled densification of `GaussianModel`
(`main_3DGS_renderer.py:543-781`). Behavioral parity targets:

  * loss = (1-λ_ssim)·L1(masked rgb) + λ_alpha·MSE(alpha vs mask)
           + λ_ssim·(1-MS_SSIM) (+ offset regularizers)     [main_3DGS.py:184-201]
  * per-group Adam with the 3DGS exponential xyz LR schedule [renderer.py:455]
  * densify-and-prune every `densification_interval` steps inside the
    [start, end] window: clone (small, high viewspace grad), split
    (large, high grad; children scale /1.6), prune (low opacity / big
    screen radius / big world scale)                        [renderer.py:640-781]
  * opacity reset every `opacity_reset_interval`            [renderer.py:463]

The JAX re-design (SURVEY.md §7 "hard parts" #2): parameters live in a
*fixed-capacity* padded buffer with an `alive` mask. Densify writes children
into dead slots and prune just clears `alive` — no reallocation, so the
whole train step stays one compiled XLA program and Adam moments are
surgically zeroed at reused slots instead of rebuilding optimizer state.
Viewspace-gradient stats come from a zero-offset hook added to the projected
means (same contract as the reference's `viewspace_points.grad`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.gaussian import GaussianSplat, quat_to_rotmat
from ..ops import gs_render, ssim as ssim_ops


@dataclasses.dataclass(frozen=True)
class GSTrainConfig:
    # training (defaults mirror GSParams, main_3DGS.py:15-74)
    iterations: int = 30_000
    batch_size: int = 1
    lambda_ssim: float = 0.2
    lambda_alpha: float = 3.0
    invert_bg_prob: float = 0.5
    # learning rates
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    # densification
    num_pts: int = 5000
    capacity: int = 65536
    percent_dense: float = 0.01
    density_start_iter: int = 500
    density_end_iter: int = 15_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_grad_threshold: float = 0.0002
    prune_min_opacity: float = 0.005
    prune_max_screen_px: float = 20.0
    prune_max_world_scale: float = 0.4   # 0.1 * extent(=4) as in reference
    scene_extent: float = 4.0
    sh_degree: int = 0
    # renderer
    max_per_tile: int = 512
    chunk: int = 16
    backend: str = "auto"


def exponential_lr(step, lr_init, lr_final, delay_mult, max_steps):
    """The 3DGS position LR schedule (log-linear with warm-up delay)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    delay = delay_mult + (1 - delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / (0.01 * max_steps + 1e-8), 0, 1))
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay * log_lerp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GSTrainState:
    params: dict            # xyz, sh, opacity_raw, scale_raw, rot_raw
    alive: jnp.ndarray      # [cap] bool
    adam_m: dict
    adam_v: dict
    grad_accum: jnp.ndarray  # [cap] viewspace grad-norm accumulator
    denom: jnp.ndarray       # [cap]
    max_radii: jnp.ndarray   # [cap]
    step: jnp.ndarray        # []

    def to_splat(self) -> GaussianSplat:
        p = self.params
        return GaussianSplat(xyz=p["xyz"], sh=p["sh"],
                             opacity_raw=p["opacity_raw"],
                             scale_raw=p["scale_raw"], rot_raw=p["rot_raw"],
                             alive=self.alive)


def init_state(splat: GaussianSplat) -> GSTrainState:
    params = {"xyz": splat.xyz, "sh": splat.sh,
              "opacity_raw": splat.opacity_raw,
              "scale_raw": splat.scale_raw, "rot_raw": splat.rot_raw}
    zeros = jax.tree.map(jnp.zeros_like, params)
    cap = splat.num_capacity
    return GSTrainState(
        params=params, alive=splat.alive,
        adam_m=zeros, adam_v=jax.tree.map(jnp.zeros_like, params),
        grad_accum=jnp.zeros((cap,)), denom=jnp.zeros((cap,)),
        max_radii=jnp.zeros((cap,)), step=jnp.int32(0))


def _lr_tree(cfg: GSTrainConfig, step):
    xyz_lr = exponential_lr(step, cfg.position_lr_init, cfg.position_lr_final,
                            cfg.position_lr_delay_mult,
                            cfg.position_lr_max_steps) * cfg.scene_extent
    return {"xyz": xyz_lr, "sh": cfg.feature_lr,
            "opacity_raw": cfg.opacity_lr, "scale_raw": cfg.scaling_lr,
            "rot_raw": cfg.rotation_lr}


_B1, _B2, _EPS = 0.9, 0.999, 1e-15


def _adam_update(params, grads, m, v, lrs, step):
    """Hand-rolled Adam: per-leaf LR, moments owned by the state so densify
    can zero reused slots (the reference rebuilds optimizer tensors
    instead, renderer.py:543-640)."""
    t = step.astype(jnp.float32) + 1.0
    new_m = jax.tree.map(lambda mm, g: _B1 * mm + (1 - _B1) * g, m, grads)
    new_v = jax.tree.map(lambda vv, g: _B2 * vv + (1 - _B2) * g * g,
                         v, grads)
    bc1 = 1 - _B1 ** t
    bc2 = 1 - _B2 ** t

    def upd(p, mm, vv, lr):
        mhat = mm / bc1
        vhat = vv / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + _EPS)

    new_p = {k: upd(params[k], new_m[k], new_v[k], lrs[k]) for k in params}
    return new_p, new_m, new_v


# ------------------------------------------------------------------ #
# Train step
# ------------------------------------------------------------------ #
def make_train_step(cfg: GSTrainConfig, cameras: Camera,
                    images: jnp.ndarray, masks: jnp.ndarray,
                    mesh=None):
    """Build the jitted train step over a fixed reference view set.

    images: [V, H, W, 3] in [0,1]; masks: [V, H, W]; cameras batched [V].
    With a `mesh`, the per-step view batch is dp-sharded (SURVEY.md
    §2.7 implication (a): data-parallel over the view axis); the splat
    params stay replicated, GSPMD inserts the grad psum.
    """
    height, width = cameras.height, cameras.width
    nviews = images.shape[0]
    masked_ref = images * masks[..., None]

    def render_one(params, alive, vs_off, view_idx, bg):
        splat = GaussianSplat(xyz=params["xyz"], sh=params["sh"],
                              opacity_raw=params["opacity_raw"],
                              scale_raw=params["scale_raw"],
                              rot_raw=params["rot_raw"], alive=alive)
        w2c = cameras.w2c[view_idx]
        intr = cameras.intrinsics[view_idx]
        campos = cameras.campos[view_idx]
        colors = splat.colors_toward(campos)
        # "auto" resolves to pallas on TPU for training too: with the v2
        # coarse-bin kernel (ops/pallas/gs_flat.py) the full step is
        # 64 ms vs 295 ms on the XLA path (@800², 100k gaussians,
        # batch 1, v5e — fwd 7 ms / fwd+bwd 37 ms; the round-2 claim
        # that the pallas VJP lost to XLA predated the flat kernel).
        backend = (gs_render.default_backend() if cfg.backend == "auto"
                   else cfg.backend)
        out = gs_render.render_arrays(
            splat.xyz, splat.scale, splat.rotation, splat.opacity, colors,
            splat.alive, w2c, intr, width, height, background=bg,
            max_per_tile=cfg.max_per_tile, chunk=cfg.chunk,
            means2d_offset=vs_off, backend=backend)
        return out

    def loss_fn(params, vs_off, alive, view_idx, bgs):
        outs = jax.vmap(lambda i, bg, off: render_one(params, alive, off,
                                                      i, bg))(
            view_idx, bgs, vs_off)
        img = outs["image"]                        # [B, H, W, 3]
        alpha = outs["alpha"]
        ref_m = masks[view_idx]
        rendered_masked = img * ref_m[..., None]
        target_masked = masked_ref[view_idx]

        l1 = jnp.abs(rendered_masked - target_masked).mean()
        l_alpha = ((alpha - ref_m) ** 2).mean()
        # pytorch_msssim's 5-level default (main_3DGS.py:102), clamped
        # to what the render size supports (each level halves; a level
        # needs >= the 11px window)
        side = min(target_masked.shape[1], target_masked.shape[2])
        levels = max(1, min(5, int(np.log2(max(side // 11, 1))) + 1))
        l_ssim = 1.0 - ssim_ops.ms_ssim(target_masked, rendered_masked,
                                        levels=levels)
        loss = ((1 - cfg.lambda_ssim) * l1 + cfg.lambda_alpha * l_alpha
                + cfg.lambda_ssim * l_ssim)
        aux = {"radii": outs["radii"], "loss_l1": l1, "loss_alpha": l_alpha,
               "loss_ssim": l_ssim}
        return loss, aux

    def _dp_shard(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]
        if x.shape[0] % mesh.shape[axis]:
            return x
        spec = P(*((axis,) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))

    @jax.jit
    def train_step(state: GSTrainState, key):
        # Fold the step count in *inside* the jit: callers pass one constant
        # base key for the whole fit. (Host-side fold_in per iteration costs
        # ~140 ms/step of dispatch latency through the remote-TPU tunnel —
        # measured with jax.profiler, /host:CPU line — vs 60 ms of device
        # compute for the whole step.)
        key = jax.random.fold_in(key, state.step)
        k_view, k_bg = jax.random.split(key)
        view_idx = jax.random.randint(k_view, (cfg.batch_size,), 0, nviews)
        bgs = jnp.where(
            jax.random.uniform(k_bg, (cfg.batch_size, 1))
            < cfg.invert_bg_prob, 0.0, 1.0) * jnp.ones((cfg.batch_size, 3))
        cap = state.alive.shape[0]
        vs_off = jnp.zeros((cfg.batch_size, cap, 2))
        view_idx = _dp_shard(view_idx)
        bgs = _dp_shard(bgs)
        vs_off = _dp_shard(vs_off)

        (loss, aux), (g_params, g_vs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, vs_off, state.alive, view_idx, bgs)

        lrs = _lr_tree(cfg, state.step)
        new_p, new_m, new_v = _adam_update(state.params, g_params,
                                           state.adam_m, state.adam_v,
                                           lrs, state.step)
        # keep dead slots frozen
        def freeze(new, old):
            mask = state.alive.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)
        new_p = {k: freeze(new_p[k], state.params[k]) for k in new_p}

        # densification stats: per-view viewspace grad norms, visibility
        radii = aux["radii"]                       # [B, cap]
        visible = radii > 0
        vs_norm = jnp.linalg.norm(g_vs, axis=-1)   # [B, cap]
        grad_accum = state.grad_accum + (vs_norm * visible).sum(0)
        denom = state.denom + visible.sum(0).astype(jnp.float32)
        max_radii = jnp.maximum(state.max_radii, (radii * visible).max(0))

        new_state = dataclasses.replace(
            state, params=new_p, adam_m=new_m, adam_v=new_v,
            grad_accum=grad_accum, denom=denom, max_radii=max_radii,
            step=state.step + 1)
        metrics = {"loss": loss, "l1": aux["loss_l1"],
                   "alpha": aux["loss_alpha"], "ssim": aux["loss_ssim"],
                   "num_alive": state.alive.sum()}
        return new_state, metrics

    return train_step


# ------------------------------------------------------------------ #
# Densify / prune / opacity reset (all capacity-preserving)
# ------------------------------------------------------------------ #
def make_densify_step(cfg: GSTrainConfig):

    @jax.jit
    def densify_and_prune(state: GSTrainState, key):
        key = jax.random.fold_in(key, state.step)  # base key, see train_step
        p = state.params
        cap = state.alive.shape[0]
        alive = state.alive
        scale = jnp.exp(p["scale_raw"])
        opacity = jax.nn.sigmoid(p["opacity_raw"])
        grads = state.grad_accum / jnp.maximum(state.denom, 1.0)
        grads = jnp.nan_to_num(grads)

        max_scale = scale.max(-1)
        dense_limit = cfg.percent_dense * cfg.scene_extent
        hot = (grads >= cfg.densify_grad_threshold) & alive
        clone_mask = hot & (max_scale <= dense_limit)
        split_mask = hot & (max_scale > dense_limit)

        # prune first → frees slots for children
        prune = alive & ((opacity < cfg.prune_min_opacity)
                         | (state.max_radii > cfg.prune_max_screen_px)
                         | (max_scale > cfg.prune_max_world_scale))
        alive = alive & ~prune
        clone_mask &= alive
        split_mask &= alive

        # split: source slot becomes child 1 (in place), child 2 → free slot
        k1 = jax.random.split(key, 2)
        noise1 = jax.random.normal(k1[0], (cap, 3)) * scale
        noise2 = jax.random.normal(k1[1], (cap, 3)) * scale
        R = quat_to_rotmat(p["rot_raw"] / jnp.maximum(
            jnp.linalg.norm(p["rot_raw"], -1, keepdims=True), 1e-12))
        off1 = jnp.einsum("nij,nj->ni", R, noise1)
        off2 = jnp.einsum("nij,nj->ni", R, noise2)
        child_scale_raw = p["scale_raw"] - jnp.log(1.6)

        new_p = dict(p)
        new_p["xyz"] = jnp.where(split_mask[:, None], p["xyz"] + off1,
                                 p["xyz"])
        new_p["scale_raw"] = jnp.where(split_mask[:, None], child_scale_raw,
                                       p["scale_raw"])

        # candidate queue: clones first, then split-children
        cand_mask = jnp.concatenate([clone_mask, split_mask])   # [2*cap]
        cand_xyz = jnp.concatenate([p["xyz"], p["xyz"] + off2])
        cand_sh = jnp.concatenate([p["sh"]] * 2)
        cand_op = jnp.concatenate([p["opacity_raw"]] * 2)
        cand_scale = jnp.concatenate([p["scale_raw"], child_scale_raw])
        cand_rot = jnp.concatenate([p["rot_raw"]] * 2)

        ordinal = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1
        free_slots = jnp.argsort(alive)             # dead-first (stable)
        num_free = cap - alive.sum()
        ok = cand_mask & (ordinal < num_free)
        dst = jnp.where(ok, free_slots[jnp.clip(ordinal, 0, cap - 1)], cap)

        def place(buf, cand):
            return buf.at[dst].set(cand, mode="drop")

        new_p["xyz"] = place(new_p["xyz"], cand_xyz)
        new_p["sh"] = place(new_p["sh"], cand_sh)
        new_p["opacity_raw"] = place(new_p["opacity_raw"], cand_op)
        new_p["scale_raw"] = place(new_p["scale_raw"], cand_scale)
        new_p["rot_raw"] = place(new_p["rot_raw"], cand_rot)
        alive = alive.at[dst].set(True, mode="drop")

        # zero Adam moments at reused slots and split sources
        touched = jnp.zeros((cap,), bool).at[dst].set(True, mode="drop")
        touched = touched | split_mask

        def clear(mom):
            mask = touched.reshape((-1,) + (1,) * (mom.ndim - 1))
            return jnp.where(mask, 0.0, mom)

        adam_m = {k: clear(v) for k, v in state.adam_m.items()}
        adam_v = {k: clear(v) for k, v in state.adam_v.items()}

        return dataclasses.replace(
            state, params=new_p, alive=alive, adam_m=adam_m, adam_v=adam_v,
            grad_accum=jnp.zeros((cap,)), denom=jnp.zeros((cap,)),
            max_radii=jnp.zeros((cap,)))

    return densify_and_prune


@jax.jit
def reset_opacity(state: GSTrainState) -> GSTrainState:
    """Clamp opacity to ≤0.01 (reference `reset_opacity`, renderer.py:463)."""
    op = jax.nn.sigmoid(state.params["opacity_raw"])
    new_op = jnp.minimum(op, 0.01)
    raw = jnp.log(new_op / (1.0 - new_op))
    p = dict(state.params)
    p["opacity_raw"] = raw
    m = dict(state.adam_m)
    v = dict(state.adam_v)
    m["opacity_raw"] = jnp.zeros_like(m["opacity_raw"])
    v["opacity_raw"] = jnp.zeros_like(v["opacity_raw"])
    return dataclasses.replace(state, params=p, adam_m=m, adam_v=v)


# ------------------------------------------------------------------ #
# Driver
# ------------------------------------------------------------------ #
def train(splat: GaussianSplat, cameras: Camera, images, masks,
          cfg: GSTrainConfig = GSTrainConfig(), seed: int = 0,
          progress: Optional[Callable[[int, dict], None]] = None,
          mesh=None) -> GaussianSplat:
    """Run the full optimization; returns the trained splat.

    Counterpart of `GaussianSplatting3D.training` (main_3DGS.py:129-232);
    `progress` plays the role of comfy's ProgressBar callback. `mesh`
    dp-shards the view batch over the devices of a jax.sharding.Mesh.
    """
    images = jnp.asarray(images, jnp.float32)
    masks = jnp.asarray(masks, jnp.float32)
    state = init_state(splat)
    step_fn = make_train_step(cfg, cameras, images, masks, mesh=mesh)
    densify_fn = make_densify_step(cfg)
    # One constant base key for the whole fit; each jitted step folds
    # state.step in on-device (host-side fold_in/split per iteration costs
    # more dispatch latency than the step's device compute).
    k_step = jax.random.PRNGKey(seed)
    k_dens = jax.random.PRNGKey(seed + 1)

    for it in range(cfg.iterations):
        state, metrics = step_fn(state, k_step)
        in_window = cfg.density_start_iter <= it <= cfg.density_end_iter
        if in_window and it > 0 and it % cfg.densification_interval == 0:
            state = densify_fn(state, k_dens)
        if in_window and it > 0 and it % cfg.opacity_reset_interval == 0:
            state = reset_opacity(state)
        if progress is not None and (it % 50 == 0
                                     or it == cfg.iterations - 1):
            progress(it, jax.tree.map(np.asarray, metrics))
    return state.to_splat()
