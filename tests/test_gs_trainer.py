"""3DGS trainer tests: loss descent on a synthetic scene, densify/prune
slot mechanics, opacity reset, LR schedule."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from comfy3d_tpu.algorithms import gs_trainer as T
from comfy3d_tpu.core.camera import Camera
from comfy3d_tpu.core.gaussian import GaussianSplat
from comfy3d_tpu.ops import gs_render


def synthetic_views(key, n_views=4, size=32):
    """Ground-truth splat rendered from orbit views → (cams, imgs, masks)."""
    gt = GaussianSplat.from_points(
        np.array([[0.0, 0, 0], [0.25, 0, 0], [0, 0.25, 0], [0, 0, 0.25]],
                 np.float32),
        colors=np.array([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1],
                         [0.1, 0.1, 0.9], [0.9, 0.9, 0.1]], np.float32),
        initial_scale=0.12)
    gt = dataclasses.replace(
        gt, opacity_raw=jnp.full_like(gt.opacity_raw, 3.0))
    cams = Camera.from_orbit(
        jnp.zeros((n_views,)),
        jnp.arange(n_views) * (360.0 / n_views), 2.0,
        width=size, height=size)
    out = gs_render.render(gt, cams, background=(1.0, 1.0, 1.0),
                           max_per_tile=32, chunk=8)
    return cams, out["image"], out["alpha"]


class TestTrainStep:
    def test_loss_decreases(self):
        cams, imgs, masks = synthetic_views(jax.random.PRNGKey(0))
        init = GaussianSplat.random(jax.random.PRNGKey(1), 64, radius=0.4,
                                    sh_degree=0)
        cfg = T.GSTrainConfig(iterations=120, batch_size=2,
                              max_per_tile=32, chunk=8,
                              density_start_iter=10_000,  # no densify here
                              position_lr_init=0.002,
                              position_lr_final=0.0002)
        state = T.init_state(init)
        step_fn = T.make_train_step(cfg, cams, imgs, masks)
        key = jax.random.PRNGKey(2)
        losses = []
        for i in range(cfg.iterations):
            key, k = jax.random.split(key)
            state, m = step_fn(state, k)
            losses.append(float(m["loss"]))
        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert last < first * 0.7, (first, last)

    def test_dead_slots_stay_frozen(self):
        cams, imgs, masks = synthetic_views(jax.random.PRNGKey(0))
        init = GaussianSplat.from_points(
            np.random.RandomState(0).randn(16, 3).astype(np.float32) * 0.3,
            capacity=32)
        cfg = T.GSTrainConfig(iterations=5, batch_size=1, max_per_tile=16,
                              chunk=8, density_start_iter=10_000)
        state = T.init_state(init)
        step_fn = T.make_train_step(cfg, cams, imgs, masks)
        before = np.asarray(state.params["xyz"][16:])
        key = jax.random.PRNGKey(1)
        for _ in range(5):
            key, k = jax.random.split(key)
            state, _ = step_fn(state, k)
        after = np.asarray(state.params["xyz"][16:])
        np.testing.assert_array_equal(before, after)


class TestDensify:
    def _state(self, n=8, cap=32):
        splat = GaussianSplat.from_points(
            np.random.RandomState(0).randn(n, 3).astype(np.float32) * 0.2,
            capacity=cap, initial_scale=0.01)
        return T.init_state(splat)

    def test_clone_on_high_grad_small_scale(self):
        cfg = T.GSTrainConfig(densify_grad_threshold=0.1, scene_extent=4.0,
                              prune_min_opacity=0.001)
        state = self._state()
        # gaussian 0: high viewspace grad, small scale → clone
        state = dataclasses.replace(
            state,
            grad_accum=state.grad_accum.at[0].set(10.0),
            denom=state.denom.at[0].set(1.0))
        n_before = int(state.alive.sum())
        out = T.make_densify_step(cfg)(state, jax.random.PRNGKey(0))
        assert int(out.alive.sum()) == n_before + 1
        # stats reset
        assert float(out.grad_accum.sum()) == 0.0

    def test_split_replaces_and_adds(self):
        cfg = T.GSTrainConfig(densify_grad_threshold=0.1, scene_extent=4.0,
                              percent_dense=0.01, prune_min_opacity=0.001,
                              prune_max_world_scale=10.0)
        state = self._state()
        # make gaussian 1 large (scale > percent_dense*extent = 0.04)
        p = dict(state.params)
        p["scale_raw"] = p["scale_raw"].at[1].set(jnp.log(0.2))
        state = dataclasses.replace(
            state, params=p,
            grad_accum=state.grad_accum.at[1].set(10.0),
            denom=state.denom.at[1].set(1.0))
        xyz_before = np.asarray(state.params["xyz"][1])
        n_before = int(state.alive.sum())
        out = T.make_densify_step(cfg)(state, jax.random.PRNGKey(0))
        assert int(out.alive.sum()) == n_before + 1
        # source slot re-positioned (child 1) and scale shrunk by 1.6
        assert not np.allclose(np.asarray(out.params["xyz"][1]), xyz_before)
        np.testing.assert_allclose(
            float(out.params["scale_raw"][1, 0]),
            float(jnp.log(0.2) - jnp.log(1.6)), atol=1e-4)

    def test_prune_low_opacity(self):
        cfg = T.GSTrainConfig(prune_min_opacity=0.5)
        state = self._state()
        p = dict(state.params)
        # opacity sigmoid(-3) ≈ 0.047 < 0.5 for gaussian 2
        p["opacity_raw"] = p["opacity_raw"].at[:].set(3.0)
        p["opacity_raw"] = p["opacity_raw"].at[2].set(-3.0)
        state = dataclasses.replace(state, params=p)
        out = T.make_densify_step(cfg)(state, jax.random.PRNGKey(0))
        assert not bool(out.alive[2])
        assert int(out.alive.sum()) == 7

    def test_adam_moments_cleared_at_new_slots(self):
        cfg = T.GSTrainConfig(densify_grad_threshold=0.1,
                              prune_min_opacity=0.001)
        state = self._state()
        m = jax.tree.map(lambda a: jnp.ones_like(a), state.adam_m)
        state = dataclasses.replace(
            state, adam_m=m,
            grad_accum=state.grad_accum.at[0].set(10.0),
            denom=state.denom.at[0].set(1.0))
        out = T.make_densify_step(cfg)(state, jax.random.PRNGKey(0))
        # slot 8 (first dead) received the clone → moments zeroed there
        assert float(out.adam_m["xyz"][8].sum()) == 0.0
        assert float(out.adam_m["xyz"][3].sum()) == 3.0  # untouched


class TestMisc:
    def test_opacity_reset(self):
        splat = GaussianSplat.random(jax.random.PRNGKey(0), 16)
        state = T.init_state(splat)
        p = dict(state.params)
        p["opacity_raw"] = jnp.full_like(p["opacity_raw"], 5.0)
        state = dataclasses.replace(state, params=p)
        out = T.reset_opacity(state)
        op = np.asarray(jax.nn.sigmoid(out.params["opacity_raw"]))
        np.testing.assert_allclose(op, 0.01, atol=1e-4)

    def test_lr_schedule_endpoints(self):
        lr0 = float(T.exponential_lr(0, 1e-2, 1e-4, 1.0, 1000))
        lr_end = float(T.exponential_lr(1000, 1e-2, 1e-4, 1.0, 1000))
        np.testing.assert_allclose(lr0, 1e-2, rtol=1e-4)
        np.testing.assert_allclose(lr_end, 1e-4, rtol=1e-4)

    def test_full_train_api(self):
        cams, imgs, masks = synthetic_views(jax.random.PRNGKey(0), size=24)
        init = GaussianSplat.random(jax.random.PRNGKey(1), 32, radius=0.4)
        cfg = T.GSTrainConfig(iterations=30, batch_size=1, max_per_tile=16,
                              chunk=8, density_start_iter=5,
                              densification_interval=10,
                              densify_grad_threshold=1e-6,
                              opacity_reset_interval=10_000)
        calls = []
        out = T.train(init, cams, imgs, masks, cfg,
                      progress=lambda it, m: calls.append(it))
        assert isinstance(out, GaussianSplat)
        assert len(calls) >= 1
        assert int(np.asarray(out.alive).sum()) >= 32  # densified
