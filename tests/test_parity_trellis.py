"""TRELLIS dense-stage parity vs the reference torch modules
(SparseStructureFlowModel, SparseStructureDecoder, flow Euler sampler
with CFG interval)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import refutil
from comfy3d_tpu.models.trellis.sparse_structure import (
    SparseStructureDecoder, SparseStructureFlowModel, SSDecoderConfig,
    SSFlowConfig)
from comfy3d_tpu.models.trellis.convert import (convert_ss_decoder,
                                                convert_ss_flow)
from comfy3d_tpu.models.trellis.sampler import flow_t_schedule

torch = pytest.importorskip("torch")


def _install_trellis():
    os.environ["ATTN_BACKEND"] = "sdpa"
    refutil.install()
    import sys
    import types
    if "comfy" not in sys.modules:
        comfy = types.ModuleType("comfy")
        cu = types.ModuleType("comfy.utils")

        class ProgressBar:
            def __init__(self, *a):
                pass

            def update_absolute(self, *a):
                pass

        cu.ProgressBar = ProgressBar
        comfy.utils = cu
        sys.modules["comfy"] = comfy
        sys.modules["comfy.utils"] = cu
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed


class TestSSFlowParity:
    def test_flow_model(self):
        _install_trellis()
        from TRELLIS.trellis.models.sparse_structure_flow import \
            SparseStructureFlowModel as RefSSF
        torch.manual_seed(0)
        ref = RefSSF(resolution=8, in_channels=4, model_channels=48,
                     cond_channels=24, out_channels=4, num_blocks=2,
                     num_heads=4, patch_size=2, qk_rms_norm=True).eval()
        cfg = SSFlowConfig(resolution=8, in_channels=4,
                           model_channels=48, cond_channels=24,
                           out_channels=4, num_blocks=2, num_heads=4,
                           patch_size=2, qk_rms_norm=True)
        x = np.random.RandomState(0).randn(2, 4, 8, 8, 8) \
            .astype(np.float32)
        t = np.array([100.0, 500.0], np.float32)
        cond = np.random.RandomState(1).randn(2, 5, 24).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x), torch.from_numpy(t),
                          torch.from_numpy(cond)).numpy()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_ss_flow(sd)
        ours = SparseStructureFlowModel(cfg).apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),    # NCDHW → NDHWC
            jnp.asarray(t), jnp.asarray(cond))
        ref_t = out_ref.transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(np.asarray(ours), ref_t, atol=1e-3)

    def test_decoder(self):
        _install_trellis()
        from TRELLIS.trellis.models.sparse_structure_vae import \
            SparseStructureDecoder as RefDec
        torch.manual_seed(1)
        ref = RefDec(out_channels=1, latent_channels=4, num_res_blocks=1,
                     channels=[32, 16], num_res_blocks_middle=1).eval()
        cfg = SSDecoderConfig(out_channels=1, latent_channels=4,
                              num_res_blocks=1, channels=(32, 16),
                              num_res_blocks_middle=1)
        z = np.random.RandomState(2).randn(1, 4, 8, 8, 8) \
            .astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(z)).numpy()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_ss_decoder(sd)
        ours = SparseStructureDecoder(cfg).apply(
            {"params": params}, jnp.asarray(z.transpose(0, 2, 3, 4, 1)))
        ref_t = out_ref.transpose(0, 2, 3, 4, 1)
        assert np.asarray(ours).shape == ref_t.shape
        np.testing.assert_allclose(np.asarray(ours), ref_t, atol=5e-4)


class TestSamplerParity:
    def test_t_schedule(self):
        _install_trellis()
        for steps, r in ((12, 3.0), (8, 1.0)):
            t = np.linspace(1, 0, steps + 1)
            ref = r * t / (1 + (r - 1) * t)
            np.testing.assert_allclose(flow_t_schedule(steps, r), ref,
                                       atol=1e-7)

    def test_euler_cfg_interval_matches_reference(self):
        """Drive both samplers with the same linear 'model' and compare
        trajectories."""
        _install_trellis()
        from TRELLIS.trellis.pipelines.samplers.flow_euler import \
            FlowEulerGuidanceIntervalSampler
        from comfy3d_tpu.models.trellis.sampler import sample_flow_euler

        A = np.random.RandomState(3).randn(4, 4).astype(np.float32) * 0.1

        class TorchModel:
            def __call__(self, x, t, cond, **kw):
                return x @ torch.from_numpy(A) + cond + 1e-4 * t[:, None]

        def jax_model(x, t, cond):
            return x @ jnp.asarray(A) + cond + 1e-4 * t[:, None]

        noise = np.random.RandomState(4).randn(2, 4).astype(np.float32)
        cond = np.random.RandomState(5).randn(2, 4).astype(np.float32)
        neg = np.zeros_like(cond)
        sampler = FlowEulerGuidanceIntervalSampler(sigma_min=0.0)
        ref = sampler.sample(
            TorchModel(), torch.from_numpy(noise.copy()),
            torch.from_numpy(cond), torch.from_numpy(neg), steps=6,
            rescale_t=2.0, cfg_strength=3.5, cfg_interval=(0.3, 0.9),
            verbose=False).samples.numpy()
        ours = sample_flow_euler(jax_model, jnp.asarray(noise),
                                 jnp.asarray(cond), jnp.asarray(neg),
                                 steps=6, cfg_strength=3.5,
                                 cfg_interval=(0.3, 0.9), rescale_t=2.0)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
