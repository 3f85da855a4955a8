"""TRELLIS dense-stage parity vs the reference torch modules
(SparseStructureFlowModel, SparseStructureDecoder, flow Euler sampler
with CFG interval)."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

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


# ------------------------------------------------------------------ #
# SLat (sparse) stack parity — runs the reference torch modules on CPU
# through refutil's functional spconv/xformers stubs (SubMConv3d =
# densify → torch conv3d → gather, weight layout spconv2 KRSC).
# ------------------------------------------------------------------ #
from comfy3d_tpu.ops import sparse as osp
from comfy3d_tpu.models.convert import convert_with_rules


def _rand_voxels(rs, res, n, c, capacity=None):
    """Unique random coords (sorted raster order) + feats; returns
    (coords_np [n,4], feats_np [n,c], SparseVoxels padded to capacity)."""
    capacity = capacity or n
    lin = rs.choice(res ** 3, size=n, replace=False)
    lin.sort()
    x, y, z = lin // (res * res), (lin // res) % res, lin % res
    coords = np.stack([np.zeros_like(x), x, y, z], 1).astype(np.int32)
    feats = rs.randn(n, c).astype(np.float32)
    pc = np.zeros((capacity, 4), np.int32)
    pf = np.zeros((capacity, c), np.float32)
    pm = np.zeros((capacity,), bool)
    pc[:n], pf[:n], pm[:n] = coords, feats, True
    st = osp.SparseVoxels(jnp.asarray(pf), jnp.asarray(pc),
                          jnp.asarray(pm))
    return coords, feats, st


class TestSpconvLayout:
    def test_subm_conv_matches_torch_dense_conv3d(self):
        """spconv 2.x KRSC weight [O,k0,k1,k2,I] → t_spconv → our
        gather-GEMM subm conv == torch dense conv3d oracle on a fully
        active grid (validates the converter transpose + axis order)."""
        from comfy3d_tpu.models.trellis.convert import t_spconv
        rs = np.random.RandomState(3)
        R, CI, CO = 5, 6, 7
        w_sp = rs.randn(CO, 3, 3, 3, CI).astype(np.float32)
        x = rs.randn(R, R, R, CI).astype(np.float32)
        t = torch.nn.functional.conv3d(
            torch.from_numpy(x.transpose(3, 0, 1, 2))[None],
            torch.from_numpy(w_sp.transpose(0, 4, 1, 2, 3)), padding=1)
        ref = t[0].numpy().transpose(1, 2, 3, 0).reshape(-1, CO)
        st = osp.SparseVoxels.from_dense_occupancy(
            np.ones((R, R, R), bool), R ** 3, feats=x)
        out = osp.subm_conv3d(st, jnp.asarray(t_spconv(w_sp)), None, R)
        np.testing.assert_allclose(np.asarray(out.feats), ref,
                                   atol=1e-4)


class TestSLatFlowParity:
    def test_flow_model(self):
        refutil.install_trellis_sparse()
        from TRELLIS.trellis.models.structured_latent_flow import \
            SLatFlowModel as RefSLF
        from TRELLIS.trellis.modules import sparse as rsp
        from comfy3d_tpu.models.trellis.slat import (SLatFlowConfig,
                                                     SLatFlowModel)
        from comfy3d_tpu.models.trellis.convert import convert_slat_flow
        torch.manual_seed(2)
        kw = dict(resolution=16, in_channels=4, model_channels=32,
                  cond_channels=24, out_channels=4, num_blocks=2,
                  num_heads=4, patch_size=2, num_io_res_blocks=2,
                  io_block_channels=[8], use_skip_connection=True,
                  qk_rms_norm=True)
        ref = RefSLF(**kw).eval()
        cfg = SLatFlowConfig(
            resolution=16, in_channels=4, model_channels=32,
            cond_channels=24, out_channels=4, num_blocks=2, num_heads=4,
            patch_size=2, num_io_res_blocks=2, io_block_channels=(8,),
            use_skip_connection=True, qk_rms_norm=True)
        rs = np.random.RandomState(6)
        # coords divisible grouping not required; patchify via
        # downsample handles odd voxels
        coords, feats, st = _rand_voxels(rs, 16, 48, 4, capacity=64)
        cond = rs.randn(1, 5, 24).astype(np.float32)
        t = np.array([400.0], np.float32)
        with torch.no_grad():
            rx = rsp.SparseTensor(torch.from_numpy(feats),
                                  torch.from_numpy(coords).int())
            out_ref = ref(rx, torch.from_numpy(t),
                          torch.from_numpy(cond)).feats.numpy()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_slat_flow(sd)
        out = SLatFlowModel(cfg).apply({"params": params}, st,
                                       jnp.asarray(t),
                                       jnp.asarray(cond))
        ours = np.asarray(out.feats)[:48]
        assert ours.shape == out_ref.shape
        np.testing.assert_allclose(ours, out_ref, atol=2e-3)


class TestSLatDecoderParity:
    REP_GS = {'num_gaussians': 4, 'voxel_size': 1.5,
              'lr': {'_xyz': 1.0, '_features_dc': 1.0, '_opacity': 1.0,
                     '_scaling': 1.0, '_rotation': 0.1},
              'perturb_offset': True, 'scaling_bias': 0.01,
              'opacity_bias': 0.1, 'scaling_activation': 'softplus',
              '3d_filter_kernel_size': 9e-4}

    def test_gs_decoder(self):
        refutil.install_trellis_sparse()
        import functools
        import TRELLIS.trellis.models.structured_latent_vae.decoder_gs \
            as dgs
        RefGS = dgs.SLatGaussianDecoder
        dgs.Gaussian = functools.partial(dgs.Gaussian, device="cpu")
        from TRELLIS.trellis.modules import sparse as rsp
        from comfy3d_tpu.models.trellis.slat import (SLatDecoderConfig,
                                                     SLatGaussianDecoder)
        from comfy3d_tpu.models.trellis.convert import \
            convert_slat_decoder
        torch.manual_seed(3)
        ref = RefGS(resolution=8, model_channels=16, latent_channels=4,
                    num_blocks=2, num_heads=2, attn_mode='swin',
                    window_size=4,
                    representation_config=self.REP_GS).eval()
        # out_layer is zero-init in the reference; give it signal
        torch.nn.init.normal_(ref.out_layer.weight, std=0.1)
        torch.nn.init.normal_(ref.out_layer.bias, std=0.1)
        cfg = SLatDecoderConfig(resolution=8, model_channels=16,
                                latent_channels=4, num_blocks=2,
                                num_heads=2, attn_mode="swin",
                                window_size=4, num_gaussians=4,
                                voxel_size=1.5, lr_xyz=1.0, lr_feat=1.0,
                                lr_rot=0.1, perturb_offset=True)
        rs = np.random.RandomState(7)
        coords, feats, st = _rand_voxels(rs, 8, 30, 4, capacity=40)
        with torch.no_grad():
            rx = rsp.SparseTensor(torch.from_numpy(feats),
                                  torch.from_numpy(coords).int())
            reps = ref(rx)
        g = reps[0]
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_slat_decoder(sd, "swin")
        out = SLatGaussianDecoder(cfg).apply({"params": params}, st)
        n = 30
        np.testing.assert_allclose(
            np.asarray(out["xyz"])[:n].reshape(-1, 3),
            g._xyz.numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["features_dc"])[:n].reshape(-1, 3),
            g._features_dc.numpy().reshape(-1, 3), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["scaling"])[:n].reshape(-1, 3),
            g._scaling.numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["rotation"])[:n].reshape(-1, 4),
            g._rotation.numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["opacity"])[:n].reshape(-1),
            g._opacity.numpy().reshape(-1), atol=2e-4)

    def test_mesh_decoder(self):
        refutil.install_trellis_sparse()
        import types
        import TRELLIS.trellis.models.structured_latent_vae.decoder_mesh \
            as dm
        from TRELLIS.trellis.modules import sparse as rsp
        from comfy3d_tpu.models.trellis.slat import (SLatDecoderConfig,
                                                     SLatMeshDecoder)
        from comfy3d_tpu.models.trellis.convert import \
            convert_slat_decoder
        # SparseFeatures2Mesh builds CUDA FlexiCubes tables; stub it —
        # we compare the raw feature field, not the extracted mesh
        orig = dm.SparseFeatures2Mesh
        dm.SparseFeatures2Mesh = lambda res, use_color: \
            types.SimpleNamespace(feats_channels=101 if use_color
                                  else 53)
        try:
            torch.manual_seed(4)
            # num_groups is fixed at 32 (decoder_mesh.py:28) so the
            # smallest legal tiny config is model_channels=256
            ref = dm.SLatMeshDecoder(
                resolution=8, model_channels=256, latent_channels=4,
                num_blocks=1, num_heads=4, attn_mode='swin',
                window_size=4,
                representation_config={'use_color': True}).eval()
            torch.nn.init.normal_(ref.out_layer.weight, std=0.1)
        finally:
            dm.SparseFeatures2Mesh = orig
        cfg = SLatDecoderConfig(resolution=8, model_channels=256,
                                latent_channels=4, num_blocks=1,
                                num_heads=4, attn_mode="swin",
                                window_size=4)
        rs = np.random.RandomState(8)
        coords, feats, st = _rand_voxels(rs, 8, 24, 4, capacity=32)
        with torch.no_grad():
            rx = rsp.SparseTensor(torch.from_numpy(feats),
                                  torch.from_numpy(coords).int())
            h = dm.SLatMeshDecoder.forward.__wrapped__(ref, rx) \
                if hasattr(dm.SLatMeshDecoder.forward, "__wrapped__") \
                else None
            # forward() ends in to_representation; replicate the torso+
            # upsample+out_layer part (decoder_mesh.py:160-166)
            from TRELLIS.trellis.models.structured_latent_vae.base \
                import SparseTransformerBase
            hh = SparseTransformerBase.forward(ref, rx)
            for block in ref.upsample:
                hh = block(hh)
            hh = ref.out_layer(hh.type(rx.dtype))
            ref_feats = hh.feats.numpy()
            ref_coords = hh.coords.numpy()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_slat_decoder(sd, "swin")
        out, res = SLatMeshDecoder(cfg).apply({"params": params}, st)
        assert res == 32
        ours_feats = np.asarray(out.feats)
        ours_coords = np.asarray(out.coords)
        mask = np.asarray(out.mask)
        # match rows by coordinate (subdivision order differs)
        ref_map = {tuple(c): i for i, c in enumerate(ref_coords)}
        n_checked = 0
        for i in np.nonzero(mask)[0]:
            key = tuple(ours_coords[i])
            assert key in ref_map, f"coord {key} missing in reference"
            np.testing.assert_allclose(ours_feats[i],
                                       ref_feats[ref_map[key]],
                                       atol=2e-3)
            n_checked += 1
        assert n_checked == 24 * 64


class TestTrellisFromPretrained:
    """End-to-end checkpoint-tree load: reference torch modules'
    state_dicts written in the microsoft/TRELLIS-image-large layout
    (pipeline.json + ckpts/*.{json,safetensors}), loaded by
    `trellis.convert.from_pretrained`, validated + run."""

    def test_load_and_run(self, tmp_path):
        refutil.install_trellis_sparse()
        import functools
        import json
        from safetensors.torch import save_file
        from TRELLIS.trellis.models.sparse_structure_flow import \
            SparseStructureFlowModel as RefSSF
        from TRELLIS.trellis.models.sparse_structure_vae import \
            SparseStructureDecoder as RefDec
        from TRELLIS.trellis.models.structured_latent_flow import \
            SLatFlowModel as RefSLF
        import TRELLIS.trellis.models.structured_latent_vae.decoder_gs \
            as dgs
        import types as _types
        import TRELLIS.trellis.models.structured_latent_vae.decoder_mesh \
            as dm
        dgs.Gaussian = functools.partial(dgs.Gaussian, device="cpu")
        torch.manual_seed(11)

        ssf_args = dict(resolution=8, in_channels=4, model_channels=32,
                        cond_channels=24, out_channels=4, num_blocks=1,
                        num_heads=2, patch_size=2, qk_rms_norm=True)
        ssd_args = dict(out_channels=1, latent_channels=4,
                        num_res_blocks=1, channels=[16, 8],
                        num_res_blocks_middle=1)
        slf_args = dict(resolution=16, in_channels=4, model_channels=32,
                        cond_channels=24, out_channels=4, num_blocks=1,
                        num_heads=2, patch_size=2, num_io_res_blocks=2,
                        io_block_channels=[8], use_skip_connection=True,
                        qk_rms_norm=True)
        rep_gs = dict(TestSLatDecoderParity.REP_GS)
        sdg_args = dict(resolution=16, model_channels=16,
                        latent_channels=4, num_blocks=1, num_heads=2,
                        attn_mode='swin', window_size=4,
                        representation_config=rep_gs)
        sdm_args = dict(resolution=16, model_channels=256,
                        latent_channels=4, num_blocks=1, num_heads=4,
                        attn_mode='swin', window_size=4,
                        representation_config={'use_color': True})

        orig = dm.SparseFeatures2Mesh
        dm.SparseFeatures2Mesh = lambda res, use_color: \
            _types.SimpleNamespace(feats_channels=101 if use_color
                                   else 53)
        try:
            models = {
                "sparse_structure_flow_model": RefSSF(**ssf_args),
                "sparse_structure_decoder": RefDec(**ssd_args),
                "slat_flow_model": RefSLF(**slf_args),
                "slat_decoder_gs": dgs.SLatGaussianDecoder(**sdg_args),
                "slat_decoder_mesh": dm.SLatMeshDecoder(**sdm_args),
            }
        finally:
            dm.SparseFeatures2Mesh = orig
        cfg_args = {"sparse_structure_flow_model": ssf_args,
                    "sparse_structure_decoder": ssd_args,
                    "slat_flow_model": slf_args,
                    "slat_decoder_gs": sdg_args,
                    "slat_decoder_mesh": sdm_args}

        (tmp_path / "ckpts").mkdir()
        stems = {}
        for name, mod in models.items():
            stem = f"ckpts/{name}"
            stems[name] = stem
            sd = {k: v.detach().clone()
                  for k, v in mod.state_dict().items()}
            save_file(sd, str(tmp_path / (stem + ".safetensors")))
            with open(tmp_path / (stem + ".json"), "w") as f:
                json.dump({"name": type(mod).__name__,
                           "args": cfg_args[name]}, f)
        with open(tmp_path / "pipeline.json", "w") as f:
            json.dump({"name": "TrellisImageTo3DPipeline", "args": {
                "models": stems,
                "image_cond_model": {
                    "hidden": 24, "layers": 1, "heads": 2, "patch": 14,
                    "pretrain_image_size": 28, "num_registers": 4},
                "image_size": 28, "capacity": 512,
                "slat_normalization": {"mean": [0.0] * 4,
                                       "std": [1.0] * 4},
            }}, f)

        from comfy3d_tpu.models.trellis import convert as tc
        pipe = tc.from_pretrained(str(tmp_path))
        # converted trees validated inside from_pretrained; now run
        img = np.random.RandomState(12).rand(28, 28, 3) \
            .astype(np.float32)
        import dataclasses as dc
        pipe.cfg = dc.replace(pipe.cfg, ss_steps=2, slat_steps=2)
        out = pipe.run(img, seed=0, formats=("gaussian",))
        g = out["gaussian"]
        assert np.isfinite(np.asarray(g.xyz)).all()
