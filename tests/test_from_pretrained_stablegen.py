"""Yoso (Stable3DGen StableX) `from_pretrained` against a fabricated
Stable-X/yoso-normal layout: unet/ + vae/ + controlnet/ where the
controlnet state dict follows diffusers ControlNetModel naming — its
conditioning-embedding and zero-conv weights are dead at forward time
(ControlNetVAE semantics) and must be skipped without error."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import os

import numpy as np
import pytest

import diffusers_fixture as fx

UNET_CFG = {
    "in_channels": 4, "out_channels": 4,
    "block_out_channels": [8, 16], "layers_per_block": 1,
    "cross_attention_dim": 16, "attention_head_dim": 4,
    "norm_num_groups": 4, "use_linear_projection": True,
    "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
}
VAE_CFG = {
    "in_channels": 3, "latent_channels": 4,
    "block_out_channels": [8, 16], "layers_per_block": 1,
    "norm_num_groups": 4, "scaling_factor": 0.18215,
}


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from comfy3d_tpu.models.diffusion import convert as dconv
    from comfy3d_tpu.models.diffusion.controlnet import ControlNetEncoder
    from comfy3d_tpu.models.diffusion.unet import UNet2DCondition
    from comfy3d_tpu.models.diffusion.vae import AutoencoderKL

    root = tmp_path_factory.mktemp("yoso-normal")
    rng = np.random.default_rng(0)
    ucfg = dconv.unet_config_from_json(UNET_CFG)

    uparams = UNet2DCondition(ucfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 2, 16)))["params"]
    keys = fx.enumerate_unet_keys(
        UNET_CFG["down_block_types"], UNET_CFG["up_block_types"],
        UNET_CFG["block_out_channels"], 1)
    sd = fx.fabricate_state_dict(keys, dconv.unet_rules(), uparams, rng)
    fx.write_component(os.path.join(root, "unet"), UNET_CFG, sd)

    # controlnet: the down+mid subset of the UNet keys (raw_residuals
    # encoder), plus dead diffusers extras that must be ignored
    cn = ControlNetEncoder(ucfg, raw_residuals=True)
    cparams = cn.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 4)),
                      jnp.zeros((1,)), jnp.zeros((1, 2, 16)),
                      jnp.zeros((1, 8, 8, 4)))["params"]
    ckeys = [(k, kind) for k, kind in keys
             if not (k.startswith(("up_blocks.", "conv_out",
                                   "conv_norm_out")))]
    csd = fx.fabricate_state_dict(ckeys, dconv.unet_rules(), cparams,
                                  rng)
    csd["controlnet_cond_embedding.conv_in.weight"] = \
        np.zeros((4, 3, 3, 3), np.float32)
    csd["controlnet_down_blocks.0.weight"] = \
        np.zeros((8, 8, 1, 1), np.float32)
    fx.write_component(os.path.join(root, "controlnet"),
                       dict(UNET_CFG), csd)

    vcfg = dconv.vae_config_from_json(VAE_CFG)
    vparams = AutoencoderKL(vcfg).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 3)))["params"]
    sd = fx.fabricate_state_dict(
        fx.enumerate_vae_keys(VAE_CFG["block_out_channels"], 1),
        dconv.vae_rules(), vparams, rng)
    fx.write_component(os.path.join(root, "vae"), VAE_CFG, sd)
    return str(root)


def test_from_pretrained_runs(ckpt_dir):
    from comfy3d_tpu.models.stablegen import YosoNormalsPipeline
    pipe = YosoNormalsPipeline.from_pretrained(ckpt_dir,
                                               prompt_tokens=2)
    assert pipe.controlnet.raw_residuals
    img = np.random.default_rng(1).random((16, 16, 3), np.float32)
    normals = np.asarray(pipe(img))
    assert normals.shape == (1, 16, 16, 3)
    assert np.isfinite(normals).all()
    lens = np.linalg.norm(normals, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)


def test_node_loads(ckpt_dir, monkeypatch):
    import shutil
    import comfy3d_tpu.nodes.nodes_diffusers as nd
    import comfy3d_tpu.nodes.nodes_stablegen as ns
    root = os.path.join(os.path.dirname(ckpt_dir), "ckroot")
    dst = os.path.join(root, "Stable-X", "yoso-normal-v1-8-1")
    if not os.path.isdir(dst):
        shutil.copytree(ckpt_dir, dst)
    monkeypatch.setattr(nd, "CKPT_DIFFUSERS_PATH", root)
    (pipe,) = ns.Load_StableGen_StableX_Pipeline().load()
    assert pipe.controlnet.raw_residuals   # proves the real loader ran