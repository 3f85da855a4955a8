"""Craftsman parity vs the reference torch classes.

Runs the actual `SimpleDenoiser`
(craftsman/models/denoisers/simple_denoiser.py:94),
`MichelangeloAutoencoder` (models/autoencoders/
michelangelo_autoencoder.py:179) and `ConditionalCLIPVisionModel`
(conditional_encoders/clip/modeling_conditional_clip.py:227) at tiny
configs, converts the randomly-initialized Lightning-style state dict
through models/craftsman/convert.py, and compares outputs."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import refutil
from comfy3d_tpu.models import convert as C
from comfy3d_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder
from comfy3d_tpu.models.craftsman import (CraftsmanConfig,
                                          CraftsmanPipeline)
from comfy3d_tpu.models.craftsman.convert import (cond_rules,
                                                  denoiser_rules,
                                                  michelangelo_vae_rules)
from comfy3d_tpu.models.craftsman.pipeline import (DenoiserConfig,
                                                   SimpleDenoiser)
from comfy3d_tpu.models.vecset import ShapeVAE, ShapeVAEConfig

torch = pytest.importorskip("torch")

WIDTH = 32
HEADS = 2

AE_KW = dict(num_latents=16, embed_dim=8, point_feats=3, out_dim=1,
             num_freqs=8, include_pi=False, heads=HEADS, width=WIDTH,
             num_encoder_layers=1, num_decoder_layers=2,
             use_ln_post=True, qkv_bias=False, use_flash=False,
             use_checkpoint=False)
DEN_KW = dict(input_channels=8, output_channels=8, n_ctx=16, width=WIDTH,
              layers=2, heads=HEADS, context_dim=24, skip_ln=True)


@pytest.fixture(autouse=True)
def _f32():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


def _prefix_sd(module, prefix):
    return {prefix + k: v.numpy() for k, v in module.state_dict().items()}


def test_denoiser_parity():
    refutil.install_craftsman()
    from craftsman.models.denoisers.simple_denoiser import \
        SimpleDenoiser as RefDenoiser

    torch.manual_seed(0)
    ref = RefDenoiser(dict(DEN_KW)).eval()
    x = torch.randn(2, 16, 8)
    t = torch.tensor([500.0, 500.0])
    ctx = torch.randn(2, 5, 24)
    with torch.no_grad():
        want = ref(x, t, ctx).numpy()

    sd = _prefix_sd(ref, "denoiser_model.")
    params = C.convert_with_rules(sd, denoiser_rules(), strict=True)
    cfg = DenoiserConfig(input_channels=8, n_ctx=16, width=WIDTH,
                         layers=2, heads=HEADS, context_dim=24,
                         skip_ln=True)
    got = SimpleDenoiser(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want,
                               atol=2e-4, rtol=2e-4)


def test_michelangelo_decode_query_parity():
    refutil.install_craftsman()
    from craftsman.models.autoencoders.michelangelo_autoencoder import \
        MichelangeloAutoencoder

    torch.manual_seed(1)
    ref = MichelangeloAutoencoder(dict(AE_KW)).eval()
    z = torch.randn(1, 16, 8)
    pts = torch.rand(1, 11, 3) * 2 - 1
    with torch.no_grad():
        lat = ref.decode(z)
        want = ref.query(pts, lat).numpy()

    sd = _prefix_sd(ref, "shape_model.")
    params = C.convert_with_rules(sd, michelangelo_vae_rules(),
                                  strict=False)
    cfg = ShapeVAEConfig(num_latents=16, embed_dim=8, width=WIDTH,
                         heads=HEADS, num_decoder_layers=2,
                         qkv_bias=False, num_freqs=8, include_pi=False)
    vae = ShapeVAE(cfg)
    decoded = vae.apply({"params": params}, jnp.asarray(z.numpy()))
    got = vae.apply({"params": params}, decoded,
                    jnp.asarray(pts.numpy()), method=ShapeVAE.query)
    np.testing.assert_allclose(np.asarray(got), want,
                               atol=2e-4, rtol=2e-4)


def test_conditional_clip_parity():
    refutil.install_craftsman()
    from craftsman.models.conditional_encoders.clip. \
        modeling_conditional_clip import (ConditionalCLIPVisionConfig,
                                          ConditionalCLIPVisionModel)

    torch.manual_seed(2)
    rcfg = ConditionalCLIPVisionConfig(
        modulation_dim=6, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, image_size=28,
        patch_size=14, projection_dim=24)
    ref = ConditionalCLIPVisionModel(rcfg).eval()
    # zero-init ModLN mlps are a no-op — randomize to exercise the path
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "mod_norm" in name:
                p.normal_(0.0, 0.2)
    px = torch.rand(2, 3, 28, 28)
    cond = torch.randn(2, 6)
    with torch.no_grad():
        want = ref(pixel_values=px,
                   condition=cond).last_hidden_state.numpy()

    sd = {"condition.model.vision_model." + k: v.numpy()
          for k, v in ref.vision_model.state_dict().items()}
    sd["condition.model.visual_projection.weight"] = \
        np.zeros((24, 32), np.float32)
    params = C.convert_with_rules(sd, cond_rules(), strict=False)
    cfg = CLIPVisionConfig(hidden=32, layers=2, heads=2, mlp_dim=64,
                           image_size=28, patch=14, projection_dim=24,
                           modulation_dim=6)
    tokens, _ = CLIPVisionEncoder(cfg).apply(
        {"params": params},
        jnp.asarray(px.numpy().transpose(0, 2, 3, 1)),
        mod_cond=jnp.asarray(cond.numpy()))
    np.testing.assert_allclose(np.asarray(tokens), want,
                               atol=3e-4, rtol=3e-4)


def test_from_pretrained_runs(tmp_path):
    refutil.install_craftsman()
    from craftsman.models.autoencoders.michelangelo_autoencoder import \
        MichelangeloAutoencoder
    from craftsman.models.conditional_encoders.clip. \
        modeling_conditional_clip import (ConditionalCLIPVisionConfig,
                                          ConditionalCLIPVisionModel)
    from craftsman.models.denoisers.simple_denoiser import \
        SimpleDenoiser as RefDenoiser

    torch.manual_seed(3)
    den_kw = dict(DEN_KW, context_dim=32)
    sd = {}
    sd.update(_prefix_sd(RefDenoiser(den_kw), "denoiser_model."))
    sd.update(_prefix_sd(MichelangeloAutoencoder(dict(AE_KW)),
                         "shape_model."))
    vm = ConditionalCLIPVisionModel(ConditionalCLIPVisionConfig(
        modulation_dim=32, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, image_size=28,
        patch_size=14, projection_dim=24))
    sd.update({"condition.model.vision_model." + k: v.numpy()
               for k, v in vm.vision_model.state_dict().items()})
    sd["condition.model.visual_projection.weight"] = \
        np.zeros((24, 32), np.float32)

    import torch as _t
    ckpt = tmp_path / "image-to-shape-diffusion" / "tiny" / "model.ckpt"
    ckpt.parent.mkdir(parents=True)
    _t.save({"state_dict": {k: _t.from_numpy(np.asarray(v))
                            for k, v in sd.items()}}, str(ckpt))

    pipe = CraftsmanPipeline.from_pretrained(
        str(tmp_path), **dataclass_tiny_overrides())
    imgs = np.random.default_rng(0).random((2, 28, 28, 3), np.float32)
    meshes = pipe(imgs, num_steps=2, octree_resolution=16,
                  num_chunks=4096)
    assert len(meshes) == 1


def dataclass_tiny_overrides():
    tiny = CraftsmanConfig.tiny()
    import dataclasses
    den = dataclasses.replace(tiny.denoiser, context_dim=32)
    vae = dataclasses.replace(tiny.vae, num_decoder_layers=2)
    cond = dataclasses.replace(tiny.cond, mlp_dim=64, hidden=32,
                               layers=1, heads=2)
    return dict(denoiser=den, vae=vae, cond=cond, n_views=2)
