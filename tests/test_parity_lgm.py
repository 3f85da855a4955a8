"""LGM weight-conversion parity against the reference torch UNet.

Instantiates the reference asymmetric UNet + trailing 1×1 conv exactly as
`LargeMultiviewGaussianModel` composes them
(`Gen_3D_Modules/LGM/large_multiview_gaussian_model.py:22-33`), converts
the state dict with `models.lgm.convert`, and asserts our flax LGMUNet
reproduces the 14-channel splat map.
"""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

import jax.numpy as jnp

import refutil
from comfy3d_tpu.models.lgm.model import LGMConfig, LGMUNet
from comfy3d_tpu.models.lgm.convert import convert_lgm

torch = pytest.importorskip("torch")

CFG = LGMConfig(
    input_size=32, splat_size=8, down_channels=(32, 64, 64),
    down_attention=(False, True, True), mid_attention=True,
    up_channels=(64, 64), up_attention=(True, False), layers_per_block=1)


@pytest.fixture(scope="module")
def ref_model():
    refutil.install()
    from LGM.core.unet import UNet

    class RefLGM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.unet = UNet(
                9, 14, down_channels=CFG.down_channels,
                down_attention=CFG.down_attention,
                mid_attention=CFG.mid_attention,
                up_channels=CFG.up_channels,
                up_attention=CFG.up_attention,
                layers_per_block=CFG.layers_per_block)
            self.conv = torch.nn.Conv2d(14, 14, kernel_size=1)

        def forward(self, x):
            return self.conv(self.unet(x))

    torch.manual_seed(3)
    return RefLGM().eval()


def test_unet_parity(ref_model):
    x = np.random.RandomState(0).rand(4, 9, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x)).numpy()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_lgm(sd)
    ours = LGMUNet(CFG).apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
    ref_t = np.transpose(ref, (0, 2, 3, 1))
    assert np.asarray(ours).shape == ref_t.shape
    np.testing.assert_allclose(np.asarray(ours), ref_t, atol=5e-4)


def test_all_keys_consumed(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    from comfy3d_tpu.models.lgm.convert import lgm_rules
    rules = lgm_rules()
    missed = [k for k in sd if rules(k, sd[k]) is None]
    assert missed == []


def test_from_pretrained_roundtrip(ref_model, tmp_path):
    """Node load path: state dict → safetensors file → LGMPipeline."""
    from safetensors.numpy import save_file
    from comfy3d_tpu.models.lgm import LGMPipeline
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    path = str(tmp_path / "model_fp16.safetensors")
    save_file(sd, path)
    pipe = LGMPipeline.from_pretrained(path, cfg=CFG)
    x = np.random.RandomState(1).rand(4, 32, 32, 9).astype(np.float32)
    ours = pipe.model.apply({"params": pipe.params}, jnp.asarray(x))
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)
