"""CLIP text/vision encoder parity vs transformers' torch CLIP (the
conditioning oracle for Zero123Plus / MVDream)."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

import jax.numpy as jnp

from comfy3d_tpu.models.clip import (CLIPTextConfig, CLIPTextEncoder,
                                     CLIPVisionConfig, CLIPVisionEncoder,
                                     convert_clip)

torch = pytest.importorskip("torch")


def test_text_encoder_parity():
    from transformers import CLIPTextModel
    from transformers import CLIPTextConfig as HFText
    torch.manual_seed(0)
    hf = CLIPTextModel(HFText(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, vocab_size=100,
        max_position_embeddings=16, eos_token_id=99)).eval()
    ids = np.random.RandomState(0).randint(1, 90, size=(2, 16))
    ids[:, 10] = 99                              # mid-sequence EOS
    with torch.no_grad():
        out = hf(torch.from_numpy(ids))
        ref_h = out.last_hidden_state.numpy()
        ref_p = out.pooler_output.numpy()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip(sd)
    cfg = CLIPTextConfig(vocab_size=100, hidden=32, layers=2, heads=2,
                         mlp_dim=64, max_positions=16, eos_token_id=99)
    h, pooled = CLIPTextEncoder(cfg).apply({"params": params},
                                           jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_p, atol=3e-4)


def test_vision_encoder_parity():
    from transformers import CLIPVisionModelWithProjection
    from transformers import CLIPVisionConfig as HFVision
    torch.manual_seed(1)
    hf = CLIPVisionModelWithProjection(HFVision(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=24)).eval()
    x = np.random.RandomState(1).randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_emb = out.image_embeds.numpy()
        ref_h = out.last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip(sd)
    cfg = CLIPVisionConfig(hidden=32, layers=2, heads=2, mlp_dim=64,
                           image_size=28, patch=14, projection_dim=24)
    tokens, emb = CLIPVisionEncoder(cfg).apply({"params": params},
                                               jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(tokens), ref_h, atol=3e-4)
    np.testing.assert_allclose(np.asarray(emb), ref_emb, atol=3e-4)
