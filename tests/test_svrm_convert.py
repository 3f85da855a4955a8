"""Hunyuan3D-V1 SVRM checkpoint conversion: layout bijection against a
fabricated official-layout state dict, EG3D plane-sampling numerics vs
a torch transcription of `sample_from_planes`
(svrm/ldm/modules/rendering_neus/utils/renderer.py:28-76), a DINOv2
AdaNorm block oracle (attention.py:365-377 + layers/block.py:94-118),
and the double-backward 3D grid_sample replacement
(third_party/ops/grid_sample.cu)."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

from comfy3d_tpu.models.hunyuan3d_v1.convert import (
    convert_svrm_state_dict, load_svrm_checkpoint)
from comfy3d_tpu.models.hunyuan3d_v1.pipeline import (SVRMConfig,
                                                      SVRMPipeline)

ATOL = 2e-4


def _fabricate_svrm_sd(cfg: SVRMConfig, rng):
    sd = {}
    H = cfg.vit_hidden
    E = "img_encoder.model."

    def lin(name, o, i):
        sd[name + ".weight"] = rng.standard_normal(
            (o, i)).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.standard_normal(
            (o,)).astype(np.float32) * 0.02

    sd[E + "cls_token"] = rng.standard_normal(
        (1, 1, H)).astype(np.float32) * 0.02
    g0 = cfg.pretrain_image_size // cfg.patch
    sd[E + "pos_embed"] = rng.standard_normal(
        (1, g0 ** 2 + 1, H)).astype(np.float32) * 0.02
    sd[E + "mask_token"] = np.zeros((1, H), np.float32)   # dropped
    sd[E + "patch_embed.proj.weight"] = rng.standard_normal(
        (H, 3, cfg.patch, cfg.patch)).astype(np.float32) * 0.05
    sd[E + "patch_embed.proj.bias"] = np.zeros((H,), np.float32)
    lin(E + "cam_embed.0", H, cfg.cam_cond_dim)
    lin(E + "cam_embed.2", H, H)
    for i in range(cfg.vit_layers):
        b = f"{E}blocks.{i}."
        lin(b + "norm1.adaLN_modulation.1", 2 * H, H)
        lin(b + "attn.qkv", 3 * H, H)
        lin(b + "attn.proj", H, H)
        sd[b + "ls1.gamma"] = np.full((H,), 1e-5, np.float32)
        lin(b + "norm2.adaLN_modulation.1", 2 * H, H)
        lin(b + "mlp.fc1", cfg.vit_mlp_ratio * H, H)
        lin(b + "mlp.fc2", H, cfg.vit_mlp_ratio * H)
        sd[b + "ls2.gamma"] = np.full((H,), 1e-5, np.float32)
    lin(E + "norm.adaLN_modulation.1", 2 * H, H)

    D = "img_to_triplane_decoder."
    sd[D + "pos_emb"] = rng.standard_normal(
        (1, 3 * cfg.pos_emb_size ** 2, cfg.pos_emb_dim)).astype(
        np.float32) * 0.02
    inner = cfg.heads * cfg.head_dim
    T = D + "img_to_triplane_decoder."
    for i in range(cfg.depth):
        b = f"{T}transformer_blocks.{i}."
        for nm in ("norm1", "norm2", "norm3"):
            sd[b + nm + ".weight"] = np.ones((cfg.pos_emb_dim,),
                                             np.float32)
            sd[b + nm + ".bias"] = np.zeros((cfg.pos_emb_dim,),
                                            np.float32)
        for a, kdim in (("attn1", cfg.context_dim),
                        ("attn2", cfg.pos_emb_dim)):
            sd[b + f"{a}.to_q.weight"] = rng.standard_normal(
                (inner, cfg.pos_emb_dim)).astype(np.float32) * 0.05
            for p in ("to_k", "to_v"):
                sd[b + f"{a}.{p}.weight"] = rng.standard_normal(
                    (inner, kdim)).astype(np.float32) * 0.05
            lin(b + f"{a}.to_out.0", cfg.pos_emb_dim, inner)
        lin(b + "ff.net.0.proj", 8 * cfg.pos_emb_dim, cfg.pos_emb_dim)
        lin(b + "ff.net.2", cfg.pos_emb_dim, 4 * cfg.pos_emb_dim)
    sd[T + "norm.weight"] = np.ones((cfg.pos_emb_dim,), np.float32)
    sd[T + "norm.bias"] = np.zeros((cfg.pos_emb_dim,), np.float32)
    lin(D + "upsampler", cfg.triplane_dim * cfg.upsample_ratio ** 2,
        cfg.pos_emb_dim)

    lin("render.decoder.net.0", cfg.mlp_hidden, 3 * cfg.triplane_dim)
    lin("render.decoder.net.2", 4, cfg.mlp_hidden)
    return sd


@pytest.fixture(scope="module")
def tiny():
    return SVRMConfig.tiny()


def test_bijection_and_run(tiny):
    import diffusers_fixture as dfx

    rng = np.random.default_rng(0)
    sd = _fabricate_svrm_sd(tiny, rng)
    params = convert_svrm_state_dict(sd)
    pipe = SVRMPipeline.init_random(cfg=tiny)
    flat_c = dfx._flat(params)
    flat_r = dfx._flat(pipe.params)
    assert set(flat_c) == set(flat_r), (
        sorted(set(flat_c) ^ set(flat_r))[:8])
    for k in flat_c:
        assert flat_c[k].shape == flat_r[k].shape, k
    pipe.params = params
    views = np.random.RandomState(1).rand(2, 28, 28, 3).astype(
        np.float32)
    mesh = pipe.views_to_mesh(views, mesh_size=16)
    assert np.isfinite(np.asarray(mesh.v)).all() or \
        mesh.num_vertices == 0


def test_loader_from_disk(tiny, tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(2)
    sd = _fabricate_svrm_sd(tiny, rng)
    path = str(tmp_path / "svrm.safetensors")
    save_file(sd, path)
    pipe = load_svrm_checkpoint(path)
    assert pipe.cfg.vit_hidden == tiny.vit_hidden
    assert pipe.cfg.depth == tiny.depth
    assert pipe.cfg.triplane_dim == tiny.triplane_dim
    assert pipe.cfg.upsample_ratio == tiny.upsample_ratio
    assert pipe.cfg.pos_emb_size == tiny.pos_emb_size


def test_plane_sampling_matches_eg3d_oracle(tiny):
    """query's plane projection vs a torch transcription of
    generate_planes + project_onto_planes + sample_from_planes
    (renderer.py:28-76, box_warp = 2·radius)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax.numpy as jnp
    from comfy3d_tpu.models.triposr.model import grid_sample_2d

    rng = np.random.default_rng(3)
    C, Hp = 5, 9
    planes = rng.standard_normal((3, Hp, Hp, C)).astype(np.float32)
    pts = (rng.random((17, 3)).astype(np.float32) * 2 - 1) * 0.58
    radius = 0.6

    # ours (the query() sampling path)
    u = pts / radius
    ours = np.concatenate([
        np.asarray(grid_sample_2d(jnp.asarray(planes[0]),
                                  jnp.asarray(u[:, (0, 1)]))),
        np.asarray(grid_sample_2d(jnp.asarray(planes[1]),
                                  jnp.asarray(u[:, (0, 2)]))),
        np.asarray(grid_sample_2d(jnp.asarray(planes[2]),
                                  jnp.asarray(u[:, (2, 1)]))),
    ], axis=-1)

    # torch oracle
    plane_axes = torch.tensor([[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
                               [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                               [[0, 0, 1], [0, 1, 0], [1, 0, 0]]],
                              dtype=torch.float32)
    coords = torch.as_tensor(pts)[None] * (2.0 / (2 * radius))
    N, M, _ = coords.shape
    n_planes = 3
    cexp = coords.unsqueeze(1).expand(-1, n_planes, -1, -1).reshape(
        N * n_planes, M, 3)
    inv = torch.linalg.inv(plane_axes).unsqueeze(0).expand(
        N, -1, -1, -1).reshape(N * n_planes, 3, 3)
    proj = torch.bmm(cexp, inv)[..., :2]
    pf = torch.as_tensor(planes).permute(0, 3, 1, 2)    # [3, C, H, W]
    out = F.grid_sample(pf, proj.unsqueeze(1), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    out = out.permute(0, 3, 2, 1).reshape(1, n_planes, M, C)
    want = out.permute(0, 2, 1, 3).reshape(M, 3 * C).numpy()
    np.testing.assert_allclose(ours, want, atol=ATOL, rtol=0)


def test_dino_block_matches_torch_oracle(tiny):
    """_DinoBlockMod vs a transcription of BlockMod + AdaNorm
    (shift-first modulate, fused qkv, LayerScale)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax.numpy as jnp
    from comfy3d_tpu.models.hunyuan3d_v1.pipeline import _DinoBlockMod
    from comfy3d_tpu.models.convert import t_linear

    rng = np.random.default_rng(4)
    H, heads = 24, 2
    sd = {}
    for nm, o, i in (("norm1.mod", 2 * H, H), ("qkv", 3 * H, H),
                     ("proj", H, H), ("norm2.mod", 2 * H, H),
                     ("fc1", 4 * H, H), ("fc2", H, 4 * H)):
        sd[nm + ".weight"] = rng.standard_normal(
            (o, i)).astype(np.float32) * 0.1
        sd[nm + ".bias"] = rng.standard_normal(
            (o,)).astype(np.float32) * 0.02
    sd["ls1.gamma"] = rng.random((H,)).astype(np.float32)
    sd["ls2.gamma"] = rng.random((H,)).astype(np.float32)

    x = rng.standard_normal((2, 5, H)).astype(np.float32)
    cam = rng.standard_normal((2, H)).astype(np.float32)

    def t_lin(nm, t):
        return F.linear(t, torch.as_tensor(sd[nm + ".weight"]),
                        torch.as_tensor(sd[nm + ".bias"]))

    def adanorm(nm, t, c):
        emb = t_lin(nm, F.silu(c))
        shift, scale = emb.chunk(2, dim=1)
        h = F.layer_norm(t, (H,), eps=1e-6)
        return h * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)

    xt = torch.as_tensor(x)
    ct = torch.as_tensor(cam)
    h = adanorm("norm1.mod", xt, ct)
    qkv = t_lin("qkv", h)
    q, k, v = qkv.chunk(3, dim=-1)
    b, t, _ = h.shape
    hd = H // heads
    q = q.view(b, t, heads, hd).transpose(1, 2)
    k = k.view(b, t, heads, hd).transpose(1, 2)
    v = v.view(b, t, heads, hd).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, t, H)
    o = t_lin("proj", o)
    xt = xt + o * torch.as_tensor(sd["ls1.gamma"])
    h = adanorm("norm2.mod", xt, ct)
    h = t_lin("fc2", F.gelu(t_lin("fc1", h)))
    want = (xt + h * torch.as_tensor(sd["ls2.gamma"])).numpy()

    params = {
        "norm1": {"mod": {"kernel": t_linear(sd["norm1.mod.weight"]),
                          "bias": sd["norm1.mod.bias"]}},
        "norm2": {"mod": {"kernel": t_linear(sd["norm2.mod.weight"]),
                          "bias": sd["norm2.mod.bias"]}},
        "qkv": {"kernel": t_linear(sd["qkv.weight"]),
                "bias": sd["qkv.bias"]},
        "proj": {"kernel": t_linear(sd["proj.weight"]),
                 "bias": sd["proj.bias"]},
        "fc1": {"kernel": t_linear(sd["fc1.weight"]),
                "bias": sd["fc1.bias"]},
        "fc2": {"kernel": t_linear(sd["fc2.weight"]),
                "bias": sd["fc2.bias"]},
        "ls1_gamma": sd["ls1.gamma"],
        "ls2_gamma": sd["ls2.gamma"],
    }
    got = _DinoBlockMod(H, heads, 4).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(cam))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL,
                               rtol=0)


class TestGridSample3D:
    """ops.grid_sample.grid_sample_3d vs torch F.grid_sample 5D —
    forward, first- AND second-order gradients (the contract of the
    reference's double-backward grid_sample.cu)."""

    def _setup(self):
        rng = np.random.default_rng(5)
        vol = rng.standard_normal((4, 5, 6, 3)).astype(np.float32)
        pts = (rng.random((11, 3)).astype(np.float32) * 2.4 - 1.2)
        return vol, pts

    def test_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        import jax.numpy as jnp
        from comfy3d_tpu.ops.grid_sample import grid_sample_3d

        vol, pts = self._setup()
        got = np.asarray(grid_sample_3d(jnp.asarray(vol),
                                        jnp.asarray(pts)))
        # torch: input [N, C, D, H, W]; grid [N, Do, Ho, Wo, 3] (x,y,z)
        tv = torch.as_tensor(vol).permute(3, 0, 1, 2)[None]
        tg = torch.as_tensor(pts).view(1, 1, 1, -1, 3)
        want = F.grid_sample(tv, tg, mode="bilinear",
                             padding_mode="zeros", align_corners=False)
        want = want[0, :, 0, 0].T.numpy()
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=0)

    def test_first_and_second_order_grads(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        import jax
        import jax.numpy as jnp
        from comfy3d_tpu.ops.grid_sample import grid_sample_3d

        vol, pts = self._setup()
        volj = jnp.asarray(vol)

        def f(p):
            return jnp.sum(grid_sample_3d(volj, p) ** 2)

        g = jax.grad(f)(jnp.asarray(pts))
        assert np.isfinite(np.asarray(g)).all()

        tv = torch.as_tensor(vol).permute(3, 0, 1, 2)[None]
        tp = torch.as_tensor(pts, dtype=torch.float64).clone() \
            .requires_grad_(True)
        tvd = tv.double()
        out = F.grid_sample(tvd, tp.view(1, 1, 1, -1, 3),
                            mode="bilinear", padding_mode="zeros",
                            align_corners=False)
        loss = (out ** 2).sum()
        (tg,) = torch.autograd.grad(loss, tp)
        np.testing.assert_allclose(np.asarray(g), tg.numpy(),
                                   atol=1e-3, rtol=0)

        # second order: grad of grad-norm must be finite and match a
        # finite-difference probe (the double-backward contract)
        def gnorm(p):
            return jnp.sum(jax.grad(f)(p) ** 2)

        g2 = jax.grad(gnorm)(jnp.asarray(pts))
        assert np.isfinite(np.asarray(g2)).all()
        eps = 1e-3
        e = np.zeros_like(pts)
        e[0, 0] = eps
        fd = (float(gnorm(jnp.asarray(pts + e)))
              - float(gnorm(jnp.asarray(pts - e)))) / (2 * eps)
        assert abs(fd - float(np.asarray(g2)[0, 0])) < 5e-2 * max(
            1.0, abs(fd))
