"""Behavioral shard smoke (round-4 verdict task 9): for each pipeline
family, shard a tiny-config pipeline over the 8-virtual-device CPU mesh
(the same `shard_pipeline` chokepoint every Load_* node routes through)
and run a real forward — asserting (a) at least one parameter leaf is
genuinely tp-sharded and (b) the output is finite. Upgrades the AST
chokepoint tripwire (test_shard_chokepoint.py) to behavior."""

import pytest

# compile-heavy tier — excluded from the <2 min CI smoke job
pytestmark = pytest.mark.heavy

import dataclasses as dc

import numpy as np

import jax

from comfy3d_tpu.parallel.sharding import make_mesh, shard_pipeline


def _sharded_leaves(params):
    """Count leaves whose sharding actually splits an axis."""
    n = 0
    for leaf in jax.tree_util.tree_leaves(params):
        sh = getattr(leaf, "sharding", None)
        if sh is None or not hasattr(sh, "spec"):
            continue
        if any(s is not None for s in sh.spec):
            n += 1
    return n


def _img(h=32, w=32, seed=0):
    return np.random.RandomState(seed).rand(h, w, 3).astype(np.float32)


def _cube():
    from comfy3d_tpu.core.mesh import Mesh
    v = np.array([[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
                  for z in (-0.5, 0.5)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(v=v, f=f).auto_normal()


def _finite(x):
    return bool(np.isfinite(np.asarray(x)).all())


# --------------------------- family probes --------------------------- #
def _hunyuan_shape():
    from comfy3d_tpu.models.hunyuan3d.pipeline import (
        Hunyuan3DShapeConfig, Hunyuan3DShapePipeline)
    pipe = Hunyuan3DShapePipeline.init_random(
        cfg=Hunyuan3DShapeConfig.tiny())

    def probe(p):
        lat = p.sample_latents(_img(), num_steps=2)
        return _finite(lat)
    return pipe, probe


def _triposg():
    from comfy3d_tpu.models.triposg.pipeline import (TripoSGConfig,
                                                     TripoSGPipeline)
    pipe = TripoSGPipeline.init_random(cfg=TripoSGConfig.tiny())

    def probe(p):
        return _finite(p.sample_latents(_img(), num_steps=2))
    return pipe, probe


def _craftsman():
    from comfy3d_tpu.models.craftsman.pipeline import (CraftsmanConfig,
                                                       CraftsmanPipeline)
    pipe = CraftsmanPipeline.init_random(cfg=CraftsmanConfig.tiny())

    def probe(p):
        mesh = p(_img()[None], num_steps=2, octree_resolution=12)
        return mesh is not None
    return pipe, probe


def _trellis():
    from comfy3d_tpu.models.trellis.pipeline import (
        TrellisConfig, TrellisImageTo3DPipeline)
    pipe = TrellisImageTo3DPipeline.init_random(cfg=TrellisConfig.tiny())

    def probe(p):
        out = p.run(_img(), formats=("gaussian",))
        return out["gaussian"] is not None
    return pipe, probe


def _sf3d():
    from comfy3d_tpu.models.sf3d.pipeline import SF3DConfig, SF3DPipeline
    pipe = SF3DPipeline.init_random(cfg=SF3DConfig.tiny())

    def probe(p):
        planes = p.forward_planes(_img())
        return _finite(planes)
    return pipe, probe


def _partcrafter():
    from comfy3d_tpu.models.partcrafter.pipeline import (
        PartCrafterConfig, PartCrafterPipeline)
    pipe = PartCrafterPipeline.init_random(cfg=PartCrafterConfig.tiny())

    def probe(p):
        meshes = p(_img(), num_parts=2, num_steps=1,
                   octree_resolution=12)
        return len(meshes) == 2
    return pipe, probe


def _svrm():
    from comfy3d_tpu.models.hunyuan3d_v1.pipeline import (SVRMConfig,
                                                          SVRMPipeline)
    pipe = SVRMPipeline.init_random(cfg=SVRMConfig.tiny())

    def probe(p):
        mesh = p.views_to_mesh(
            np.random.RandomState(2).rand(2, 28, 28, 3).astype(
                np.float32), mesh_size=12)
        return mesh is not None
    return pipe, probe


def _charactergen_lrm():
    from comfy3d_tpu.models.charactergen.lrm import (
        CGLRMConfig, CharacterGenLRMPipeline)
    pipe = CharacterGenLRMPipeline.init_random(cfg=CGLRMConfig.tiny())

    def probe(p):
        mesh = p.inference(
            np.random.RandomState(3).rand(4, 28, 28, 3).astype(
                np.float32), mesh_size=12)
        return mesh is not None
    return pipe, probe


def _charactergen_2d():
    import test_diffusion as td
    from comfy3d_tpu.models.charactergen import (CharacterGen2DConfig,
                                                 CharacterGen2DPipeline)
    cfg = CharacterGen2DConfig(
        width=32, height=32,
        unet=dc.replace(td.tiny_unet_cfg(), mv_views=4),
        vae=td.tiny_vae_cfg(), prompt_tokens=3, prompt_dim=16)
    pipe = CharacterGen2DPipeline.init_random(cfg=cfg)

    def probe(p):
        views = p.inference(_img(), num_inference_steps=1)
        return _finite(views)
    return pipe, probe


def _mvadapter_tg2mv():
    import test_mvadapter_convert as tmc
    from comfy3d_tpu.models.mvadapter import MVAdapterTG2MVPipeline
    pipe = MVAdapterTG2MVPipeline.init_random(cfg=tmc._tiny_mv_cfg())

    def probe(p):
        views, _, _ = p(_cube(), num_inference_steps=1)
        return _finite(views)
    return pipe, probe


def _crm_recon():
    from comfy3d_tpu.models.crm.pipeline import (CRMConfig,
                                                 CRMReconPipeline)
    pipe = CRMReconPipeline.init_random(cfg=CRMConfig.tiny())

    def probe(p):
        imgs = np.random.RandomState(4).rand(6, 16, 16, 3).astype(
            np.float32)
        ccms = np.random.RandomState(5).rand(6, 16, 16, 3).astype(
            np.float32)
        mesh = p(imgs, ccms, with_color=False)
        return mesh is not None
    return pipe, probe


FAMILIES = {
    "hunyuan3d_shape": _hunyuan_shape,
    "triposg": _triposg,
    "craftsman": _craftsman,
    "trellis": _trellis,
    "sf3d": _sf3d,
    "partcrafter": _partcrafter,
    "hunyuan3d_v1_svrm": _svrm,
    "charactergen_lrm": _charactergen_lrm,
    "charactergen_2d": _charactergen_2d,
    "mvadapter_tg2mv": _mvadapter_tg2mv,
    "crm_recon": _crm_recon,
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_sharded_pipeline_forward(family):
    assert len(jax.devices()) == 8, "conftest must provide 8 devices"
    pipe, probe = FAMILIES[family]()
    mesh = make_mesh()
    shard_pipeline(pipe, mesh)
    n = _sharded_leaves(pipe.params)
    assert n >= 1, f"{family}: no tp-sharded parameter leaves"
    assert probe(pipe), f"{family}: sharded forward failed"
